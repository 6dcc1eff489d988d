"""Scene preprocessing: HR -> LR-grid projection + per-view alignment.

This is the WORKING version of the reference's `preprocess_imgset`
(preprocess_images.py:322-486), whose alignment step calls an undefined
function and is dead code (SURVEY.md "out of scope / dead code"). Here:

1. The HR frame (and its SM mask) is Lanczos-downscaled by the SR factor
   onto the LR grid (ops.lanczos.lanczos_resample_2d — separable, fused).
2. Every LR view is registered against the downscaled HR reference with
   the masked-NCC coarse-to-fine search (batched on device).
3. Aligned views, masks, and the per-view shifts (JSON) are written to
   `<scene>/aligned/`.
"""

from __future__ import annotations

import os
from os.path import join
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np

from highresnet_tpu.data.probav import read_imageset
from highresnet_tpu.ops.lanczos import lanczos_resample_2d
from highresnet_tpu.registration.search import apply_shift_to_template, compute_shift_ncc
from highresnet_tpu.utils.display import save_image, save_shift


def downscale_hr(hr: np.ndarray, hr_map: np.ndarray, scale: int = 3) -> Tuple[np.ndarray, np.ndarray]:
    """Project HR + mask onto the LR grid (Lanczos for image, box for mask)."""
    lr_ref = np.asarray(lanczos_resample_2d(jnp.asarray(hr, jnp.float32), scale))
    h, w = hr_map.shape
    mask_small = (
        hr_map[: h - h % scale, : w - w % scale]
        .reshape(h // scale, scale, w // scale, scale)
        .mean(axis=(1, 3))
    )
    return lr_ref, (mask_small > 0.5).astype(np.float32)


def preprocess_imgset(
    scene_dir: str,
    scale: int = 3,
    out_subdir: str = "aligned",
    points_per_dim: int = 5,
    max_recursions: int = 6,
) -> Dict[str, Tuple[float, float]]:
    """Align every LR view of a scene to its Lanczos-downscaled HR frame.

    Returns {view_index: (dy, dx)} of the applied shifts; writes aligned
    images/masks and shifts JSON under <scene_dir>/<out_subdir>/.
    """
    imset = read_imageset(scene_dir, top_k=None)
    if imset.hr is None:
        raise ValueError(f"{scene_dir} has no HR.png; nothing to align against")

    ref, ref_mask = downscale_hr(imset.hr, imset.hr_map, scale)
    out_dir = join(scene_dir, out_subdir)
    os.makedirs(out_dir, exist_ok=True)
    save_image(ref * 65535.0, join(out_dir, "REF.png"), dtype=np.float32)

    shifts: Dict[str, Tuple[float, float]] = {}
    for i, view in enumerate(imset.lr):
        view_mask = np.ones_like(view)
        dy, dx = compute_shift_ncc(
            ref, view, ref_mask, view_mask,
            points_per_dim=points_per_dim, max_recursions=max_recursions,
        )
        aligned, aligned_mask = apply_shift_to_template(dx, dy, view, view_mask)
        save_image(aligned * 65535.0, join(out_dir, f"LR{i:03d}.png"), dtype=np.float32)
        save_image(aligned_mask > 0.5, join(out_dir, f"QM{i:03d}.png"), dtype=np.bool_)
        save_shift((dy, dx), join(out_dir, f"shift{i:03d}.json"))
        shifts[f"{i:03d}"] = (dy, dx)
    return shifts
