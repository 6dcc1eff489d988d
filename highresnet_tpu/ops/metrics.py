"""Evaluation metrics: cPSNR and shift-search cPSNR.

The reference computes shift_cPSNR as a Python loop over the 49 integer
placements of the trimmed SR patch inside the HR frame, each a full NumPy
cPSNR (src/Evaluator.py:52-73). Here the whole 7x7 grid is one vmapped,
jitted computation: 49 bias-corrected MSEs evaluated in parallel on device,
then a max — this is the op that dominates validation time, so it must be
fused (SURVEY.md §7 risk: "Eval loop shape").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

UINT16_MAX = np.iinfo(np.uint16).max


def cpsnr(sr, hr, hr_map) -> jax.Array:
    """Clear PSNR between (..., H, W) arrays. Accepts uint16 or [0,1] float."""
    sr = jnp.asarray(sr)
    hr = jnp.asarray(hr)
    hr_map = jnp.asarray(hr_map, jnp.float32)
    if sr.dtype == jnp.uint16:
        sr = sr.astype(jnp.float32) / UINT16_MAX
    if hr.dtype == jnp.uint16:
        hr = hr.astype(jnp.float32) / UINT16_MAX
    n_clear = jnp.sum(hr_map, axis=(-2, -1))
    diff = hr.astype(jnp.float32) - sr.astype(jnp.float32)
    bias = jnp.sum(diff * hr_map, axis=(-2, -1)) / n_clear
    cmse = (
        jnp.sum(jnp.square((diff - bias[..., None, None]) * hr_map), axis=(-2, -1))
        / n_clear
    )
    return -10.0 * jnp.log10(cmse)


@partial(jax.jit, static_argnames=("border",))
def shift_cpsnr(sr: jax.Array, hr: jax.Array, hr_map: jax.Array, border: int = 3) -> jax.Array:
    """Max cPSNR of the border-trimmed SR over all (2b+1)^2 integer placements.

    Args:
      sr, hr, hr_map: (H, W) float arrays, sr/hr in [0, 1].
    Returns:
      scalar max cPSNR (dB).
    """
    size = sr.shape[-1] - 2 * border
    sr_c = jax.lax.dynamic_slice(sr, (border, border), (size, size))

    span = 2 * border + 1
    dys, dxs = jnp.meshgrid(jnp.arange(span), jnp.arange(span), indexing="ij")
    positions = jnp.stack([dys.ravel(), dxs.ravel()], axis=-1)  # (49, 2)

    def at(pos):
        hr_p = jax.lax.dynamic_slice(hr, (pos[0], pos[1]), (size, size))
        map_p = jax.lax.dynamic_slice(hr_map, (pos[0], pos[1]), (size, size))
        return cpsnr(sr_c, hr_p, map_p)

    scores = jax.vmap(at)(positions)
    return jnp.max(scores)


@partial(jax.jit, static_argnames=("border",))
def shift_cpsnr_batch(sr: jax.Array, hr: jax.Array, hr_map: jax.Array, border: int = 3) -> jax.Array:
    """Vectorized shift_cpsnr over a (B, H, W) batch -> (B,) scores."""
    return jax.vmap(lambda s, h, m: shift_cpsnr(s, h, m, border=border))(sr, hr, hr_map)


# ---------------------------------------------------------------------------
# NumPy reference paths (used for golden tests and CPU-side tooling).
# ---------------------------------------------------------------------------

def cpsnr_np(sr: np.ndarray, hr: np.ndarray, hr_map: np.ndarray):
    """NumPy cPSNR, exact mirror of the device formula (float64)."""
    squeeze = sr.ndim == 2
    if squeeze:
        sr, hr, hr_map = sr[None], hr[None], hr_map[None]
    if sr.dtype == np.uint16:
        sr = sr / UINT16_MAX
    else:
        assert 0 <= sr.min() and sr.max() <= 1, "float sr must lie in [0, 1]"
    if hr.dtype == np.uint16:
        hr = hr / UINT16_MAX
    hr_map = hr_map.astype(np.float64)
    n_clear = np.sum(hr_map, axis=(1, 2))
    diff = hr - sr
    bias = np.sum(diff * hr_map, axis=(1, 2)) / n_clear
    cmse = np.sum(np.square((diff - bias[:, None, None]) * hr_map), axis=(1, 2)) / n_clear
    out = -10 * np.log10(cmse)
    return out[0] if squeeze else out


def shift_cpsnr_np(sr: np.ndarray, hr: np.ndarray, hr_map: np.ndarray, border: int = 3):
    """NumPy shift-search cPSNR (golden oracle for the jitted version)."""
    size = sr.shape[-1] - 2 * border
    sr_c = sr[border : border + size, border : border + size]
    best = -np.inf
    for dy in range(2 * border + 1):
        for dx in range(2 * border + 1):
            hr_p = hr[dy : dy + size, dx : dx + size]
            map_p = hr_map[dy : dy + size, dx : dx + size]
            best = max(best, cpsnr_np(sr_c, hr_p, map_p))
    return best
