"""Masked registration metrics, jitted and batch-friendly.

Capability parity with the reference toolkit
(/root/reference/registration_metrics.py:27-311): masked NCC, normalized
masked MSE/ML1E, masked SSIM, normalized mutual information, and VGG
perceptual loss. Every metric here takes (ref, mov, ref_mask, mov_mask)
(H, W) arrays and is written in jnp with static shapes, so the shift-search
grid can vmap it over hundreds of candidate warps in one XLA program —
the reference re-enters NumPy per candidate.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _combined_mask(ref_mask, mov_mask):
    rm = jnp.asarray(ref_mask)
    mm = jnp.asarray(mov_mask)
    rm = jnp.where(rm > 0.5, 1.0, 0.0) if rm.dtype != jnp.bool_ else rm.astype(jnp.float32)
    mm = jnp.where(mm > 0.5, 1.0, 0.0) if mm.dtype != jnp.bool_ else mm.astype(jnp.float32)
    return rm * mm


@jax.jit
def masked_ncc(ref, mov, ref_mask, mov_mask):
    """Weighted normalized cross-correlation over the combined mask.

    Returns NaN when the mask is empty or either image is constant under
    the mask (same contract as the reference).
    """
    w = jnp.asarray(ref_mask, jnp.float32) * jnp.asarray(mov_mask, jnp.float32)
    wsum = jnp.sum(w)
    mu_r = jnp.sum(ref * w) / wsum
    mu_m = jnp.sum(mov * w) / wsum
    sig_r = jnp.sqrt(jnp.sum(w * jnp.square(ref - mu_r)) / wsum)
    sig_m = jnp.sqrt(jnp.sum(w * jnp.square(mov - mu_m)) / wsum)
    cov = jnp.sum(w * (ref - mu_r) * (mov - mu_m)) / wsum
    ncc = cov / (sig_r * sig_m)
    bad = (wsum == 0) | (sig_r == 0) | (sig_m == 0)
    return jnp.where(bad, jnp.nan, ncc)


def _masked_normalize(img, mask):
    """Zero-mean / unit-std over the masked region (masked pixels excluded
    from the statistics, matching the boolean-extraction in the reference)."""
    n = jnp.sum(mask)
    mean = jnp.sum(img * mask) / n
    var = jnp.sum(mask * jnp.square(img - mean)) / n
    std = jnp.sqrt(var)
    return (img - mean) / (std + _EPS)


@partial(jax.jit, static_argnames=("use_masks", "normalize"))
def masked_mse(ref, mov, ref_mask, mov_mask, use_masks: bool = True, normalize: bool = True):
    """Mean squared error over the combined mask, optionally on normalized images."""
    if use_masks:
        m = _combined_mask(ref_mask, mov_mask)
    else:
        m = jnp.ones_like(jnp.asarray(ref, jnp.float32))
    n = jnp.sum(m)
    if normalize:
        ref = _masked_normalize(ref, m)
        mov = _masked_normalize(mov, m)
    return jnp.sum(m * jnp.square(ref - mov)) / n


@partial(jax.jit, static_argnames=("use_masks", "normalize"))
def masked_ml1e(ref, mov, ref_mask, mov_mask, use_masks: bool = True, normalize: bool = True):
    """Mean L1 error over the combined mask, optionally on normalized images."""
    if use_masks:
        m = _combined_mask(ref_mask, mov_mask)
    else:
        m = jnp.ones_like(jnp.asarray(ref, jnp.float32))
    n = jnp.sum(m)
    if normalize:
        ref = _masked_normalize(ref, m)
        mov = _masked_normalize(mov, m)
    return jnp.sum(m * jnp.abs(ref - mov)) / n


def _uniform_filter(x, size: int):
    """Mean filter with a size x size window, 'valid' region padded back
    to input size by edge replication (skimage-compatible interior)."""
    pad = size // 2
    xp = jnp.pad(x, ((pad, pad), (pad, pad)), mode="edge")
    h, w = x.shape
    acc = sum(
        xp[i : i + h, j : j + w] for i in range(size) for j in range(size)
    )
    return acc / (size * size)


@partial(jax.jit, static_argnames=("use_masks", "win_size"))
def masked_ssim(ref, mov, ref_mask, mov_mask, use_masks: bool = True, win_size: int = 7):
    """Structural similarity on mask-zeroed images.

    Mirrors the reference protocol (registration_metrics.py:225-279):
    masked-out pixels are set to 0 in BOTH images, the data range is taken
    from the masked images, and the standard uniform-window SSIM
    (K1=0.01, K2=0.03, skimage sample covariance correction) is averaged
    over the full frame.
    """
    ref = jnp.asarray(ref, jnp.float32)
    mov = jnp.asarray(mov, jnp.float32)
    if use_masks:
        m = _combined_mask(ref_mask, mov_mask)
        ref = ref * m
        mov = mov * m
    dmin = jnp.minimum(jnp.min(ref), jnp.min(mov))
    dmax = jnp.maximum(jnp.max(ref), jnp.max(mov))
    drange = dmax - dmin

    k1, k2 = 0.01, 0.03
    c1 = jnp.square(k1 * drange)
    c2 = jnp.square(k2 * drange)

    n = win_size * win_size
    cov_norm = n / (n - 1)  # sample covariance (skimage default)
    ux = _uniform_filter(ref, win_size)
    uy = _uniform_filter(mov, win_size)
    uxx = _uniform_filter(ref * ref, win_size)
    uyy = _uniform_filter(mov * mov, win_size)
    uxy = _uniform_filter(ref * mov, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    # skimage crops the filter-invalid border before averaging
    pad = (win_size - 1) // 2
    return jnp.mean(s[pad:-pad, pad:-pad])


@partial(jax.jit, static_argnames=("use_masks", "bins"))
def masked_mi(ref, mov, ref_mask, mov_mask, use_masks: bool = True, bins: int = 100):
    """Normalized mutual information (Studholme): (H(X)+H(Y)) / H(X,Y).

    Histogram-based with `bins` equal-width bins over each image's own
    range, on mask-zeroed images (reference: registration_metrics.py:281-311
    via skimage.metrics.normalized_mutual_information).
    """
    ref = jnp.asarray(ref, jnp.float32)
    mov = jnp.asarray(mov, jnp.float32)
    if use_masks:
        m = _combined_mask(ref_mask, mov_mask)
        ref = ref * m
        mov = mov * m

    def bucketize(x):
        lo, hi = jnp.min(x), jnp.max(x)
        t = (x - lo) / jnp.maximum(hi - lo, _EPS)
        return jnp.clip((t * bins).astype(jnp.int32), 0, bins - 1)

    ri = bucketize(ref).ravel()
    mi_ = bucketize(mov).ravel()
    joint_idx = ri * bins + mi_
    joint = jnp.zeros((bins * bins,), jnp.float32).at[joint_idx].add(1.0)
    joint = joint / jnp.sum(joint)
    px = jnp.sum(joint.reshape(bins, bins), axis=1)
    py = jnp.sum(joint.reshape(bins, bins), axis=0)

    def entropy(p):
        return -jnp.sum(jnp.where(p > 0, p * jnp.log(p), 0.0))

    hx, hy, hxy = entropy(px), entropy(py), entropy(joint)
    return (hx + hy) / hxy


LAYER_WEIGHTS = (1.0, 0.8, 0.6, 0.4, 0.2)


def perceptual_loss(
    ref,
    mov,
    ref_mask,
    mov_mask,
    extractor,
    return_diffs: bool = True,
) -> Tuple[float, Dict]:
    """Masked VGG perceptual loss (reference: registration_metrics.py:27-111).

    Protocol: multiply both images by the combined mask, extract tapped VGG
    features, nearest-resize the mask to each feature resolution, and take
    the weighted mask-normalized L1 between feature maps; weights
    (1, .8, .6, .4, .2) over taps, normalized by their sum.

    Returns (loss, diffs) where diffs holds per-layer losses, summed |diff|
    maps and resized masks for visualization.
    """
    m = jnp.asarray(_combined_mask(ref_mask, mov_mask))
    ref_feats = extractor(jnp.asarray(ref) * m)
    mov_feats = extractor(jnp.asarray(mov) * m)

    total = 0.0
    wsum = 0.0
    diffs: Dict[str, object] = {}
    for i, name in enumerate(sorted(ref_feats, key=int)):
        rf = ref_feats[name]
        mf = mov_feats[name]
        hf, wf = rf.shape[1:3]
        # nearest-neighbor mask resize
        ys = (jnp.arange(hf) * (m.shape[0] / hf)).astype(jnp.int32)
        xs = (jnp.arange(wf) * (m.shape[1] / wf)).astype(jnp.int32)
        mr = m[ys][:, xs]
        mask_e = mr[None, :, :, None]
        num_valid = jnp.sum(mask_e) * rf.shape[-1]
        l1 = jnp.abs(rf * mask_e - mf * mask_e)
        layer_loss = jnp.sum(l1) / jnp.maximum(num_valid, 1.0)
        w = LAYER_WEIGHTS[i] if i < len(LAYER_WEIGHTS) else LAYER_WEIGHTS[-1]
        total = total + w * layer_loss
        wsum += w
        if return_diffs:
            diffs[f"{name}_loss"] = float(layer_loss)
            diffs[f"{name}_diff"] = jax.device_get(jnp.sum(l1[0], axis=-1) / jnp.maximum(num_valid, 1.0))
            diffs[f"{name}_mask"] = jax.device_get(mr)
    return float(total / wsum), diffs
