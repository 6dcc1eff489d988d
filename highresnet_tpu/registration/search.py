"""Shift-search algorithms (capability parity with registration_search.py).

Four families, same signatures and conventions as the reference toolkit:

- ``compute_shift_ncc``      coarse-to-fine grid search maximizing masked NCC
- ``compute_shift_pl``       same grid, minimizing VGG perceptual loss
- ``compute_shift_with_metric``  generic metric-driven grid search
- ``compute_shift_pcc``      FFT phase cross-correlation with sub-pixel
                              upsampled-DFT refinement
- ``compute_shift_point_matching``  ORB keypoints + RANSAC translation (cv2)

TPU-first redesign of the grid search: the reference evaluates the
points_per_dim^2 grid with a nested Python loop, re-warping the template
once per candidate on the host (registration_search.py:73-97, 584-602).
Here every level warps ALL candidates in one batched cubic-warp and scores
them with a vmapped masked metric — one XLA program per level, ~P^2-fold
less dispatch overhead.

Search protocol matches the reference: level bounds are
prev_best +/- (scale_factor**level), starting width 2.0; scale_factor is
derived from points_per_dim and clamped to [0.25, 0.9); max_recursions
levels are always executed.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from highresnet_tpu.registration import metrics as rm
from highresnet_tpu.registration.warp import (
    cubic_shift_batch,
    linear_shift_batch,
    shift_template_batch,
)


def apply_shift_to_template(shift_x: float, shift_y: float, template_image, template_mask):
    """Warp one template+mask by (dx, dy); returns (image, mask) arrays.

    Mirrors the reference helper's signature and (x, y) argument order
    (registration_search.py:12-44). Mask is float in [0,1], caller
    binarizes (the reference binarizes at 0.5 at each use site).
    """
    shifts = jnp.asarray([[shift_y, shift_x]], jnp.float32)
    img = cubic_shift_batch(jnp.asarray(template_image, jnp.float32)[None], shifts)[0]
    msk = linear_shift_batch(jnp.asarray(template_mask, jnp.float32)[None], shifts)[0]
    return np.asarray(img), np.asarray(msk)


def _grid(bounds_y, bounds_x, points_per_dim: int) -> jnp.ndarray:
    ys = jnp.linspace(bounds_y[0], bounds_y[1], points_per_dim)
    xs = jnp.linspace(bounds_x[0], bounds_x[1], points_per_dim)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([yy.ravel(), xx.ravel()], axis=-1)  # (P^2, 2) as (dy, dx)


@partial(jax.jit, static_argnames=("points_per_dim",))
def _mncc_grid_scores(ref, ref_mask, template, template_mask, center, width, points_per_dim):
    """True masked-NCC scores for the whole grid in one program. Higher = better.

    Divergence from the reference (intentional fix): the reference
    pre-normalizes the reference image under the FULL ref mask
    (registration_search.py:173-193), which yields pseudo-correlations > 1
    when the candidate warp moves the combined-mask boundary, and the
    search can lock onto mask artifacts instead of alignment. Here BOTH
    images are normalized under each candidate's combined mask — the exact
    masked NCC — at the cost of two extra fused reductions per candidate.
    """
    bounds_y = (center[0] - width / 2, center[0] + width / 2)
    bounds_x = (center[1] - width / 2, center[1] + width / 2)
    shifts = _grid(bounds_y, bounds_x, points_per_dim)
    warped, wmasks = shift_template_batch(template, template_mask, shifts)
    combined = ref_mask[None] * wmasks  # (N, H, W)
    wsum = jnp.sum(combined, axis=(1, 2))
    mu_r = jnp.sum(ref[None] * combined, axis=(1, 2)) / wsum
    sig_r = jnp.sqrt(
        jnp.sum(combined * jnp.square(ref[None] - mu_r[:, None, None]), axis=(1, 2)) / wsum
    )
    mu_t = jnp.sum(warped * combined, axis=(1, 2)) / wsum
    sig_t = jnp.sqrt(
        jnp.sum(combined * jnp.square(warped - mu_t[:, None, None]), axis=(1, 2)) / wsum
    )
    cov = (
        jnp.sum(combined * (ref[None] - mu_r[:, None, None]) * (warped - mu_t[:, None, None]), axis=(1, 2))
        / wsum
    )
    mncc = cov / (sig_r * sig_t)
    mncc = jnp.where((wsum > 0) & (sig_r > 0) & (sig_t > 0), mncc, -jnp.inf)
    return shifts, mncc


def _scale_factor(points_per_dim: int, minus: int) -> float:
    sf = 1.0 / (points_per_dim - minus)
    return min(max(sf, 0.25), 0.9) if sf < 1.0 else 0.9


def compute_shift_ncc(
    ref_image,
    template_image,
    ref_mask,
    template_mask,
    points_per_dim: int = 7,
    max_recursions: int = 10,
) -> Tuple[float, float]:
    """Best (dy, dx) maximizing masked NCC via coarse-to-fine grid search."""
    if points_per_dim < 3:
        raise ValueError("points_per_dim must be at least 3")
    if max_recursions < 3:
        raise ValueError("max_recursions must be at least 3")

    ref_mask_f = jnp.asarray(ref_mask, jnp.float32)
    wsum = float(jnp.sum(ref_mask_f))
    if wsum == 0:
        return 0.0, 0.0
    ref = jnp.asarray(ref_image, jnp.float32)
    sig = float(
        jnp.sqrt(
            jnp.sum(ref_mask_f * jnp.square(ref - jnp.sum(ref * ref_mask_f) / wsum)) / wsum
        )
    )
    if sig == 0:
        return 0.0, 0.0

    sf = _scale_factor(points_per_dim, minus=2)
    template = jnp.asarray(template_image, jnp.float32)
    tmask = jnp.asarray(template_mask, jnp.float32)

    best = jnp.zeros(2, jnp.float32)
    for level in range(max_recursions):
        width = jnp.float32(2.0 * sf**level)
        shifts, scores = _mncc_grid_scores(
            ref, ref_mask_f, template, tmask, best, width, points_per_dim
        )
        best = shifts[jnp.argmax(scores)]
    dy, dx = np.asarray(best)
    return float(dy), float(dx)


def compute_shift_with_metric(
    metric_fn: Callable,
    minimize: bool = True,
    ref_image=None,
    template_image=None,
    ref_mask=None,
    template_mask=None,
    points_per_dim: int = 7,
    max_recursions: int = 10,
    **metric_kwargs,
) -> Tuple[float, float]:
    """Generic coarse-to-fine search over any masked metric.

    metric_fn(ref_image=, mov_image=, ref_mask=, mov_mask=, **kwargs) -> scalar.
    Metrics written in jnp are vmapped over the whole candidate grid; other
    callables fall back to per-candidate evaluation (still batched warps).
    """
    sf = _scale_factor(points_per_dim, minus=1)
    ref = jnp.asarray(ref_image, jnp.float32)
    rmask = jnp.asarray(ref_mask, jnp.float32)
    template = jnp.asarray(template_image, jnp.float32)
    tmask = jnp.asarray(template_mask, jnp.float32)

    def eval_grid(center, width):
        shifts = _grid(
            (center[0] - width / 2, center[0] + width / 2),
            (center[1] - width / 2, center[1] + width / 2),
            points_per_dim,
        )
        warped, wmasks = shift_template_batch(template, tmask, shifts)
        # metrics take (ref, mov, ref_mask, mov_mask) positionally (both this
        # package's metrics and reference-style ones)
        try:
            scores = jnp.asarray(
                jax.vmap(lambda w, m: metric_fn(ref, w, rmask, m, **metric_kwargs))(
                    warped, wmasks
                )
            )
        except Exception:
            # non-traceable metric (host NumPy): per-candidate fallback,
            # still with batched device warps
            scores = jnp.asarray(
                [
                    float(
                        metric_fn(
                            np.asarray(ref),
                            np.asarray(warped[i]),
                            np.asarray(rmask),
                            np.asarray(wmasks[i]),
                            **metric_kwargs,
                        )
                    )
                    for i in range(shifts.shape[0])
                ]
            )
        if minimize:
            scores = jnp.where(jnp.isnan(scores), jnp.inf, scores)
            return shifts[jnp.argmin(scores)]
        scores = jnp.where(jnp.isnan(scores), -jnp.inf, scores)
        return shifts[jnp.argmax(scores)]

    best = jnp.zeros(2, jnp.float32)
    for level in range(max_recursions):
        best = eval_grid(best, 2.0 * sf**level)
    dy, dx = np.asarray(best)
    return float(dy), float(dx)


def compute_shift_pl(
    extractor,
    ref_image,
    template_image,
    ref_mask,
    template_mask,
    points_per_dim: int = 7,
    max_recursions: int = 10,
) -> Tuple[float, float]:
    """Coarse-to-fine search minimizing the masked VGG perceptual loss.

    All grid candidates are featurized in one batched VGG forward per level
    (the reference runs the VGG once per candidate, per level).
    """
    sf = _scale_factor(points_per_dim, minus=1)
    ref = jnp.asarray(ref_image, jnp.float32)
    rmask = jnp.asarray(ref_mask, jnp.float32)
    template = jnp.asarray(template_image, jnp.float32)
    tmask = jnp.asarray(template_mask, jnp.float32)

    def level_best(center, width):
        shifts = _grid(
            (center[0] - width / 2, center[0] + width / 2),
            (center[1] - width / 2, center[1] + width / 2),
            points_per_dim,
        )
        warped, wmasks = shift_template_batch(template, tmask, shifts)
        combined = rmask[None] * wmasks  # (N, H, W)
        ref_feats = extractor.features_batched(ref[None] * combined)
        mov_feats = extractor.features_batched(warped * combined)
        total = 0.0
        wsum = 0.0
        for i, name in enumerate(sorted(ref_feats, key=int)):
            rf, mf = ref_feats[name], mov_feats[name]
            hf, wf = rf.shape[1:3]
            ys = (jnp.arange(hf) * (combined.shape[1] / hf)).astype(jnp.int32)
            xs = (jnp.arange(wf) * (combined.shape[2] / wf)).astype(jnp.int32)
            mr = combined[:, ys][:, :, xs][..., None]  # (N, hf, wf, 1)
            nvalid = jnp.sum(mr, axis=(1, 2, 3)) * rf.shape[-1]
            l1 = jnp.sum(jnp.abs(rf * mr - mf * mr), axis=(1, 2, 3))
            w = rm.LAYER_WEIGHTS[i] if i < len(rm.LAYER_WEIGHTS) else rm.LAYER_WEIGHTS[-1]
            total = total + w * l1 / jnp.maximum(nvalid, 1.0)
            wsum += w
        scores = total / wsum
        return shifts[jnp.argmin(scores)]

    best = jnp.zeros(2, jnp.float32)
    for level in range(max_recursions):
        best = level_best(best, 2.0 * sf**level)
    dy, dx = np.asarray(best)
    return float(dy), float(dx)


# ---------------------------------------------------------------------------
# Phase cross-correlation (Guizar-Sicairos upsampled-DFT refinement)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("upsample_factor",))
def _pcc(ref: jax.Array, mov: jax.Array, upsample_factor: int = 1000) -> jax.Array:
    """Sub-pixel translation (dy, dx) such that mov == shift(ref by (dy, dx)).

    Standard single-step DFT upsampling: coarse integer peak from the full
    cross-power spectrum, then a matrix-DFT zoom of a 1.5-px neighborhood
    at `upsample_factor` resolution.
    """
    h, w = ref.shape
    fr = jnp.fft.fft2(ref)
    fm = jnp.fft.fft2(mov)
    cross = fr * jnp.conj(fm)
    # phase normalization (whitening) — the standard "phase" correlation;
    # without it, low-passed imagery yields a flat, unreliable peak
    cross = cross / jnp.maximum(jnp.abs(cross), 1e-12)
    # zero the Nyquist row/col: under non-integer shifts of real images they
    # are conjugate-asymmetric and, once whitened, bias the sub-pixel peak
    if h % 2 == 0:
        cross = cross.at[h // 2, :].set(0)
    if w % 2 == 0:
        cross = cross.at[:, w // 2].set(0)
    cc = jnp.fft.ifft2(cross)
    peak = jnp.argmax(jnp.abs(cc))
    py, px = peak // w, peak % w
    dy = jnp.where(py > h // 2, py - h, py).astype(jnp.float32)
    dx = jnp.where(px > w // 2, px - w, px).astype(jnp.float32)

    # Upsampled DFT around the coarse peak.
    uf = upsample_factor
    region = int(np.ceil(1.5 * uf))  # 1.5 px neighborhood
    off = region // 2

    fy = jnp.fft.fftfreq(h)
    fx = jnp.fft.fftfreq(w)
    sy = dy - off / uf + jnp.arange(region) / uf  # candidate dys
    sx = dx - off / uf + jnp.arange(region) / uf
    # E[a, k] = exp(2i*pi * sy[a] * fy[k]) — matrix DFT zoom
    ey = jnp.exp(2j * jnp.pi * sy[:, None] * fy[None, :])  # (region, h)
    ex = jnp.exp(2j * jnp.pi * fx[:, None] * sx[None, :])  # (w, region)
    zoom = ey @ cross @ ex  # (region, region)
    zpeak = jnp.argmax(jnp.abs(zoom))
    zy, zx = zpeak // region, zpeak % region
    return jnp.stack([sy[zy], sx[zx]])


def compute_shift_pcc(ref_image, shifted_image, ref_mask=None, shifted_mask=None):
    """Fourier-domain shift estimate, sub-pixel to 1/1000 px.

    Masks are accepted for signature parity but unused (matching the
    reference, which found masking the FFT inputs unreliable —
    registration_search.py:330-341).
    """
    out = _pcc(
        jnp.asarray(ref_image, jnp.float32), jnp.asarray(shifted_image, jnp.float32)
    )
    dy, dx = np.asarray(out)
    return float(dy), float(dx)


@partial(jax.jit, static_argnames=("upsample_factor",))
def pcc_align_batch(ref, mov, upsample_factor: int = 100):
    """Translate each ``mov[b]`` onto ``ref[b]`` (PCC estimate + Lanczos warp).

    ``_pcc(ref, mov)`` returns d with ``mov(i) == ref(i + d)``; shifting mov
    by ``-d`` (lanczos_shift convention: out(i) = in(i + s)) lands it on
    ref's pixel grid. Used by the registered ensemble: independently trained
    HRNet members converge to output frames offset by O(1 px) from each
    other (the shift-invariant cPSNR objective never pins the absolute
    frame; ENSEMBLE_REPORT.json measured seed-to-seed offsets of ~2 px with
    ~0.3 px scene-to-scene std), so averaging raw member outputs blurs.

    Args:
      ref: (B, H, W) anchor images.
      mov: (B, H, W) images to align.
      upsample_factor: sub-pixel resolution of the DFT zoom (1/factor px).

    Returns:
      (aligned, d): the warped mov stack and the (B, 2) estimated (dy, dx).
    """
    from highresnet_tpu.ops.lanczos import lanczos_shift

    ref = jnp.asarray(ref, jnp.float32)
    mov = jnp.asarray(mov, jnp.float32)
    # Hann-window before the FFT: these are NON-circular shifts of bounded
    # images, and the wrap-around discontinuity corrupts the whitened phase
    # badly enough to bias sub-pixel estimates by >0.3 px on smooth imagery
    # (measured). compute_shift_pcc keeps the un-windowed reference
    # behavior; this path needs the accuracy.
    h, w = ref.shape[-2:]
    win = jnp.hanning(h)[:, None] * jnp.hanning(w)[None, :]
    prep = lambda im: (im - im.mean(axis=(-2, -1), keepdims=True)) * win
    d = jax.vmap(partial(_pcc, upsample_factor=upsample_factor))(prep(ref), prep(mov))
    return lanczos_shift(mov, -d), d


def compute_shift_point_matching(
    ref_image,
    tmplt_image,
    n_keypoints: int = 500,
    match_threshold: float = 0.75,
    ransac_threshold: float = 2.0,
    scale: int = 4,
) -> Tuple[float, float]:
    """ORB keypoints + RANSAC translation at `scale`x upresolution.

    Uses OpenCV (the image has no skimage): cubic up-resize, ORB
    detect+describe, cross-checked Hamming matching, RANSAC partial-affine
    restricted to its translation component, divided back by `scale`.
    """
    try:
        import cv2
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("compute_shift_point_matching requires OpenCV") from e

    def prep(img):
        img = np.asarray(img, np.float32)
        rng = img.max() - img.min()
        u8 = ((img - img.min()) / (rng if rng > 0 else 1.0) * 255).astype(np.uint8)
        h, w = img.shape
        return cv2.resize(u8, (w * scale, h * scale), interpolation=cv2.INTER_CUBIC)

    im1, im2 = prep(ref_image), prep(tmplt_image)
    orb = cv2.ORB_create(nfeatures=n_keypoints, fastThreshold=10)
    k1, d1 = orb.detectAndCompute(im1, None)
    k2, d2 = orb.detectAndCompute(im2, None)
    if d1 is None or d2 is None or len(k1) < 4 or len(k2) < 4:
        raise ValueError("Not enough keypoints found for reliable alignment.")

    matcher = cv2.BFMatcher(cv2.NORM_HAMMING, crossCheck=True)
    matches = matcher.match(d1, d2)
    if len(matches) < 4:
        raise ValueError("Not enough matches found for reliable alignment.")

    src = np.float32([k2[m.trainIdx].pt for m in matches]).reshape(-1, 1, 2)
    dst = np.float32([k1[m.queryIdx].pt for m in matches]).reshape(-1, 1, 2)
    mat, inliers = cv2.estimateAffinePartial2D(
        src, dst, method=cv2.RANSAC, ransacReprojThreshold=ransac_threshold, maxIters=1000
    )
    if mat is None:
        raise ValueError("RANSAC failed to find a robust model.")
    shift_x, shift_y = float(mat[0, 2]), float(mat[1, 2])
    return shift_y / scale, shift_x / scale
