"""Sub-pixel Lanczos shift resampling, batched for TPU.

Behavioral contract (matches the reference semantics at
/root/reference/src/lanczos.py:5-106, re-derived — not translated):

- ``lanczos_kernel(dx, a, n)`` produces normalized 1-D Lanczos-a kernels at
  tap positions ``linspace(-(n-1)/2, (n-1)/2, n) - dx`` with a 1e-6 guard at
  the sinc singularity.
- ``lanczos_shift(img, shift)`` warps each image by its own (dy, dx) with a
  separable 7-tap convolution over a reflect-padded field. The reference
  loops over images in Python, one pair of tiny conv2d calls each
  (src/lanczos.py:62-101); here the whole batch is one fused XLA computation:
  two passes of N fused multiply-adds over statically-shaped slices — no
  gather, no dynamic shapes, bandwidth-bound on HBM.

Reflection-padding note: the reference reflect-pads by ``p`` then lets conv2d
zero-pad by N//2 and crops ``p`` afterwards. For any p >= N//2 the zero-padded
region is never read, so results are identical for all p >= 3; we therefore
always use reflect padding of exactly N//2.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

_EPS = 1e-6


def lanczos_kernel(dx: jax.Array, a: int = 3, n: int = 7) -> jax.Array:
    """Batched 1-D Lanczos kernels.

    Args:
      dx: (...,) sub-pixel offsets.
      a: number of lobes.
      n: kernel width (odd).

    Returns:
      (..., n) normalized kernels.
    """
    dx = jnp.asarray(dx)
    half = (n - 1) // 2
    taps = jnp.linspace(-half, half, n, dtype=dx.dtype)
    x = taps - dx[..., None]
    pi_x = jnp.pi * x
    pi_x = jnp.where(pi_x == 0, jnp.asarray(_EPS, dx.dtype), pi_x)
    k = (jnp.sin(pi_x) / pi_x) * (jnp.sin(pi_x / a) / (pi_x / a))
    return k / jnp.sum(k, axis=-1, keepdims=True)


@partial(jax.jit, static_argnames=("a", "n", "int_range"))
def lanczos_shift(
    img: jax.Array, shift: jax.Array, a: int = 3, n: int = 7, int_range: int = 0
) -> jax.Array:
    """Shift a batch of single-channel images by per-image sub-pixel offsets.

    Args:
      img: (B, H, W) images.
      shift: (B, 2) offsets as (dy, dx). Matching the reference orientation,
        the output at pixel i equals the input resampled at ``i + d`` along
        each axis (a positive shift moves content toward the origin).
      a: Lanczos lobes.
      n: kernel width (odd).
      int_range: 0 reproduces the reference's single 7-tap pass exactly
        (src/lanczos.py:62-101), whose accuracy degrades beyond ~±(n//2) px
        because the kernel support leaves the tap window. int_range=K > 0
        decomposes each shift into a rounded integer part (handled by a
        per-image dynamic_slice on a reflect-padded field, exact for any
        |d_int| <= K) plus a fractional part in [-0.5, 0.5] px (handled by
        the 7-tap pass at its accuracy sweet spot) — extending the accurate
        warp window to ±(K + 0.5) px at negligible extra cost. Static so
        each value compiles its own program.

    Returns:
      (B, H, W) warped images.
    """
    b, h, w = img.shape
    if int_range:
        r = int(int_range)
        d_int = jnp.clip(jnp.round(shift), -r, r)
        shift = shift - d_int  # fractional remainder, in [-0.5, 0.5] in range
        padded = jnp.pad(img, ((0, 0), (r, r), (r, r)), mode="reflect")

        def slice_one(p, d):
            # out[i] = in[i + d_int]: the slice starts at r + d_int in the
            # padded frame; starts are traced values, shapes stay static
            return jax.lax.dynamic_slice(p, (r + d[0], r + d[1]), (h, w))

        img = jax.vmap(slice_one)(padded, d_int.astype(jnp.int32))

    half = n // 2
    ky = lanczos_kernel(shift[:, 0].astype(img.dtype), a=a, n=n)  # (B, n)
    kx = lanczos_kernel(shift[:, 1].astype(img.dtype), a=a, n=n)  # (B, n)

    pad = jnp.pad(img, ((0, 0), (half, half), (half, half)), mode="reflect")

    # Vertical pass over the horizontally-padded field, then horizontal pass.
    rows = sum(ky[:, t, None, None] * pad[:, t : t + h, :] for t in range(n))
    out = sum(kx[:, t, None, None] * rows[:, :, t : t + w] for t in range(n))
    return out


def lanczos_shift_views(img: jax.Array, shift: jax.Array, a: int = 3, n: int = 7) -> jax.Array:
    """Shift a (B, L, H, W) stack with per-view offsets (B, L, 2).

    Flattens views into the batch axis — the reference's per-image Python
    loop (src/train.py:47-63 + src/lanczos.py:62) expressed as one kernel.
    """
    b, l, h, w = img.shape
    out = lanczos_shift(img.reshape(b * l, h, w), shift.reshape(b * l, 2), a=a, n=n)
    return out.reshape(b, l, h, w)


def lanczos_resample_2d(img: jax.Array, scale: int, a: int = 3) -> jax.Array:
    """Lanczos downscale of a (H, W) image by an integer factor.

    Used by the preprocessing toolkit (HR -> LR-grid projection, the working
    part of the reference's preprocess_images.py). Implemented as a strided
    separable convolution with a widened kernel.
    """
    n = 2 * a * scale + 1
    half = n // 2
    taps = jnp.arange(n, dtype=img.dtype) - half
    x = taps / scale
    pi_x = jnp.pi * x
    pi_x = jnp.where(pi_x == 0, jnp.asarray(_EPS, img.dtype), pi_x)
    k = (jnp.sin(pi_x) / pi_x) * (jnp.sin(pi_x / a) / (pi_x / a))
    k = k / jnp.sum(k)

    h, w = img.shape
    pad = jnp.pad(img, ((half, half), (half, half)), mode="reflect")
    rows = sum(k[t] * pad[t : t + h, :] for t in range(n))
    cols = sum(k[t] * rows[:, t : t + w] for t in range(n))
    # Sample at the centers of scale x scale blocks.
    off = (scale - 1) // 2
    return cols[off::scale, off::scale][: math.ceil(h / scale), : math.ceil(w / scale)]
