"""Pallas TPU kernel: fused per-image Lanczos shift.

The XLA path (ops.lanczos.lanczos_shift) lowers to a reflect-pad plus 14
slice-FMAs; XLA fuses most of it but materializes the padded field and the
row-pass intermediate. This kernel keeps one image resident in VMEM and
does reflect-pad -> vertical 7-tap pass -> horizontal 7-tap pass in a
single fused program: each image is read from HBM exactly once and written
exactly once, the speed-of-light for this bandwidth-bound op.

Grid: one program per image; per-image kernels are computed on the host
side of the call (tiny) and streamed as (1, N) blocks. Numerics match
ops.lanczos.lanczos_shift exactly (same taps, same reflect contract).

On non-TPU backends the kernel runs in interpreter mode (tests); use
``lanczos_shift_fused`` which dispatches by backend and falls back to the
pure-XLA path when Pallas is unavailable.

Status note (measured, relay-robust method — thousands of chained warps
inside one jit program, slope across two program sizes): at
(128, 192, 192) f32 the XLA lowering runs at 49 us/warp = 768 GB/s
effective, ~94% of v5e HBM bandwidth — the speed of light for this
read-once/write-once op — while this kernel measures 254 us/warp
(one image per sequential grid step pipelines poorly, and the in-kernel
concatenates copy within VMEM). The XLA path is therefore the default and
the right one; this kernel remains as the Pallas reference implementation
and a starting point for block-batched variants.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from highresnet_tpu.ops.lanczos import lanczos_kernel, lanczos_shift


def _fused_shift_kernel(ky_ref, kx_ref, img_ref, out_ref, *, n: int):
    half = n // 2
    img = img_ref[0]  # (H, W) resident in VMEM
    ky = ky_ref[0, 0]  # (n,)
    kx = kx_ref[0, 0]
    h, w = img.shape

    # reflect pad rows: index -k maps to row k (np.pad "reflect" contract).
    # Built from static single-row slices — Pallas TPU has no `rev` lowering.
    top = [img[k : k + 1] for k in range(half, 0, -1)]
    bot = [img[h - 1 - k : h - k] for k in range(1, half + 1)]
    pad_y = jnp.concatenate(top + [img] + bot, axis=0)  # (H + 2*half, W)

    rows = ky[0] * pad_y[0:h]
    for t in range(1, n):
        rows = rows + ky[t] * pad_y[t : t + h]

    left = [rows[:, k : k + 1] for k in range(half, 0, -1)]
    right = [rows[:, w - 1 - k : w - k] for k in range(1, half + 1)]
    pad_x = jnp.concatenate(left + [rows] + right, axis=1)  # (H, W + 2*half)

    out = kx[0] * pad_x[:, 0:w]
    for t in range(1, n):
        out = out + kx[t] * pad_x[:, t : t + w]
    out_ref[0] = out


def _pallas_forward(img: jax.Array, shift: jax.Array, a: int, n: int, interpret: bool) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w = img.shape
    # (B, 1, n) so per-image blocks satisfy TPU tile constraints
    ky = lanczos_kernel(shift[:, 0].astype(img.dtype), a=a, n=n)[:, None, :]
    kx = lanczos_kernel(shift[:, 1].astype(img.dtype), a=a, n=n)[:, None, :]

    return pl.pallas_call(
        partial(_fused_shift_kernel, n=n),
        out_shape=jax.ShapeDtypeStruct((b, h, w), img.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(ky, kx, img)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def lanczos_shift_pallas(
    img: jax.Array, shift: jax.Array, a: int = 3, n: int = 7, interpret: bool = False
) -> jax.Array:
    """Fused Pallas version of ops.lanczos.lanczos_shift.

    Args:
      img: (B, H, W) float32 images.
      shift: (B, 2) per-image (dy, dx).

    Differentiable via custom VJP: the backward pass reuses the XLA
    implementation's VJP (identical math, so gradients are exact).
    """
    return _pallas_forward(img, shift, a, n, interpret)


def _pallas_fwd(img, shift, a, n, interpret):
    return _pallas_forward(img, shift, a, n, interpret), (img, shift)


def _pallas_bwd(a, n, interpret, residuals, g):
    img, shift = residuals
    _, vjp = jax.vjp(lambda i, s: lanczos_shift(i, s, a=a, n=n), img, shift)
    return vjp(g)


lanczos_shift_pallas.defvjp(_pallas_fwd, _pallas_bwd)


def lanczos_shift_fused(img: jax.Array, shift: jax.Array, a: int = 3, n: int = 7) -> jax.Array:
    """Backend-dispatching fused shift: Pallas on TPU, XLA elsewhere.

    Dispatches on the default backend (resolvable at trace time — concrete
    arrays are traced inside jit, so per-array device inspection is not).
    """
    if jax.default_backend() == "tpu":
        return lanczos_shift_pallas(img, shift, a=a, n=n)
    return lanczos_shift(img, shift, a=a, n=n)
