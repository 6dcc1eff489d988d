"""Pallas TPU kernel: fusion-round pair packing.

Each fusion round pairs view state j with view state 2*half-1-j and
concatenates them on the channel axis (reference: HRNet.py:113-122 splits
into alice / flipped bob and concats). On TPU an XLA channel-concat of two
C=64 tensors into C=128 crosses the 128-lane tile boundary and measures
~220 GB/s effective (FUSION_LAB2.json bw_concat64) vs ~930 GB/s for a
plain copy — and feeding the concat straight into the fuse convolution
adds further relayout traffic (the full fusion tree runs at ~72 TF/s while
the bare conv stack reaches ~154 TF/s, BENCH_BREAKDOWN.json).

This kernel stages both source blocks in VMEM and writes the interleaved
(…, 2C) output in one pass: every byte of x is read from HBM exactly once
and every byte of the pair tensor written exactly once — the speed of
light for a pure data-movement op.

Numerics: exact (pure gather/concat, no arithmetic). Differentiable via
custom VJP: the backward is the inverse permutation (channel split + view
unflip), fused into a single Pallas pass that writes the full input
cotangent directly; only an odd dropped view's zero block is appended in
jnp.

``pack_pairs`` dispatches by backend: Pallas on TPU, jnp elsewhere.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def pack_pairs_xla(x: jax.Array) -> jax.Array:
    """jnp reference: (B, L, H, W, C) -> (B, L//2, H, W, 2C).

    pair[:, j] = concat(x[:, j], x[:, 2*half-1-j]); an odd last view is
    dropped (reference: HRNet.py:113-122).
    """
    half = x.shape[1] // 2
    alice = x[:, :half]
    bob = jnp.flip(x[:, half : 2 * half], axis=1)
    return jnp.concatenate([alice, bob], axis=-1)


def _pack_kernel(a_ref, b_ref, out_ref, *, c: int):
    out_ref[0, 0, :, :, :c] = a_ref[0, 0]
    out_ref[0, 0, :, :, c:] = b_ref[0, 0]


def _block_h(h: int, limit: int = 32) -> int:
    """Largest divisor of h that is <= limit (VMEM budget per block)."""
    for cand in range(min(h, limit), 0, -1):
        if h % cand == 0:
            return cand
    return 1


def _pallas_forward(x: jax.Array, interpret: bool) -> jax.Array:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, l, h, w, c = x.shape
    half = l // 2
    hb = _block_h(h)
    blk = (1, 1, hb, w, c)

    return pl.pallas_call(
        partial(_pack_kernel, c=c),
        out_shape=jax.ShapeDtypeStruct((b, half, h, w, 2 * c), x.dtype),
        grid=(b, half, h // hb),
        in_specs=[
            pl.BlockSpec(blk, lambda i, j, k: (i, j, k, 0, 0), memory_space=pltpu.VMEM),
            # bob: the flipped second half -> view index 2*half-1-j
            pl.BlockSpec(
                blk,
                lambda i, j, k, _half=half: (i, 2 * _half - 1 - j, k, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, hb, w, 2 * c), lambda i, j, k: (i, j, k, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(x, x)


def pack_pairs_pallas(x: jax.Array, interpret: bool = False) -> jax.Array:
    """Pallas version of pack_pairs_xla.

    Off-TPU the kernel has no compiled lowering, so interpreter mode is
    forced — an explicit ``use_pallas_pack: true`` config then still runs
    (slowly) instead of crashing the documented CPU dev/test flow.
    """
    interpret = interpret or jax.default_backend() != "tpu"
    return _pack_custom(x, x.shape[1], interpret)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _pack_custom(x: jax.Array, l: int, interpret: bool) -> jax.Array:
    return _pallas_forward(x, interpret)


def _unpack_kernel(g_ref, out_ref, *, c: int, half: int):
    from jax.experimental import pallas as pl

    v = pl.program_id(1)  # output view index in [0, 2*half)

    @pl.when(v < half)
    def _alice():
        out_ref[0, 0] = g_ref[0, 0, :, :, :c]

    @pl.when(v >= half)
    def _bob():
        out_ref[0, 0] = g_ref[0, 0, :, :, c:]


def _pallas_unpack(g: jax.Array, interpret: bool):
    """Invert the pack permutation in ONE pass: (B, half, H, W, 2C) -> (B, 2*half, H, W, C).

    Output view v < half takes the alice channels of pair v; view v >= half
    takes the bob channels of pair 2*half-1-v (the forward's view flip,
    inverted in the input index map). Writing the full cotangent directly —
    instead of channel-splitting to two half tensors, flipping bob, and
    concatenating on the view axis — replaces the previous 5 HBM passes
    over the state (split read+write, flip, concat read+write) with 3 (the
    pair block is DMA'd once per output view, i.e. read twice, written
    once), measured against the 22 ms/step data-movement bucket of
    TRACE_BF16_TRAIN_SUMMARY.json.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, half, h, w, c2 = g.shape
    c = c2 // 2
    hb = _block_h(h)
    return pl.pallas_call(
        partial(_unpack_kernel, c=c, half=half),
        out_shape=jax.ShapeDtypeStruct((b, 2 * half, h, w, c), g.dtype),
        grid=(b, 2 * half, h // hb),
        in_specs=[
            # source pair index: v for the alice half, 2*half-1-v for bob;
            # min(v, 2*half-1-v) covers both branches in one expression
            pl.BlockSpec(
                (1, 1, hb, w, c2),
                lambda i, v, k, _half=half: (i, jnp.minimum(v, 2 * _half - 1 - v), k, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 1, hb, w, c), lambda i, v, k: (i, v, k, 0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(g)


def _fwd(x, l, interpret):
    return _pallas_forward(x, interpret), None


def _bwd(l, interpret, _, g):
    # inverse permutation in a single Pallas pass; only an odd dropped
    # view (zero cotangent) is appended in jnp — one tiny view-axis concat
    half = l // 2
    gx = _pallas_unpack(g, interpret)
    if l > 2 * half:
        c = g.shape[-1] // 2
        zeros = jnp.zeros(g.shape[:1] + (l - 2 * half,) + g.shape[2:-1] + (c,), g.dtype)
        gx = jnp.concatenate([gx, zeros], axis=1)
    return (gx,)


_pack_custom.defvjp(_fwd, _bwd)


def pack_pairs(x: jax.Array) -> jax.Array:
    """Backend-dispatching pair packing: Pallas on TPU, XLA elsewhere."""
    if jax.default_backend() == "tpu":
        return pack_pairs_pallas(x)
    return pack_pairs_xla(x)
