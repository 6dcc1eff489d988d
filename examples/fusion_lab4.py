"""Round 4: can pair packing beat 219 GB/s, and does batch amortize better?

  pack_pallas        current kernel (VMEM-staged ref-slice stores)
  pack_stack_xla     jnp.stack(axis=-2) + reshape lowering
  pack_dma           per-block async DMA HBM->HBM into lane-sliced dst
  splitconv vs pairconv   isolated: conv0(pair) vs conv0a(alice)+conv0b(bob)
                     at round-1 shapes (is a no-interleave fusion viable?)
  fwd_b16 / fwd_b32  full bf16 forward at batch 16 / 32 (throughput scaling)

Usage: python examples/fusion_lab4.py
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", f"/tmp/jax_cache_{jax.default_backend()}")

from highresnet_tpu.ops.fusion_pallas import pack_pairs_pallas  # noqa: E402


def timed(fn, args, k1=10, k2=60):
    out = fn(*args)
    float(jnp.sum(out if isinstance(out, jax.Array) else out[0]))
    out = fn(*args)
    float(jnp.sum(out if isinstance(out, jax.Array) else out[0]))

    def run_k(k):
        t0 = time.perf_counter()
        y = None
        for _ in range(k):
            y = fn(*args)
        float(jnp.sum(y if isinstance(y, jax.Array) else y[0]))
        return time.perf_counter() - t0

    t1, t2 = run_k(k1), run_k(k2)
    return (t2 - t1) / (k2 - k1)


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def pack_dma(x):
    """Pure-DMA pack: each grid step copies one (alice, bob) view block
    into the two channel halves of the output, no VMEM staging."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, l, h, w, c = x.shape
    half = l // 2

    def kernel(xa_ref, xb_ref, out_ref, sems):
        ca = pltpu.make_async_copy(xa_ref.at[0, 0], out_ref.at[0, 0, :, :, 0:c], sems.at[0])
        cb = pltpu.make_async_copy(xb_ref.at[0, 0], out_ref.at[0, 0, :, :, c:], sems.at[1])
        ca.start()
        cb.start()
        ca.wait()
        cb.wait()

    blk = (1, 1, h, w, c)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, half, h, w, 2 * c), x.dtype),
        grid=(b, half),
        in_specs=[
            pl.BlockSpec(blk, lambda i, j: (i, j, 0, 0, 0), memory_space=pltpu.ANY),
            pl.BlockSpec(
                blk, lambda i, j, _h=half: (i, 2 * _h - 1 - j, 0, 0, 0),
                memory_space=pltpu.ANY,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, h, w, 2 * c), lambda i, j: (i, j, 0, 0, 0), memory_space=pltpu.ANY
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((2,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(x, x)


def main():
    dtype = jnp.bfloat16
    b, l, s, c = 8, 16, 128, 64
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    x = jax.random.normal(ks[0], (b, l, s, s, c), jnp.float32).astype(dtype)
    nbytes = x.size * 2

    report = {"device": str(jax.devices()[0])}

    def add(name, fn, args, bytes_moved=None):
        dt = timed(fn, args)
        entry = {"step_s": dt}
        if bytes_moved:
            entry["gb_per_s"] = bytes_moved / dt / 1e9
        report[name] = entry
        return dt

    add("pack_pallas", jax.jit(lambda z: pack_pairs_pallas(z)), (x,), 2 * nbytes)

    def pack_stack(z):
        half = z.shape[1] // 2
        alice = z[:, :half]
        bob = jnp.flip(z[:, half: 2 * half], axis=1)
        st = jnp.stack([alice, bob], axis=-2)  # (B, half, H, W, 2, C)
        return st.reshape(z.shape[0], half, s, s, 2 * c)

    add("pack_stack_xla", jax.jit(pack_stack), (x,), 2 * nbytes)
    try:
        y = jax.jit(pack_dma)(x)
        ref = jax.jit(pack_stack)(x)
        ok = bool(jnp.all(y == ref))
        add("pack_dma", jax.jit(pack_dma), (x,), 2 * nbytes)
        report["pack_dma"]["correct"] = ok
    except Exception as e:  # DMA lane-sliced dst may be unsupported
        report["pack_dma"] = {"error": str(e)[:200]}

    # isolated conv comparison at round-1 shapes
    alice = jax.random.normal(ks[1], (b * l // 2, s, s, c), jnp.float32).astype(dtype)
    bob = jax.random.normal(ks[2], (b * l // 2, s, s, c), jnp.float32).astype(dtype)
    pair = jnp.concatenate([alice, bob], axis=-1)
    w0 = (jax.random.normal(ks[3], (3, 3, 2 * c, 2 * c), jnp.float32) / 34).astype(dtype)
    w0a, w0b = w0[:, :, :c], w0[:, :, c:]
    add("pairconv", jax.jit(lambda p: conv(p, w0)), (pair,))
    add("splitconv", jax.jit(lambda a2, b2: conv(a2, w0a) + conv(b2, w0b)), (alice, bob))

    # full-forward batch scaling
    from highresnet_tpu.config import DEFAULT_CONFIG
    from highresnet_tpu.models.hrnet import HRNet

    for batch in (16, 32):
        hrnet = HRNet(config=DEFAULT_CONFIG["network"], dtype=dtype)
        rng = np.random.default_rng(0)
        lrs = jnp.asarray(rng.random((batch, l, s, s)), jnp.float32)
        al = jnp.ones((batch, l), jnp.float32)
        params = jax.jit(hrnet.init)(jax.random.PRNGKey(0), lrs, al)["params"]
        f = jax.jit(lambda p, z, a2: jnp.sum(hrnet.apply({"params": p}, z, a2).astype(jnp.float32)))
        dt = timed(f, (params, lrs, al), k1=3, k2=13)
        report[f"fwd_bf16_batch{batch}"] = {"step_s": dt, "scenes_per_s": batch / dt}

    print(json.dumps(report, indent=2))
    with open("FUSION_LAB4.json", "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
