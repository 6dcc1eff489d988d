"""Round 3: is the Pallas pack kernel at bandwidth, and what does the
alpha gate cost in the real fusion loop?

  pack_pallas_s / pack_xla_s   one round-1-sized pack (8,16,128,128,64)
                               -> (8,8,128,128,128), Pallas vs XLA concat
  fusion_gated_s               shipped FusionNet round structure (pack + gate)
  fusion_nogate_s              alpha_residual=False (pack + conv only)
  gate_only_s                  materialized alice + a*fused per round

Usage: python examples/fusion_lab3.py [--dtype bfloat16]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", f"/tmp/jax_cache_{jax.default_backend()}")

from highresnet_tpu.ops.fusion_pallas import pack_pairs, pack_pairs_xla  # noqa: E402


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


def prelu(x, a=0.25):
    return jnp.where(x >= 0, x, a * x)


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    b, l, s, c = 8, 16, 128, 64
    itemsize = 2 if dtype == jnp.bfloat16 else 4

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    x = jax.random.normal(ks[0], (b, l, s, s, c), jnp.float32).astype(dtype)
    alphas = jnp.ones((b, l, 1, 1, 1), dtype)
    w0 = (jax.random.normal(ks[1], (3, 3, 2 * c, 2 * c), jnp.float32) / 34).astype(dtype)
    w1 = (jax.random.normal(ks[2], (3, 3, 2 * c, 2 * c), jnp.float32) / 34).astype(dtype)
    wf = (jax.random.normal(ks[3], (3, 3, 2 * c, c), jnp.float32) / 34).astype(dtype)

    report = {"device": str(jax.devices()[0]), "dtype": args.dtype}

    nbytes = x.size * itemsize  # pack reads + writes exactly this many bytes
    dt = timed(jax.jit(pack_pairs), (x,))
    report["pack_pallas"] = {"step_s": dt, "gb_per_s": 2 * nbytes / dt / 1e9}
    dt = timed(jax.jit(pack_pairs_xla), (x,))
    report["pack_xla"] = {"step_s": dt, "gb_per_s": 2 * nbytes / dt / 1e9}

    def fuse_block(pair):
        h = prelu(conv(pair, w0))
        h = prelu(conv(h, w1))
        return prelu(conv(pair + h, wf))

    def fusion(x, gated):
        a = alphas
        nviews = l
        while nviews // 2 > 0:
            half = nviews // 2
            pair = pack_pairs(x)
            fused = fuse_block(pair.reshape(b * half, s, s, 2 * c)).reshape(
                b, half, s, s, c
            )
            if gated:
                a_bob = jnp.flip(a[:, half: 2 * half], axis=1)
                x = x[:, :half] + a_bob * fused
                a = a[:, :half]
            else:
                x = fused
            nviews = half
        return jnp.mean(x, axis=1)

    report["fusion_gated_s"] = timed(jax.jit(lambda z: fusion(z, True)), (x,))
    report["fusion_nogate_s"] = timed(jax.jit(lambda z: fusion(z, False)), (x,))

    def gate_only(x):
        outs = []
        nviews = l
        y = x
        while nviews // 2 > 0:
            half = nviews // 2
            a_bob = jnp.flip(alphas[:, half: 2 * half], axis=1)
            y = y[:, :half] + a_bob * (y[:, half: 2 * half] * 1.0000001)
            outs.append(y)
            nviews = half
        return outs[-1]

    report["gate_only_s"] = timed(jax.jit(gate_only), (x,))

    print(json.dumps(report, indent=2))
    with open("FUSION_LAB3.json", "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
