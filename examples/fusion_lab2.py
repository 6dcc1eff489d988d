"""Round 2: isolate fusion's 8.8 ms of non-conv time and probe layouts.

pieces:
  p_concat      slices + flip + channel-concat for every round (no convs)
  p_gate        alice + alpha*fused for every round (no convs)
  p_mean        the final view-mean
bandwidth probes (copy = read + write, GB/s):
  bw_c64        x + 1 on (8,16,128,128,64)   <- half-tile lanes?
  bw_c128       x + 1 on (8,8,128,128,128)
  bw_concat64   channel-concat of two C=64 halves into C=128
controls:
  full_v0       the shipped fusion
  conv_only     fuse block on pre-materialized pairs
variants:
  v3_flat       states kept flat (B*half, s, s, c); pairing via dim-0
                strided slices (no 5-D tensors anywhere)
  v4_revconv    bob never flipped: fuse conv reads bob through a spatially
                unflipped concat but pairs (i, half-1-i) made by negative
                slice step on dim 1

Usage: python examples/fusion_lab2.py [--dtype bfloat16]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", f"/tmp/jax_cache_{jax.default_backend()}")


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
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (b, l, s, s, c), jnp.float32).astype(dtype)
    alphas = jnp.ones((b, l, 1, 1, 1), dtype)
    w0 = (jax.random.normal(ks[1], (3, 3, 2 * c, 2 * c), jnp.float32) / 34).astype(dtype)
    w1 = (jax.random.normal(ks[2], (3, 3, 2 * c, 2 * c), jnp.float32) / 34).astype(dtype)
    wf = (jax.random.normal(ks[3], (3, 3, 2 * c, c), jnp.float32) / 34).astype(dtype)

    report = {"device": str(jax.devices()[0]), "dtype": args.dtype}

    def fuse_block(pair):
        h = prelu(conv(pair, w0))
        h = prelu(conv(h, w1))
        return prelu(conv(pair + h, wf))

    # ---- pieces -----------------------------------------------------------
    def p_concat(x):
        outs = []
        nviews = l
        y = x
        while nviews // 2 > 0:
            half = nviews // 2
            alice = y[:, :half]
            bob = jnp.flip(y[:, half: 2 * half], axis=1)
            pair = jnp.concatenate([alice, bob], axis=-1)
            outs.append(jnp.sum(pair))
            y = y[:, :half] * 1.000001  # keep rounds data-dependent
            nviews = half
        return sum(outs)

    def p_gate(x):
        outs = []
        nviews = l
        y = x
        while nviews // 2 > 0:
            half = nviews // 2
            alice = y[:, :half]
            fused = y[:, half: 2 * half]  # stand-in for the conv output
            a_bob = jnp.flip(alphas[:, half: 2 * half], axis=1)
            y = alice + a_bob * fused
            outs.append(jnp.sum(y[:, :1, :1, :1, :1]))
            nviews = half
        return sum(outs)

    report["p_concat_s"] = timed(jax.jit(p_concat), (x,))
    report["p_gate_s"] = timed(jax.jit(p_gate), (x,))
    report["p_mean_s"] = timed(jax.jit(lambda x: jnp.mean(x, axis=1)), (x,))

    # ---- bandwidth probes --------------------------------------------------
    def bw(shape):
        z = jax.random.normal(ks[4], shape, jnp.float32).astype(dtype)
        dt = timed(jax.jit(lambda v: v + 1), (z,))
        nbytes = int(np.prod(shape)) * itemsize
        return {"step_s": dt, "gb_per_s": 2 * nbytes / dt / 1e9}

    report["bw_c64"] = bw((b, l, s, s, 64))
    report["bw_c128"] = bw((b, l // 2, s, s, 128))
    z64a = jax.random.normal(ks[5], (b * l // 2, s, s, 64), jnp.float32).astype(dtype)
    z64b = jax.random.normal(ks[6], (b * l // 2, s, s, 64), jnp.float32).astype(dtype)
    dt = timed(jax.jit(lambda u, v: jnp.concatenate([u, v], axis=-1)), (z64a, z64b))
    report["bw_concat64"] = {
        "step_s": dt,
        "gb_per_s": 2 * (z64a.nbytes + z64b.nbytes) / dt / 1e9,
    }

    # ---- controls -----------------------------------------------------------
    def v0(x):
        a = alphas
        nviews = l
        while nviews // 2 > 0:
            half = nviews // 2
            alice = x[:, :half]
            bob = jnp.flip(x[:, half: 2 * half], axis=1)
            pair = jnp.concatenate([alice, bob], axis=-1)
            fused = fuse_block(pair.reshape(b * half, s, s, 2 * c)).reshape(
                b, half, s, s, c
            )
            a_bob = jnp.flip(a[:, half: 2 * half], axis=1)
            x = alice + a_bob * fused
            a = a[:, :half]
            nviews = half
        return jnp.mean(x, axis=1)

    report["full_v0_s"] = timed(jax.jit(v0), (x,))

    pairs = []
    nviews = l
    while nviews // 2 > 0:
        half = nviews // 2
        pairs.append(
            jax.random.normal(ks[7], (b * half, s, s, 2 * c), jnp.float32).astype(dtype)
        )
        nviews = half
    report["conv_only_s"] = timed(
        jax.jit(lambda *ps: sum(jnp.sum(fuse_block(p)) for p in ps)), tuple(pairs)
    )

    # ---- v3: flat states, pairing via dim-0 gather --------------------------
    xflat = x.reshape(b * l, s, s, c)

    def v3(xf):
        a = alphas.reshape(b * l)
        nviews = l
        while nviews // 2 > 0:
            half = nviews // 2
            m = xf.shape[0] // nviews  # = b
            g = xf.reshape(b, nviews, s, s, c)
            alice = g[:, :half].reshape(b * half, s, s, c)
            bob = g[:, nviews - 1: half - 1: -1].reshape(b * half, s, s, c)
            pair = jnp.concatenate([alice, bob], axis=-1)
            fused = fuse_block(pair)
            ga = a.reshape(b, nviews)
            a_bob = ga[:, nviews - 1: half - 1: -1].reshape(b * half, 1, 1, 1)
            xf = alice + a_bob * fused
            a = ga[:, :half].reshape(b * half)
            nviews = half
        return jnp.mean(xf.reshape(b, 1, s, s, c), axis=1)

    report["v3_flat_s"] = timed(jax.jit(v3), (xflat,))

    print(json.dumps(report, indent=2))
    with open("FUSION_LAB2.json", "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
