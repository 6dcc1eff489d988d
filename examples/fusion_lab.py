"""On-chip experiments: where do fusion's and the decoder's non-conv
milliseconds go, and which restructuring recovers them?

BENCH_BREAKDOWN.json shows the fusion tree at ~72 TF/s (bf16) while the
bare 128-channel conv stack reaches ~154 TF/s on the same chip, and the
decoder spending ~2.3 ms on ~10 GFLOP. Variants measured here:

fusion:
  v0_current          the shipped FusionNet round structure
  v_conv_only         fuse block on pre-materialized pair inputs (conv SoL
                      incl. PReLU epilogues; the v0 gap above this is pure
                      data movement)
  v1_no_concat        conv0/conv_f distributed over (alice, bob) so the 2C
                      concat and the 2C residual sum are never materialized
  v2_dist_residual    concat kept for conv0; conv_f distributed over
                      (pair, h) so only the residual sum is avoided

decoder:
  d0_current          einsum -> depth-to-space -> PReLU -> 1x1 conv
  d1_pre_d2s          einsum -> PReLU -> 1x1 projection -> depth-to-space
                      (elementwise & 1x1 commute with the permutation, so
                      the full-res tensor is 1 channel instead of 64)

Usage:  python examples/fusion_lab.py [--dtype bfloat16] [--batch 8] [--views 16]
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


def conv_params(rng, k, cin, cout, dtype):
    w = jax.random.normal(rng, (k, k, cin, cout), jnp.float32) * (1.0 / np.sqrt(k * k * cin))
    return w.astype(dtype)


def prelu(x, a=0.25):
    return jnp.where(x >= 0, x, a * x)


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def fuse_block(pair, ws):
    """ResidualBlock(2C) + conv 2C->C + PReLU on a materialized pair."""
    w0, w1, wf = ws
    h = prelu(conv(pair, w0))
    h = prelu(conv(h, w1))
    r = pair + h
    return prelu(conv(r, wf))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--channels", type=int, default=64)
    args = ap.parse_args()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    b, l, s, c = args.batch, args.views, args.size, args.channels

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    x = jax.random.normal(ks[0], (b, l, s, s, c), jnp.float32).astype(dtype)
    alphas = jnp.ones((b, l, 1, 1, 1), dtype)
    w0 = conv_params(ks[1], 3, 2 * c, 2 * c, dtype)
    w1 = conv_params(ks[2], 3, 2 * c, 2 * c, dtype)
    wf = conv_params(ks[3], 3, 2 * c, c, dtype)

    report = {"device": str(jax.devices()[0]), "dtype": args.dtype,
              "batch": b, "views": l, "size": s, "fusion": {}, "decoder": {}}

    # ---- fusion variants -------------------------------------------------
    def rounds(x, body):
        a = alphas
        nviews = l
        while nviews // 2 > 0:
            half = nviews // 2
            alice = x[:, :half]
            bob = jnp.flip(x[:, half: 2 * half], axis=1)
            a_bob = jnp.flip(a[:, half: 2 * half], axis=1)
            fused = body(alice, bob)
            x = alice + a_bob * fused
            a = a[:, :half]
            nviews = half
        return jnp.mean(x, axis=1)

    def v0(x):
        def body(alice, bob):
            hb, half = alice.shape[0], alice.shape[1]
            pair = jnp.concatenate([alice, bob], axis=-1)
            y = fuse_block(pair.reshape(hb * half, s, s, 2 * c), (w0, w1, wf))
            return y.reshape(hb, half, s, s, c)
        return rounds(x, body)

    def v1(x):
        w0a, w0b = w0[:, :, :c], w0[:, :, c:]
        wfa, wfb = wf[:, :, :c], wf[:, :, c:]

        def body(alice, bob):
            hb, half = alice.shape[0], alice.shape[1]
            af = alice.reshape(hb * half, s, s, c)
            bf = bob.reshape(hb * half, s, s, c)
            h = prelu(conv(af, w0a) + conv(bf, w0b))
            h = prelu(conv(h, w1))
            y = prelu(conv(af, wfa) + conv(bf, wfb) + conv(h, wf))
            return y.reshape(hb, half, s, s, c)
        return rounds(x, body)

    def v2(x):
        def body(alice, bob):
            hb, half = alice.shape[0], alice.shape[1]
            pair = jnp.concatenate([alice, bob], axis=-1).reshape(hb * half, s, s, 2 * c)
            h = prelu(conv(pair, w0))
            h = prelu(conv(h, w1))
            y = prelu(conv(pair, wf) + conv(h, wf))
            return y.reshape(hb, half, s, s, c)
        return rounds(x, body)

    report["fusion"]["v0_current_s"] = timed(jax.jit(v0), (x,))

    # conv ceiling: fuse block on pre-materialized pairs at each round's M
    pairs = []
    nviews = l
    while nviews // 2 > 0:
        half = nviews // 2
        pairs.append(jax.random.normal(ks[4], (b * half, s, s, 2 * c), jnp.float32).astype(dtype))
        nviews = half

    def conv_only(*ps):
        return sum(jnp.sum(fuse_block(p, (w0, w1, wf))) for p in ps)

    report["fusion"]["v_conv_only_s"] = timed(jax.jit(conv_only), tuple(pairs))
    report["fusion"]["v1_no_concat_s"] = timed(jax.jit(v1), (x,))
    report["fusion"]["v2_dist_residual_s"] = timed(jax.jit(v2), (x,))

    # numerics: v1/v2 must match v0 to accumulation-order tolerance
    r0 = jax.jit(v0)(x).astype(jnp.float32)
    for name, fn in (("v1", v1), ("v2", v2)):
        r = jax.jit(fn)(x).astype(jnp.float32)
        report["fusion"][f"{name}_max_abs_diff"] = float(jnp.max(jnp.abs(r - r0)))

    # ---- decoder variants ------------------------------------------------
    fused = jax.random.normal(ks[5], (b, s, s, c), jnp.float32).astype(dtype)
    wd = jax.random.normal(ks[6], (3, 3, c, c), jnp.float32).astype(dtype) * 0.05
    wo = jax.random.normal(ks[7], (c, 1), jnp.float32).astype(dtype) * 0.1

    def d0(z):
        y = jnp.einsum("bhwc,uvcd->bhwuvd", z, wd, preferred_element_type=z.dtype)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 3 * s, 3 * s, c)
        y = prelu(y)
        return jnp.einsum("bhwc,co->bhwo", y, wo, preferred_element_type=z.dtype)

    def d1(z):
        y = jnp.einsum("bhwc,uvcd->bhwuvd", z, wd, preferred_element_type=z.dtype)
        y = prelu(y)
        y = jnp.einsum("bhwuvc,co->bhwuvo", y, wo, preferred_element_type=z.dtype)
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 3 * s, 3 * s, 1)

    report["decoder"]["d0_current_s"] = timed(jax.jit(d0), (fused,))
    report["decoder"]["d1_pre_d2s_s"] = timed(jax.jit(d1), (fused,))
    a0 = jax.jit(d0)(fused).astype(jnp.float32)[..., 0]
    a1 = jax.jit(d1)(fused).astype(jnp.float32)[..., 0]
    report["decoder"]["d1_max_abs_diff"] = float(jnp.max(jnp.abs(a0 - a1)))

    print(json.dumps(report, indent=2))
    with open("FUSION_LAB.json", "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
