"""Component-level TPU timing: where does the bf16 forward spend its time?

Times the HRNet stages (input prep / encoder / fusion / decoder) and bare
conv stacks at f32 and bf16 with the relay-safe two-point protocol, plus
microbenchmarks that establish the op-level ceiling of this chip at the
model's actual conv shapes (3x3, C=64 vs C=128). Output: one JSON dict to
stdout + BENCH_BREAKDOWN.json.

Usage (one TPU process at a time):
    python examples/bench_breakdown.py [--batch 8] [--views 16] [--size 128]
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

from highresnet_tpu.config import DEFAULT_CONFIG  # noqa: E402
from highresnet_tpu.models.hrnet import HRNet, lower_median  # noqa: E402


def timed(fn, args, k1=10, k2=60):
    """Two-point enqueue timing (single home: utils.profiling.enqueue_timed)."""
    from highresnet_tpu.utils.profiling import enqueue_timed

    return enqueue_timed(lambda: fn(*args), k1, k2)


def conv_stack_bench(batch, size, cin, cout, depth, dtype):
    """Bare conv3x3 stack: the op-level ceiling at these shapes."""
    import flax.linen as nn

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(depth):
                x = nn.Conv(cout, (3, 3), padding="SAME", dtype=dtype, name=f"c{i}")(x)
            return x

    m = Stack()
    x = jnp.asarray(np.random.default_rng(0).random((batch, size, size, cin)), dtype)
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x)["params"]
    fn = jax.jit(lambda p, x: m.apply({"params": p}, x))
    dt = timed(fn, (params, x))
    flops = 2.0 * batch * size * size * 9 * (cin * cout + (depth - 1) * cout * cout)
    return {"step_time_s": dt, "tflops_per_s": flops / dt / 1e12}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--size", type=int, default=128)
    args = ap.parse_args()
    b, l, s = args.batch, args.views, args.size

    rng = np.random.default_rng(0)
    lrs32 = jnp.asarray(rng.random((b, l, s, s)), jnp.float32)
    alphas = jnp.ones((b, l), jnp.float32)

    report = {"device": str(jax.devices()[0]), "batch": b, "views": l, "size": s, "stages": {}}

    for dtype in (jnp.float32, jnp.bfloat16):
        dname = dtype.__name__
        hrnet = HRNet(config=DEFAULT_CONFIG["network"], dtype=dtype)
        variables = jax.jit(hrnet.init)(jax.random.PRNGKey(0), lrs32, alphas)
        params = variables["params"]

        # full forward
        full = jax.jit(lambda p, x, a: hrnet.apply({"params": p}, x, a))
        t_full = timed(full, (params, lrs32, alphas))

        # stage 1: median reference + stack + cast (pure data movement)
        def prep(x):
            refs = lower_median(x[:, : min(9, l)], axis=1)
            refs = jnp.broadcast_to(refs[:, None], (b, l, s, s))
            return jnp.stack([x, refs], axis=-1).astype(dtype)

        prep_j = jax.jit(prep)
        t_prep = timed(prep_j, (lrs32,))
        x_prep = prep_j(lrs32).reshape(b * l, s, s, 2)

        # stage 2: encoder over the folded (B*L) conv batch
        enc = jax.jit(
            lambda p, x: hrnet.apply({"params": p}, x, method=lambda m, x: m.encode(x))
        )
        t_enc = timed(enc, (params, x_prep))
        states = enc(params, x_prep).reshape(b, l, s, s, -1)

        # stage 3: fusion tree
        fuse = jax.jit(
            lambda p, x, a: hrnet.apply({"params": p}, x, a, method=lambda m, x, a: m.fuse(x, a))
        )
        t_fuse = timed(fuse, (params, states, alphas.astype(states.dtype)))
        fused = fuse(params, states, alphas.astype(states.dtype))

        # stage 4: decoder
        dec = jax.jit(lambda p, x: hrnet.apply({"params": p}, x, method=lambda m, x: m.decode(x)))
        t_dec = timed(dec, (params, fused))

        report["stages"][dname] = {
            "full_forward_s": t_full,
            "prep_median_stack_s": t_prep,
            "encoder_s": t_enc,
            "fusion_s": t_fuse,
            "decoder_s": t_dec,
            "stage_sum_s": t_prep + t_enc + t_fuse + t_dec,
        }

        # op-level ceilings at the model's conv shapes
        report["stages"][dname]["conv64_stack"] = conv_stack_bench(b * l, s, 64, 64, 6, dtype)
        report["stages"][dname]["conv128_stack"] = conv_stack_bench(b * l // 2, s, 128, 128, 3, dtype)

    with open("BENCH_BREAKDOWN.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
