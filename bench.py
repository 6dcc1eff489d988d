"""Benchmark: scenes/sec/chip for 16-view 3x SR inference (BASELINE.json metric).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "scenes/sec/chip", "vs_baseline": N}

Baseline derivation: the reference reports < 0.2 s/scene for 3x SR of 32
LR views @128x128 on one V100 (paper txt:580-583), i.e. 5 scenes/sec at
32 views. The tracked metric uses 16 views; encoder cost is linear in L,
so the V100-equivalent baseline is taken as 10 scenes/sec. vs_baseline is
therefore value / 10.0 — and >= 5.0 is the north-star target.

Detailed numbers (more configs, step time, compile time) go to
BENCH_DETAILS.json.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

    from highresnet_tpu.config import DEFAULT_CONFIG
    from highresnet_tpu.models.hrnet import HRNet

    hrnet = HRNet(config=DEFAULT_CONFIG["network"])

    def bench_config(batch, views, size, iters=20, warmup=3):
        rng = np.random.default_rng(0)
        lrs = jnp.asarray(rng.random((batch, views, size, size)), jnp.float32)
        alphas = jnp.ones((batch, views), jnp.float32)
        variables = hrnet.init(jax.random.PRNGKey(0), lrs, alphas)
        fwd = jax.jit(lambda p, x, a: hrnet.apply({"params": p}, x, a))

        t0 = time.perf_counter()
        out = fwd(variables["params"], lrs, alphas)
        out.block_until_ready()
        compile_time = time.perf_counter() - t0

        for _ in range(warmup):
            fwd(variables["params"], lrs, alphas).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fwd(variables["params"], lrs, alphas)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        return {
            "batch": batch,
            "views": views,
            "lr_size": size,
            "step_time_s": dt,
            "scenes_per_sec": batch / dt,
            "compile_time_s": compile_time,
        }

    device = jax.devices()[0]
    details = {"device": str(device), "configs": []}

    headline = bench_config(batch=8, views=16, size=128)
    details["configs"].append(headline)
    # the published-config point (32 views @128): baseline 5 scenes/sec
    details["configs"].append(bench_config(batch=4, views=32, size=128))

    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(details, f, indent=2)

    value = headline["scenes_per_sec"]
    print(
        json.dumps(
            {
                "metric": "scenes/sec/chip (16-view 128px 3x SR inference)",
                "value": round(value, 3),
                "unit": "scenes/sec/chip",
                "vs_baseline": round(value / 10.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
