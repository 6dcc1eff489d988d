"""Registered-loss ablation (paper Table 4): train WITHOUT ShiftNet
registration on the same dataset/protocol as examples/quality_experiment.py
and compare held-out shift_cPSNR against the registered run.

The paper reports registered 0.9501/0.9532 vs unregistered 0.9616/0.9671
(lower=better Kelvin score) — registration at the loss is one of
HighRes-net's two key ideas. This reproduces the direction of that result
on synthetic data.

    python examples/register_ablation.py [--root /tmp/hrn_quality_data] \
        [--epochs 300] [--out REGISTER_ABLATION.json]

Expects the dataset from quality_experiment.py (run that first).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/hrn_quality_data")
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--patch", type=int, default=32)
    ap.add_argument("--val-proportion", type=float, default=0.1)
    ap.add_argument("--max-scenes", type=int, default=30)
    ap.add_argument("--registered-report", default="QUALITY_REPORT.json")
    ap.add_argument("--out", default="REGISTER_ABLATION.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", f"/tmp/jax_cache_{jax.default_backend()}")
    import jax.numpy as jnp

    from highresnet_tpu.config import load_config
    from highresnet_tpu.data import collate, discover_scenes, read_imageset, train_val_split
    from highresnet_tpu.models.hrnet import HRNet
    from highresnet_tpu.ops.metrics import shift_cpsnr
    from highresnet_tpu.train.loop import train_and_get_best_model

    config = load_config(
        overrides={
            "paths": {
                "prefix": args.root,
                "checkpoint_dir": os.path.join(args.root, "ckpt_unregistered"),
                "tb_log_file_dir": "",
            },
            "training": {
                "num_epochs": args.epochs,
                "batch_size": args.batch,
                "n_views": args.views,
                "min_L": args.views,
                "patch_size": args.patch,
                "register_size": 2 * args.patch,
                "register": False,  # <-- the ablation arm
                "val_proportion": args.val_proportion,
                "eval_batch_size": 4,
                "checkpoint_every": 0,
                "data_parallel": jax.device_count() > 1,
            },
        }
    )
    t0 = time.time()
    result = train_and_get_best_model(config)
    train_s = time.time() - t0
    print(f"unregistered arm trained in {train_s:.0f}s; best={result['best_score']:.3f}")

    hrnet = HRNet(config=config["network"])
    params = result["params"]["hrnet"]
    fwd = jax.jit(lambda p, lrs, al: hrnet.apply({"params": p}, lrs, al))

    scenes = discover_scenes(os.path.join(args.root, "train"))
    _, val = train_val_split(scenes, args.val_proportion, seed=1)
    val = val[: args.max_scenes]

    scores = []
    for d in val:
        s = read_imageset(d, top_k=args.views, beta=50.0)
        batch = collate([s], args.views)
        sr = fwd(params, jnp.asarray(batch.lrs), jnp.asarray(batch.alphas))[0]
        scores.append(
            float(shift_cpsnr(jnp.clip(sr, 0, 1), jnp.asarray(s.hr), jnp.asarray(s.hr_map)))
        )

    unreg = float(np.mean(scores))
    report = {
        "unregistered_mean_shift_cpsnr": unreg,
        "n_scenes": len(scores),
        "train_seconds": round(train_s, 1),
        "protocol": {"views": args.views, "epochs": args.epochs, "batch": args.batch},
    }
    if os.path.exists(args.registered_report):
        with open(args.registered_report) as f:
            reg = json.load(f)["val_mean_shift_cpsnr"]["mfsr"]
        report["registered_mean_shift_cpsnr"] = reg
        report["registered_minus_unregistered_db"] = round(reg - unreg, 3)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
