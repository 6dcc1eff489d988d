"""Views-scaling ablation: shift_cPSNR vs number of fused LR views.

Reproduces the shape of the paper's Fig. 1 (score improves monotonically
with views up to ~16, and 1-view is worse than the no-learning baseline)
on a trained checkpoint from examples/quality_experiment.py.

    python examples/views_ablation.py [--root /tmp/hrn_quality_data] \
        [--checkpoint <run_dir>] [--out VIEWS_ABLATION.json]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/hrn_quality_data")
    ap.add_argument("--checkpoint", default=None, help="run dir (default: newest in <root>/ckpt)")
    ap.add_argument("--views", type=int, nargs="+", default=[1, 2, 4, 8, 12, 16])
    ap.add_argument("--val-proportion", type=float, default=0.1)
    ap.add_argument("--max-scenes", type=int, default=20)
    ap.add_argument("--out", default="VIEWS_ABLATION.json")
    args = ap.parse_args()

    from highresnet_tpu.exp import harness

    harness.honor_platform_and_cache()

    import jax
    import jax.numpy as jnp

    from highresnet_tpu.config import load_config
    from highresnet_tpu.data import collate, read_imageset
    from highresnet_tpu.eval.evaluator import load_model

    run = args.checkpoint or sorted(glob.glob(os.path.join(args.root, "ckpt", "*")))[-1]
    max_views = max(args.views)
    config = load_config(overrides={"training": {"min_L": max_views, "n_views": max_views}})
    hrnet, params = load_model(config, run)
    fwd = jax.jit(lambda p, lrs, al: hrnet.apply({"params": p}, lrs, al))

    val = harness.held_out_scenes(args.root, args.val_proportion, args.max_scenes)

    per_k = {k: [] for k in args.views}
    per_k_overflow = {k: [] for k in args.views}
    per_k_overflow_scored = {k: [] for k in args.views}
    cubic_scores = []
    for d in val:
        s = read_imageset(d, top_k=max_views, beta=50.0)
        score = harness.scene_scorer(s)
        for k in args.views:
            batch = collate([s], k)  # truncates to the k clearest views
            sr = fwd(params, jnp.asarray(batch.lrs), jnp.asarray(batch.alphas))[0]
            per_k[k].append(score(sr))
            # clip-floor evidence: how far the raw output leaves [0,1]
            # before the metric clips it (the off-distribution L artifact
            # that variable-L training exists to remove), full-frame and
            # restricted to the region shift_cpsnr actually scores
            ov_full, ov_scored = harness.overflow_metrics(sr)
            per_k_overflow[k].append(ov_full)
            per_k_overflow_scored[k].append(ov_scored)
        cubic_scores.append(score(harness.bicubic_x3(s.lr[0])))

    bicubic = float(np.mean(cubic_scores))
    table = [
        {
            "views": k,
            "mean_shift_cpsnr": float(np.mean(v)),
            "vs_bicubic_db": round(float(np.mean(v)) - bicubic, 3),
            # >0.3 is the eval path's warn_out_of_range threshold
            "max_out_of_range": round(float(np.max(per_k_overflow[k])), 4),
            # overflow inside the border-trimmed region the metric scores
            "max_out_of_range_scored": round(
                float(np.max(per_k_overflow_scored[k])), 4
            ),
        }
        for k, v in sorted(per_k.items())
    ]
    report = {
        "checkpoint": run,
        "n_scenes": len(val),
        "bicubic_mean_shift_cpsnr": bicubic,
        "by_views": table,
        "monotone_nondecreasing": all(
            table[i]["mean_shift_cpsnr"] <= table[i + 1]["mean_shift_cpsnr"] + 0.02
            for i in range(len(table) - 1)
        ),
    }
    harness.emit_report(args.out, report)


if __name__ == "__main__":
    main()
