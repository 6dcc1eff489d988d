"""Geometric self-ensemble (x8 TTA) on a trained paper-scale checkpoint.

Measures, per held-out scene, the shift_cPSNR of:
  - ``single``  — the plain forward (the QUALITY_REPORT.json flagship arm),
  - ``naive8`` / ``naive4``  — mean of the inverse-transformed dihedral
    outputs WITHOUT frame registration,
  - ``reg8`` / ``reg4``      — the shipped path (``Model.enable_tta``):
    every inverse-transformed output PCC-aligned to the identity-transform
    frame before averaging,
and the per-transform output-frame offsets that explain the difference:
the model's learned absolute output offset is NOT equivariant under the
dihedral action, so raw symmetry outputs are mutually shifted sharp
images (same failure mode as the naive seed ensemble,
ENSEMBLE_REPORT.json).

Scenes are scored in collated batches with one host readback per batch
(scalar readbacks cost ~1 s each through the relay).

    python examples/tta_experiment.py [--root /tmp/hrn_quality_full] \
        [--splits val fresh] [--out TTA_REPORT.json]

One TPU process at a time.
"""

import argparse
import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/hrn_quality_full")
    ap.add_argument("--run", default=None,
                    help="run dir with best/ (default: newest under <root>/ckpt)")
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--val-proportion", type=float, default=0.25)
    ap.add_argument("--fresh-dir", default="fresh_test_77",
                    help="fresh never-seen dataset subdir (train/ inside)")
    ap.add_argument("--splits", nargs="+", default=["val", "fresh"],
                    choices=["val", "fresh"])
    ap.add_argument("--max-scenes", type=int, default=0, help="0 = all")
    ap.add_argument("--out", default="TTA_REPORT.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", f"/tmp/jax_cache_{jax.default_backend()}")
    import jax.numpy as jnp

    from highresnet_tpu.config import load_config
    from highresnet_tpu.data import collate, discover_scenes, read_imageset, train_val_split
    from highresnet_tpu.eval.evaluator import load_model
    from highresnet_tpu.ops.dihedral import dihedral_fwd, dihedral_inv
    from highresnet_tpu.ops.metrics import shift_cpsnr_batch
    from highresnet_tpu.registration.search import pcc_align_batch

    run = args.run or sorted(glob.glob(os.path.join(args.root, "ckpt", "*")))[-1]
    cfg = load_config(overrides={"training": {"min_L": args.views, "n_views": args.views}})
    hrnet, params = load_model(cfg, run)
    print(f"checkpoint: {run}", flush=True)

    def batch_scores(p, lrs, al, hr, hrm):
        """All arms for one collated batch. Returns (scores[5, B], d[7, B, 2])."""
        srs = jnp.stack([
            dihedral_inv(hrnet.apply({"params": p}, dihedral_fwd(lrs, t), al), t)
            for t in range(8)
        ])  # (8, B, H, W)
        t_, b, h, w = srs.shape
        anchor = srs[0]
        ref = jnp.broadcast_to(anchor[None], (7, b, h, w)).reshape(7 * b, h, w)
        aligned, d = pcc_align_batch(ref, srs[1:].reshape(7 * b, h, w))
        aligned = aligned.reshape(7, b, h, w)
        d = d.reshape(7, b, 2)
        reg = jnp.concatenate([anchor[None], aligned])  # (8, B, H, W)
        # 4-element shape-safe subgroup is srs/reg indices [0, 2, 4, 6]
        arms = jnp.stack([
            anchor,
            jnp.mean(srs, axis=0),
            jnp.mean(reg, axis=0),
            jnp.mean(srs[jnp.array([0, 2, 4, 6])], axis=0),
            jnp.mean(reg[jnp.array([0, 2, 4, 6])], axis=0),
        ])  # (5, B, H, W)
        scores = jax.vmap(
            lambda a: shift_cpsnr_batch(jnp.clip(a, 0.0, 1.0), hr, hrm)
        )(arms)
        return scores, d

    fn = jax.jit(batch_scores)
    ARMS = ("single", "naive8", "reg8", "naive4", "reg4")

    def run_split(dirs, label):
        rows, offsets = [], []
        for i in range(0, len(dirs) - len(dirs) % args.batch, args.batch):
            sets = [read_imageset(d, top_k=args.views, beta=50.0)
                    for d in dirs[i:i + args.batch]]
            bt = collate(sets, args.views)
            scores, d = jax.device_get(fn(
                params, jnp.asarray(bt.lrs), jnp.asarray(bt.alphas),
                jnp.asarray(bt.hrs), jnp.asarray(bt.hr_maps),
            ))
            for j, s in enumerate(sets):
                rows.append({"scene": s.name,
                             **{a: float(scores[k, j]) for k, a in enumerate(ARMS)}})
            offsets.append(d)
            if (i // args.batch) % 5 == 4:
                print(f"[{label}] {len(rows)}/{len(dirs)}", flush=True)
        d = np.concatenate(offsets, axis=1)  # (7, N, 2)
        means = {a: float(np.mean([r[a] for r in rows])) for a in ARMS}
        best_tta = max((a for a in ARMS if a != "single"), key=means.get)
        delta = np.array([r[best_tta] - r["single"] for r in rows])
        return rows, {
            "n_scenes": len(rows),
            "mean_shift_cpsnr": {a: round(v, 4) for a, v in means.items()},
            "best_tta_arm": best_tta,
            "best_tta_minus_single_db": round(means[best_tta] - means["single"], 3),
            "reg8_minus_naive8_db": round(means["reg8"] - means["naive8"], 3),
            "best_tta_wins_vs_single": f"{int((delta > 0).sum())}/{len(rows)}",
            "paired_t": round(float(
                delta.mean() / (delta.std(ddof=1) / np.sqrt(len(delta)))), 2),
            "per_transform_offset_px": {
                f"t{t + 1}": {
                    "mean_dyx": [round(float(m), 3) for m in d[t].mean(axis=0)],
                    "std_dyx": [round(float(s), 3) for s in d[t].std(axis=0)],
                }
                for t in range(7)
            },
        }

    report = {
        "what": ("Geometric self-ensemble (dihedral TTA) on the paper-scale "
                 "flagship; registered vs naive averaging of the 8 symmetry "
                 "outputs (Model.enable_tta ships the registered path)"),
        "checkpoint": run,
        "views": args.views,
    }
    if "val" in args.splits:
        scenes = discover_scenes(os.path.join(args.root, "train"))
        _, val = train_val_split(scenes, args.val_proportion, seed=1)
        if args.max_scenes:
            val = val[:args.max_scenes]
        rows, summary = run_split(val, "val")
        report["val_split"] = summary
    if "fresh" in args.splits:
        fresh = discover_scenes(os.path.join(args.root, args.fresh_dir, "train"))
        if args.max_scenes:
            fresh = fresh[:args.max_scenes]
        fr_rows, fr_summary = run_split(fresh, "fresh")
        report["fresh_test"] = fr_summary
        report["per_scene_fresh"] = fr_rows

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "per_scene_fresh"},
                     indent=2))


if __name__ == "__main__":
    main()
