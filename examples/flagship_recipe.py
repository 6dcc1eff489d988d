"""Flagship recipe composition: ALL measured quality mechanisms, one run.

Every quality mechanism this framework adds over the reference has been
measured in isolation (README "Measured quality wins"): the registered
loss with its warm-start + curriculum recipe (+1.56 dB at sigma=1.25 px
misalignment, REGISTER_ABLATION.json), D4 train-time augmentation
(+0.16 dB, RECIPE_REPORT.json), and x8 registered TTA at inference
(+0.16-0.19 dB, TTA_REPORT.json / ENSEMBLE_TTA_STACK.json). This driver
measures the COMPOSITE: reference-default training vs the full recipe,
both scored plain and with TTA, on a FRESH test set (different generator
seed, untouched by training or model selection).

Arms (same dataset, same protocol, differ only in the recipe knobs):
  plain : register=False, no augmentation   (the reference's defaults,
          src/train.py:109-294 minus loss-time registration)
  full  : registered loss + ShiftNet warm-start + unregistered-warmup
          curriculum + D4 augmentation      (this framework's recipe)

Scoring modes per arm: plain forward, and x8 dihedral TTA with
PCC registration to the identity frame (eval/evaluator.py::_TTAForward).
The headline is full+TTA minus plain — what a user gains by switching
the reference's training defaults to this framework's recipe.

    python examples/flagship_recipe.py [--epochs 300] [--out FLAGSHIP_RECIPE.json]

One TPU process at a time; relaunch-safe under scripts/supervise_tpu.sh
(stable per-arm run dirs + periodic full-state checkpoints).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ARMS = {
    "plain": {"register": False},
    "full": {
        "register": True,
        "shiftnet_warmup_steps": 400,
        "shiftnet_warmup_sigma": 1.5,
        "register_warmup_epochs": 30,
        "augment_dihedral": True,
    },
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/hrn_flagship_data")
    ap.add_argument("--test-root", default="/tmp/hrn_flagship_test")
    ap.add_argument("--scenes-per-channel", type=int, default=150)
    ap.add_argument("--test-scenes-per-channel", type=int, default=100)
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--lr-size", type=int, default=48)
    ap.add_argument("--detail", type=float, default=0.5)
    ap.add_argument("--sigma", type=float, default=1.25,
                    help="per-scene Gaussian HR offset std (px) — the "
                    "structured misalignment model REGISTER_ABLATION uses")
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--patch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=7e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--val-proportion", type=float, default=0.1)
    ap.add_argument("--early-stop-patience", type=int, default=0)
    ap.add_argument("--regen", action="store_true")
    ap.add_argument("--out", default="FLAGSHIP_RECIPE.json")
    args = ap.parse_args()

    from highresnet_tpu.exp import harness

    harness.honor_platform_and_cache()

    import jax
    import jax.numpy as jnp

    from highresnet_tpu.config import load_config
    from highresnet_tpu.data import collate, discover_scenes, read_imageset
    from highresnet_tpu.eval.evaluator import _TTAForward
    from highresnet_tpu.models.hrnet import HRNet
    from highresnet_tpu.train.loop import train_and_get_best_model

    # --- datasets: train root + FRESH test root (disjoint generator seed) --
    # only the TRAIN root gets the decode-free pack cache (the test root is
    # read once per arm, not every epoch)
    for root, spc, seed, pack in (
        (args.root, args.scenes_per_channel, args.seed, True),
        (args.test_root, args.test_scenes_per_channel, args.seed + 7777, False),
    ):
        harness.ensure_dataset(
            root,
            scenes_per_channel=spc,
            views=args.views,
            lr_size=args.lr_size,
            seed=seed,
            detail=args.detail,
            hr_shift_sigma=args.sigma,
            regen=args.regen,
            pack=pack,
        )

    test_scenes = discover_scenes(os.path.join(args.test_root, "train"))

    shared = {
        "num_epochs": args.epochs,
        "batch_size": args.batch,
        "n_views": args.views,
        "min_L": args.views,
        "patch_size": args.patch,
        "register_size": 2 * args.patch,
        "val_proportion": args.val_proportion,
        "eval_batch_size": 4,
        "checkpoint_every": 25,
        "lr": args.lr,
        "early_stop_patience": args.early_stop_patience,
        "data_parallel": jax.device_count() > 1,
    }

    results = {}
    for arm, overrides in ARMS.items():
        config = load_config(
            overrides={
                "paths": {
                    "prefix": args.root,
                    "checkpoint_dir": os.path.join(args.root, f"ckpt_{arm}"),
                    "tb_log_file_dir": "",
                },
                "training": {**shared, **overrides},
            }
        )
        t0 = time.time()
        out = train_and_get_best_model(
            config, run_dir=os.path.join(args.root, f"ckpt_{arm}", "run")
        )
        train_s = time.time() - t0
        print(f"[{arm}] trained in {train_s:.0f}s; best={out['best_score']:.3f}", flush=True)

        hrnet = HRNet(config=config["network"])
        params = out["params"]["hrnet"]
        fwd_plain = jax.jit(lambda p, lrs, al: hrnet.apply({"params": p}, lrs, al))
        fwd_tta = _TTAForward(hrnet, params, transforms=8, register=True)

        scores = {"plain_fwd": [], "tta8": []}
        for d in test_scenes:
            s = read_imageset(d, top_k=args.views, beta=50.0)
            batch = collate([s], args.views)
            lrs, al = jnp.asarray(batch.lrs), jnp.asarray(batch.alphas)
            score = harness.scene_scorer(s)
            scores["plain_fwd"].append(score(fwd_plain(params, lrs, al)[0]))
            scores["tta8"].append(
                score(jnp.asarray(fwd_tta(np.asarray(lrs), np.asarray(al)))[0])
            )
        results[arm] = {
            "train_seconds": round(train_s, 1),
            "best_val_score": float(out["best_score"]),
            "best_epoch": int(out["best_epoch"]),
            "mean_shift_cpsnr": {k: float(np.mean(v)) for k, v in scores.items()},
            "per_scene_shift_cpsnr": {
                k: [round(x, 4) for x in v] for k, v in scores.items()
            },
        }
        for k in scores:
            print(f"[{arm}/{k}] test shift_cPSNR={np.mean(scores[k]):.3f}", flush=True)

    p, f = results["plain"]["per_scene_shift_cpsnr"], results["full"]["per_scene_shift_cpsnr"]
    report = {
        "what": (
            "Flagship recipe composition: reference-default training (plain) "
            "vs this framework's full recipe (registered loss + warm-start + "
            "curriculum + D4 augmentation), each scored plain and with x8 "
            "registered TTA on a fresh test set"
        ),
        "protocol": {
            "train_scenes": 2 * args.scenes_per_channel,
            "fresh_test_scenes": len(test_scenes),
            "views": args.views,
            "lr_size": args.lr_size,
            "hr_shift_sigma_px": args.sigma,
            "detail": args.detail,
            "epochs": args.epochs,
            "batch": args.batch,
            "lr": args.lr,
            "seed": args.seed,
            "device": str(jax.devices()[0]),
        },
        "arms": results,
        "comparisons": {
            "headline_full_tta_vs_plain": harness.paired_stats(f["tta8"], p["plain_fwd"]),
            "recipe_only_full_vs_plain": harness.paired_stats(f["plain_fwd"], p["plain_fwd"]),
            "tta_on_full": harness.paired_stats(f["tta8"], f["plain_fwd"]),
            "tta_on_plain": harness.paired_stats(p["tta8"], p["plain_fwd"]),
        },
    }
    with open(args.out, "w") as fp:
        json.dump(report, fp, indent=2)
    print(json.dumps(report["comparisons"], indent=2))


if __name__ == "__main__":
    main()
