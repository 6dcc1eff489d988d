"""Train-from-scratch quality evidence: MFSR beats single-view baselines.

Generates a synthetic Proba-V-format dataset whose HR scenes carry
band-limited detail in the aliased-but-surviving wavelength band (see
data/synth.py), trains HRNet+ShiftNet from scratch, then scores held-out
validation scenes:

  - trained HRNet with all views (MFSR),
  - trained HRNet with 1 view (SISR ablation),
  - bicubic 3x upsampling of the clearest LR view (no-learning baseline).

The claim under test (paper Table 1 / Fig. 1 in spirit): the trained
multi-frame model recovers aliased detail no single-view method can, so
MFSR shift_cPSNR > bicubic shift_cPSNR on held-out scenes.

    python examples/quality_experiment.py [--epochs 250] [--out QUALITY_REPORT.json]

Runs on whatever backend JAX selects (the real chip under axon). One TPU
process at a time.
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
    ap.add_argument("--scenes-per-channel", type=int, default=24)
    ap.add_argument("--views", type=int, default=12)
    ap.add_argument("--lr-size", type=int, default=48)
    ap.add_argument("--detail", type=float, default=0.5)
    ap.add_argument("--hr-shift", type=float, default=0.0)
    ap.add_argument("--epochs", type=int, default=250)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--patch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=7e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--val-proportion", type=float, default=0.25)
    ap.add_argument(
        "--grad-clip-norm", type=float, default=0.0,
        help="training.grad_clip_norm passthrough (0 = off, the "
        "reference-exact default); bare Adam showed unlucky-seed "
        "divergence at the paper-scale protocol (CHANGELOG round 3)",
    )
    ap.add_argument(
        "--ema-decay", type=float, default=0.0,
        help="training.ema_decay passthrough (0 = off): eval/best-model "
        "selection then score the parameter EMA",
    )
    ap.add_argument(
        "--augment", action="store_true",
        help="training.augment_dihedral: per-scene random D4 rotation/flip "
        "each epoch (extension; the reference never augments)",
    )
    ap.add_argument(
        "--lr-decay", type=float, default=0.97,
        help="training.lr_decay passthrough (plateau factor; 1.0 = constant "
        "LR — the regime where parameter EMA should shine)",
    )
    ap.add_argument(
        "--variable-views-p", type=float, default=0.0,
        help="training.variable_views_p passthrough: per-scene probability "
        "of truncating to a random view count so one checkpoint serves "
        "1..n_views (the VIEWS_ABLATION clip-floor fix)",
    )
    ap.add_argument(
        "--early-stop-patience", type=int, default=0,
        help="training.early_stop_patience passthrough (0 = run all epochs)",
    )
    ap.add_argument(
        "--val-views", type=int, nargs="*", default=[],
        help="training.val_views passthrough: score validation at these "
        "view counts too and select on the mean (the variable-L selection "
        "criterion; full stack always included)",
    )
    ap.add_argument(
        "--range-penalty", type=float, default=0.0,
        help="training.range_penalty passthrough: penalize SR output that "
        "leaves [0,1] (clip-floor artifact root fix at the loss level)",
    )
    ap.add_argument(
        "--init-from", default="",
        help="training.init_params_from passthrough: fine-tune from another "
        "run's best/ snapshot (value = that run's run_dir) instead of a "
        "fresh init — e.g. variable-L fine-tuning of a fixed-L checkpoint",
    )
    ap.add_argument(
        "--run-name", default="run",
        help="checkpoint run-dir name under <root>/ckpt — give each arm of "
        "a multi-arm experiment its own name so resumable runs don't collide",
    )
    ap.add_argument("--regen", action="store_true", help="rebuild the dataset")
    ap.add_argument(
        "--checkpoint-every",
        type=int,
        default=0,
        help="epochs between resumable full-state checkpoints; with a "
        "stable run dir this makes the run relaunch-safe under the relay "
        "stall watchdog (scripts/supervise_tpu.sh)",
    )
    ap.add_argument("--out", default="QUALITY_REPORT.json")
    args = ap.parse_args()

    from highresnet_tpu.exp import harness

    harness.honor_platform_and_cache()

    import jax
    import jax.numpy as jnp

    from highresnet_tpu.config import load_config
    from highresnet_tpu.data import collate, read_imageset
    from highresnet_tpu.models.hrnet import HRNet
    from highresnet_tpu.train.loop import train_and_get_best_model

    # --- dataset (best-model selection on raw -shift_cPSNR, no norm.csv) --
    harness.ensure_dataset(
        args.root,
        scenes_per_channel=args.scenes_per_channel,
        views=args.views,
        lr_size=args.lr_size,
        seed=args.seed,
        detail=args.detail,
        hr_shift=args.hr_shift,
        regen=args.regen,
    )

    # --- train ----------------------------------------------------------
    config = load_config(
        overrides={
            "paths": {
                "prefix": args.root,
                "checkpoint_dir": os.path.join(args.root, "ckpt"),
                "tb_log_file_dir": "",
            },
            "training": {
                "num_epochs": args.epochs,
                "batch_size": args.batch,
                "n_views": args.views,
                "min_L": args.views,
                "patch_size": args.patch,
                "register_size": 2 * args.patch,  # < default 128: small scenes
                "val_proportion": args.val_proportion,
                "eval_batch_size": 4,
                "checkpoint_every": args.checkpoint_every,
                "lr": args.lr,
                "lr_decay": args.lr_decay,
                "grad_clip_norm": args.grad_clip_norm,
                "ema_decay": args.ema_decay,
                "augment_dihedral": args.augment,
                "variable_views_p": args.variable_views_p,
                "early_stop_patience": args.early_stop_patience,
                "init_params_from": args.init_from,
                "range_penalty": args.range_penalty,
                "val_views": args.val_views,
                "data_parallel": jax.device_count() > 1,
            },
        }
    )
    # stable run dir iff checkpointing: each watchdog relaunch resumes (or,
    # when training already finished, serves the saved best weights)
    run_dir = (
        os.path.join(args.root, "ckpt", args.run_name) if args.checkpoint_every else None
    )
    t0 = time.time()
    result = train_and_get_best_model(config, run_dir=run_dir)
    train_s = time.time() - t0
    print(f"trained {args.epochs} epochs in {train_s:.0f}s; best={result['best_score']:.3f}")

    # --- score held-out validation scenes --------------------------------
    hrnet = HRNet(config=config["network"])
    params = result["params"]["hrnet"]
    fwd = jax.jit(lambda p, lrs, al: hrnet.apply({"params": p}, lrs, al))

    val = harness.held_out_scenes(args.root, args.val_proportion)

    rows = []
    for d in val:
        s = read_imageset(d, top_k=args.views, beta=50.0)
        batch = collate([s], args.views)
        sr = fwd(params, jnp.asarray(batch.lrs), jnp.asarray(batch.alphas))[0]
        one = collate([s], 1)
        sr1 = fwd(params, jnp.asarray(one.lrs), jnp.asarray(one.alphas))[0]
        cubic = harness.bicubic_x3(s.lr[0])
        score = harness.scene_scorer(s)
        rows.append(
            {"scene": s.name, "mfsr": score(sr), "one_view": score(sr1), "bicubic": score(cubic)}
        )
        print(
            f"{s.name:<12} mfsr={rows[-1]['mfsr']:6.2f} one={rows[-1]['one_view']:6.2f} "
            f"bicubic={rows[-1]['bicubic']:6.2f}",
            flush=True,
        )

    mean = {k: float(np.mean([r[k] for r in rows])) for k in ("mfsr", "one_view", "bicubic")}
    wins = sum(r["mfsr"] > r["bicubic"] for r in rows)
    report = {
        "protocol": {
            "scenes": 2 * args.scenes_per_channel,
            "views": args.views,
            "lr_size": args.lr_size,
            "detail": args.detail,
            "hr_shift": args.hr_shift,
            "epochs": args.epochs,
            "batch": args.batch,
            "patch": args.patch,
            "lr": args.lr,
            "lr_decay": args.lr_decay,
            "seed": args.seed,
            "val_proportion": args.val_proportion,
            "grad_clip_norm": args.grad_clip_norm,
            "ema_decay": args.ema_decay,
            "augment_dihedral": args.augment,
            "variable_views_p": args.variable_views_p,
            "early_stop_patience": args.early_stop_patience,
            "init_params_from": args.init_from,
            "range_penalty": args.range_penalty,
            "val_views": args.val_views,
            # on a watchdog-relaunched resumable run this is the LAST leg
            # only, not cumulative wall-clock
            "train_seconds": round(train_s, 1),
            "device": str(jax.devices()[0]),
        },
        # selection evidence (NOT protocol): the loop's internal val optimum
        # and when it happened — exposes peak-then-overfit timing and lets a
        # recipe comparison see where each arm's selection landed
        "selection": {
            "loop_best_score": round(float(result["best_score"]), 4),
            "best_epoch": int(result.get("best_epoch", -1)),
            # full per-epoch selection-score trajectory: distinguishes "the
            # arm genuinely peaked here" from "selection clipped the run"
            # (the RECIPE_FT_CTL epoch-18 confound, VERDICT round-4 weak #2)
            "val_history": [
                [int(e), round(float(s), 4)]
                for e, s in result.get("val_history", [])
            ],
            # with ema_decay > 0: which weights the dual selection shipped
            # plus the per-epoch EMA-vs-raw win tally (win-or-retire
            # evidence, VERDICT round-3 item 6)
            **({"ema": result["ema_selection"]} if "ema_selection" in result else {}),
        },
        "val_mean_shift_cpsnr": mean,
        "mfsr_minus_bicubic_db": round(mean["mfsr"] - mean["bicubic"], 3),
        "mfsr_minus_one_view_db": round(mean["mfsr"] - mean["one_view"], 3),
        "scenes_where_mfsr_beats_bicubic": f"{wins}/{len(rows)}",
        "per_scene": rows,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "per_scene"}, indent=2))


if __name__ == "__main__":
    main()
