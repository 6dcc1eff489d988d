"""Registered-loss ablation (paper Table 4): does loss-time registration help?

The reference's signature mechanism trains with ShiftNet+Lanczos aligning
the SR output to the HR ground truth before the loss
(/root/reference/src/train.py:177-187); the paper reports registered
0.9501/0.9532 vs unregistered 0.9616/0.9671 (Table 4, lower=better).

Round-2 protocols (uniform random HR offsets at 0 / ±1 / ±3 px) produced
three honest negatives: aligned frames make registration a no-op, a uniform
sub-pixel offset favors the unregistered conditional-mean estimator, and at
±3 px joint training fails to bootstrap. This round-3 protocol models what
Proba-V actually has — structured, per-scene, mostly-small GAUSSIAN offsets
(data/synth.py::hr_shift_sigma) — and fixes the bootstrap failure with a
ShiftNet warm-start on known synthetic shifts plus an unregistered warmup
curriculum (train/pretrain.py; training.shiftnet_warmup_steps /
register_warmup_epochs).

Every arm trains on the SAME dataset with the SAME protocol (epochs, batch,
views, lr, val split) differing ONLY in the registration settings, and all
arms are scored on the same held-out scenes with both the reference metric
(integer-search shift_cPSNR) and a fractional-search variant (max cPSNR
over Lanczos warps on a 0.25-px grid).

    python examples/register_ablation.py [--epochs 300] [--sigma 1.25] \
        [--arms unregistered,registered_warmstart,registered_plain] \
        [--out REGISTER_ABLATION.json]

One TPU process at a time.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ARMS = {
    # arm name -> training-config overrides beyond the shared protocol
    "unregistered": {"register": False},
    "registered_warmstart": {
        "register": True,
        "shiftnet_warmup_steps": 400,
        "shiftnet_warmup_sigma": 1.5,
        "register_warmup_epochs": 30,
    },
    # recipe + extended warp window (training.warp_int_range=4: accurate to
    # ±4.5 px instead of the reference's ~±3 px) — for protocols whose
    # offsets reach the single-pass warp's cap (round-2 protocol 3, ±3 px
    # uniform, where joint training failed to bootstrap); the warm-start
    # sigma widens to match the offset scale
    "registered_warmstart_wide": {
        "register": True,
        "shiftnet_warmup_steps": 400,
        "shiftnet_warmup_sigma": 2.0,
        "register_warmup_epochs": 30,
        "warp_int_range": 4,
    },
    "registered_plain": {"register": True},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/hrn_regab_data")
    ap.add_argument("--scenes-per-channel", type=int, default=150)
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--lr-size", type=int, default=48)
    ap.add_argument("--detail", type=float, default=0.5)
    ap.add_argument("--sigma", type=float, default=1.25, help="per-scene Gaussian HR offset std (px)")
    ap.add_argument(
        "--hr-shift", type=float, default=0.0,
        help="UNIFORM per-scene HR offset scale (px, ±hr_shift) instead of "
        "Gaussian --sigma — the round-2 protocol-3 misalignment model; "
        "mutually exclusive with --sigma (setting this ignores --sigma)",
    )
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--patch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=7e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--val-proportion", type=float, default=0.1)
    ap.add_argument(
        "--early-stop-patience", type=int, default=0,
        help="training.early_stop_patience passthrough (0 = run all epochs)",
    )
    ap.add_argument("--max-scenes", type=int, default=30, help="held-out scenes to score")
    ap.add_argument("--arms", default="unregistered,registered_warmstart,registered_plain")
    ap.add_argument("--regen", action="store_true")
    ap.add_argument("--out", default="REGISTER_ABLATION.json")
    args = ap.parse_args()

    from highresnet_tpu.exp import harness

    harness.honor_platform_and_cache()

    import jax
    import jax.numpy as jnp

    from highresnet_tpu.config import load_config
    from highresnet_tpu.data import collate, read_imageset
    from highresnet_tpu.models.hrnet import HRNet
    from highresnet_tpu.ops.lanczos import lanczos_shift
    from highresnet_tpu.ops.metrics import cpsnr
    from highresnet_tpu.train.loop import train_and_get_best_model

    # --- dataset (shared by all arms); model selection on raw -shift_cPSNR
    harness.ensure_dataset(
        args.root,
        scenes_per_channel=args.scenes_per_channel,
        views=args.views,
        lr_size=args.lr_size,
        seed=args.seed,
        detail=args.detail,
        hr_shift=args.hr_shift,
        hr_shift_sigma=0.0 if args.hr_shift > 0 else args.sigma,
        regen=args.regen,
    )

    # --- fractional-search scorer ----------------------------------------
    offs = np.arange(-3.0, 3.0 + 1e-9, 0.25)
    grid = np.stack(np.meshgrid(offs, offs, indexing="ij"), -1).reshape(-1, 2)
    grid_j = jnp.asarray(grid, jnp.float32)  # (625, 2) as (dy, dx)

    @jax.jit
    def frac_cpsnr(sr, hr, hr_map, border=3):
        """Max cPSNR over sub-pixel Lanczos placements of SR (0.25-px grid).

        The continuous analog of Evaluator.shift_cPSNR's integer search:
        warps SR by every grid offset, trims the same 3-px border, and
        scores against the centered HR window.
        """
        n = grid_j.shape[0]
        warped = lanczos_shift(jnp.broadcast_to(sr, (n,) + sr.shape), grid_j)
        size = sr.shape[-1] - 2 * border
        sr_c = warped[:, border : border + size, border : border + size]
        hr_c = hr[border : border + size, border : border + size]
        map_c = hr_map[border : border + size, border : border + size]
        scores = cpsnr(jnp.clip(sr_c, 0, 1), hr_c[None], map_c[None])
        return jnp.max(scores)

    # --- train + score each arm ------------------------------------------
    val = harness.held_out_scenes(args.root, args.val_proportion, args.max_scenes)

    shared = {
        "num_epochs": args.epochs,
        "batch_size": args.batch,
        "n_views": args.views,
        "min_L": args.views,
        "patch_size": args.patch,
        "register_size": 2 * args.patch,
        "val_proportion": args.val_proportion,
        "eval_batch_size": 4,
        # periodic full-state checkpoints + a stable per-arm run_dir: a
        # killed/stalled run (the TPU relay can wedge) resumes mid-arm
        # instead of restarting from scratch
        "checkpoint_every": 25,
        "lr": args.lr,
        "early_stop_patience": args.early_stop_patience,
        "data_parallel": jax.device_count() > 1,
    }

    results = {}
    for arm in args.arms.split(","):
        arm = arm.strip()
        overrides = ARMS[arm]
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
        fwd = jax.jit(lambda p, lrs, al: hrnet.apply({"params": p}, lrs, al))

        int_scores, frac_scores = [], []
        for d in val:
            s = read_imageset(d, top_k=args.views, beta=50.0)
            batch = collate([s], args.views)
            sr = fwd(params, jnp.asarray(batch.lrs), jnp.asarray(batch.alphas))[0]
            hr, hrm = jnp.asarray(s.hr), jnp.asarray(s.hr_map)
            int_scores.append(harness.scene_scorer(s)(sr))
            frac_scores.append(float(frac_cpsnr(sr, hr, hrm)))
        results[arm] = {
            "mean_shift_cpsnr": float(np.mean(int_scores)),
            "mean_fractional_cpsnr": float(np.mean(frac_scores)),
            "train_seconds": round(train_s, 1),
            "best_val_score": float(out["best_score"]),
            "per_scene_shift_cpsnr": [round(x, 4) for x in int_scores],
        }
        print(
            f"[{arm}] held-out shift_cPSNR={results[arm]['mean_shift_cpsnr']:.3f} "
            f"fractional={results[arm]['mean_fractional_cpsnr']:.3f}",
            flush=True,
        )

    # --- report (append to the historical protocol list) ------------------
    if args.hr_shift > 0:
        note = (
            f"uniform per-scene HR offsets (±{args.hr_shift} px — the "
            "round-2 protocol-3 misalignment model) with the warm-start + "
            "curriculum recipe, including a warp_int_range=4 arm whose "
            "loss-time warp stays accurate to ±4.5 px; all arms share "
            "dataset/protocol and differ only in registration settings"
        )
    else:
        note = (
            "structured per-scene Gaussian HR offsets "
            f"(sigma={args.sigma} px, truncated +-2.4 sigma) + ShiftNet "
            "warm-start + unregistered warmup curriculum; all arms share "
            "dataset/protocol and differ only in registration settings"
        )
    protocol = {
        "note": note,
        "hr_shift_uniform_px": args.hr_shift,
        "hr_shift_sigma_px": 0.0 if args.hr_shift > 0 else args.sigma,
        "training_protocol": {
            "scenes": 2 * args.scenes_per_channel,
            "views": args.views,
            "lr_size": args.lr_size,
            "detail": args.detail,
            "epochs": args.epochs,
            "batch": args.batch,
            "lr": args.lr,
            "val_proportion": args.val_proportion,
            "early_stop_patience": args.early_stop_patience,
            "device": str(jax.devices()[0]),
        },
        "arms": results,
    }
    if "registered_warmstart" in results and "unregistered" in results:
        protocol["registered_minus_unregistered_db"] = round(
            results["registered_warmstart"]["mean_shift_cpsnr"]
            - results["unregistered"]["mean_shift_cpsnr"],
            3,
        )

    report = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            report = json.load(f)
    report.setdefault("what", "Registered-loss ablation (paper Table 4) across misalignment protocols")
    report.setdefault("protocols", [])
    report["protocols"].append(protocol)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(protocol, indent=2))


if __name__ == "__main__":
    main()
