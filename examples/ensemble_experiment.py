"""HighRes-net+ ensemble with MEMBER PARITY (paper Table 1 protocol).

The paper's leaderboard-best entry averages the SR outputs of two
same-protocol models (paper txt:613-623). Round 2's attempt lost to the
best single model because the members were unequal (an 8-view member and a
late-overfit second seed, ENSEMBLE_REPORT.json). This runs the protocol
properly: two seeds trained IDENTICALLY (same dataset, epochs, views, lr),
each keeping its best-validation weights (the loop's built-in early-stop
selection), then scores each member, the naive SR-average ensemble, and
the REGISTERED ensemble on the same held-out scenes.

Registered ensemble: the shift-invariant cPSNR objective never pins a
model's absolute output frame, so independent seeds converge to frames
offset ~2 px from each other and raw averaging blurs (round-3 measurement:
-0.65 dB vs best single). Each member is PCC-aligned to the anchor
member's frame (registration.search.pcc_align_batch) before averaging —
this is what makes the paper's HighRes-net+ protocol (txt:613-623) pay.

    python examples/ensemble_experiment.py [--epochs 250] [--seeds 0,1] \
        [--out ENSEMBLE_REPORT.json]

One TPU process at a time.
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
    ap.add_argument("--root", default="/tmp/hrn_ensemble_data")
    ap.add_argument("--scenes-per-channel", type=int, default=300)
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--lr-size", type=int, default=48)
    ap.add_argument("--detail", type=float, default=0.5)
    ap.add_argument("--epochs", type=int, default=250)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--patch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=7e-4)
    ap.add_argument("--seeds", default="0,1")
    ap.add_argument("--val-proportion", type=float, default=0.1)
    ap.add_argument(
        "--early-stop-patience", type=int, default=0,
        help="training.early_stop_patience passthrough (0 = run all epochs); "
        "member parity needs matched stopping, so the same patience applies "
        "to every seed",
    )
    ap.add_argument("--max-scenes", type=int, default=40)
    ap.add_argument("--regen", action="store_true")
    ap.add_argument(
        "--fresh-test-seed", type=int, default=None,
        help="evaluate on a FRESH synthetic dataset generated with this "
        "seed (same protocol, never seen by any member or by training-time "
        "validation) instead of the shared val split",
    )
    ap.add_argument("--fresh-test-scenes", type=int, default=100,
                    help="scenes per channel for the fresh test set")
    ap.add_argument(
        "--tta", type=int, default=0, choices=[0, 4, 8],
        help="also score each member under registered dihedral TTA and the "
        "FULL STACK (registered ensemble of the members' TTA outputs) — the "
        "best-known inference configuration, stacking both demonstrated "
        "mechanisms (TTA_REPORT.json, ENSEMBLE_REPORT_PARITY.json)",
    )
    ap.add_argument("--out", default="ENSEMBLE_REPORT.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", f"/tmp/jax_cache_{jax.default_backend()}")
    import jax.numpy as jnp

    from highresnet_tpu.config import load_config
    from highresnet_tpu.data import collate, discover_scenes, read_imageset, train_val_split
    from highresnet_tpu.data.synth import make_synthetic_dataset
    from highresnet_tpu.models.hrnet import HRNet
    from highresnet_tpu.ops.metrics import shift_cpsnr
    from highresnet_tpu.train.loop import train_and_get_best_model

    from highresnet_tpu.data.synth import synthetic_dataset_complete
    # .complete marker: a generator killed mid-write (watchdog, ctrl-C)
    # leaves a partial tree that must be rebuilt, not trained on
    if args.regen or not synthetic_dataset_complete(args.root):
        from highresnet_tpu.data.synth import clear_synthetic_dataset

        # removes only generated artifacts (train/, norm.csv, caches) and
        # refuses to touch an unmarked tree unless --regen forces it —
        # checkpoint dirs under --root survive a deterministic rebuild
        clear_synthetic_dataset(args.root, force=args.regen)
        make_synthetic_dataset(
            args.root,
            n_scenes_per_channel=args.scenes_per_channel,
            n_views=args.views,
            lr_size=args.lr_size,
            seed=0,
            splits=("train",),
            write_norm_csv=False,
            detail=args.detail,
        )
        print(f"dataset: {2 * args.scenes_per_channel} scenes at {args.root}", flush=True)
        from highresnet_tpu.cli.pack_dataset import main as pack_main

        pack_main(["--prefix", args.root])

    seeds = [int(s) for s in args.seeds.split(",")]
    members = {}
    for seed in seeds:
        config = load_config(
            overrides={
                "paths": {
                    "prefix": args.root,
                    "checkpoint_dir": os.path.join(args.root, f"ckpt_seed{seed}"),
                    "tb_log_file_dir": "",
                },
                "training": {
                    "num_epochs": args.epochs,
                    "batch_size": args.batch,
                    "n_views": args.views,
                    "min_L": args.views,
                    "patch_size": args.patch,
                    "register_size": 2 * args.patch,
                    "val_proportion": args.val_proportion,
                    "eval_batch_size": 4,
                    # resumable under the stall-watchdog (wedgy TPU relay)
                    "checkpoint_every": 25,
                    "lr": args.lr,
                    "early_stop_patience": args.early_stop_patience,
                    "seed": seed,  # the ONLY difference between members
                    "data_parallel": jax.device_count() > 1,
                },
            }
        )
        # keep the log fresh: restore+compile of a finished run can sit
        # silent for minutes, which a stall-watchdog would misread as a
        # relay wedge
        print(f"[seed {seed}] restoring or training...", flush=True)
        t0 = time.time()
        out = train_and_get_best_model(
            config, run_dir=os.path.join(args.root, f"ckpt_seed{seed}", "run")
        )
        members[seed] = {
            "params": out["params"]["hrnet"],
            "best_val": float(out["best_score"]),
            "train_seconds": round(time.time() - t0, 1),
        }
        print(f"[seed {seed}] best_val={out['best_score']:.3f} "
              f"({members[seed]['train_seconds']:.0f}s)", flush=True)
        net_config = config["network"]

    hrnet = HRNet(config=net_config)
    fwd = jax.jit(lambda p, lrs, al: hrnet.apply({"params": p}, lrs, al))

    if args.tta:
        from highresnet_tpu.ops.dihedral import SAFE_SUBGROUP, dihedral_fwd, dihedral_inv
        from highresnet_tpu.registration.search import pcc_align_batch as _pcc

        tta_ts = SAFE_SUBGROUP if args.tta == 4 else tuple(range(8))

        @jax.jit
        def tta_fwd(p, lrs, al):
            srs = [
                dihedral_inv(hrnet.apply({"params": p}, dihedral_fwd(lrs, t), al), t)
                for t in tta_ts
            ]
            anchor = srs[0]
            srs = [anchor] + [_pcc(anchor, sr)[0] for sr in srs[1:]]
            return jnp.mean(jnp.stack(srs), axis=0)

    if args.fresh_test_seed is not None:
        fresh_root = os.path.join(args.root, f"fresh_test_{args.fresh_test_seed}")
        if not synthetic_dataset_complete(fresh_root):
            make_synthetic_dataset(
                fresh_root,
                n_scenes_per_channel=args.fresh_test_scenes,
                n_views=args.views,
                lr_size=args.lr_size,
                seed=args.fresh_test_seed,
                splits=("train",),
                write_norm_csv=False,
                detail=args.detail,
            )
            print(f"fresh test set: {2 * args.fresh_test_scenes} scenes at "
                  f"{fresh_root}", flush=True)
        val = discover_scenes(os.path.join(fresh_root, "train"))[: args.max_scenes]
    else:
        scenes = discover_scenes(os.path.join(args.root, "train"))
        _, val = train_val_split(scenes, args.val_proportion, seed=1)
        val = val[: args.max_scenes]

    # the paper ensembles TWO models; with >2 trained seeds the pair is
    # chosen by VALIDATION score (members[seed]["best_val"], lower=better
    # -shift_cPSNR) — a pre-registered selection rule, no test peeking
    import itertools

    pair_keys = list(itertools.combinations(seeds, 2))
    val_pair = tuple(sorted(seeds, key=lambda s: members[s]["best_val"])[:2])

    from highresnet_tpu.registration.search import pcc_align_batch

    anchor = sorted(seeds, key=lambda s_: members[s_]["best_val"])[0]
    rows = []
    offsets = {k: [] for k in pair_keys}
    scene_data = []  # per-scene anchor-frame member stacks for the stacker
    for d in val:
        s = read_imageset(d, top_k=args.views, beta=50.0)
        batch = collate([s], args.views)
        lrs, al = jnp.asarray(batch.lrs), jnp.asarray(batch.alphas)
        srs = {seed: fwd(members[seed]["params"], lrs, al)[0] for seed in seeds}
        hr, hrm = jnp.asarray(s.hr), jnp.asarray(s.hr_map)
        score = lambda img: float(shift_cpsnr(jnp.clip(img, 0, 1), hr, hrm))
        row = {"scene": s.name}
        for seed in seeds:
            row[f"seed{seed}"] = score(srs[seed])
        if args.tta:
            # full stack: registered dihedral TTA per member, then the
            # members' TTA outputs PCC-registered to the anchor member's
            # TTA frame and averaged (ensemble-of-self-ensembles)
            ttas = {seed: tta_fwd(members[seed]["params"], lrs, al)[0] for seed in seeds}
            for seed in seeds:
                row[f"tta{seed}"] = score(ttas[seed])
            t_anchor = ttas[anchor]
            t_stack = jnp.stack([t_anchor] + [
                pcc_align_batch(t_anchor[None], ttas[s_][None])[0][0]
                for s_ in seeds if s_ != anchor
            ])
            row["full_stack"] = score(jnp.mean(t_stack, axis=0))
        for a, b in pair_keys:
            # anchor on the pair's better-val member (the one users would
            # ship standalone), align the other onto its output frame
            a0, b0 = sorted((a, b), key=lambda s_: members[s_]["best_val"])
            row[f"ens{a}{b}"] = score((srs[a] + srs[b]) / 2.0)
            aligned, dyx = pcc_align_batch(srs[a0][None], srs[b0][None])
            offsets[(a, b)].append([float(v) for v in np.asarray(dyx[0])])
            row[f"rens{a}{b}"] = score((srs[a0] + aligned[0]) / 2.0)
        # every member in the anchor's output frame (anchor stays pristine)
        stack = jnp.stack([srs[anchor]] + [
            pcc_align_batch(srs[anchor][None], srs[s_][None])[0][0]
            for s_ in seeds if s_ != anchor
        ])
        if len(seeds) > 2:
            row["ens_all"] = score(jnp.mean(jnp.stack(list(srs.values())), axis=0))
            row["rens_all"] = score(jnp.mean(stack, axis=0))
        scene_data.append((np.asarray(stack), np.asarray(hr), np.asarray(hrm)))
        rows.append(row)
        if len(rows) % 10 == 0:
            # keep the log fresh for the stall watchdog (relay readbacks
            # make long eval loops slow and otherwise silent)
            print(f"[eval] {len(rows)}/{len(val)} scenes", flush=True)

    # ---- stacked (least-squares weighted) registered ensemble -----------
    # Equal weights lose whenever one member dominates (a 0.7 dB-stronger
    # seed makes the average WORSE than it alone). Fit global combination
    # weights by ridgeless least squares on HALF the scenes (even indices)
    # and score on the other half — weights never see their test scenes.
    # Members are in the anchor frame; the target HR is PCC-aligned into
    # that frame per scene; per-image means are removed (cPSNR's bias
    # term) and the warp's edge band is cropped.
    k, c = len(seeds), 8
    member_order = [anchor] + [s_ for s_ in seeds if s_ != anchor]
    G, rhs = np.zeros((k, k)), np.zeros(k)
    for stack, hr, hrm in scene_data[0::2]:
        hr_a = np.asarray(pcc_align_batch(stack[:1], hr[None])[0][0])
        X = stack[:, c:-c, c:-c].reshape(k, -1)
        m = hrm[c:-c, c:-c].reshape(-1) > 0
        X = X[:, m] - X[:, m].mean(axis=1, keepdims=True)
        y = hr_a[c:-c, c:-c].reshape(-1)[m]
        y = y - y.mean()
        G += X @ X.T
        rhs += X @ y
    w = np.linalg.solve(G, rhs)
    stack_weights = {f"seed{s_}": round(float(wi), 4)
                     for s_, wi in zip(member_order, w)}

    def half_means(idxs):
        out = {f"seed{s_}": float(np.mean([rows[i][f"seed{s_}"] for i in idxs]))
               for s_ in seeds}
        if len(seeds) > 2:
            out["rens_all"] = float(np.mean([rows[i]["rens_all"] for i in idxs]))
        if args.tta:
            for s_ in seeds:
                out[f"tta{s_}"] = float(np.mean([rows[i][f"tta{s_}"] for i in idxs]))
            out["full_stack"] = float(np.mean([rows[i]["full_stack"] for i in idxs]))
        stacked_scores = []
        for i in idxs:
            stack, hr, hrm = scene_data[i]
            img = jnp.einsum("k,khw->hw", jnp.asarray(w), jnp.asarray(stack))
            stacked_scores.append(float(shift_cpsnr(
                jnp.clip(img, 0.0, 1.0), jnp.asarray(hr), jnp.asarray(hrm))))
        out["stacked"] = float(np.mean(stacked_scores))
        return out

    fit_idx = list(range(0, len(rows), 2))
    test_idx = list(range(1, len(rows), 2))
    fit, test = half_means(fit_idx), half_means(test_idx)
    best_test_single = max((v for k_, v in test.items() if k_.startswith("seed")))
    # deployment rule: pick the best candidate (any single member, the
    # registered equal-weight ensemble, or the stacked ensemble) on the FIT
    # half, ship it, report its score on the unseen test half. The rule can
    # never systematically lose to "always ship the best-val member" and
    # picks the ensemble exactly when members are close enough for
    # averaging to pay.
    selected = max(fit, key=fit.get)
    stacking = {
        "protocol": "weights fit on even-index scenes (ridgeless LS, anchor-frame stacks, HR PCC-aligned, mean-centered, 8px edge crop); scored on odd-index scenes the weights never saw",
        "weights": stack_weights,
        "n_fit_scenes": len(fit_idx),
        "n_test_scenes": len(test_idx),
        "fit_half_mean_shift_cpsnr": {k_: round(v, 4) for k_, v in fit.items()},
        "test_half_mean_shift_cpsnr": {k_: round(v, 4) for k_, v in test.items()},
        "stacked_minus_best_single_db": round(test["stacked"] - best_test_single, 3),
        "selected_on_fit_half": selected,
        "selected_test_score": round(test[selected], 4),
        "selected_minus_best_single_db": round(test[selected] - best_test_single, 3),
    }

    means = {k: float(np.mean([r[k] for r in rows])) for k in rows[0] if k != "scene"}
    # headline = REGISTERED all-member ensemble: members are PCC-aligned to
    # the anchor's output frame before averaging (naive raw averaging
    # superimposes mutually-offset sharp frames, i.e. blur). Using every
    # trained member is a fixed protocol — no subset selection at all; the
    # val-selected 2-model pair (the paper's exact recipe) is also reported.
    ens_key = "rens_all" if len(seeds) > 2 else f"rens{val_pair[0]}{val_pair[1]}"
    means["ensemble"] = means[ens_key]
    best_single_key = max((k for k in means if k.startswith("seed")), key=means.get)
    wins = sum(
        r[ens_key] > max(r[k] for k in means if k.startswith("seed")) for r in rows
    )
    off_stats = {
        f"{a}-{b}": {
            "mean_dyx": [round(float(v), 3) for v in np.mean(offsets[(a, b)], axis=0)],
            "std_dyx": [round(float(v), 3) for v in np.std(offsets[(a, b)], axis=0)],
        }
        for a, b in pair_keys
    }
    report = {
        "what": (
            "HighRes-net+ SR-average ensemble with member parity "
            "(identical-protocol seeds, best-val member selection); "
            "rens* = members PCC-registered to a common output frame "
            "before averaging, ens* = naive raw average"
        ),
        "inter_member_output_offsets_px": off_stats,
        "stacking": stacking,
        "ensemble_members_selected_by_val": list(val_pair),
        "protocol": {
            "eval_set": (
                f"fresh synthetic dataset, generator seed {args.fresh_test_seed} "
                "(never seen by any member or by training-time validation)"
                if args.fresh_test_seed is not None
                else "shared val split (train_val_split seed=1)"
            ),
            "n_eval_scenes": len(val),
            "scenes": 2 * args.scenes_per_channel,
            "views": args.views,
            "lr_size": args.lr_size,
            "detail": args.detail,
            "epochs": args.epochs,
            "batch": args.batch,
            "lr": args.lr,
            "seeds": seeds,
            "early_stop_patience": args.early_stop_patience,
            "device": str(jax.devices()[0]),
        },
        "member_best_val": {str(s): members[s]["best_val"] for s in seeds},
        "member_train_seconds": {str(s): members[s]["train_seconds"] for s in seeds},
        "val_mean_shift_cpsnr": means,
        "best_single": best_single_key,
        "ensemble_minus_best_single_db": round(means["ensemble"] - means[best_single_key], 3),
        "scenes_where_ensemble_beats_both": f"{wins}/{len(rows)}",
        "per_scene": rows,
    }
    if args.tta:
        best_tta_single = max((k for k in means if k.startswith("tta")), key=means.get)
        report["tta_transforms"] = args.tta
        report["full_stack_minus_best_single_db"] = round(
            means["full_stack"] - means[best_single_key], 3)
        report["full_stack_minus_best_tta_single_db"] = round(
            means["full_stack"] - means[best_tta_single], 3)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: v for k, v in report.items() if k != "per_scene"}, indent=2))


if __name__ == "__main__":
    main()
