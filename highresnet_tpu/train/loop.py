"""Training orchestration: the `trainAndGetBestModel` capability.

Structure follows the reference protocol (src/train.py:109-294) with the
TPU-native execution model:

- one compiled train step per batch (batch sharded over the mesh's data
  axis, grads all-reduced by XLA);
- validation runs the jitted SR forward + on-device 7x7 shift-search
  cPSNR, aggregated to the ESA-ratio score when norm.csv exists;
- ReduceLROnPlateau on the val score;
- best weights + fully resumable state checkpointed via Orbax;
- optional tensorboardX scalars/images (gated import).

This module is orchestration-only; the subsystems live next door:
train/setup.py (mesh / loader / warm-start), train/evaluation.py (val
batching + scoring), train/selection.py (EMA dual scoring, best tracking,
early stop), train/tb.py (TensorBoard writing).
"""

from __future__ import annotations

import datetime
import os
import time
from typing import Any, Dict, Optional

import jax
import numpy as np

from highresnet_tpu.data.probav import (
    discover_scenes,
    read_baseline_cpsnr,
    train_val_split,
)
from highresnet_tpu.data.pipeline import shard_for_hosts
from highresnet_tpu.parallel.distributed import (
    broadcast_string,
    is_multihost,
    maybe_initialize,
)
from highresnet_tpu.train.checkpoint import CheckpointManager, resume_run
from highresnet_tpu.train.epoch import (  # re-exported (public surface)
    run_train_epoch,
    warn_warp_window,
    warp_window_px,
)
from highresnet_tpu.train.evaluation import (  # re-exported (public surface)
    BATCH_SPECS as _BATCH_SPECS,
    build_val_batches,
    evaluate_model,
)
from highresnet_tpu.train.schedule import ReduceLROnPlateau
from highresnet_tpu.train.selection import BestTracker, dual_candidates
from highresnet_tpu.train.setup import (
    build_models_and_steps,
    build_train_loader,
    make_feed,
    maybe_warmstart_shiftnet,  # noqa: F401  re-exported (public surface)
    setup_mesh,
)
from highresnet_tpu.train.tb import TBWriter


def _run_dir_name(t: Dict[str, Any]) -> str:
    stamp = f"{datetime.datetime.now():%Y-%m-%d-%H-%M-%S-%f}"
    return (
        f"batch_{t['batch_size']}_views_{t['n_views']}_min_{t['min_L']}"
        f"_beta_{t['beta']}_time_{stamp}"
    )


def train_and_get_best_model(
    config: Dict[str, Any],
    max_steps: Optional[int] = None,
    run_dir: Optional[str] = None,
) -> Dict[str, Any]:
    """Train HRNet+ShiftNet; checkpoint and return the best weights.

    Returns {'params': ..., 'batch_stats': ..., 'best_score': float,
    'best_epoch': int, 'run_dir': str}.
    """
    # multi-host: join the distributed runtime BEFORE any device query
    # (no-op unless HRN_DISTRIBUTED / HRN_COORDINATOR is set; on cloud TPU
    # pods HRN_DISTRIBUTED=auto uses cluster auto-detection)
    maybe_initialize()
    n_proc = jax.process_count()
    proc = jax.process_index()
    is_primary = proc == 0

    t = config["training"]
    paths = config["paths"]
    seed = t.get("seed", 123)

    if t.get("debug_nans", False):
        # the reference leaves torch detect_anomaly permanently on
        # (src/train.py:156); here the NaN tripwire is opt-in
        from highresnet_tpu.utils.profiling import enable_nan_debugging

        enable_nan_debugging(True)

    # --- data ---------------------------------------------------------------
    data_dir = paths["prefix"]
    baseline = None
    norm_path = os.path.join(data_dir, "norm.csv")
    if os.path.exists(norm_path):
        baseline = read_baseline_cpsnr(norm_path)

    scene_dirs = discover_scenes(os.path.join(data_dir, "train"))
    if not scene_dirs:
        raise FileNotFoundError(f"no scenes under {data_dir}/train/(RED|NIR)")
    train_list, val_list = train_val_split(scene_dirs, t["val_proportion"], seed=1)

    multihost = is_multihost()
    mesh, shard_views = setup_mesh(t, multihost)

    # per-host equal-length shard of the scene list; each host reads and
    # feeds only its share of every global batch (single-host: identity)
    local_train_list = shard_for_hosts(train_list, proc, n_proc)
    local_batch_size = t["batch_size"] // n_proc

    if mesh is not None and len(local_train_list) < local_batch_size:
        # meshed runs drop ragged batches (static sharded shapes); with
        # fewer scenes than one batch the loader would yield NOTHING and
        # every epoch would silently train zero steps (loss=0.0)
        raise ValueError(
            f"batch_size {local_batch_size} exceeds the {len(local_train_list)} "
            "local training scenes: a mesh-sharded run drops ragged batches, "
            "so no training would happen. Lower batch_size or add scenes."
        )

    loader = build_train_loader(
        t,
        local_train_list,
        seed=seed,
        proc=proc,
        drop_last=mesh is not None,
        data_dir=data_dir,
    )

    # --- models / state / compiled steps (setup.py) ---------------------------
    pieces = build_models_and_steps(
        config,
        mesh,
        shard_views,
        multihost=multihost,
        seed=seed,
        train_list=train_list,
        is_primary=is_primary,
    )
    state = pieces.state
    train_step, warm_train_step = pieces.train_step, pieces.warm_train_step
    register_warmup = pieces.register_warmup
    eval_step, eval_batch, eval_mesh = pieces.eval_step, pieces.eval_batch, pieces.eval_mesh

    # pre-collate the (fixed) validation set once: per-epoch re-read +
    # re-collate dominated epoch wall-clock at paper scale on a 1-core
    # host, and per-epoch re-SAMPLING of eval views made the val score —
    # and hence best-model selection — noisy. Seeded rng => deterministic
    # across epochs and runs. training.cache_val_batches=false restores
    # the reference's stochastic per-epoch behavior (src/train.py:284).
    # training.val_views = [k1, k2, ...]: score the val set at SEVERAL view
    # counts and select on the mean — a selection criterion that sees the
    # variable-L objective (an L-only val let a variable-L fine-tune pick
    # an early epoch that kept the fixed-L brittleness at low L,
    # VIEWS_ABLATION_VARL_FT.json). [] = reference-exact single full-L val.
    # The full stack is always scored; entries < min_L add truncated-view
    # batch lists (entries >= min_L are the full stack, listed or not).
    # Mixture implies cached val batches (each count gets its own list,
    # all served by the same compiled eval step — static shapes).
    val_views = [int(v) for v in (t.get("val_views") or [])]
    val_batches = None
    if t.get("cache_val_batches", True) or val_views:
        val_batches = build_val_batches(
            val_list,
            t["min_L"],
            t["n_views"],
            t["beta"],
            eval_batch,
            rng=np.random.default_rng(seed + 10007),
        )
    extra_val_batches = [
        build_val_batches(
            val_list,
            t["min_L"],
            t["n_views"],
            t["beta"],
            eval_batch,
            rng=np.random.default_rng(seed + 10007),
            truncate_to=k,
        )
        for k in val_views
        if k < t["min_L"]
    ]

    def eval_params_hrnet(params_hrnet, sample_rng, return_images=False):
        """One val pass (or the val_views mixture) with the run's plumbing."""

        def one(batches, want_images):
            return evaluate_model(
                params_hrnet,
                eval_step,
                val_list,
                t["min_L"],
                baseline,
                top_k=t["n_views"],
                beta=t["beta"],
                batch_size=eval_batch,
                mesh=eval_mesh,
                return_images=want_images,
                prebuilt_batches=batches,
                sample_rng=sample_rng,
            )

        if not extra_val_batches:
            return one(val_batches, return_images)
        out = one(val_batches, return_images)  # full stack first (images)
        score, images = (out[0], out[1:]) if return_images else (out, ())
        scores = [score] + [one(b, False) for b in extra_val_batches]
        mixture = float(np.mean(scores))
        return (mixture, *images) if return_images else mixture

    if run_dir is None:
        run_dir = os.path.join(paths["checkpoint_dir"], _run_dir_name(t))
        if multihost:  # per-host clocks would mint different names
            run_dir = broadcast_string(run_dir)
    ckpt = CheckpointManager(run_dir)
    scheduler = ReduceLROnPlateau(t["lr"], factor=t["lr_decay"], patience=t["lr_step"])
    writer = TBWriter(paths.get("tb_log_file_dir"), os.path.basename(run_dir),
                      enabled=is_primary)

    # --- resume (checkpoint.py::resume_run) -----------------------------------
    # with training.ema_decay > 0, validation and best-model selection score
    # the EMA weights (state.eval_params); otherwise the raw ones
    tracker = BestTracker(ckpt, patience=t.get("early_stop_patience", 0))
    tracker.seed(
        jax.device_get({"params": state.eval_params, "batch_stats": state.batch_stats})
    )
    state, start_epoch = resume_run(
        ckpt, state, tracker, scheduler, multihost=multihost, mesh=mesh
    )

    # host-array placement for each train batch (identity off-mesh)
    feed = make_feed(mesh, multihost=multihost, shard_views=shard_views)

    steps_done = 0
    num_epochs = t["num_epochs"]
    _warp_warn_from = 1
    for epoch in range(start_epoch, num_epochs + 1):
        step_fn = (
            warm_train_step
            if (warm_train_step is not None and epoch <= register_warmup)
            else train_step
        )
        state, estats, n_steps = run_train_epoch(
            loader,
            state,
            step_fn,
            feed,
            steps_left=None if max_steps is None else max_steps - steps_done,
        )
        steps_done += n_steps
        train_loss = estats["train_loss"]
        mean_abs_shift = estats["mean_abs_shift"]
        grad_norm = estats["grad_norm"]
        max_abs_shift = estats["max_abs_shift"]
        t0 = time.time() - estats["seconds"]

        _warp_warn_from = warn_warp_window(t, max_abs_shift, epoch, _warp_warn_from)

        # fetch the first val SR only when a writer will log it (an image
        # readback per epoch is wasted bandwidth on remote transports).
        # cache_val_batches=false: re-sample views each epoch like the
        # reference, but from an epoch-seeded rng so (a) every host of a
        # multi-host run draws the same views (val-driven control flow —
        # early stop, best selection — must agree across processes) and
        # (b) the raw and EMA candidates below score the SAME draw
        def epoch_val_rng():
            return (
                None if val_batches is not None
                else np.random.default_rng((seed, 1000003, epoch))
            )

        val_out = eval_params_hrnet(
            state.eval_params["hrnet"], epoch_val_rng(), return_images=writer.active
        )
        if writer.active:
            val_score, sr0, hr0 = val_out
        else:
            val_score, sr0, hr0 = val_out, None, None

        # EMA dual selection: score the raw weights too (same val draw) and
        # let best-model selection take whichever wins (selection.py)
        cand_score, cand_params, raw_val_score, ema_val_score = dual_candidates(
            state, val_score, lambda p: eval_params_hrnet(p, epoch_val_rng())
        )
        if raw_val_score is not None:  # EMA on: keep the per-epoch tally
            if ema_val_score <= raw_val_score:
                tracker.ema_wins += 1
            else:
                tracker.raw_wins += 1
        tracker.val_history.append((epoch, float(cand_score)))
        if tracker.update(epoch, cand_score, cand_params, state.batch_stats):
            if raw_val_score is not None:
                tracker.best_source = (
                    "ema" if cand_score == ema_val_score else "raw"
                )

        # the log prints the selection-relevant (min) score…
        val_score = cand_score
        # …but the plateau scheduler steps on the RAW score: the lr drives
        # the raw optimization, and an EMA-influenced lr path would make the
        # training trajectory depend on a passive readout — with raw-driven
        # scheduling an ema_decay>0 run's raw trajectory is bit-identical to
        # the ema=0 run's (verified: identical per-epoch train losses), so
        # dual selection provably never returns a worse model than raw-only
        new_lr = scheduler.step(
            raw_val_score if raw_val_score is not None else val_score
        )
        state = state.with_learning_rate(new_lr)

        # optional early stopping (training.early_stop_patience epochs with
        # no val improvement; 0 = off, the reference-exact behavior).
        # Deterministic across hosts: every process scores the same
        # replicated val number, so all break on the same epoch.
        early_stop = tracker.early_stop(epoch)

        # full resumable state every `checkpoint_every` epochs (async save);
        # 0 = best-weights-only during the run, one final state save at exit
        every = t.get("checkpoint_every", 1)
        stopping = (
            (epoch == num_epochs)
            or early_stop
            or (max_steps is not None and steps_done >= max_steps)
        )
        if (every > 0 and epoch % every == 0) or stopping:
            ckpt.save_state(
                state,
                {
                    "epoch": epoch,
                    "best_score": tracker.best_score,
                    "best_epoch": tracker.best_epoch,
                    "scheduler": scheduler.state_dict(),
                    "val_history": tracker.val_history,
                },
            )

        writer.log_epoch(
            epoch,
            {
                "train/loss": train_loss,
                "train/val_loss": val_score,
                "train/val_loss_raw": raw_val_score,
                "train/val_loss_ema": ema_val_score,
                "train/lr": new_lr,
                "train/mean_abs_shift": mean_abs_shift,
                "train/max_abs_shift": max_abs_shift,
                "train/grad_norm": grad_norm,
            },
            sr0=sr0,
            hr0=hr0,
        )
        if is_primary:
            print(
                f"epoch {epoch}/{num_epochs} loss={train_loss:.4f} "
                f"val={val_score:.4f} best={tracker.best_score:.4f} lr={new_lr:.2e} "
                f"({time.time() - t0:.1f}s)",
                flush=True,
            )
        if early_stop:
            if is_primary:
                print(
                    f"early stop at epoch {epoch}: no val improvement since "
                    f"epoch {tracker.best_epoch} (patience {tracker.patience})",
                    flush=True,
                )
            break
        if max_steps is not None and steps_done >= max_steps:
            break

    writer.close()
    ckpt.wait()
    out = {
        "params": tracker.best["params"],
        "batch_stats": tracker.best["batch_stats"],
        "best_score": tracker.best_score,
        "best_epoch": tracker.best_epoch,
        "val_history": tracker.val_history,
        "run_dir": run_dir,
    }
    if state.ema_params is not None:
        # EMA-vs-raw selection evidence (RECIPE_REPORT's win-or-retire
        # question needs to see WHICH weights the dual selection shipped)
        out["ema_selection"] = {
            "best_from": tracker.best_source,
            "epochs_ema_better": tracker.ema_wins,
            "epochs_raw_better": tracker.raw_wins,
        }
    return out
