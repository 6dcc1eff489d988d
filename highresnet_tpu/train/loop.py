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
from highresnet_tpu.models.hrnet import HRNet
from highresnet_tpu.models.shiftnet import ShiftNet
from highresnet_tpu.parallel.distributed import (
    broadcast_string,
    is_multihost,
    make_global_batch,
    maybe_initialize,
    replicate_to_mesh,
)
from highresnet_tpu.parallel.mesh import put_with_specs, shard_batch
from highresnet_tpu.train.checkpoint import CheckpointManager
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
    build_train_loader,
    maybe_warmstart_shiftnet,
    setup_mesh,
)
from highresnet_tpu.train.state import create_train_state
from highresnet_tpu.train.step import build_eval_step, build_train_step
from highresnet_tpu.train.tb import TBWriter

from jax.sharding import PartitionSpec as _P

# 2-D (data x view) layout: the LR stack's view axis is sharded too, so the
# encoder's folded (B*L) conv batch spans both mesh axes; HR targets only
# have a batch axis (SURVEY.md §2: the view axis is the one to shard as L
# grows; same specs as __graft_entry__.dryrun_multichip's 2-D leg)
_BATCH_SPECS_2D = (
    _P("data", "view", None, None),
    _P("data", "view"),
    _P("data", None, None),
    _P("data", None, None),
)


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

    # --- models / state -------------------------------------------------------
    from highresnet_tpu.models.hrnet import resolve_compute_dtypes

    dtype, decoder_dtype = resolve_compute_dtypes(t.get("compute_dtype"))
    net_config = config["network"]
    if mesh is not None and net_config.get("recursive", {}).get("use_pallas_pack") is None:
        # a Pallas call cannot be auto-partitioned by the SPMD compiler, so
        # mesh-sharded training pins the XLA pair-pack path unless the
        # config explicitly opts in (single-chip runs keep the kernel)
        import copy as _copy

        net_config = _copy.deepcopy(net_config)
        net_config.setdefault("recursive", {})["use_pallas_pack"] = False
    hrnet = HRNet(config=net_config, dtype=dtype, decoder_dtype=decoder_dtype)
    shiftnet = ShiftNet(dtype=dtype)
    state = create_train_state(hrnet, shiftnet, config, jax.random.PRNGKey(seed))
    state = maybe_warmstart_shiftnet(state, shiftnet, t, train_list, seed, is_primary)

    if multihost:
        # identical seeded init on every process -> replicate onto the
        # global mesh (grads then all-reduce over ICI within a host and
        # DCN across hosts, inserted by jit)
        state = replicate_to_mesh(mesh, state)

    train_step = build_train_step(hrnet, shiftnet, config, mesh=mesh, shard_views=shard_views)
    # registration curriculum: train the fusion model WITHOUT loss-time
    # registration for the first N epochs, then enable it — lets HRNet form
    # a stable output frame before ShiftNet's predictions steer the loss
    register_warmup = int(t.get("register_warmup_epochs", 0) or 0)
    warm_train_step = None
    if register_warmup > 0 and t.get("register", True):
        import copy as _copy

        warm_cfg = _copy.deepcopy(config)
        warm_cfg["training"]["register"] = False
        warm_train_step = build_train_step(
            hrnet, shiftnet, warm_cfg, mesh=mesh, shard_views=shard_views
        )
    # the eval step rides the same mesh when the eval batch divides it
    # (padded final batches keep the compiled shape static); batch=1
    # stays single-device like the reference val loop (src/train.py:284)
    eval_batch = t.get("eval_batch_size", 1)
    eval_mesh = None
    if mesh is not None and eval_batch > 1:
        # round the eval batch UP to a multiple of the DATA axis so the
        # sharded eval step always engages on a mesh (evaluate_model pads
        # short batches to the static compiled shape, so any val-set size
        # works); the old divisibility requirement silently fell back to
        # one-device eval on any pod with more devices than eval_batch_size.
        # On a 2-D (data x view) mesh, eval shards scenes over 'data' only
        n_dev = mesh.shape["data"]
        eval_batch = ((eval_batch + n_dev - 1) // n_dev) * n_dev
        eval_mesh = mesh
    eval_step = build_eval_step(hrnet, config, mesh=eval_mesh, replicate_out=multihost)

    # pre-collate the (fixed) validation set once: per-epoch re-read +
    # re-collate dominated epoch wall-clock at paper scale on a 1-core
    # host, and per-epoch re-SAMPLING of eval views made the val score —
    # and hence best-model selection — noisy. Seeded rng => deterministic
    # across epochs and runs. training.cache_val_batches=false restores
    # the reference's stochastic per-epoch behavior (src/train.py:284).
    val_batches = None
    if t.get("cache_val_batches", True):
        val_batches = build_val_batches(
            val_list,
            t["min_L"],
            t["n_views"],
            t["beta"],
            eval_batch,
            rng=np.random.default_rng(seed + 10007),
        )

    def eval_params_hrnet(params_hrnet, sample_rng, return_images=False):
        """One val pass with the run's fixed evaluation plumbing."""
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
            return_images=return_images,
            prebuilt_batches=val_batches,
            sample_rng=sample_rng,
        )

    if run_dir is None:
        run_dir = os.path.join(paths["checkpoint_dir"], _run_dir_name(t))
        if multihost:  # per-host clocks would mint different names
            run_dir = broadcast_string(run_dir)
    ckpt = CheckpointManager(run_dir)
    scheduler = ReduceLROnPlateau(t["lr"], factor=t["lr_decay"], patience=t["lr_step"])
    writer = TBWriter(paths.get("tb_log_file_dir"), os.path.basename(run_dir),
                      enabled=is_primary)

    # --- resume ---------------------------------------------------------------
    # multi-host: every process restores from the same (shared-storage)
    # run_dir so train states stay identical; process 0 alone writes
    restored, host_state = ckpt.restore_state(state)
    if multihost and restored is not None:
        restored = replicate_to_mesh(mesh, restored)
    start_epoch = 1
    # with training.ema_decay > 0, validation and best-model selection score
    # the EMA weights (state.eval_params); otherwise the raw ones
    tracker = BestTracker(ckpt, patience=t.get("early_stop_patience", 0))
    tracker.seed(
        jax.device_get({"params": state.eval_params, "batch_stats": state.batch_stats})
    )
    if restored is not None:
        state = restored
        start_epoch = host_state.get("epoch", 0) + 1
        # older checkpoints lack best_epoch; seeding it with the restored
        # epoch is conservative (a resume never instantly early-stops)
        best = tracker.best
        try:
            # ANY resume must seed from the SAVED best weights: the restored
            # best_score belongs to the epoch that wrote best/, and if the
            # remaining epochs never beat it (or the loop won't run at all
            # after a relaunch of a finished run), returning the restored
            # CURRENT state would mislabel non-best weights with the score
            best = ckpt.load_best(best)
        except Exception:
            pass  # no best saved yet (e.g. killed before the first eval)
        tracker.seed(
            best,
            host_state.get("best_score", float("inf")),
            host_state.get("best_epoch", start_epoch - 1),
        )
        if "scheduler" in host_state:
            scheduler.load_state_dict(host_state["scheduler"])
        state = state.with_learning_rate(scheduler.lr)

    # host-array placement for each train batch (identity off-mesh)
    if multihost:
        # each host contributes its local shard of the global batch
        feed = lambda args: make_global_batch(mesh, args, _BATCH_SPECS)
    elif shard_views:
        feed = lambda args: put_with_specs(mesh, args, _BATCH_SPECS_2D)
    elif mesh is not None:
        feed = lambda args: shard_batch(mesh, args)
    else:
        feed = lambda args: args

    steps_done = 0
    num_epochs = t["num_epochs"]
    _warp_warned = False
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

        _warp_warned = warn_warp_window(t, max_abs_shift, epoch, _warp_warned)

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
