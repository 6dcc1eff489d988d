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
"""

from __future__ import annotations

import datetime
import os
import time
from typing import Any, Dict, Optional

import jax
import numpy as np

from highresnet_tpu.data.collate import collate
from highresnet_tpu.data.pipeline import BatchLoader
from highresnet_tpu.data.probav import (
    discover_scenes,
    read_baseline_cpsnr,
    read_imageset,
    train_val_split,
)
from highresnet_tpu.models.hrnet import HRNet
from highresnet_tpu.models.shiftnet import ShiftNet
from highresnet_tpu.parallel.mesh import make_mesh, shard_batch
from highresnet_tpu.train.checkpoint import CheckpointManager
from highresnet_tpu.train.schedule import ReduceLROnPlateau
from highresnet_tpu.train.state import create_train_state
from highresnet_tpu.train.step import build_eval_step, build_train_step


def _run_dir_name(t: Dict[str, Any]) -> str:
    stamp = f"{datetime.datetime.now():%Y-%m-%d-%H-%M-%S-%f}"
    return (
        f"batch_{t['batch_size']}_views_{t['n_views']}_min_{t['min_L']}"
        f"_beta_{t['beta']}_time_{stamp}"
    )


def evaluate_model(
    params_hrnet,
    eval_step,
    val_scenes,
    min_l: int,
    baseline_cpsnrs: Optional[Dict[str, float]],
    top_k: int,
    beta: float,
    batch_size: int = 1,
    mesh=None,
) -> float:
    """Validation score over full-resolution scenes.

    With norm.csv: mean of ESA/model cPSNR ratios (lower is better, <1
    beats the ESA baseline). Without: mean of -shift_cPSNR.
    """
    # dispatch all eval batches first, read scores back once at the end
    # (device transports with high readback latency would otherwise sync
    # once per batch)
    pending = []  # (names, device scores)
    for start in range(0, len(val_scenes), batch_size):
        dirs = val_scenes[start : start + batch_size]
        sets = [read_imageset(d, top_k=top_k, beta=beta) for d in dirs]
        batch = collate(sets, min_l)
        args = (batch.lrs, batch.alphas, batch.hrs, batch.hr_maps)
        if mesh is not None and len(dirs) == batch_size:
            args = shard_batch(mesh, args)
        _, scores = eval_step(params_hrnet, *args)
        pending.append((batch.names, scores))

    total = 0.0
    n = 0
    for names, scores in pending:
        scores = np.asarray(scores)
        for name, s in zip(names, scores):
            if baseline_cpsnrs is not None:
                total += baseline_cpsnrs[name] / float(s)
            else:
                total -= float(s)
            n += 1
    return total / max(n, 1)


def train_and_get_best_model(
    config: Dict[str, Any],
    max_steps: Optional[int] = None,
    run_dir: Optional[str] = None,
) -> Dict[str, Any]:
    """Train HRNet+ShiftNet; checkpoint and return the best weights.

    Returns {'params': ..., 'batch_stats': ..., 'best_score': float,
    'run_dir': str}.
    """
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
    # NOTE multi-host: this loop is single-controller. True multi-process
    # training additionally needs jax.make_array_from_process_local_data
    # over equal-length per-host shards (data.pipeline.shard_for_hosts) and
    # host-synchronized step counts; wiring that is out of scope here.

    mesh = None
    if t.get("data_parallel", True) and jax.device_count() > 1:
        n = jax.device_count()
        while t["batch_size"] % n:
            n -= 1
        if n > 1:
            mesh = make_mesh(n_devices=n)

    loader = BatchLoader(
        train_list,
        batch_size=t["batch_size"],
        min_l=t["min_L"],
        top_k=t["n_views"],
        beta=t["beta"],
        create_patches=t.get("create_patches", True),
        patch_size=t["patch_size"],
        seed=seed,
        num_workers=t.get("n_workers", 4),
        drop_last=mesh is not None,
    )

    # --- models / state -------------------------------------------------------
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if t.get("compute_dtype") == "bfloat16" else jnp.float32
    hrnet = HRNet(config=config["network"], dtype=dtype)
    shiftnet = ShiftNet(dtype=dtype)
    state = create_train_state(hrnet, shiftnet, config, jax.random.PRNGKey(seed))

    train_step = build_train_step(hrnet, shiftnet, config, mesh=mesh)
    eval_step = build_eval_step(hrnet, config, mesh=None)  # val batch=1 default

    if run_dir is None:
        run_dir = os.path.join(paths["checkpoint_dir"], _run_dir_name(t))
    ckpt = CheckpointManager(run_dir)
    scheduler = ReduceLROnPlateau(t["lr"], factor=t["lr_decay"], patience=t["lr_step"])

    writer = None
    tb_dir = paths.get("tb_log_file_dir")
    if tb_dir:
        try:
            from tensorboardX import SummaryWriter

            writer = SummaryWriter(os.path.join(tb_dir, os.path.basename(run_dir)))
        except ImportError:
            pass

    # --- resume ---------------------------------------------------------------
    restored, host_state = ckpt.restore_state(state)
    start_epoch = 1
    best_score = float("inf")
    if restored is not None:
        state = restored
        start_epoch = host_state.get("epoch", 0) + 1
        best_score = host_state.get("best_score", float("inf"))
        if "scheduler" in host_state:
            scheduler.load_state_dict(host_state["scheduler"])
        state = state.with_learning_rate(scheduler.lr)

    best = jax.device_get({"params": state.params, "batch_stats": state.batch_stats})
    steps_done = 0
    num_epochs = t["num_epochs"]

    for epoch in range(start_epoch, num_epochs + 1):
        # accumulate the loss ON DEVICE: reading a scalar back per step
        # would force a host sync every step (very expensive on remote
        # device transports); one readback per epoch instead
        epoch_loss_dev = None
        n_seen = 0
        t0 = time.time()
        for batch in loader:
            args = (batch.lrs, batch.alphas, batch.hrs, batch.hr_maps)
            if mesh is not None:
                args = shard_batch(mesh, args)
            state, metrics = train_step(state, *args)
            contrib = metrics["loss"] * len(batch.names)
            epoch_loss_dev = contrib if epoch_loss_dev is None else epoch_loss_dev + contrib
            n_seen += len(batch.names)
            steps_done += 1
            if max_steps is not None and steps_done >= max_steps:
                break
        train_loss = float(epoch_loss_dev) / max(n_seen, 1) if n_seen else 0.0

        val_score = evaluate_model(
            state.params["hrnet"],
            eval_step,
            val_list,
            t["min_L"],
            baseline,
            top_k=t["n_views"],
            beta=t["beta"],
            batch_size=t.get("eval_batch_size", 1),
        )

        if val_score < best_score:
            best_score = val_score
            # snapshot to host: the next train_step DONATES state buffers
            # (donate_argnums), so keeping device references would return
            # deleted arrays whenever the best epoch isn't the last one
            best = jax.device_get(
                {"params": state.params, "batch_stats": state.batch_stats}
            )
            ckpt.save_best(best["params"], best["batch_stats"], best_score)

        new_lr = scheduler.step(val_score)
        state = state.with_learning_rate(new_lr)

        # full resumable state every `checkpoint_every` epochs (async save);
        # 0 = best-weights-only during the run, one final state save at exit
        every = t.get("checkpoint_every", 1)
        stopping = (epoch == num_epochs) or (max_steps is not None and steps_done >= max_steps)
        if (every > 0 and epoch % every == 0) or stopping:
            ckpt.save_state(
                state,
                {"epoch": epoch, "best_score": best_score, "scheduler": scheduler.state_dict()},
            )

        if writer is not None:
            writer.add_scalar("train/loss", train_loss, epoch)
            writer.add_scalar("train/val_loss", val_score, epoch)
            writer.add_scalar("train/lr", new_lr, epoch)
        print(
            f"epoch {epoch}/{num_epochs} loss={train_loss:.4f} "
            f"val={val_score:.4f} best={best_score:.4f} lr={new_lr:.2e} "
            f"({time.time() - t0:.1f}s)",
            flush=True,
        )
        if max_steps is not None and steps_done >= max_steps:
            break

    if writer is not None:
        writer.close()
    ckpt.wait()
    return {
        "params": best["params"],
        "batch_stats": best["batch_stats"],
        "best_score": best_score,
        "run_dir": run_dir,
    }
