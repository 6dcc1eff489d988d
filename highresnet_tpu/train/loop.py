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
import warnings
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from highresnet_tpu.data.collate import collate
from highresnet_tpu.data.pipeline import BatchLoader, shard_for_hosts
from highresnet_tpu.data.probav import (
    discover_scenes,
    read_baseline_cpsnr,
    read_imageset,
    train_val_split,
)
from highresnet_tpu.models.hrnet import HRNet
from highresnet_tpu.models.shiftnet import ShiftNet
from highresnet_tpu.parallel.distributed import (
    broadcast_string,
    global_from_replicated,
    is_multihost,
    make_global_batch,
    maybe_initialize,
    replicate_to_mesh,
)
from highresnet_tpu.parallel.mesh import make_mesh, put_with_specs, shard_batch
from highresnet_tpu.train.checkpoint import CheckpointManager
from highresnet_tpu.train.schedule import ReduceLROnPlateau
from highresnet_tpu.train.state import create_train_state
from highresnet_tpu.train.step import build_eval_step, build_train_step

# (lrs, alphas, hrs, hr_maps) partition specs: batch axis over 'data'
from jax.sharding import PartitionSpec as _P

_BATCH_SPECS = (
    _P("data", None, None, None),
    _P("data", None),
    _P("data", None, None),
    _P("data", None, None),
)

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


def warp_window_px(t: Dict[str, Any]) -> float:
    """Accurate range of the loss-time Lanczos warp for this config.

    ±3 px for the reference-exact single 7-tap pass
    (/root/reference/src/lanczos.py:62-101); ±(K + 0.5) px with
    training.warp_int_range = K (integer/fractional decomposition,
    ops/lanczos.py)."""
    k = int(t.get("warp_int_range", 0) or 0)
    return 3.0 if k <= 0 else k + 0.5


def warn_warp_window(
    t: Dict[str, Any], max_abs_shift: float, epoch: int, already_warned: bool
) -> bool:
    """Warn (once per run) when a predicted shift leaves the warp window.

    Shifts beyond the window silently degrade the registered loss — the
    REGISTER_ABLATION.json protocol-3 failure mode — so leaving it must be
    LOUD. Returns the updated already_warned flag."""
    if already_warned or not t.get("register", True):
        return already_warned
    window = warp_window_px(t)
    if max_abs_shift > window:
        warnings.warn(
            f"epoch {epoch}: predicted registration shift "
            f"{max_abs_shift:.2f} px exceeds the warp's accurate window "
            f"(±{window:.1f} px) — the registered loss is degrading "
            "alignments it cannot express. Raise training.warp_int_range "
            "or reduce the misalignment scale."
        )
        return True
    return already_warned


def _run_dir_name(t: Dict[str, Any]) -> str:
    stamp = f"{datetime.datetime.now():%Y-%m-%d-%H-%M-%S-%f}"
    return (
        f"batch_{t['batch_size']}_views_{t['n_views']}_min_{t['min_L']}"
        f"_beta_{t['beta']}_time_{stamp}"
    )


def build_val_batches(
    val_scenes,
    min_l: int,
    top_k: int,
    beta: float,
    batch_size: int,
    rng=None,
):
    """Pre-collate the validation set into static-shape batches.

    The val set is fixed, so reading + collating it once and replaying the
    arrays every epoch removes the per-epoch host cost (at paper scale the
    repeated decode/collate dominated epoch wall-clock on a 1-core host).
    A seeded ``rng`` freezes the clearance-sampled view selection, making
    the val score deterministic across epochs AND runs — a deliberate
    divergence from the reference, whose val loader re-samples views every
    epoch (src/train.py:284 + DataLoader.py:127): noisy val scores make
    best-model selection itself noisy. Opt out with
    ``training.cache_val_batches: false``.
    """
    out = []
    for start in range(0, len(val_scenes), batch_size):
        dirs = val_scenes[start : start + batch_size]
        sets = [read_imageset(d, top_k=top_k, beta=beta, rng=rng) for d in dirs]
        n_real = len(sets)
        if n_real < batch_size:  # pad to the compiled static batch shape
            sets = sets + [sets[-1]] * (batch_size - n_real)
        batch = collate(sets, min_l)
        out.append(
            (batch.names[:n_real], (batch.lrs, batch.alphas, batch.hrs, batch.hr_maps))
        )
    return out


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
    return_images: bool = False,
    prebuilt_batches=None,
    sample_rng=None,
):
    """Validation score over full-resolution scenes.

    With norm.csv: mean of ESA/model cPSNR ratios (lower is better, <1
    beats the ESA baseline). Without: mean of -shift_cPSNR.

    Scenes absent from norm.csv or scoring a nonpositive cPSNR are skipped
    with a warning instead of crashing / poisoning the mean (the reference
    KeyErrors on the former and divides by the latter, src/train.py:214-215).

    A ragged final batch is padded (by repeating the last scene) to keep
    the eval step's compiled shape static — required both for one-program
    execution and for mesh-sharded eval; padded scores are discarded.

    With return_images=True also returns (sr0, hr0) of the first scene for
    TensorBoard image logging (reference: src/train.py:226-228).
    """
    # dispatch all eval batches first, read scores back once at the end
    # (device transports with high readback latency would otherwise sync
    # once per batch)
    batches = prebuilt_batches
    if batches is None:
        # sample_rng seeds the clearance-based view sampling; callers that
        # run in multi-host programs MUST pass one seeded identically on
        # every process, or hosts would score different view draws and
        # disagree on val-driven control flow (early stop, best selection)
        batches = build_val_batches(
            val_scenes, min_l, top_k, beta, batch_size, rng=sample_rng
        )
    pending = []  # (names, device scores)
    first_srs = None
    first_hr = None
    for names, host_args in batches:
        args = host_args
        if mesh is not None:
            if is_multihost():
                # every host loads the full val batch; cut global arrays
                # out of the replicated copies (no cross-host input moves)
                args = global_from_replicated(mesh, args, _BATCH_SPECS)
            else:
                args = shard_batch(mesh, args)
        srs, scores = eval_step(params_hrnet, *args)
        if return_images and first_srs is None:
            first_srs = srs  # device ref; fetched once below
            first_hr = host_args[2][0]  # hrs of the first batch
        pending.append((names, scores))

    total = 0.0
    n = 0
    for names, scores in pending:
        scores = np.asarray(scores)
        for name, s in zip(names, scores):
            s = float(s)
            if baseline_cpsnrs is not None and name not in baseline_cpsnrs:
                warnings.warn(f"scene {name!r} missing from norm.csv; skipped in val score")
                continue
            if s <= 0.0 or not np.isfinite(s):
                warnings.warn(f"scene {name!r} scored non-positive cPSNR {s}; skipped")
                continue
            if baseline_cpsnrs is not None:
                total += baseline_cpsnrs[name] / s
            else:
                total -= s
            n += 1
    if n == 0:
        warnings.warn("no scorable validation scenes; returning +inf val score")
    score = total / n if n else float("inf")
    if return_images:
        sr0 = np.asarray(first_srs[0]) if first_srs is not None else None
        return score, sr0, first_hr
    return score


def train_and_get_best_model(
    config: Dict[str, Any],
    max_steps: Optional[int] = None,
    run_dir: Optional[str] = None,
) -> Dict[str, Any]:
    """Train HRNet+ShiftNet; checkpoint and return the best weights.

    Returns {'params': ..., 'batch_stats': ..., 'best_score': float,
    'run_dir': str}.
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
    mesh = None
    shard_views = False
    mesh_cfg = t.get("mesh")
    if mesh_cfg and multihost:
        raise ValueError(
            "training.mesh (explicit 2-D layout) is a single-controller "
            "feature; multi-host runs use the 1-D per-host data layout"
        )
    if mesh_cfg and not multihost:
        # explicit layout: training.mesh = {"data": N, "view": M} shards
        # scenes over 'data' and the LR view axis over 'view'
        dp = int(mesh_cfg.get("data", 1))
        vp = int(mesh_cfg.get("view", 1))
        if dp * vp > jax.device_count():
            raise ValueError(
                f"training.mesh data*view = {dp}*{vp} exceeds the "
                f"{jax.device_count()} available devices"
            )
        if t["batch_size"] % dp:
            raise ValueError(f"batch_size {t['batch_size']} must divide over data={dp}")
        if t["min_L"] % vp:
            raise ValueError(f"min_L {t['min_L']} must divide over view={vp}")
        mesh = make_mesh(n_devices=dp * vp, shape=(dp, vp), axis_names=("data", "view"))
        shard_views = vp > 1
    elif multihost:
        # every process feeds its own shard; the mesh must span ALL
        # devices and the GLOBAL batch must divide evenly
        if t["batch_size"] % jax.device_count():
            raise ValueError(
                f"multi-host training needs batch_size divisible by the "
                f"global device count ({t['batch_size']} % {jax.device_count()})"
            )
        mesh = make_mesh()  # all global devices, 1-D 'data' axis
    elif t.get("data_parallel", True) and jax.device_count() > 1:
        n = jax.device_count()
        while t["batch_size"] % n:
            n -= 1
        if n > 1:
            mesh = make_mesh(n_devices=n)

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

    loader = BatchLoader(
        local_train_list,
        batch_size=local_batch_size,
        min_l=t["min_L"],
        top_k=t["n_views"],
        beta=t["beta"],
        create_patches=t.get("create_patches", True),
        patch_size=t["patch_size"],
        shuffle=t.get("shuffle", True),
        seed=seed + 7919 * proc,  # decorrelate per-host view/patch sampling
        num_workers=t.get("n_workers", 4),
        drop_last=mesh is not None,
        # D4 train-time augmentation (extension; the reference never
        # flips/rotates — data/augment.py). Off by default.
        augment=t.get("augment_dihedral", False),
        # variable-L training (one checkpoint serving 1..L views); off by
        # default (reference-exact fixed-L batches)
        variable_views_p=float(t.get("variable_views_p", 0.0) or 0.0),
    )

    # optional pre-collated epoch cache: trades sampling freshness
    # (n_variants epoch realizations, cycled) for a decode-free, mmap-served
    # input path — headroom for consumers faster than the 1-core live
    # pipeline (config: training.epoch_cache_variants > 0)
    cache_variants = int(t.get("epoch_cache_variants", 0) or 0)
    if cache_variants > 0:
        from highresnet_tpu.data.pipeline import EpochCache

        proto_key = (
            f"b{local_batch_size}_L{t['min_L']}_k{t['n_views']}_p{t['patch_size']}"
            f"_c{int(t.get('create_patches', True))}_sh{int(t.get('shuffle', True))}"
            f"_d{int(mesh is not None)}_s{seed}_h{proc}_n{len(local_train_list)}"
            f"_a{int(t.get('augment_dihedral', False))}_be{t['beta']:g}"
            f"_vv{float(t.get('variable_views_p', 0.0) or 0.0):g}"
        )
        cache_dir = os.path.join(
            t.get("epoch_cache_dir") or os.path.join(data_dir, ".epoch_cache"), proto_key
        )
        loader = EpochCache(loader, cache_dir, n_variants=cache_variants)

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

    # ShiftNet warm-start: supervised pretraining on known Lanczos shifts
    # before joint training (fixes the joint-bootstrap failure at
    # multi-pixel misalignment, REGISTER_ABLATION.json protocol 3). Runs
    # BEFORE mesh replication, from the GLOBAL scene list with a fixed
    # seed, so every host computes the identical warm-started state.
    warmup_steps = int(t.get("shiftnet_warmup_steps", 0) or 0)
    if warmup_steps > 0 and t.get("register", True):
        from highresnet_tpu.train.pretrain import hr_crop_pool, pretrain_shiftnet

        register_size = t.get("register_size", 128)
        pool = hr_crop_pool(train_list, register_size)
        sn_params, sn_stats, rmse = pretrain_shiftnet(
            shiftnet,
            state.params["shiftnet"],
            state.batch_stats,
            pool,
            jax.random.PRNGKey(seed + 1),
            steps=warmup_steps,
            sigma=t.get("shiftnet_warmup_sigma", 1.5),
        )
        state = state.replace(
            params={**state.params, "shiftnet": sn_params}, batch_stats=sn_stats
        )
        if state.ema_params is not None:
            # the EMA tracks from the warm-started point, not the cold init
            state = state.replace(
                ema_params={**state.ema_params, "shiftnet": jax.tree_util.tree_map(
                    jnp.copy, sn_params
                )}
            )
        if is_primary:
            print(
                f"shiftnet warm-start: {warmup_steps} steps on {len(pool)} HR "
                f"crops, final shift RMSE {rmse:.3f} px",
                flush=True,
            )

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

    if run_dir is None:
        run_dir = os.path.join(paths["checkpoint_dir"], _run_dir_name(t))
        if multihost:  # per-host clocks would mint different names
            run_dir = broadcast_string(run_dir)
    ckpt = CheckpointManager(run_dir)
    scheduler = ReduceLROnPlateau(t["lr"], factor=t["lr_decay"], patience=t["lr_step"])

    writer = None
    tb_dir = paths.get("tb_log_file_dir")
    if tb_dir and is_primary:
        try:
            from tensorboardX import SummaryWriter

            writer = SummaryWriter(os.path.join(tb_dir, os.path.basename(run_dir)))
        except ImportError:
            pass

    # --- resume ---------------------------------------------------------------
    # multi-host: every process restores from the same (shared-storage)
    # run_dir so train states stay identical; process 0 alone writes
    restored, host_state = ckpt.restore_state(state)
    if multihost and restored is not None:
        restored = replicate_to_mesh(mesh, restored)
    start_epoch = 1
    best_score = float("inf")
    best_epoch = 0
    if restored is not None:
        state = restored
        start_epoch = host_state.get("epoch", 0) + 1
        best_score = host_state.get("best_score", float("inf"))
        # older checkpoints lack best_epoch; seeding it with the restored
        # epoch is conservative (a resume never instantly early-stops)
        best_epoch = host_state.get("best_epoch", start_epoch - 1)
        if "scheduler" in host_state:
            scheduler.load_state_dict(host_state["scheduler"])
        state = state.with_learning_rate(scheduler.lr)

    # with training.ema_decay > 0, validation and best-model selection score
    # the EMA weights (state.eval_params); otherwise the raw ones
    best = jax.device_get({"params": state.eval_params, "batch_stats": state.batch_stats})
    steps_done = 0
    num_epochs = t["num_epochs"]
    if restored is not None:
        # ANY resume must seed `best` from the SAVED best weights: the
        # restored best_score belongs to the epoch that wrote best/, and if
        # the remaining epochs never beat it (or the loop won't run at all
        # after a relaunch of a finished run), returning the restored
        # CURRENT state would mislabel non-best weights with the best score
        try:
            best = ckpt.load_best(best)
        except Exception:
            pass  # no best saved yet (e.g. killed before the first eval)

    _warp_warned = False
    for epoch in range(start_epoch, num_epochs + 1):
        step_fn = (
            warm_train_step
            if (warm_train_step is not None and epoch <= register_warmup)
            else train_step
        )
        # accumulate the loss ON DEVICE: reading a scalar back per step
        # would force a host sync every step (very expensive on remote
        # device transports); one readback per epoch instead
        epoch_dev = None  # stacked (loss*n, mean_abs_shift, grad_norm) on device
        n_seen = 0
        n_steps_epoch = 0
        t0 = time.time()
        for batch in loader:
            args = (batch.lrs, batch.alphas, batch.hrs, batch.hr_maps)
            if multihost:
                # each host contributes its local shard of the global batch
                args = make_global_batch(mesh, args, _BATCH_SPECS)
            elif shard_views:
                args = put_with_specs(mesh, args, _BATCH_SPECS_2D)
            elif mesh is not None:
                args = shard_batch(mesh, args)
            state, metrics = step_fn(state, *args)
            contrib = jnp.stack(
                [
                    metrics["loss"] * len(batch.names),
                    metrics["mean_abs_shift"],
                    metrics["grad_norm"],
                    # slot 3 accumulates by MAX (warp-window guard), not sum
                    metrics.get("max_abs_shift", metrics["mean_abs_shift"]),
                ]
            )
            if epoch_dev is None:
                epoch_dev = contrib
            else:
                epoch_dev = jnp.concatenate(
                    [epoch_dev[:3] + contrib[:3], jnp.maximum(epoch_dev[3:], contrib[3:])]
                )
            n_seen += len(batch.names)
            n_steps_epoch += 1
            steps_done += 1
            if max_steps is not None and steps_done >= max_steps:
                break
        if n_seen:
            epoch_sums = np.asarray(epoch_dev)  # one host sync per epoch
            train_loss = float(epoch_sums[0]) / n_seen
            mean_abs_shift = float(epoch_sums[1]) / n_steps_epoch
            grad_norm = float(epoch_sums[2]) / n_steps_epoch
            max_abs_shift = float(epoch_sums[3])
        else:
            train_loss = mean_abs_shift = grad_norm = max_abs_shift = 0.0

        _warp_warned = warn_warp_window(t, max_abs_shift, epoch, _warp_warned)

        # fetch the first val SR only when a writer will log it (an image
        # readback per epoch is wasted bandwidth on remote transports)
        # cache_val_batches=false: re-sample views each epoch like the
        # reference, but from an epoch-seeded rng so (a) every host of a
        # multi-host run draws the same views (val-driven control flow —
        # early stop, best selection — must agree across processes) and
        # (b) the raw and EMA candidates below score the SAME draw
        epoch_val_rng = (
            None if val_batches is not None
            else np.random.default_rng((seed, 1000003, epoch))
        )
        val_out = evaluate_model(
            state.eval_params["hrnet"],
            eval_step,
            val_list,
            t["min_L"],
            baseline,
            top_k=t["n_views"],
            beta=t["beta"],
            batch_size=eval_batch,
            mesh=eval_mesh,
            return_images=writer is not None,
            prebuilt_batches=val_batches,
            sample_rng=epoch_val_rng,
        )
        if writer is not None:
            val_score, sr0, hr0 = val_out
        else:
            val_score, sr0, hr0 = val_out, None, None

        # with EMA on, score the RAW weights too and let best-model
        # selection take whichever wins. An EMA at decay d lags ~1/(1-d)
        # steps behind; in a peak-then-overfit regime that lag alone can
        # cost the EMA the peak (measured: the ema arm of the recipe
        # experiment peaked 0.8 dB below its raw trajectory), so shipping
        # the EMA unconditionally makes ema_decay a risky knob. Scoring
        # both makes it at-worst-neutral for one extra (cached,
        # decode-free) val pass per epoch.
        ema_val_score = None
        raw_val_score = None
        if state.ema_params is not None:
            ema_val_score = val_score
            raw_val_score = evaluate_model(
                state.params["hrnet"],
                eval_step,
                val_list,
                t["min_L"],
                baseline,
                top_k=t["n_views"],
                beta=t["beta"],
                batch_size=eval_batch,
                mesh=eval_mesh,
                prebuilt_batches=val_batches,
                # fresh rng, same seed tuple: identical draw to the EMA eval
                sample_rng=(
                    None if val_batches is not None
                    else np.random.default_rng((seed, 1000003, epoch))
                ),
            )

        cand_score, cand_params = val_score, state.eval_params
        if raw_val_score is not None and raw_val_score < cand_score:
            cand_score, cand_params = raw_val_score, state.params
        if cand_score < best_score:
            best_score = cand_score
            best_epoch = epoch
            # snapshot to host: the next train_step DONATES state buffers
            # (donate_argnums), so keeping device references would return
            # deleted arrays whenever the best epoch isn't the last one
            best = jax.device_get(
                {"params": cand_params, "batch_stats": state.batch_stats}
            )
            # collective in multi-host runs: EVERY process participates
            # (Orbax coordinates; the primary host does the writing)
            ckpt.save_best(best["params"], best["batch_stats"], best_score)

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
        # no val improvement; 0 = off, the reference-exact behavior). At
        # synthetic-data scale runs spend most epochs past their val peak
        # with best-model selection doing the rescue — stopping there saves
        # the chip time. Deterministic across hosts: every process scores
        # the same replicated val number, so all break on the same epoch.
        patience = int(t.get("early_stop_patience", 0) or 0)
        early_stop = patience > 0 and (epoch - best_epoch) >= patience

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
                    "best_score": best_score,
                    "best_epoch": best_epoch,
                    "scheduler": scheduler.state_dict(),
                },
            )

        if writer is not None:
            writer.add_scalar("train/loss", train_loss, epoch)
            writer.add_scalar("train/val_loss", val_score, epoch)
            if raw_val_score is not None:
                writer.add_scalar("train/val_loss_raw", raw_val_score, epoch)
                writer.add_scalar("train/val_loss_ema", ema_val_score, epoch)
            writer.add_scalar("train/lr", new_lr, epoch)
            writer.add_scalar("train/mean_abs_shift", mean_abs_shift, epoch)
            writer.add_scalar("train/max_abs_shift", max_abs_shift, epoch)
            writer.add_scalar("train/grad_norm", grad_norm, epoch)
            if sr0 is not None:
                # reference logs the first val SR min-max normalized and the
                # raw HR-SR error map each epoch (src/train.py:226-228)
                sr0 = np.asarray(sr0, np.float32)
                lo, hi = float(sr0.min()), float(sr0.max())
                norm = (sr0 - lo) / max(hi - lo, 1e-12)
                writer.add_image("SR Image", norm, epoch, dataformats="HW")
                writer.add_image(
                    "Error Map", np.asarray(hr0, np.float32) - sr0, epoch, dataformats="HW"
                )
        if is_primary:
            print(
                f"epoch {epoch}/{num_epochs} loss={train_loss:.4f} "
                f"val={val_score:.4f} best={best_score:.4f} lr={new_lr:.2e} "
                f"({time.time() - t0:.1f}s)",
                flush=True,
            )
        if early_stop:
            if is_primary:
                print(
                    f"early stop at epoch {epoch}: no val improvement since "
                    f"epoch {best_epoch} (patience {patience})",
                    flush=True,
                )
            break
        if max_steps is not None and steps_done >= max_steps:
            break

    if writer is not None:
        writer.close()
    ckpt.wait()
    return {
        "params": best["params"],
        "batch_stats": best["batch_stats"],
        "best_score": best_score,
        "best_epoch": best_epoch,
        "run_dir": run_dir,
    }
