"""Training-run setup helpers (split out of train/loop.py).

Mesh layout resolution, train-loader construction (with the optional mmap
epoch cache), and the ShiftNet warm-start — each a pure function so
``train_and_get_best_model`` stays orchestration-only.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from highresnet_tpu.data.pipeline import BatchLoader
from highresnet_tpu.parallel.mesh import make_mesh
from highresnet_tpu.train.step import build_eval_step, build_train_step


def setup_mesh(t: Dict[str, Any], multihost: bool):
    """Resolve the device-mesh layout from training config.

    Returns (mesh, shard_views):
    - ``training.mesh = {"data": N, "view": M}``: explicit 2-D layout —
      scenes sharded over 'data' AND the LR view axis over 'view'
      (single-controller only);
    - multi-host: 1-D 'data' mesh over ALL global devices, every process
      feeding its own shard;
    - otherwise: 1-D data parallelism over the largest local device count
      that divides the batch (``training.data_parallel``), or None.
    """
    mesh = None
    shard_views = False
    mesh_cfg = t.get("mesh")
    if mesh_cfg and multihost:
        raise ValueError(
            "training.mesh (explicit 2-D layout) is a single-controller "
            "feature; multi-host runs use the 1-D per-host data layout"
        )
    if mesh_cfg and not multihost:
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
    return mesh, shard_views


def build_train_loader(
    t: Dict[str, Any],
    local_train_list: List[str],
    *,
    seed: int,
    proc: int,
    drop_last: bool,
    data_dir: str,
):
    """Construct the (optionally epoch-cached) training batch loader."""
    local_batch_size = t["batch_size"] // max(1, jax.process_count())
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
        drop_last=drop_last,
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
            f"_d{int(drop_last)}_s{seed}_h{proc}_n{len(local_train_list)}"
            f"_a{int(t.get('augment_dihedral', False))}_be{t['beta']:g}"
            f"_vv{float(t.get('variable_views_p', 0.0) or 0.0):g}"
        )
        cache_dir = os.path.join(
            t.get("epoch_cache_dir") or os.path.join(data_dir, ".epoch_cache"), proto_key
        )
        loader = EpochCache(loader, cache_dir, n_variants=cache_variants)
    return loader


class RunPieces(NamedTuple):
    """Everything model-shaped a training run needs, built in one place."""

    state: Any
    train_step: Any
    warm_train_step: Optional[Any]  # registration-curriculum step (or None)
    register_warmup: int
    eval_step: Any
    eval_batch: int
    eval_mesh: Optional[Any]


def build_models_and_steps(
    config: Dict[str, Any],
    mesh,
    shard_views: bool,
    *,
    multihost: bool,
    seed: int,
    train_list: List[str],
    is_primary: bool,
) -> RunPieces:
    """Construct models, the (warm-started, possibly replicated) train state,
    and the compiled train/eval steps for one run.

    Mesh-aware details handled here so the loop stays orchestration-only:
    Pallas pack is pinned off under SPMD partitioning (a custom call cannot
    be auto-partitioned), the registration curriculum gets its own
    register=False step, and the eval batch is rounded up to the mesh's
    data axis so sharded eval always engages (evaluate_model pads short
    batches to the static compiled shape)."""
    import copy as _copy

    from highresnet_tpu.models.hrnet import HRNet, resolve_compute_dtypes
    from highresnet_tpu.models.shiftnet import ShiftNet
    from highresnet_tpu.parallel.distributed import replicate_to_mesh
    from highresnet_tpu.train.state import create_train_state

    t = config["training"]
    dtype, decoder_dtype = resolve_compute_dtypes(t.get("compute_dtype"))
    net_config = config["network"]
    if mesh is not None and net_config.get("recursive", {}).get("use_pallas_pack") is None:
        net_config = _copy.deepcopy(net_config)
        net_config.setdefault("recursive", {})["use_pallas_pack"] = False
    hrnet = HRNet(config=net_config, dtype=dtype, decoder_dtype=decoder_dtype)
    shiftnet = ShiftNet(dtype=dtype)
    state = create_train_state(hrnet, shiftnet, config, jax.random.PRNGKey(seed))
    init_from = t.get("init_params_from") or ""
    if init_from:
        # fine-tune: seed params/BN stats from another run's best/ snapshot
        # (training.init_params_from = that run's run_dir). The optimizer
        # starts fresh (standard fine-tune practice) and, with EMA on, the
        # EMA tracker starts AT the loaded point (same no-debias convention
        # as create_train_state). Unlike resume, this changes no schedule
        # or epoch bookkeeping — it is a new run that starts from trained
        # weights (e.g. variable-L fine-tuning of a fixed-L checkpoint).
        from highresnet_tpu.train.checkpoint import load_params

        restored = load_params(
            init_from, {"params": state.params, "batch_stats": state.batch_stats}
        )
        state = state.replace(
            params=restored["params"],
            batch_stats=restored.get("batch_stats") or state.batch_stats,
            ema_params=(
                jax.tree_util.tree_map(jnp.copy, restored["params"])
                if state.ema_params is not None
                else None
            ),
        )
        if is_primary:
            print(f"init: params loaded from {init_from}/best", flush=True)
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
        warm_cfg = _copy.deepcopy(config)
        warm_cfg["training"]["register"] = False
        warm_train_step = build_train_step(
            hrnet, shiftnet, warm_cfg, mesh=mesh, shard_views=shard_views
        )

    # the eval step rides the same mesh when eval_batch_size > 1; batch=1
    # stays single-device like the reference val loop (src/train.py:284)
    eval_batch = t.get("eval_batch_size", 1)
    eval_mesh = None
    if mesh is not None and eval_batch > 1:
        # round UP to a multiple of the DATA axis (2-D meshes shard eval
        # over 'data' only); the old divisibility rule silently fell back
        # to one-device eval on pods with more devices than eval_batch_size
        n_dev = mesh.shape["data"]
        eval_batch = ((eval_batch + n_dev - 1) // n_dev) * n_dev
        eval_mesh = mesh
    eval_step = build_eval_step(hrnet, config, mesh=eval_mesh, replicate_out=multihost)
    return RunPieces(
        state, train_step, warm_train_step, register_warmup, eval_step, eval_batch, eval_mesh
    )


def make_feed(mesh, *, multihost: bool, shard_views: bool):
    """Host-array placement for each train batch (identity off-mesh).

    2-D (data x view) layout: the LR stack's view axis is sharded too, so
    the encoder's folded (B*L) conv batch spans both mesh axes; HR targets
    only have a batch axis (SURVEY.md §2: the view axis is the one to shard
    as L grows; same specs as __graft_entry__.dryrun_multichip's 2-D leg).
    """
    from jax.sharding import PartitionSpec as P

    from highresnet_tpu.parallel.distributed import make_global_batch
    from highresnet_tpu.parallel.mesh import put_with_specs, shard_batch
    from highresnet_tpu.train.evaluation import BATCH_SPECS

    specs_2d = (
        P("data", "view", None, None),
        P("data", "view"),
        P("data", None, None),
        P("data", None, None),
    )
    if multihost:
        # each host contributes its local shard of the global batch
        return lambda args: make_global_batch(mesh, args, BATCH_SPECS)
    if shard_views:
        return lambda args: put_with_specs(mesh, args, specs_2d)
    if mesh is not None:
        return lambda args: shard_batch(mesh, args)
    return lambda args: args


def maybe_warmstart_shiftnet(state, shiftnet, t, train_list, seed, is_primary):
    """ShiftNet warm-start: supervised pretraining on known Lanczos shifts
    before joint training (fixes the joint-bootstrap failure at multi-pixel
    misalignment, REGISTER_ABLATION.json protocol 3). Runs BEFORE mesh
    replication, from the GLOBAL scene list with a fixed seed, so every
    host computes the identical warm-started state."""
    warmup_steps = int(t.get("shiftnet_warmup_steps", 0) or 0)
    if warmup_steps <= 0 or not t.get("register", True):
        return state
    from highresnet_tpu.train.pretrain import hr_crop_pool, pretrain_shiftnet

    register_size = t.get("register_size", 128)
    pool = hr_crop_pool(train_list, register_size)
    # cap and generate the warm-start shifts with the SAME warp window the
    # registered loss will use (±3 px single-pass; ±(K+0.5) extended)
    from highresnet_tpu.train.epoch import warp_window_px

    sn_params, sn_stats, rmse = pretrain_shiftnet(
        shiftnet,
        state.params["shiftnet"],
        state.batch_stats,
        pool,
        jax.random.PRNGKey(seed + 1),
        steps=warmup_steps,
        sigma=t.get("shiftnet_warmup_sigma", 1.5),
        max_shift=warp_window_px(t),
        warp_int_range=int(t.get("warp_int_range", 0) or 0),
    )
    state = state.replace(
        params={**state.params, "shiftnet": sn_params}, batch_stats=sn_stats
    )
    if state.ema_params is not None:
        # the EMA tracks from the warm-started point, not the cold init
        state = state.replace(
            ema_params={
                **state.ema_params,
                "shiftnet": jax.tree_util.tree_map(jnp.copy, sn_params),
            }
        )
    if is_primary:
        print(
            f"shiftnet warm-start: {warmup_steps} steps on {len(pool)} HR "
            f"crops, final shift RMSE {rmse:.3f} px",
            flush=True,
        )
    return state
