"""Training-run setup helpers (split out of train/loop.py).

Mesh layout resolution, train-loader construction (with the optional mmap
epoch cache), and the ShiftNet warm-start — each a pure function so
``train_and_get_best_model`` stays orchestration-only.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from highresnet_tpu.data.pipeline import BatchLoader
from highresnet_tpu.parallel.mesh import make_mesh


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
