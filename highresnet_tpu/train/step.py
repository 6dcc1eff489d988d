"""Compiled train / eval steps.

One XLA program per step. The training protocol mirrors the reference hot
loop (src/train.py:165-193) with every Python-level loop fused away:

  1. HRNet forward on the full (B, L, h, w) batch.
  2. ShiftNet registers the SR output against HR ground truth on central
     128x128 crops — the reference's per-view Python loop is a single
     batched conv stack here.
  3. The SR frame is Lanczos-warped by the predicted shift (whole batch in
     one separable-FMA kernel).
  4. loss = mean(-cPSNR(warped, hr, border-cropped mask))
          + lambda * mean(shifts)^2, Adam update over both models jointly.

Sharding: with a mesh, the batch is sharded over the ``data`` axis and
params are replicated; jit partitions the step and inserts the grad
all-reduce (ICI psum) automatically.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from highresnet_tpu.models.hrnet import HRNet
from highresnet_tpu.models.shiftnet import ShiftNet
from highresnet_tpu.ops.losses import LOSS_METRICS, crop_mask, registered_loss
from highresnet_tpu.ops.lanczos import lanczos_shift
from highresnet_tpu.ops.metrics import shift_cpsnr_batch
from highresnet_tpu.train.state import TrainState, make_optimizer

REGISTER_SIZE = 128  # default ShiftNet input crop (torch-compatible fc geometry)


def _mesh_safe_hrnet(hrnet: HRNet, mesh: Optional[Mesh]) -> HRNet:
    """Pin the XLA pair-pack path for any meshed step.

    A Pallas call cannot be partitioned by the SPMD compiler, so the
    auto-dispatch default (Pallas on TPU, hrnet.py:138) must not reach a
    mesh-sharded program. The training loop guards its own construction;
    this guard lives in the exported step builders so direct callers of
    build_train_step/build_eval_step/build_predict_step with a mesh get a
    partitionable program too. An EXPLICIT config opt-in
    (recursive.use_pallas_pack=true) is honored unchanged.
    """
    if mesh is None:
        return hrnet
    cfg = hrnet.config or {}
    if cfg.get("recursive", {}).get("use_pallas_pack") is not None:
        return hrnet
    import copy

    cfg = copy.deepcopy(cfg)
    cfg.setdefault("recursive", {})["use_pallas_pack"] = False
    return HRNet(config=cfg, dtype=hrnet.dtype)


def _register_and_warp(
    shiftnet, sn_params, batch_stats, srs, hrs, offset, dropout_rng, train,
    register_size=REGISTER_SIZE, use_pallas_warp=False, warp_int_range=0,
):
    """Predict one shift per SR image vs HR and Lanczos-warp the SR frame."""
    b = srs.shape[0]
    sr_crop = jax.lax.dynamic_slice(
        srs, (0, offset, offset), (b, register_size, register_size)
    )
    hr_crop = jax.lax.dynamic_slice(
        hrs, (0, offset, offset), (b, register_size, register_size)
    )
    pairs = jnp.stack([hr_crop, sr_crop], axis=-1)  # [reference, moving]
    variables = {"params": sn_params, "batch_stats": batch_stats}
    if train:
        thetas, mutated = shiftnet.apply(
            variables,
            pairs,
            train=True,
            rngs={"dropout": dropout_rng},
            mutable=["batch_stats"],
        )
        new_stats = mutated["batch_stats"]
    else:
        thetas = shiftnet.apply(variables, pairs, train=False)
        new_stats = batch_stats
    # net predicts (dx, dy); resampler wants (dy, dx)  [ShiftNet contract]
    shifts = jnp.flip(thetas, axis=-1)
    if warp_int_range:
        # extended-range warp (integer dynamic_slice + 7-tap fractional):
        # XLA path only — the Pallas kernel hard-codes the single-pass form
        warped = lanczos_shift(srs, shifts, int_range=warp_int_range)
    elif use_pallas_warp:
        # backend-dispatching: Pallas kernel on TPU, XLA path elsewhere
        # (Pallas has no compiled CPU lowering)
        from highresnet_tpu.ops.lanczos_pallas import lanczos_shift_fused

        warped = lanczos_shift_fused(srs, shifts)
    else:
        warped = lanczos_shift(srs, shifts)
    return warped, thetas, new_stats


def build_train_step(
    hrnet: HRNet,
    shiftnet: ShiftNet,
    config: Dict[str, Any],
    mesh: Optional[Mesh] = None,
    shard_views: bool = False,
):
    """Returns jitted fn(state, lrs, alphas, hrs, hr_maps) -> (state, metrics).

    With a mesh, the batch axis is sharded over 'data'. If the mesh also
    has a 'view' axis and shard_views=True, the L (view) axis of the LR
    stack is sharded too — the encoder's folded (B*L) conv batch then
    spans both mesh axes and the fusion tree's cross-view pairing becomes
    XLA-inserted collectives over 'view' (SURVEY.md §2: the view axis is
    the one to shard when L grows).
    """
    hrnet = _mesh_safe_hrnet(hrnet, mesh)
    t = config["training"]
    lam = t["lambda"]
    patch = t["patch_size"]
    register_size = t.get("register_size", REGISTER_SIZE)
    use_pallas_warp = bool(t.get("use_pallas_warp", False))
    # training.warp_int_range=K extends the loss-time warp's accurate window
    # from the reference's ~±3 px (7-tap Lanczos, src/lanczos.py:62-101) to
    # ±(K + 0.5) px via integer/fractional decomposition (ops/lanczos.py).
    # 0 = reference-exact single-pass warp. The loop's max_abs_shift metric
    # warns loudly when predicted shifts leave the configured window.
    warp_int_range = int(t.get("warp_int_range", 0) or 0)
    # training.register=False trains WITHOUT ShiftNet registration (loss on
    # the raw SR frame) — the paper's Table 4 ablation arm; the reference
    # code always registers, the paper compares both
    register = bool(t.get("register", True))
    loss_metric = t.get("loss", "cPSNR")
    if loss_metric not in LOSS_METRICS:
        raise ValueError(
            f"training.loss={loss_metric!r} not in {LOSS_METRICS} "
            "(reference switch: src/train.py:66-87)"
        )
    offset = (3 * patch - register_size) // 2
    assert offset >= 0 or not register, "3*patch_size must cover the registration crop"
    border_mask = jnp.asarray(crop_mask(patch, t["crop"]))
    tx = make_optimizer(t["lr"], t.get("grad_clip_norm", 0.0))
    # training.ema_decay > 0: maintain an EMA of params each step (the state
    # must have been created with the SAME config so state.ema_params is
    # initialized — create_train_state handles that). Elementwise, fused by
    # XLA into the Adam update; cost is one extra param-sized FMA + write.
    ema_decay = float(t.get("ema_decay", 0.0) or 0.0)
    if not 0.0 <= ema_decay <= 1.0:
        raise ValueError(f"training.ema_decay must be in [0, 1], got {ema_decay}")
    # training.range_penalty > 0 adds rp * mean(relu(sr-1) + relu(-sr)) on
    # the RAW SR output — the quantity eval clips and warn_out_of_range
    # flags (the clip-floor artifact, VIEWS_ABLATION.json). 0 = off
    # (reference-exact loss; the reference has no such term).
    range_penalty = float(t.get("range_penalty", 0.0) or 0.0)

    def loss_fn(params, batch_stats, dropout_rng, lrs, alphas, hrs, hr_maps):
        srs = hrnet.apply({"params": params["hrnet"]}, lrs, alphas)
        if register:
            warped, thetas, new_stats = _register_and_warp(
                shiftnet, params["shiftnet"], batch_stats, srs, hrs, offset, dropout_rng,
                train=True, register_size=register_size, use_pallas_warp=use_pallas_warp,
                warp_int_range=warp_int_range,
            )
        else:  # unregistered arm: raw SR vs HR, no shift penalty term
            warped, new_stats = srs, batch_stats
            thetas = jnp.zeros((srs.shape[0], 2), srs.dtype)
        mask = border_mask[None] * hr_maps
        loss = registered_loss(warped, hrs, mask, thetas, lam, metric=loss_metric)
        if range_penalty > 0:
            overflow = jax.nn.relu(srs - 1.0) + jax.nn.relu(-srs)
            loss = loss + range_penalty * jnp.mean(overflow.astype(jnp.float32))
        return loss, (new_stats, thetas)

    def step(state: TrainState, lrs, alphas, hrs, hr_maps):
        rng, dropout_rng = jax.random.split(state.rng)
        (loss, (new_stats, thetas)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, dropout_rng, lrs, alphas, hrs, hr_maps
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
        if ema_decay > 0:
            ema_params = jax.tree_util.tree_map(
                lambda e, p: e + (1.0 - ema_decay) * (p - e), state.ema_params, params
            )
        else:
            ema_params = state.ema_params
        new_state = state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=new_stats,
            opt_state=opt_state,
            rng=rng,
            ema_params=ema_params,
        )
        metrics = {
            "loss": loss,
            "mean_abs_shift": jnp.mean(jnp.abs(thetas)),
            # window guard: the loop warns when predicted shifts leave the
            # warp's accurate range (±3 px single-pass, ±(K+0.5) extended)
            "max_abs_shift": jnp.max(jnp.abs(thetas)),
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    view_axis = "view" if (shard_views and "view" in mesh.axis_names) else None
    return jax.jit(
        step,
        donate_argnums=(0,),
        in_shardings=(
            None,  # state: let jit replicate (params/opt replicated)
            NamedSharding(mesh, P("data", view_axis, None, None)),
            NamedSharding(mesh, P("data", view_axis)),
            NamedSharding(mesh, P("data", None, None)),
            NamedSharding(mesh, P("data", None, None)),
        ),
    )


def build_eval_step(
    hrnet: HRNet,
    config: Dict[str, Any],
    mesh: Optional[Mesh] = None,
    replicate_out: bool = False,
):
    """Returns jitted fn(params, lrs, alphas, hrs, hr_maps) -> (srs, scores).

    Runs the SR forward and the full 7x7 shift-search cPSNR on device —
    the reference does the 49-placement search per scene in host NumPy
    (src/train.py:199-217); here it is one fused program per batch.

    replicate_out=True all-gathers the outputs so every process of a
    multi-host mesh can read the full score vector locally (scores are a
    few floats; srs rides along for the per-epoch TB image).
    """
    hrnet = _mesh_safe_hrnet(hrnet, mesh)

    def step(params, lrs, alphas, hrs, hr_maps):
        srs = hrnet.apply({"params": params}, lrs, alphas)
        scores = shift_cpsnr_batch(jnp.clip(srs, 0.0, 1.0), hrs, hr_maps)
        return srs, scores

    if mesh is None:
        return jax.jit(step)
    out_shardings = None
    if replicate_out:
        rep = NamedSharding(mesh, P())
        out_shardings = (rep, rep)
    return jax.jit(
        step,
        in_shardings=(
            None,
            NamedSharding(mesh, P("data", None, None, None)),
            NamedSharding(mesh, P("data", None)),
            NamedSharding(mesh, P("data", None, None)),
            NamedSharding(mesh, P("data", None, None)),
        ),
        out_shardings=out_shardings,
    )


def build_predict_step(hrnet: HRNet, mesh: Optional[Mesh] = None):
    """SR forward only (test scenes without HR)."""
    hrnet = _mesh_safe_hrnet(hrnet, mesh)

    def step(params, lrs, alphas):
        return hrnet.apply({"params": params}, lrs, alphas)

    if mesh is None:
        return jax.jit(step)
    return jax.jit(
        step,
        in_shardings=(
            None,
            NamedSharding(mesh, P("data", None, None, None)),
            NamedSharding(mesh, P("data", None)),
        ),
    )
