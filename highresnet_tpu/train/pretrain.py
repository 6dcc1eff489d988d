"""ShiftNet warm-start: supervised pretraining on known synthetic shifts.

The reference trains HRNet and ShiftNet jointly from scratch
(/root/reference/src/train.py:249-252) — which works on Proba-V's
structured, mostly-small misalignments but fails to bootstrap when offsets
are larger (REGISTER_ABLATION.json protocol 3: the fusion model blurs
before a zero-initialized ShiftNet learns to register). The classical fix
is to warm-start the registration network on a task where ground truth is
free: take any image I, warp it by a known sub-pixel offset with the SAME
Lanczos resampler the training loss uses, and regress the offset.

Convention bookkeeping (must match train/step.py::_register_and_warp):

- ``lanczos_shift(img, d)`` samples ``out[i] = img[i + d]`` (content moves
  toward the origin for positive d).
- ShiftNet consumes ``stack([reference, moving], axis=-1)`` and predicts
  ``theta = (dx, dy)`` such that ``lanczos_shift(moving, flip(theta))``
  aligns with the reference.
- Therefore with ``ref = lanczos_shift(I, d)`` and ``moving = I`` the
  regression target is ``theta* = flip(d) = (dx, dy)``.

After warm-start, ``_register_and_warp`` recovers known offsets to
sub-0.1-px accuracy (tests/test_train.py), so joint training starts from a
working registration instead of an identity transform.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from highresnet_tpu.ops.lanczos import lanczos_shift


def pretrain_shiftnet(
    shiftnet,
    params,
    batch_stats,
    images: np.ndarray,
    rng: jax.Array,
    steps: int = 200,
    sigma: float = 1.5,
    max_shift: float = 3.0,
    lr: float = 1e-4,
    batch_size: int = 32,
    warp_int_range: int = 0,
) -> Tuple[dict, dict, float]:
    """Supervised warm-start of ShiftNet on known Lanczos shifts.

    Args:
      shiftnet: the ShiftNet module.
      params / batch_stats: ShiftNet's variables (NOT the joint train-state
        pytrees).
      images: (N, H, W) float32 pool of base images; H, W must equal the
        register crop size the training step will use.
      rng: PRNG key (deterministic across hosts for replicated multi-host
        states).
      steps: number of Adam steps.
      sigma: std-dev of the Gaussian (dy, dx) offsets to train on; clipped
        to ±max_shift (which should equal the training warp's accurate
        window: 3 px single-pass, K+0.5 with warp_int_range=K).
      lr: Adam learning rate.
      batch_size: pairs per step (images are sampled with replacement).
      warp_int_range: generate the training pairs with the SAME warp the
        registered loss will use (ops/lanczos.py int_range semantics), so
        an extended-window run warm-starts on its full shift range.

    Returns:
      (params, batch_stats, final_shift_rmse_px).
    """
    if images.ndim != 3:
        raise ValueError(f"images must be (N, H, W), got {images.shape}")
    pool = jnp.asarray(images, jnp.float32)
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def loss_fn(p, bs, pairs, target, drop_rng):
        thetas, mutated = shiftnet.apply(
            {"params": p, "batch_stats": bs},
            pairs,
            train=True,
            rngs={"dropout": drop_rng},
            mutable=["batch_stats"],
        )
        return jnp.mean(jnp.square(thetas - target)), mutated["batch_stats"]

    @jax.jit
    def step(p, bs, opt_state, rng):
        rng, i_rng, d_rng, drop_rng = jax.random.split(rng, 4)
        idx = jax.random.randint(i_rng, (batch_size,), 0, pool.shape[0])
        moving = pool[idx]
        d = jnp.clip(
            sigma * jax.random.normal(d_rng, (batch_size, 2)), -max_shift, max_shift
        )  # (dy, dx)
        refs = lanczos_shift(moving, d, int_range=warp_int_range)
        pairs = jnp.stack([refs, moving], axis=-1)
        target = jnp.flip(d, axis=-1)  # theta = (dx, dy)
        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, bs, pairs, target, drop_rng
        )
        updates, opt_state = tx.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        return p, new_bs, opt_state, rng, loss

    loss = jnp.inf
    for _ in range(steps):
        params, batch_stats, opt_state, rng, loss = step(params, batch_stats, opt_state, rng)
    rmse = float(jnp.sqrt(loss))
    return params, batch_stats, rmse


def hr_crop_pool(
    scene_dirs,
    register_size: int,
    max_scenes: int = 64,
    top_k: int = 1,
    beta: float = 50.0,
) -> np.ndarray:
    """Central HR crops from the first scenes of a (global, unsharded) list.

    Deterministic given the scene list, so every host of a multi-process
    run computes the identical warm-start (states stay replicated). Scenes
    whose HR is smaller than register_size are skipped.
    """
    from highresnet_tpu.data.probav import read_imageset

    crops = []
    for d in scene_dirs[:max_scenes]:
        s = read_imageset(d, top_k=top_k, beta=beta, create_patches=False)
        if s.hr is None:
            continue
        h, w = s.hr.shape
        if h < register_size or w < register_size:
            continue
        y0 = (h - register_size) // 2
        x0 = (w - register_size) // 2
        crops.append(np.asarray(s.hr[y0 : y0 + register_size, x0 : x0 + register_size], np.float32))
    if not crops:
        raise ValueError(
            f"no usable HR crops of size {register_size} among the first "
            f"{max_scenes} scenes (HRs too small or missing)"
        )
    return np.stack(crops)
