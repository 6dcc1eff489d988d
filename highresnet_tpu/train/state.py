"""Joint train state for HRNet + ShiftNet.

One Adam optimizer over the concatenation of both models' parameters
(reference: a single torch.optim.Adam over both param lists,
src/train.py:252). The learning rate is injected as a mutable hyperparam so
the plateau scheduler can lower it without recompiling the train step.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax
import jax.numpy as jnp
import optax

from highresnet_tpu.models.hrnet import HRNet
from highresnet_tpu.models.shiftnet import ShiftNet


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Dict[str, Any]  # {'hrnet': ..., 'shiftnet': ...}
    batch_stats: Dict[str, Any]  # ShiftNet BN running stats
    opt_state: Any
    rng: jax.Array  # dropout key, split per step
    # Exponential moving average of params (training.ema_decay > 0), an
    # extension the reference lacks: eval/best-model selection then uses
    # the EMA weights. None (an EMPTY pytree node) when disabled, so the
    # checkpoint tree of non-EMA runs is unchanged.
    ema_params: Any = None

    @property
    def eval_params(self):
        """The weights validation / best-model selection should score."""
        return self.params if self.ema_params is None else self.ema_params

    @property
    def learning_rate(self):
        return self.opt_state.hyperparams["learning_rate"]

    def with_learning_rate(self, lr) -> "TrainState":
        hp = dict(self.opt_state.hyperparams)
        hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
        return self.replace(opt_state=self.opt_state._replace(hyperparams=hp))


def make_optimizer(lr: float, grad_clip_norm: float = 0.0) -> optax.GradientTransformation:
    """Adam with a mutable learning rate; optional global-norm grad clip.

    ``grad_clip_norm > 0`` prepends optax.clip_by_global_norm — a
    robustness knob the reference lacks (src/train.py:252 is bare Adam):
    at the paper-scale protocol (1,160 scenes, batch 32, lr 7e-4) an
    unlucky init can diverge from the very first epochs (observed with
    seed 1: train loss climbing monotonically into ~1e23-output territory
    while val pins at the clipped-garbage floor and healthy seeds reach
    16+ dB). Off by default to preserve reference-exact dynamics.
    """
    if grad_clip_norm and grad_clip_norm > 0:

        @optax.inject_hyperparams
        def tx(learning_rate):
            return optax.chain(
                optax.clip_by_global_norm(grad_clip_norm),
                optax.adam(learning_rate),
            )

        return tx(learning_rate=lr)
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr)


def create_train_state(
    hrnet: HRNet,
    shiftnet: ShiftNet,
    config: Dict[str, Any],
    rng: jax.Array,
    patch_size: int | None = None,
) -> TrainState:
    """Initialize both models and the joint optimizer."""
    t = config["training"]
    p = patch_size or t["patch_size"]
    min_l = t["min_L"]
    rs = t.get("register_size", 128)
    k_init, k_drop = jax.random.split(rng)

    # jit both inits: eager flax init dispatches every op separately, which
    # is pathologically slow over remote device transports (~76 s/model on a
    # degraded relay vs <1 s jitted — the round-3 bench timeout root cause);
    # it also cuts real-training cold start, the tax the stall-watchdog pays
    # on every relaunch (scripts/supervise_tpu.sh)
    hr_vars = jax.jit(hrnet.init)(
        k_init, jnp.zeros((1, max(min_l, 2), p, p)), jnp.ones((1, max(min_l, 2)))
    )
    sn_vars = jax.jit(lambda k, x: shiftnet.init(k, x, train=False))(
        k_init, jnp.zeros((1, rs, rs, 2))
    )

    params = {"hrnet": hr_vars["params"], "shiftnet": sn_vars["params"]}
    batch_stats = sn_vars.get("batch_stats", {})
    tx = make_optimizer(t["lr"], t.get("grad_clip_norm", 0.0))
    opt_state = tx.init(params)
    # EMA starts AT the init point (not zero) so no debiasing is needed;
    # decay=1.0 therefore freezes the EMA at init — a property the tests
    # use to prove the loop evaluates EMA weights, not raw ones.
    ema_decay = float(t.get("ema_decay", 0.0) or 0.0)
    ema_params = jax.tree_util.tree_map(jnp.copy, params) if ema_decay > 0 else None
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        rng=k_drop,
        ema_params=ema_params,
    )
