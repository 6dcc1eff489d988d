"""One training epoch + the warp-window guard (split out of train/loop.py).

The hot-loop contract on remote-device transports: never read a scalar
back per step. Metrics accumulate ON DEVICE (sums for loss / mean-shift /
grad-norm, MAX for the warp-guard max_abs_shift) and the epoch does ONE
host readback at the end.
"""

from __future__ import annotations

import time
import warnings
from typing import Any, Callable, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np


def warp_window_px(t: Dict[str, Any]) -> float:
    """Accurate range of the loss-time Lanczos warp for this config.

    ±3 px for the reference-exact single 7-tap pass
    (/root/reference/src/lanczos.py:62-101); ±(K + 0.5) px with
    training.warp_int_range = K (integer/fractional decomposition,
    ops/lanczos.py)."""
    k = int(t.get("warp_int_range", 0) or 0)
    return 3.0 if k <= 0 else k + 0.5


def warn_warp_window(
    t: Dict[str, Any], max_abs_shift: float, epoch: int, warn_from: int = 1
) -> int:
    """Warn when a predicted shift leaves the warp window.

    Shifts beyond the window silently degrade the registered loss — the
    REGISTER_ABLATION.json protocol-3 failure mode — so leaving it must be
    LOUD, and a PERSISTENT violation must stay visible: a first-epoch
    ShiftNet optimizer transient (observed: 3.3 px at epoch 1 of an
    hr_shift=0 run, from a zero-init net after its first steps) would
    otherwise consume a once-per-run flag and mask the real failure mode
    later. The guard therefore re-arms on a doubling epoch back-off: a
    warning at epoch e arms the next at 2e, so a run that stays out of
    window keeps saying so at epochs 1, 2, 4, 8, ... (O(log E) warnings)
    while a one-epoch transient warns exactly once. A violation that
    disappears and re-emerges past the armed epoch warns immediately.

    Returns the updated warn_from threshold (pass it back next epoch)."""
    if not t.get("register", True) or epoch < warn_from:
        return warn_from
    window = warp_window_px(t)
    if max_abs_shift > window:
        warnings.warn(
            f"epoch {epoch}: predicted registration shift "
            f"{max_abs_shift:.2f} px exceeds the warp's accurate window "
            f"(±{window:.1f} px) — the registered loss is degrading "
            "alignments it cannot express. Raise training.warp_int_range "
            "or reduce the misalignment scale."
        )
        return max(2 * epoch, epoch + 1)
    return warn_from


def run_train_epoch(
    loader,
    state,
    step_fn: Callable,
    feed: Callable[[Tuple], Tuple],
    steps_left: Optional[int] = None,
):
    """Run one epoch of compiled train steps.

    Args:
      loader: iterable of collated Batch objects (one pass = one epoch).
      state: TrainState (donated by step_fn each call).
      step_fn: compiled (state, lrs, alphas, hrs, hr_maps) -> (state, metrics).
      feed: places/shards host arrays for the step (identity off-mesh).
      steps_left: remaining global step budget; the epoch stops early when
        it hits zero (None = unbounded).

    Returns:
      (state, stats, n_steps) where stats has train_loss / mean_abs_shift /
      grad_norm / max_abs_shift / seconds, train_loss weighted per scene.
    """
    epoch_dev = None  # (loss*n, mean_abs_shift, grad_norm, max_abs_shift)
    n_seen = 0
    n_steps = 0
    t0 = time.time()
    for batch in loader:
        args = feed((batch.lrs, batch.alphas, batch.hrs, batch.hr_maps))
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
        n_steps += 1
        if steps_left is not None and n_steps >= steps_left:
            break
    if n_seen:
        sums = np.asarray(epoch_dev)  # one host sync per epoch
        stats = {
            "train_loss": float(sums[0]) / n_seen,
            "mean_abs_shift": float(sums[1]) / n_steps,
            "grad_norm": float(sums[2]) / n_steps,
            "max_abs_shift": float(sums[3]),
        }
    else:
        stats = {k: 0.0 for k in ("train_loss", "mean_abs_shift", "grad_norm", "max_abs_shift")}
    stats["seconds"] = time.time() - t0
    return state, stats, n_steps
