"""Resumable checkpointing (Orbax).

The reference saves only best-model weights and cannot resume a run
(SURVEY.md §5: optimizer/scheduler/epoch never saved). Here the FULL train
state — params, BN stats, optimizer state, step, RNG key, epoch, scheduler
state, best score — is checkpointed, so a preempted run restarts exactly
where it left off. Best-weights-only snapshots are also written for
inference (`best/`), matching the reference's HRNet.pth/ShiftNet.pth role.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from highresnet_tpu.train.state import TrainState


class CheckpointManager:
    def __init__(self, run_dir: str):
        self.run_dir = os.path.abspath(run_dir)
        os.makedirs(self.run_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    # -- full resumable state ------------------------------------------------

    def save_state(self, state: TrainState, host_state: Dict[str, Any]) -> None:
        """Save device train state + host-side scalars (epoch, scheduler...).

        Asynchronous: the write overlaps the next epoch; we only block if a
        previous save is still in flight.
        """
        self._ckptr.wait_until_finished()
        path = os.path.join(self.run_dir, "state")
        self._ckptr.save(path, jax.device_get(state), force=True)
        with open(os.path.join(self.run_dir, "host_state.json"), "w") as f:
            json.dump(host_state, f)

    def restore_state(self, template: TrainState) -> Tuple[Optional[TrainState], Dict[str, Any]]:
        path = os.path.join(self.run_dir, "state")
        if not os.path.isdir(path):
            return None, {}
        state = self._ckptr.restore(path, jax.device_get(template))
        host_path = os.path.join(self.run_dir, "host_state.json")
        host_state = {}
        if os.path.isfile(host_path):
            with open(host_path) as f:
                host_state = json.load(f)
        return state, host_state

    # -- best weights for inference ------------------------------------------

    def save_best(self, params: Dict[str, Any], batch_stats: Dict[str, Any], score: float) -> None:
        self._ckptr.wait_until_finished()
        path = os.path.join(self.run_dir, "best")
        payload = {"params": jax.device_get(params), "batch_stats": jax.device_get(batch_stats)}
        self._ckptr.save(path, payload, force=True)
        with open(os.path.join(self.run_dir, "best_score.json"), "w") as f:
            json.dump({"score": float(score)}, f)

    def wait(self) -> None:
        """Block until in-flight async saves are durable (end of training)."""
        self._ckptr.wait_until_finished()

    def load_best(self, template: Dict[str, Any]) -> Dict[str, Any]:
        path = os.path.join(self.run_dir, "best")
        return self._ckptr.restore(path, jax.device_get(template))


def load_params(checkpoint_dir: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Load best weights from a run dir (inference entry point)."""
    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(os.path.abspath(checkpoint_dir), "best")
    return ckptr.restore(path, jax.device_get(template))
