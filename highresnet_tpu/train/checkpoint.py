"""Resumable checkpointing (Orbax).

The reference saves only best-model weights and cannot resume a run
(SURVEY.md §5: optimizer/scheduler/epoch never saved). Here the FULL train
state — params, BN stats, optimizer state, step, RNG key, epoch, scheduler
state, best score — is checkpointed, so a preempted run restarts exactly
where it left off. Best-weights-only snapshots are also written for
inference (`best/`), matching the reference's HRNet.pth/ShiftNet.pth role.

Crash safety: full-state saves are asynchronous and ALTERNATE between two
slots (state_0 / state_1); `latest.json` (slot pointer + host-side scalars)
is only written after a slot's async save has committed, so at any instant
there is one complete, pointed-to checkpoint on disk — a crash mid-save
costs at most one save interval, never resumability. `save_best` stays
synchronous: external readers load `best/` immediately after training.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from highresnet_tpu.train.state import TrainState


class CheckpointManager:
    """Multi-host note: Orbax saves are COLLECTIVE in a multi-process
    runtime — every process must call save_state/save_best/wait (Orbax
    coordinates; the primary host writes). Plain-file writes (latest.json,
    best_score.json) happen on process 0 only; run_dir must be shared
    storage across hosts."""

    def __init__(self, run_dir: str):
        self.run_dir = os.path.abspath(run_dir)
        self._primary = jax.process_index() == 0
        os.makedirs(self.run_dir, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()
        self._pending: Optional[Tuple[str, Dict[str, Any]]] = None  # (slot, host_state)
        self._last_slot = self._read_latest().get("slot", "state_1")

    # -- full resumable state ------------------------------------------------

    def _latest_path(self) -> str:
        return os.path.join(self.run_dir, "latest.json")

    def _read_latest(self) -> Dict[str, Any]:
        try:
            with open(self._latest_path()) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return {}

    def _flush_pending(self) -> None:
        """Point latest.json at the slot whose async save just committed."""
        if self._pending is None:
            return
        slot, host_state = self._pending
        if self._primary:
            with open(self._latest_path(), "w") as f:
                json.dump({"slot": slot, **host_state}, f)
        self._last_slot = slot
        self._pending = None

    def save_state(self, state: TrainState, host_state: Dict[str, Any]) -> None:
        """Async full-state save into the slot NOT pointed to by latest.json."""
        self._ckptr.wait_until_finished()
        self._flush_pending()
        slot = "state_0" if self._last_slot != "state_0" else "state_1"
        self._ckptr.save(os.path.join(self.run_dir, slot), jax.device_get(state), force=True)
        self._pending = (slot, host_state)

    def restore_state(self, template: TrainState) -> Tuple[Optional[TrainState], Dict[str, Any]]:
        latest = self._read_latest()
        slot = latest.get("slot")
        if not slot:
            return None, {}
        path = os.path.join(self.run_dir, slot)
        if not os.path.isdir(path):
            return None, {}
        try:
            state = self._ckptr.restore(path, jax.device_get(template))
        except Exception as e:
            # the most common cause is a config whose state STRUCTURE
            # changed between the save and this relaunch (e.g. ema_decay
            # toggled on/off adds/removes the ema_params tree) — surface
            # that instead of Orbax's raw tree-mismatch error so a
            # supervised run fails loudly rather than crash-looping
            raise RuntimeError(
                f"checkpoint at {path} does not match the current train-state "
                "structure. Did a config knob that changes the state tree "
                "(e.g. training.ema_decay, grad_clip_norm, network sizes) "
                "change since the run was checkpointed? Resume with the "
                "original settings, or start a fresh run_dir."
            ) from e
        host_state = {k: v for k, v in latest.items() if k != "slot"}
        return state, host_state

    # -- best weights for inference ------------------------------------------

    def save_best(
        self,
        params: Dict[str, Any],
        batch_stats: Dict[str, Any],
        score: float,
        epoch: Optional[int] = None,
    ) -> None:
        """Synchronous: `best/` is complete on return (inference may read it)."""
        self._ckptr.wait_until_finished()
        path = os.path.join(self.run_dir, "best")
        payload = {"params": jax.device_get(params), "batch_stats": jax.device_get(batch_stats)}
        self._ckptr.save(path, payload, force=True)
        self._ckptr.wait_until_finished()
        if self._primary:
            meta = {"score": float(score)}
            if epoch is not None:
                meta["epoch"] = int(epoch)
            with open(os.path.join(self.run_dir, "best_score.json"), "w") as f:
                json.dump(meta, f)

    def load_best(self, template: Dict[str, Any]) -> Dict[str, Any]:
        path = os.path.join(self.run_dir, "best")
        return self._ckptr.restore(path, jax.device_get(template))

    def read_best_score(self) -> Dict[str, Any]:
        """The sidecar written synchronously WITH best/ — it labels those
        exact weights. latest.json's best_score can be older: full-state
        saves are async and slot-gated, so after a crash between a best/
        save and the next committed slot the two disagree (best/ newer)."""
        try:
            with open(os.path.join(self.run_dir, "best_score.json")) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return {}

    def wait(self) -> None:
        """Block until in-flight async saves are durable and pointed to."""
        self._ckptr.wait_until_finished()
        self._flush_pending()


def load_params(checkpoint_dir: str, template: Dict[str, Any]) -> Dict[str, Any]:
    """Load best weights from a run dir (inference entry point)."""
    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(os.path.abspath(checkpoint_dir), "best")
    return ckptr.restore(path, jax.device_get(template))


def resume_run(ckpt: CheckpointManager, state, tracker, scheduler, *, multihost, mesh):
    """Restore a run's full state for relaunch; returns (state, start_epoch).

    Multi-host: every process restores from the same (shared-storage)
    run_dir so train states stay identical; process 0 alone writes. Seeds
    `tracker` from the SAVED best weights: the restored best_score belongs
    to the epoch that wrote best/, and if the remaining epochs never beat
    it (or the loop won't run at all after a relaunch of a finished run),
    returning the restored CURRENT state would mislabel non-best weights
    with the score."""
    restored, host_state = ckpt.restore_state(state)
    if restored is None:
        return state, 1
    if multihost:
        from highresnet_tpu.parallel.distributed import replicate_to_mesh

        restored = replicate_to_mesh(mesh, restored)
    state = restored
    start_epoch = host_state.get("epoch", 0) + 1
    best = tracker.best
    best_score = host_state.get("best_score", float("inf"))
    # older checkpoints lack best_epoch; seeding it with the restored
    # epoch is conservative (a resume never instantly early-stops)
    best_epoch = host_state.get("best_epoch", start_epoch - 1)
    try:
        best = ckpt.load_best(best)
        # best_score.json labels the best/ weights EXACTLY (written
        # synchronously with them); latest.json can lag a full-state save
        # interval behind, so pairing its score with best/ weights would
        # mislabel them after a crash inside that window
        meta = ckpt.read_best_score()
        if "score" in meta and meta["score"] <= best_score:
            best_score = meta["score"]
            best_epoch = meta.get("epoch", best_epoch)
    except Exception:
        pass  # no best saved yet (e.g. killed before the first eval)
    tracker.seed(best, best_score, best_epoch)
    tracker.val_history = [
        (int(e), float(s)) for e, s in host_state.get("val_history", [])
    ]
    if "scheduler" in host_state:
        scheduler.load_state_dict(host_state["scheduler"])
    return state.with_learning_rate(scheduler.lr), start_epoch
