"""Multi-host (multi-process) runtime: initialization + global-array feeding.

The reference is strictly single-process/single-device (SURVEY.md §2:
no torch.distributed anywhere); this module is the SURVEY-mandated
TPU-native equivalent for training across hosts:

- within a slice, devices talk over ICI; across hosts the gradient
  all-reduce rides DCN — both are XLA collectives inserted by jit from the
  sharded batch + replicated params, exactly like the single-host path;
- each host feeds only its own shard of the global batch
  (``make_global_batch`` over per-host scene shards from
  ``data.pipeline.shard_for_hosts``);
- host-replicated inputs (validation batches every host loads fully) are
  promoted to global arrays with ``global_from_replicated``.

Initialization is driven by environment variables so single-host behavior
is untouched by default:

  HRN_DISTRIBUTED=auto                 -> jax.distributed.initialize()
                                          (cloud TPU pod auto-detection)
  HRN_COORDINATOR=host:port            -> explicit init; requires
  HRN_NUM_PROCESSES=N HRN_PROCESS_ID=i    (used by the CPU multi-process
                                           tests and bare-metal setups)

Multi-host checkpointing/logging assumptions: params and optimizer state
are replicated, so process 0 alone writes checkpoints and TensorBoard
events; resume across hosts requires ``checkpoint_dir`` on shared storage.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_INITIALIZED = False


def maybe_initialize() -> None:
    """Initialize the jax distributed runtime when the env requests it.

    Safe to call more than once and in single-process runs (no-op).
    Must run before the first device query.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    mode = os.environ.get("HRN_DISTRIBUTED", "")
    coord = os.environ.get("HRN_COORDINATOR", "")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["HRN_NUM_PROCESSES"]),
            process_id=int(os.environ["HRN_PROCESS_ID"]),
        )
        _INITIALIZED = True
    elif mode == "auto":
        jax.distributed.initialize()
        _INITIALIZED = True
    if _INITIALIZED:
        _drop_cpu_persistent_cache()


def _drop_cpu_persistent_cache() -> None:
    """Disable the persistent compilation cache in multi-process CPU runs.

    On hosts where XLA:CPU tags executables with tuning pseudo-features
    (+prefer-no-gather/+prefer-no-scatter, AMX-class x86), every cache
    load re-validates the serialized target features against the raw host
    feature list and logs a pair of loud cpu_aot_loader mismatch errors
    per entry (the load itself still succeeds — measured 5x faster than a
    cold compile). Under the multi-process coordination runtime that spam
    coincided with intermittent rank deaths at coordination barriers
    (shutdown-barrier DEADLINE_EXCEEDED in the 2-process Gloo tests,
    2026-08-20 host migration): a rank whose cache hits resolve instantly
    can run minutes ahead of a peer that is compiling, and the
    coordination deadlines are sized for symmetric progress. Compiles in
    multi-process CPU runs (tests and the Gloo stand-in for DCN) are
    small, so the cache buys little; dropping it keeps rank timing
    symmetric and the logs clean. Single-process runs and TPU backends
    keep their caches.
    """
    if jax.process_count() <= 1 or jax.default_backend() != "cpu":
        return
    if getattr(jax.config, "jax_compilation_cache_dir", None):
        print(
            "multi-process CPU runtime: disabling the persistent compilation "
            "cache (keeps rank progress symmetric; avoids XLA's per-entry "
            "target-feature mismatch spam on AMX-class hosts)",
            flush=True,
        )
        jax.config.update("jax_compilation_cache_dir", None)


def is_multihost() -> bool:
    return jax.process_count() > 1


def make_global_batch(mesh: Mesh, arrays: Sequence, specs: Sequence[P]):
    """Assemble global arrays from PER-HOST shards of the batch.

    Each process passes its local portion (local_batch = global_batch /
    process_count scenes, read from its own shard of the scene list); the
    result is one global jax.Array per input, sharded over the mesh.
    Works identically (and is equivalent to device_put) in single-process
    runs.
    """
    return tuple(
        None
        if x is None
        else jax.make_array_from_process_local_data(NamedSharding(mesh, spec), np.asarray(x))
        for x, spec in zip(arrays, specs)
    )


def global_from_replicated(mesh: Mesh, arrays: Sequence, specs: Sequence[P]):
    """Assemble global arrays from HOST-REPLICATED data.

    For inputs every host loads in full (e.g. validation batches): each
    device's shard is cut out of the full local copy, so no host needs
    another host's bytes.
    """
    out = []
    for x, spec in zip(arrays, specs):
        if x is None:
            out.append(None)
            continue
        x = np.asarray(x)
        sharding = NamedSharding(mesh, spec)
        out.append(jax.make_array_from_callback(x.shape, sharding, lambda idx, x=x: x[idx]))
    return tuple(out)


def broadcast_string(s: str, max_len: int = 512) -> str:
    """Broadcast a host-side string from process 0 to all processes.

    Used for the timestamped run-dir name, which must be identical across
    hosts (each host's clock would otherwise mint a different one).
    """
    if not is_multihost():
        return s
    from jax.experimental import multihost_utils

    buf = np.zeros(max_len, np.uint8)
    raw = s.encode()[:max_len]
    buf[: len(raw)] = np.frombuffer(raw, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return bytes(out[out != 0]).decode()


def replicate_to_mesh(mesh: Mesh, tree):
    """Replicate a host-local pytree onto every device of a (possibly
    multi-host) mesh. All processes must hold identical values — true for
    seeded init and for restored checkpoints off shared storage.

    Built with ``make_array_from_callback`` rather than ``device_put``:
    a multi-process device_put of host data runs a hidden cross-process
    ``assert_equal`` — a Gloo allgather of EVERY leaf (34M ShiftNet params
    included) whose context-init carries a 30 s rendezvous deadline. Under
    compile/scheduling skew between processes that deadline trips
    ("GetKeyValue() timed out"), and the allgather is pure overhead for
    values this module already guarantees identical.
    """
    rep = NamedSharding(mesh, P())

    def put(x):
        if x is None:
            return None
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, rep, lambda idx, x=x: x[idx])

    return jax.tree_util.tree_map(put, tree)
