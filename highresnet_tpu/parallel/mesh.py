"""Device mesh construction and sharding rules.

The parallelism design (SURVEY.md §2 "TPU-native equivalents"):

- One mesh axis, ``data``: scenes (the batch axis) are sharded across
  devices; model parameters (~600k + 34M) are replicated. Gradients are
  all-reduced over ICI by XLA — the model is far too small for tensor
  parallelism to pay, and the (B·L) encoder batch is the axis with
  hardware-filling parallelism.
- For very large L, an optional second axis ``view`` shards the folded
  (B·L) encoder batch further; fusion gathers views back. This is exposed
  via ``make_mesh(shape=(dp, vp))`` but data-parallel is the default.

Everything goes through ``jax.jit`` with NamedShardings — XLA inserts the
collectives (psum for grads) automatically; no hand-written NCCL analog.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data",),
) -> Mesh:
    """Build a mesh over the first n devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),)
    assert int(np.prod(shape)) == len(devices), (shape, len(devices))
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names[: len(shape)]))


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension; replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_with_specs(mesh: Mesh, arrays, specs):
    """device_put each array with its own PartitionSpec."""
    return tuple(
        None if x is None else jax.device_put(x, NamedSharding(mesh, spec))
        for x, spec in zip(arrays, specs)
    )


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """device_put a pytree of host arrays with the batch axis sharded.

    The batch size must divide the mesh's data-axis size; BatchLoader uses
    drop_last for that in training.
    """

    def put(x):
        if x is None:
            return None
        return jax.device_put(x, batch_sharding(mesh, np.ndim(x), axis))

    return jax.tree_util.tree_map(put, tree)
