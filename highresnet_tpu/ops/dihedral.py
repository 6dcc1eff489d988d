"""Dihedral-group (D4) image transforms for geometric self-ensembling.

Standard SR test-time augmentation (Lim et al., EDSR "self-ensemble",
a.k.a. x8 TTA): run the model on the 8 symmetries of the input — 4
rotations x optional horizontal flip — undo each symmetry on the output,
and average. The reference never implemented this (its "+" ensemble
averages independently trained checkpoints, paper Table 1); here it is a
zero-training-cost quality knob layered on the same registered-averaging
machinery (`eval.evaluator._TTAForward`).

All transforms act on the LAST TWO axes, so the same function serves
(B, L, H, W) LR stacks and (B, H', W') SR outputs. Rotations by 90/270
require H == W (true for Proba-V and for every config this framework
ships); the shape-safe 4-element subgroup {identity, rot180, flip-H,
flip-V} is exposed for rectangular inputs via ``SAFE_SUBGROUP``.

Index convention: ``t in [0, 8)`` decodes as ``rot90 applied (t % 4)
times, then horizontal flip if t >= 4``. The inverse undoes the flip
first, then rotates back.
"""

from __future__ import annotations

import jax.numpy as jnp

#: Transform indices that never change the (H, W) shape — valid for
#: rectangular images: identity, rot180, flip-H, flip-H∘rot180 (= flip-V).
SAFE_SUBGROUP = (0, 2, 4, 6)


def dihedral_fwd(x: jnp.ndarray, t: int) -> jnp.ndarray:
    """Apply D4 element ``t`` to the last two axes of ``x``."""
    if not 0 <= t < 8:
        raise ValueError(f"dihedral index must be in [0, 8), got {t}")
    x = jnp.rot90(x, k=t % 4, axes=(-2, -1))
    if t >= 4:
        x = jnp.flip(x, axis=-1)
    return x


def dihedral_inv(x: jnp.ndarray, t: int) -> jnp.ndarray:
    """Undo ``dihedral_fwd(_, t)``: flip back first, then rotate back."""
    if not 0 <= t < 8:
        raise ValueError(f"dihedral index must be in [0, 8), got {t}")
    if t >= 4:
        x = jnp.flip(x, axis=-1)
    return jnp.rot90(x, k=-(t % 4), axes=(-2, -1))
