"""Validation-set construction and scoring (split out of train/loop.py).

With norm.csv: the val score is the mean of ESA/model cPSNR ratios (lower
is better, <1 beats the ESA baseline — the reference's selection metric,
src/train.py:211-218). Without: mean of -shift_cPSNR.
"""

from __future__ import annotations

import warnings
from typing import Any, Dict, Optional

import numpy as np

from highresnet_tpu.data.collate import collate
from highresnet_tpu.data.probav import read_imageset
from highresnet_tpu.parallel.distributed import global_from_replicated, is_multihost
from highresnet_tpu.parallel.mesh import shard_batch

# (lrs, alphas, hrs, hr_maps) partition specs: batch axis over 'data'
from jax.sharding import PartitionSpec as _P

BATCH_SPECS = (
    _P("data", None, None, None),
    _P("data", None),
    _P("data", None, None),
    _P("data", None, None),
)


def build_val_batches(
    val_scenes,
    min_l: int,
    top_k: int,
    beta: float,
    batch_size: int,
    rng=None,
    truncate_to: Optional[int] = None,
):
    """Pre-collate the validation set into static-shape batches.

    The val set is fixed, so reading + collating it once and replaying the
    arrays every epoch removes the per-epoch host cost (at paper scale the
    repeated decode/collate dominated epoch wall-clock on a 1-core host).
    A seeded ``rng`` freezes the clearance-sampled view selection, making
    the val score deterministic across epochs AND runs — a deliberate
    divergence from the reference, whose val loader re-samples views every
    epoch (src/train.py:284 + DataLoader.py:127): noisy val scores make
    best-model selection itself noisy. Opt out with
    ``training.cache_val_batches: false``.

    ``truncate_to=k`` keeps only each scene's k clearest views (alpha
    zero-pads back to min_l, the reference's any-L contract,
    src/utils.py:89-95) — the ``training.val_views`` mixture scores one
    such batch list per listed view count, all served by the SAME
    compiled eval step (static shapes).
    """
    out = []
    for start in range(0, len(val_scenes), batch_size):
        dirs = val_scenes[start : start + batch_size]
        sets = [read_imageset(d, top_k=top_k, beta=beta, rng=rng) for d in dirs]
        if truncate_to is not None and truncate_to < min_l:
            import dataclasses

            sets = [
                dataclasses.replace(
                    s, lr=s.lr[:truncate_to], clearances=s.clearances[:truncate_to]
                )
                for s in sets
            ]
        n_real = len(sets)
        if n_real < batch_size:  # pad to the compiled static batch shape
            sets = sets + [sets[-1]] * (batch_size - n_real)
        batch = collate(sets, min_l)
        out.append(
            (batch.names[:n_real], (batch.lrs, batch.alphas, batch.hrs, batch.hr_maps))
        )
    return out


def evaluate_model(
    params_hrnet,
    eval_step,
    val_scenes,
    min_l: int,
    baseline_cpsnrs: Optional[Dict[str, float]],
    top_k: int,
    beta: float,
    batch_size: int = 1,
    mesh=None,
    return_images: bool = False,
    prebuilt_batches=None,
    sample_rng=None,
):
    """Validation score over full-resolution scenes.

    Scenes absent from norm.csv or scoring a nonpositive cPSNR are skipped
    with a warning instead of crashing / poisoning the mean (the reference
    KeyErrors on the former and divides by the latter, src/train.py:214-215).

    A ragged final batch is padded (by repeating the last scene) to keep
    the eval step's compiled shape static — required both for one-program
    execution and for mesh-sharded eval; padded scores are discarded.

    With return_images=True also returns (sr0, hr0) of the first scene for
    TensorBoard image logging (reference: src/train.py:226-228).
    """
    # dispatch all eval batches first, read scores back once at the end
    # (device transports with high readback latency would otherwise sync
    # once per batch)
    batches = prebuilt_batches
    if batches is None:
        # sample_rng seeds the clearance-based view sampling; callers that
        # run in multi-host programs MUST pass one seeded identically on
        # every process, or hosts would score different view draws and
        # disagree on val-driven control flow (early stop, best selection)
        batches = build_val_batches(
            val_scenes, min_l, top_k, beta, batch_size, rng=sample_rng
        )
    pending = []  # (names, device scores)
    first_srs = None
    first_hr = None
    for names, host_args in batches:
        args = host_args
        if mesh is not None:
            if is_multihost():
                # every host loads the full val batch; cut global arrays
                # out of the replicated copies (no cross-host input moves)
                args = global_from_replicated(mesh, args, BATCH_SPECS)
            else:
                args = shard_batch(mesh, args)
        srs, scores = eval_step(params_hrnet, *args)
        if return_images and first_srs is None:
            first_srs = srs  # device ref; fetched once below
            first_hr = host_args[2][0]  # hrs of the first batch
        pending.append((names, scores))

    total = 0.0
    n = 0
    for names, scores in pending:
        scores = np.asarray(scores)
        for name, s in zip(names, scores):
            s = float(s)
            if baseline_cpsnrs is not None and name not in baseline_cpsnrs:
                warnings.warn(f"scene {name!r} missing from norm.csv; skipped in val score")
                continue
            if s <= 0.0 or not np.isfinite(s):
                warnings.warn(f"scene {name!r} scored non-positive cPSNR {s}; skipped")
                continue
            if baseline_cpsnrs is not None:
                total += baseline_cpsnrs[name] / s
            else:
                total -= s
            n += 1
    if n == 0:
        warnings.warn("no scorable validation scenes; returning +inf val score")
    score = total / n if n else float("inf")
    if return_images:
        sr0 = np.asarray(first_srs[0]) if first_srs is not None else None
        return score, sr0, first_hr
    return score
