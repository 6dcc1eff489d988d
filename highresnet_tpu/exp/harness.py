"""Experiment-harness primitives shared by the examples/ drivers.

Every quality/ablation driver used to re-implement the same five blocks —
platform/cache setup, synthetic-dataset build, held-out scene selection,
shift_cPSNR/bicubic/overflow scoring, paired stats, JSON emission — and
the copies drifted (VERDICT round-4 weak #7). This module is the single
home for those blocks; a driver should contain only its arms and its
protocol.

Numeric contract: the scoring helpers here are bit-identical to the loops
they replaced (same jnp call sequence, same clip/border conventions), so a
ported driver reproduces its committed report modulo timing fields.
"""

from __future__ import annotations

import json
import math
import os
from typing import Callable, Dict, List, Optional, Sequence, Tuple


def honor_platform_and_cache() -> None:
    """Honor an explicit JAX_PLATFORMS request and pin the compile cache.

    /root/.axon_site/sitecustomize.py pins jax_platforms=axon,cpu OVER the
    env var, so a driver that should run on CPU (smoke tests, emission-only
    reruns) must re-assert the request through jax.config before first
    device use — the same convention as bench.py and
    __graft_entry__._honor_cpu_request. Each backend gets its own
    compilation cache dir (/tmp/jax_cache_<backend>).
    """
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    # respect a cache dir someone already configured (tests/conftest.py
    # pins /tmp/jax_cache for the whole suite and drives the CLI mains
    # in-process — clobbering it mid-suite would cold-start their shapes)
    if not getattr(jax.config, "jax_compilation_cache_dir", None):
        jax.config.update(
            "jax_compilation_cache_dir", f"/tmp/jax_cache_{jax.default_backend()}"
        )


def ensure_dataset(
    root: str,
    *,
    scenes_per_channel: int,
    views: int,
    lr_size: int,
    seed: int,
    detail: float,
    hr_shift: float = 0.0,
    hr_shift_sigma: float = 0.0,
    regen: bool = False,
    pack: bool = True,
    write_norm_csv: bool = False,
) -> None:
    """Build (or reuse) a synthetic Proba-V-format dataset at `root`.

    Rebuilds when `regen` is set or the tree is incomplete (a generator
    killed mid-write leaves a partial tree that must be rebuilt, not
    trained on — data/synth.py's .complete marker). `clear` removes only
    generated artifacts, so checkpoint dirs under `root` survive a
    deterministic rebuild. With `pack`, writes the decode-free scene cache
    (the 1-core host would otherwise re-decode every PNG each epoch and
    starve the chip).
    """
    from highresnet_tpu.data.synth import (
        clear_synthetic_dataset,
        make_synthetic_dataset,
        synthetic_dataset_complete,
    )

    if not regen and synthetic_dataset_complete(root):
        if pack:
            # a prior run may have built the tree but been killed before
            # (or without) packing; top up any scene missing its cache
            from highresnet_tpu.data import discover_scenes
            from highresnet_tpu.data.pack import PACK_NAME, pack_scenes

            missing = [
                d
                for d in discover_scenes(os.path.join(root, "train"))
                if not os.path.exists(os.path.join(d, PACK_NAME))
            ]
            if missing:
                pack_scenes(missing)
                print(f"packed {len(missing)} unpacked scenes at {root}", flush=True)
        return
    clear_synthetic_dataset(root, force=regen)
    make_synthetic_dataset(
        root,
        n_scenes_per_channel=scenes_per_channel,
        n_views=views,
        lr_size=lr_size,
        seed=seed,
        splits=("train",),
        write_norm_csv=write_norm_csv,
        detail=detail,
        hr_shift=hr_shift,
        hr_shift_sigma=hr_shift_sigma,
    )
    print(f"dataset: {2 * scenes_per_channel} scenes at {root}", flush=True)
    if pack:
        from highresnet_tpu.cli.pack_dataset import main as pack_main

        pack_main(["--prefix", root])


def held_out_scenes(
    root: str, val_proportion: float, max_scenes: Optional[int] = None
) -> List[str]:
    """The validation-side scene dirs of the standard split (seed=1).

    Same split every quality driver and train_and_get_best_model use, so
    "held-out" means held out from the training run being scored.
    """
    from highresnet_tpu.data import discover_scenes, train_val_split

    scenes = discover_scenes(os.path.join(root, "train"))
    _, val = train_val_split(scenes, val_proportion, seed=1)
    return val if max_scenes is None else val[:max_scenes]


def bicubic_x3(img):
    """3x bicubic upsample of one (H, W) image — the no-learning baseline."""
    import jax
    import jax.numpy as jnp

    h, w = img.shape
    return jax.image.resize(jnp.asarray(img), (3 * h, 3 * w), method="cubic")


def scene_scorer(s) -> Callable:
    """shift_cPSNR scorer for one ImageSet: score(img) clips to [0,1] and
    runs the reference-exact 7x7 integer search against the scene's HR +
    clearance map (/root/reference/src/Evaluator.py:16-44 semantics via
    ops/metrics.py::shift_cpsnr)."""
    import jax.numpy as jnp

    from highresnet_tpu.ops.metrics import shift_cpsnr

    hr, hrm = jnp.asarray(s.hr), jnp.asarray(s.hr_map)
    return lambda img: float(shift_cpsnr(jnp.clip(img, 0, 1), hr, hrm))


def overflow_metrics(sr, border: int = 3) -> Tuple[float, float]:
    """(full, scored-region) out-of-[0,1] overflow of a raw SR output.

    The clip-floor evidence metric: how far the output leaves [0,1] before
    the metric clips it. The scored variant trims the `border` px frame
    shift_cpsnr never scores (ops/metrics.py:42) — overflow living only in
    the trim is cosmetic. >0.3 is warn_out_of_range's default threshold
    (calibrated to the measured healthy envelope, OVERFLOW_FRONTIER.json).
    """
    import jax.numpy as jnp

    full = float(jnp.maximum(jnp.max(sr - 1.0), jnp.max(-sr)))
    inner = sr[border:-border, border:-border]
    scored = float(jnp.maximum(jnp.max(inner - 1.0), jnp.max(-inner)))
    return max(0.0, full), max(0.0, scored)


def paired_t(deltas: Sequence[float]) -> Optional[float]:
    """Paired t-statistic, or None when it is undefined (fewer than two
    samples, or zero-variance deltas — 'infinite significance' for a
    degenerate sample would be worse than reporting nothing)."""
    n = len(deltas)
    if n < 2:
        return None
    mean = sum(deltas) / n
    var = sum((d - mean) ** 2 for d in deltas) / (n - 1)
    se = math.sqrt(var / n)
    return mean / se if se > 0 else None


def paired_stats(a: Sequence[float], b: Sequence[float]) -> Dict:
    """Paired per-scene stats for score lists a vs b (a minus b)."""
    import numpy as np

    d = np.asarray(a) - np.asarray(b)
    n = len(d)
    t = float(d.mean() / (d.std(ddof=1) / math.sqrt(n))) if n > 1 else float("nan")
    return {
        "mean_db": round(float(d.mean()), 4),
        "wins": int((d > 0).sum()),
        "n": n,
        "paired_t": round(t, 2),
    }


def emit_report(path: str, report: Dict, slim_drop: Sequence[str] = ()) -> None:
    """Write the full report JSON; print it with `slim_drop` keys removed
    (per-scene arrays belong in the artifact, not the console)."""
    with open(path, "w") as f:
        json.dump(report, f, indent=2)
    slim = {k: v for k, v in report.items() if k not in slim_drop}
    print(json.dumps(slim, indent=2))
