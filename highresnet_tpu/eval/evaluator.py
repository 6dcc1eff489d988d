"""Inference & benchmarking API — the reference predict.py capability set.

Provides `load_data` (train/val/test split), `get_sr_and_score` (single
scene), `evaluate` (all splits), `benchmark` (ESA-ratio table), and the
`Model` facade (reference: /root/reference/src/predict.py:17-220).

TPU notes: SR forwards and the 7x7 shift-search cPSNR run as one jitted
program per (static) batch shape; scenes are grouped by LR view count to
avoid shape-churn recompiles.
"""

from __future__ import annotations

import os
import sys
import warnings
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from highresnet_tpu.config import load_config
from highresnet_tpu.data.collate import Batch, collate
from highresnet_tpu.data.probav import (
    ImageSet,
    SceneDataset,
    discover_scenes,
    read_baseline_cpsnr,
    train_val_split,
)
from highresnet_tpu.models.hrnet import HRNet
from highresnet_tpu.ops.metrics import shift_cpsnr
from highresnet_tpu.train.checkpoint import load_params


def load_data(config_file_path: str, val_proportion: float = 0.10, top_k: int = -1):
    """Load train/val/test SceneDatasets + ESA baseline scores."""
    config = load_config(config_file_path)
    data_dir = config["paths"]["prefix"]

    baseline = None
    norm_path = os.path.join(data_dir, "norm.csv")
    if os.path.exists(norm_path):
        baseline = read_baseline_cpsnr(norm_path)

    train_dirs = discover_scenes(os.path.join(data_dir, "train"))
    test_dirs = discover_scenes(os.path.join(data_dir, "test"))
    train_list, val_list = train_val_split(train_dirs, val_proportion, seed=1)

    mk = lambda dirs: SceneDataset(dirs, create_patches=False, top_k=top_k)
    return mk(train_list), mk(val_list), mk(test_dirs), baseline


class _JittedForward:
    """Shape-keyed cache of jitted SR forwards (one compile per batch shape)."""

    def __init__(self, hrnet: HRNet, params):
        self.hrnet = hrnet
        self.params = params
        self._fn = jax.jit(lambda p, lrs, alphas: self.hrnet.apply({"params": p}, lrs, alphas))

    def __call__(self, lrs: np.ndarray, alphas: np.ndarray) -> np.ndarray:
        return np.asarray(self._fn(self.params, jnp.asarray(lrs), jnp.asarray(alphas)))


class _EnsembleForward:
    """Average the SR outputs of several weight sets (HighRes-net+ protocol:
    the paper's best entry ensembles two models; paper Table 1).

    With ``register=True`` (default) every member's SR is first translated
    onto the first member's output frame (PCC shift estimate + Lanczos
    warp) before averaging. This matters: the shift-invariant cPSNR
    objective never pins a model's absolute output frame, so independently
    trained members converge to frames offset by O(1 px) from each other,
    and averaging raw outputs superimposes mutually shifted sharp images —
    i.e. blur (measured: ~2 px seed-to-seed offset with ~0.3 px std, and a
    -0.65 dB naive-ensemble loss, ENSEMBLE_REPORT.json)."""

    def __init__(self, hrnet: HRNet, params_list, register: bool = True):
        self.hrnet = hrnet
        self.params_list = list(params_list)
        self.register = register

        def run(ps, lrs, alphas):
            srs = [self.hrnet.apply({"params": p}, lrs, alphas) for p in ps]
            if register and len(srs) > 1:
                from highresnet_tpu.registration.search import pcc_align_batch

                anchor = srs[0]
                srs = [anchor] + [pcc_align_batch(anchor, sr)[0] for sr in srs[1:]]
            return jnp.mean(jnp.stack(srs), axis=0)

        self._fn = jax.jit(run)

    def __call__(self, lrs: np.ndarray, alphas: np.ndarray) -> np.ndarray:
        return np.asarray(self._fn(self.params_list, jnp.asarray(lrs), jnp.asarray(alphas)))


class _TTAForward:
    """Geometric self-ensemble (x8 TTA) around one weight set.

    Runs the SR forward on each dihedral symmetry of the LR stack, undoes
    the symmetry on each output, and averages — the standard SISR
    self-ensemble (EDSR), which the reference never implemented; a
    capability the framework adds beyond parity.

    ``register=True`` (default) PCC-aligns every un-transformed output to
    the identity-transform anchor before averaging, for the same reason the
    checkpoint ensemble registers its members: the model's learned output
    frame carries an absolute O(1 px) offset that is NOT equivariant under
    the dihedral action (a rotation/reflection of the input maps offset
    delta to T^-1(delta)), so the 8 raw outputs are mutually shifted sharp
    images and naive averaging blurs exactly like the naive seed ensemble
    did (ENSEMBLE_REPORT.json). TTA_REPORT.json measures both arms.

    ``transforms=8`` needs square inputs (90-degree rotations);
    ``transforms=4`` uses the shape-safe subgroup and works for any shape.
    """

    def __init__(self, hrnet: HRNet, params, transforms: int = 8, register: bool = True):
        from highresnet_tpu.ops.dihedral import SAFE_SUBGROUP, dihedral_fwd, dihedral_inv

        if transforms not in (4, 8):
            raise ValueError(f"transforms must be 4 or 8, got {transforms}")
        self.hrnet = hrnet
        self.params = params
        self.transforms = transforms
        self.register = register
        ts = SAFE_SUBGROUP if transforms == 4 else tuple(range(8))

        def run(p, lrs, alphas):
            srs = [
                dihedral_inv(self.hrnet.apply({"params": p}, dihedral_fwd(lrs, t), alphas), t)
                for t in ts
            ]
            if register and len(srs) > 1:
                from highresnet_tpu.registration.search import pcc_align_batch

                anchor = srs[0]
                srs = [anchor] + [pcc_align_batch(anchor, sr)[0] for sr in srs[1:]]
            return jnp.mean(jnp.stack(srs), axis=0)

        self._fn = jax.jit(run)

    def __call__(self, lrs: np.ndarray, alphas: np.ndarray) -> np.ndarray:
        if self.transforms == 8 and lrs.shape[-2] != lrs.shape[-1]:
            raise ValueError(
                "x8 TTA requires square inputs (90-degree rotations); "
                f"got {lrs.shape[-2]}x{lrs.shape[-1]} — use transforms=4"
            )
        return np.asarray(self._fn(self.params, jnp.asarray(lrs), jnp.asarray(alphas)))


def warn_out_of_range(sr: np.ndarray, name: str = "", tol: float = 0.3) -> bool:
    """Loudly flag SR output that leaves [0, 1] by more than ``tol``.

    Scoring clips to [0, 1]; an output far outside the range means the clip
    silently destroys the image and the resulting cPSNR collapses to a
    floor. The known cause is benchmarking a checkpoint at an
    off-distribution view count (VIEWS_ABLATION.json "clip-floor
    artifact") — without this warning such runs return garbage scores with
    no indication anything is wrong. Returns True when the warning fired.

    The default ``tol`` is calibrated to the measured envelope of HEALTHY
    checkpoints (round-5 range-penalty sweep, OVERFLOW_FRONTIER.json):
    every well-trained arm peaks 0.11-0.26 outside [0, 1] at every view
    count — a harmless fringe the clip removes at <0.01 dB — and pushing
    the training penalty from 10 to 30+ costs cPSNR without moving that
    floor, so overflow below ~0.1 is unreachable at quality parity. The
    degenerate populations the warning exists for measure >=0.39 (fixed-L
    checkpoint off-distribution, VIEWS_ABLATION_FIXL.json) and 0.50-0.57
    (unpenalized fine-tune, VIEWS_ABLATION_VARL_FT.json); tol=0.3 sits in
    the measured gap so routine predict flows are silent and the alarm
    only fires on genuinely pathological output.
    """
    lo, hi = float(np.min(sr)), float(np.max(sr))
    if lo < -tol or hi > 1.0 + tol:
        warnings.warn(
            f"SR output{f' for scene {name!r}' if name else ''} leaves [0, 1] "
            f"by more than {tol} (range [{lo:.3f}, {hi:.3f}]); scores after "
            "clipping are unreliable. This typically means the checkpoint is "
            "run at a view count it was not trained with (clip-floor "
            "artifact, VIEWS_ABLATION.json).",
            RuntimeWarning,
            stacklevel=3,
        )
        return True
    return False


def get_sr_and_score(
    imset: ImageSet | Batch,
    forward,
    min_l: int = 16,
    registration=None,
    register_size: int = 128,
    single_view_policy: str = "warn",
) -> Tuple[np.ndarray, Optional[float]]:
    """Super-resolve one scene and (if HR exists) its shift_cPSNR.

    With ``registration=(shiftnet, variables)``, the SR frame is first
    registered against HR by ShiftNet and Lanczos-warped before scoring —
    the registered-eval protocol (BASELINE.json config #2; the integer
    shift_cpsnr search still runs on top, as in training-time validation).

    ``single_view_policy`` governs scenes with exactly ONE real view
    (alphas sum to 1 after collate padding). A fusion model given a single
    view measures BELOW plain bicubic — the paper observes the same (Fig. 1;
    this framework measured −0.88 dB for its best variable-L checkpoint,
    VIEWS_ABLATION_VARL_FT_RP.json L=1 row) — so silently returning the
    model output would hand the caller worse-than-baseline data:
      - "warn" (default): run the model but emit a RuntimeWarning citing
        the measured deficit;
      - "bicubic": return 3x bicubic of the clearest view instead;
      - "model": reference-exact silence (src/predict.py never special-
        cases L=1).
    """
    if isinstance(imset, ImageSet):
        batch = collate([imset], min_l)
    else:
        batch = imset
    n_real_views = float(np.sum(np.asarray(batch.alphas[0])))
    if n_real_views <= 1.0 and single_view_policy != "model":
        if single_view_policy == "bicubic":
            # clearest available view (read_imageset orders by clearance)
            lr = jnp.asarray(batch.lrs[0, 0])
            h, w = lr.shape
            sr = np.asarray(jax.image.resize(lr, (3 * h, 3 * w), method="cubic"))
            score = None
            if batch.hrs is not None:
                score = float(
                    shift_cpsnr(
                        jnp.clip(jnp.asarray(sr), 0.0, 1.0),
                        jnp.asarray(batch.hrs[0]),
                        jnp.asarray(batch.hr_maps[0]),
                    )
                )
            return sr, score
        warnings.warn(
            "single-view scene: multi-frame fusion measures below plain "
            "bicubic at L=1 (paper Fig. 1; −0.88 dB for this framework's "
            "best variable-L checkpoint, VIEWS_ABLATION_VARL_FT_RP.json). "
            "Set training.single_view_policy='bicubic' to route such "
            "scenes to the stronger baseline, or 'model' to silence this.",
            RuntimeWarning,
            stacklevel=3,
        )
    sr = forward(batch.lrs, batch.alphas)[0]
    warn_out_of_range(np.asarray(sr), name=batch.names[0] if batch.names else "")
    score = None
    if batch.hrs is not None:
        sr_scored = jnp.asarray(sr)
        if registration is not None:
            from highresnet_tpu.models.shiftnet import apply_shifts, register_views

            shiftnet, variables = registration
            hr = jnp.asarray(batch.hrs[0])
            size = register_size  # must match ShiftNet's trained fc geometry
            assert sr_scored.shape[-1] >= size, (
                f"registered eval needs SR >= {size}px (got {sr_scored.shape[-1]})"
            )
            off = (sr_scored.shape[-1] - size) // 2
            thetas, _ = register_views(
                shiftnet,
                variables,
                sr_scored[None, None, off : off + size, off : off + size],
                hr[None, off : off + size, off : off + size],
                train=False,
            )
            sr_scored = apply_shifts(sr_scored[None, None], thetas)[0, 0]
        score = float(
            shift_cpsnr(
                jnp.clip(sr_scored, 0.0, 1.0),
                jnp.asarray(batch.hrs[0]),
                jnp.asarray(batch.hr_maps[0]),
            )
        )
    return sr, score


def load_model(config: Dict[str, Any], checkpoint_dir: str):
    """Build HRNet and load best weights from a run dir.

    Checkpoints store the JOINT {'hrnet', 'shiftnet'} params plus ShiftNet
    batch stats (see train/checkpoint.py); inference needs the HRNet leg.
    """
    from highresnet_tpu.models.hrnet import resolve_compute_dtypes
    from highresnet_tpu.models.shiftnet import ShiftNet

    t = config["training"]
    dtype, decoder_dtype = resolve_compute_dtypes(t.get("compute_dtype"))
    hrnet = HRNet(config=config["network"], dtype=dtype, decoder_dtype=decoder_dtype)
    shiftnet = ShiftNet()
    min_l = max(t["min_L"], 2)
    rs = t.get("register_size", 128)
    hr_dummy = hrnet.init(
        jax.random.PRNGKey(0), jnp.zeros((1, min_l, 16, 16)), jnp.ones((1, min_l))
    )
    sn_dummy = shiftnet.init(jax.random.PRNGKey(0), jnp.zeros((1, rs, rs, 2)), train=False)
    joint_template = {
        "params": {"hrnet": hr_dummy["params"], "shiftnet": sn_dummy["params"]},
        "batch_stats": sn_dummy.get("batch_stats", {}),
    }
    try:
        restored = load_params(checkpoint_dir, joint_template)
        return hrnet, restored["params"]["hrnet"]
    except ValueError:
        # HRNet-only checkpoint (e.g. exported weights without ShiftNet)
        solo_template = {"params": hr_dummy["params"], "batch_stats": {}}
        restored = load_params(checkpoint_dir, solo_template)
        return hrnet, restored["params"]


def evaluate(
    forward,
    datasets: Dict[str, SceneDataset],
    min_l: int = 16,
    registration=None,
    register_size: int = 128,
    single_view_policy: str = "warn",
):
    """Score every scene in every split (optionally ShiftNet-registered).

    Returns (scores, clearances, part) dicts keyed by scene name.
    ``single_view_policy`` is threaded to get_sr_and_score so the CLI
    predict path honors ``training.single_view_policy`` the same way
    ``Model.__call__`` does.
    """
    scores, clearances, part = {}, {}, {}
    for split, ds in datasets.items():
        for i, imset in enumerate(ds):
            sr, sc = get_sr_and_score(
                imset, forward, min_l=min_l,
                registration=registration, register_size=register_size,
                single_view_policy=single_view_policy,
            )
            scores[imset.name] = sc
            clearances[imset.name] = imset.clearances
            part[imset.name] = split
            # progress heartbeat: long evals (x8 TTA compiles take minutes
            # on the relay) must keep writing so log-staleness watchdogs
            # (scripts/supervise_tpu.sh) don't kill a healthy run
            if i % 10 == 9:
                print(f"[evaluate] {split}: {i + 1}/{len(ds)}",
                      file=sys.stderr, flush=True)
    return scores, clearances, part


def benchmark(baseline_cpsnrs, scores, part, clearances):
    """ESA-ratio results table (pandas when available, dict fallback).

    score = ESA / model per scene; < 1 beats the ESA baseline.
    """
    rows = {}
    for name, sc in scores.items():
        esa = (baseline_cpsnrs or {}).get(name)
        rows[name] = {
            "ESA": esa,
            "model": sc,
            "part": part.get(name),
            "score": (esa / sc) if (esa and sc) else None,
            "mean_clr": float(np.mean(clearances[name])) if len(clearances[name]) else None,
            "std_clr": float(np.std(clearances[name])) if len(clearances[name]) else None,
        }
    try:
        import pandas as pd

        df = pd.DataFrame(rows).T
        for col in ("ESA", "model", "score", "mean_clr", "std_clr"):
            df[col] = pd.to_numeric(df[col], errors="coerce")
        return df
    except ImportError:  # pragma: no cover
        return rows


class Model:
    """Facade mirroring the reference's predict.Model class."""

    def __init__(self, config: Dict[str, Any]):
        self.config = config
        self.hrnet: Optional[HRNet] = None
        self.forward = None
        self.registration = None  # (shiftnet, variables) when available

    def load_checkpoint(self, checkpoint_dir: str):
        self.hrnet, params = load_model(self.config, checkpoint_dir)
        self.forward = _JittedForward(self.hrnet, params)

    def load_checkpoint_with_shiftnet(self, checkpoint_dir: str):
        """Also load ShiftNet for registered scoring (config #2 protocol)."""
        from highresnet_tpu.models.shiftnet import ShiftNet
        from highresnet_tpu.train.checkpoint import load_params

        self.hrnet = HRNet(config=self.config["network"])
        shiftnet = ShiftNet()
        t = self.config["training"]
        rs = t.get("register_size", 128)
        hr_dummy = self.hrnet.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 2, 16, 16)), jnp.ones((1, 2))
        )
        sn_dummy = shiftnet.init(jax.random.PRNGKey(0), jnp.zeros((1, rs, rs, 2)), train=False)
        template = {
            "params": {"hrnet": hr_dummy["params"], "shiftnet": sn_dummy["params"]},
            "batch_stats": sn_dummy.get("batch_stats", {}),
        }
        restored = load_params(checkpoint_dir, template)
        self.forward = _JittedForward(self.hrnet, restored["params"]["hrnet"])
        self.registration = (
            shiftnet,
            {"params": restored["params"]["shiftnet"], "batch_stats": restored["batch_stats"]},
        )

    def set_params(self, params):
        """Use in-memory weights (e.g. straight out of training)."""
        self.hrnet = HRNet(config=self.config["network"])
        self.forward = _JittedForward(self.hrnet, params)

    def load_ensemble(self, checkpoint_dirs, register: bool = True):
        """HighRes-net+ style inference: average SR over several trained
        models (the paper's leaderboard-best used a 2-model ensemble).

        ``register=True`` aligns every member to the first member's output
        frame before averaging (see _EnsembleForward) — pass the strongest
        member first. ``register=False`` is the naive raw average."""
        params_list = []
        for d in checkpoint_dirs:
            self.hrnet, params = load_model(self.config, d)
            params_list.append(params)
        self.forward = _EnsembleForward(self.hrnet, params_list, register=register)

    def enable_tta(self, transforms: int = 8, register: bool = True):
        """Wrap the loaded single-checkpoint forward in geometric
        self-ensembling (see _TTAForward). Call after load_checkpoint /
        set_params; layering TTA over a checkpoint ensemble is not
        supported (8 x K forwards — run the members' TTA outputs through
        load_ensemble-style registration manually if ever needed)."""
        if not isinstance(self.forward, _JittedForward):
            raise ValueError(
                "enable_tta requires a single-checkpoint forward "
                "(load_checkpoint/set_params first; not available on ensembles)"
            )
        self.forward = _TTAForward(
            self.hrnet, self.forward.params, transforms=transforms, register=register
        )

    def __call__(self, imset, registered: bool = False):
        return get_sr_and_score(
            imset,
            self.forward,
            min_l=self.config["training"]["min_L"],
            registration=self.registration if registered else None,
            register_size=self.config["training"].get("register_size", 128),
            single_view_policy=self.config["training"].get(
                "single_view_policy", "warn"
            ),
        )

    def evaluate(self, train_dataset, val_dataset, test_dataset, baseline_cpsnrs):
        scores, clearances, part = evaluate(
            self.forward,
            {"train": train_dataset, "val": val_dataset, "test": test_dataset},
            min_l=self.config["training"]["min_L"],
            single_view_policy=self.config["training"].get(
                "single_view_policy", "warn"
            ),
        )
        return benchmark(baseline_cpsnrs, scores, part, clearances)

    def generate_submission_file(self, imset_dataset, out: str = "submission"):
        from highresnet_tpu.eval.submission import generate_submission_file

        return generate_submission_file(self.forward, imset_dataset, out=out,
                                        min_l=self.config["training"]["min_L"])
