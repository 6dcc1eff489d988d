"""Eval/predict subsystem tests: scene scoring, benchmark table, submission."""

import os
import zipfile

import jax
import numpy as np
import pytest

from highresnet_tpu.data import SceneDataset, discover_scenes
from highresnet_tpu.data.synth import make_synthetic_dataset
from highresnet_tpu.eval.evaluator import Model, benchmark, evaluate, get_sr_and_score
from highresnet_tpu.eval.submission import generate_submission_file

TINY_NET = {
    "encoder": {"in_channels": 2, "num_layers": 1, "kernel_size": 3, "channel_size": 8},
    "recursive": {"alpha_residual": True, "in_channels": 8, "kernel_size": 3},
    "decoder": {
        "deconv": {"in_channels": 8, "kernel_size": 3, "stride": 3, "out_channels": 8},
        "final": {"in_channels": 8, "kernel_size": 1, "out_channels": 1},
    },
}


@pytest.fixture(scope="module")
def eval_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("evalset")
    make_synthetic_dataset(str(root), n_scenes_per_channel=1, n_views=4, lr_size=16, seed=3)
    config = {
        "paths": {"prefix": str(root)},
        "network": TINY_NET,
        "training": {"min_L": 4, "patch_size": 16},
    }
    model = Model(config)
    # init fresh params (we're testing the eval plumbing, not quality)
    from highresnet_tpu.models import HRNet
    import jax.numpy as jnp

    hrnet = HRNet(config=TINY_NET)
    v = hrnet.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 16, 16)), jnp.ones((1, 4)))
    model.set_params(v["params"])
    return root, config, model


def test_get_sr_and_score(eval_env):
    root, config, model = eval_env
    ds = SceneDataset(discover_scenes(f"{root}/train"), top_k=-1)
    sr, score = model(ds[0])
    assert sr.shape == (48, 48)
    assert score is not None and np.isfinite(score)


def test_score_is_none_without_hr(eval_env):
    root, config, model = eval_env
    ds = SceneDataset(discover_scenes(f"{root}/test"), top_k=-1)
    sr, score = model(ds[0])
    assert sr.shape == (48, 48)
    assert score is None


def test_evaluate_and_benchmark(eval_env):
    root, config, model = eval_env
    train_ds = SceneDataset(discover_scenes(f"{root}/train"), top_k=-1)
    scores, clearances, part = evaluate(model.forward, {"train": train_ds}, min_l=4)
    assert len(scores) == 2
    from highresnet_tpu.data import read_baseline_cpsnr

    baseline = read_baseline_cpsnr(f"{root}/norm.csv")
    table = benchmark(baseline, scores, part, clearances)
    # pandas DataFrame with a score column = ESA/model
    name = next(iter(scores))
    row = table.loc[name] if hasattr(table, "loc") else table[name]
    assert row["score"] == pytest.approx(baseline[name] / scores[name])


def test_submission_zip(eval_env, tmp_path):
    root, config, model = eval_env
    test_ds = SceneDataset(discover_scenes(f"{root}/test"), top_k=-1)
    out = str(tmp_path / "submission")
    archive = generate_submission_file(model.forward, test_ds, out=out, min_l=4)
    assert os.path.isfile(archive)
    with zipfile.ZipFile(archive) as zf:
        names = zf.namelist()
    assert len(names) == 2  # 2 test scenes
    assert all(n.startswith("imgset") and n.endswith(".png") for n in names)
    # PNGs are 16-bit
    from highresnet_tpu.utils.imageio import imread_u16

    png = [f for f in os.listdir(out) if f.endswith(".png")][0]
    img = imread_u16(os.path.join(out, png))
    assert img.dtype == np.uint16 and img.shape == (48, 48)


def test_ensemble_forward(eval_env, tmp_path):
    """HighRes-net+ protocol: ensemble SR == mean of member SRs."""
    import jax
    import jax.numpy as jnp

    from highresnet_tpu.eval.evaluator import _EnsembleForward
    from highresnet_tpu.models import HRNet

    root, config, model = eval_env
    hrnet = HRNet(config=TINY_NET)
    v1 = hrnet.init(jax.random.PRNGKey(1), jnp.zeros((1, 4, 16, 16)), jnp.ones((1, 4)))
    v2 = hrnet.init(jax.random.PRNGKey(2), jnp.zeros((1, 4, 16, 16)), jnp.ones((1, 4)))

    rng = np.random.default_rng(0)
    lrs = rng.random((2, 4, 16, 16)).astype(np.float32)
    alphas = np.ones((2, 4), np.float32)

    ens = _EnsembleForward(hrnet, [v1["params"], v2["params"]], register=False)
    got = ens(lrs, alphas)
    a = hrnet.apply(v1, jnp.asarray(lrs), jnp.asarray(alphas))
    b = hrnet.apply(v2, jnp.asarray(lrs), jnp.asarray(alphas))
    np.testing.assert_allclose(got, np.asarray((a + b) / 2), atol=1e-6)

    # registered (default) path: aligning a member to itself is a no-op
    # (PCC shift estimate ~0, Lanczos warp at ~0 is identity), so a
    # same-params ensemble must reproduce the single-member SR
    reg = _EnsembleForward(hrnet, [v1["params"], v1["params"]])
    got_reg = reg(lrs, alphas)
    np.testing.assert_allclose(got_reg, np.asarray(a), atol=1e-4)


def test_predict_cli_ensemble(eval_env, tmp_path, capsys):
    """predict CLI accepts several --checkpoint run dirs and runs the
    registered-ensemble path end to end (val split scoring)."""
    import json

    import jax.numpy as jnp

    from highresnet_tpu.cli.predict import main as predict_main
    from highresnet_tpu.models import HRNet
    from highresnet_tpu.train.checkpoint import CheckpointManager

    root, config, model = eval_env
    hrnet = HRNet(config=TINY_NET)
    dirs = []
    for i in (1, 2):
        v = hrnet.init(jax.random.PRNGKey(i), jnp.zeros((1, 4, 16, 16)), jnp.ones((1, 4)))
        d = str(tmp_path / f"ckpt{i}")
        cm = CheckpointManager(d)
        cm.save_best(v["params"], {}, score=-10.0 - i)
        cm.wait()
        dirs.append(d)

    cfg_path = str(tmp_path / "config.json")
    with open(cfg_path, "w") as f:
        json.dump({"paths": {"prefix": str(root)},
                   "network": TINY_NET,
                   "training": {"min_L": 4, "patch_size": 16}}, f)

    predict_main(["--config", cfg_path, "--checkpoint", *dirs, "--splits", "val"])
    out = capsys.readouterr().out
    assert "model" in out  # benchmark table printed

    # --registered + ensemble is a config error, not a crash downstream
    with pytest.raises(SystemExit):
        predict_main(["--config", cfg_path, "--checkpoint", *dirs, "--registered"])


def test_registered_eval(eval_env, tmp_path):
    """ShiftNet-registered scoring (config #2): loads joint checkpoint,
    warps SR by the predicted shift before the cPSNR shift search."""
    import jax.numpy as jnp

    from highresnet_tpu.models import ShiftNet
    from highresnet_tpu.train.checkpoint import CheckpointManager

    root, config, model = eval_env
    cfg = dict(config)
    cfg["training"] = dict(config["training"], register_size=32)

    shiftnet = ShiftNet()
    sn_vars = shiftnet.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 2)), train=False)

    run_dir = str(tmp_path / "joint_run")
    ck = CheckpointManager(run_dir)
    ck.save_best(
        {"hrnet": model.forward.params, "shiftnet": sn_vars["params"]},
        sn_vars.get("batch_stats", {}),
        score=1.0,
    )

    m = Model(cfg)
    m.load_checkpoint_with_shiftnet(run_dir)
    ds = SceneDataset(discover_scenes(f"{root}/train"), top_k=-1)
    sr_plain, score_plain = m(ds[0])
    sr_reg, score_reg = m(ds[0], registered=True)
    np.testing.assert_array_equal(sr_plain, sr_reg)  # SR image unchanged
    assert score_reg is not None and np.isfinite(score_reg)
    # zero-init fc2 -> identity registration -> identical score
    assert score_reg == pytest.approx(score_plain, abs=1e-3)


def test_checkpoint_roundtrip_via_model(eval_env, tmp_path):
    """save_best -> Model.load_checkpoint restores identical outputs."""
    root, config, model = eval_env
    from highresnet_tpu.train.checkpoint import CheckpointManager

    run_dir = str(tmp_path / "run")
    ck = CheckpointManager(run_dir)
    ck.save_best(model.forward.params, {}, score=1.0)

    m2 = Model(config)
    m2.load_checkpoint(run_dir)
    ds = SceneDataset(discover_scenes(f"{root}/train"), top_k=-1)
    sr1, _ = model(ds[0])
    sr2, _ = m2(ds[0])
    np.testing.assert_allclose(sr1, sr2, atol=0)


def test_out_of_range_sr_warns(eval_env):
    """Benchmarking a checkpoint at the wrong view count emits out-of-[0,1]
    SR whose clipped scores collapse to a floor (VIEWS_ABLATION.json); the
    eval path must warn loudly instead of returning silent garbage."""
    import warnings

    from highresnet_tpu.eval.evaluator import get_sr_and_score, warn_out_of_range

    root, config, model = eval_env
    ds = SceneDataset(discover_scenes(f"{root}/train"), top_k=-1)

    bad_forward = lambda lrs, alphas: np.full((lrs.shape[0], 48, 48), 1.7, np.float32)
    with pytest.warns(RuntimeWarning, match="leaves \\[0, 1\\]"):
        _, score = get_sr_and_score(ds[0], bad_forward, min_l=4)
    assert score is not None  # still scored (clipped), just loudly

    ok_forward = lambda lrs, alphas: np.full((lrs.shape[0], 48, 48), 0.5, np.float32)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        get_sr_and_score(ds[0], ok_forward, min_l=4)

    # tolerance boundary: default tol=0.3 is calibrated to the measured
    # healthy-checkpoint envelope (peaks 0.11-0.26, OVERFLOW_FRONTIER.json)
    # vs the degenerate populations (>=0.39) — 1.26 healthy, 1.35 not
    assert not warn_out_of_range(np.full((4, 4), 1.26, np.float32))
    with pytest.warns(RuntimeWarning):
        assert warn_out_of_range(np.full((4, 4), 1.35, np.float32))
    # and an explicit tol still overrides
    with pytest.warns(RuntimeWarning):
        assert warn_out_of_range(np.full((4, 4), 1.06, np.float32), tol=0.05)


def test_single_view_policy(eval_env):
    """L=1 routing policy: a fusion model fed one view measures below
    bicubic (paper Fig. 1; VIEWS_ABLATION_VARL_FT_RP.json L=1 row), so the
    eval path must never silently hand back worse-than-baseline output —
    'warn' flags it, 'bicubic' routes to the stronger baseline, 'model'
    keeps the reference-exact silence (src/predict.py has no L=1 case)."""
    import warnings

    from highresnet_tpu.data import collate, read_imageset

    root, config, model = eval_env
    ds = SceneDataset(discover_scenes(f"{root}/train"), top_k=-1)

    flat = lambda lrs, alphas: np.full((lrs.shape[0], 48, 48), 0.5, np.float32)
    # top_k=1 clearance-samples ONE view (Gumbel-top-k is stochastic), so
    # read once and reuse the same ImageSet for every path under test
    imset1 = read_imageset(ds.scene_dirs[0], top_k=1)
    one = collate([imset1], 4)
    assert float(np.sum(one.alphas[0])) == 1.0  # padded to 4, one real view

    # default policy: model output, plus a loud warning
    with pytest.warns(RuntimeWarning, match="single-view"):
        sr, score = get_sr_and_score(one, flat, min_l=4)
    assert float(sr[0, 0]) == 0.5

    # 'bicubic': routed to the baseline — output is NOT the model's
    sr_b, score_b = get_sr_and_score(one, flat, min_l=4, single_view_policy="bicubic")
    assert sr_b.shape == (48, 48)
    assert not np.allclose(sr_b, 0.5)
    assert score_b is not None and np.isfinite(score_b)

    # 'model': reference-exact silence
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        get_sr_and_score(one, flat, min_l=4, single_view_policy="model")

    # multi-view scenes never trip the policy
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        get_sr_and_score(ds[0], flat, min_l=4)

    # Model() threads training.single_view_policy through
    cfg = {**config, "training": {**config["training"], "single_view_policy": "bicubic"}}
    m = Model(cfg)
    m.set_params(model.forward.params)
    sr_m, _ = m(imset1)
    np.testing.assert_allclose(np.asarray(sr_m), np.asarray(sr_b), atol=1e-6)

    # evaluate() threads it too (the cli.predict path; round-5 fix — the
    # config key used to be honored only by Model.__call__)
    from highresnet_tpu.eval.evaluator import evaluate as eval_fn

    ds1 = SceneDataset(ds.scene_dirs[:1], top_k=1)
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        eval_fn(flat, {"val": ds1}, min_l=4, single_view_policy="bicubic")
    with pytest.warns(RuntimeWarning, match="single-view"):
        eval_fn(flat, {"val": ds1}, min_l=4, single_view_policy="warn")


def test_dihedral_roundtrip_and_group():
    """inv(fwd(x, t), t) == x for every D4 element; fwd matches the numpy
    rot90/flip composition it documents; the safe subgroup never changes
    the shape of a rectangular image."""
    import jax.numpy as jnp

    from highresnet_tpu.ops.dihedral import SAFE_SUBGROUP, dihedral_fwd, dihedral_inv

    rng = np.random.default_rng(0)
    x = rng.random((2, 3, 6, 6)).astype(np.float32)
    seen = set()
    for t in range(8):
        y = np.asarray(dihedral_fwd(jnp.asarray(x), t))
        expect = np.rot90(x, k=t % 4, axes=(-2, -1))
        if t >= 4:
            expect = np.flip(expect, axis=-1)
        np.testing.assert_array_equal(y, expect)
        np.testing.assert_array_equal(np.asarray(dihedral_inv(jnp.asarray(y), t)), x)
        seen.add(y.tobytes())
    assert len(seen) == 8  # all 8 group elements are distinct on generic input

    rect = jnp.asarray(rng.random((1, 4, 6)).astype(np.float32))
    for t in SAFE_SUBGROUP:
        assert dihedral_fwd(rect, t).shape == rect.shape
    with pytest.raises(ValueError):
        dihedral_fwd(rect, 9)


def test_tta_forward_matches_manual_average(eval_env):
    """x8 TTA (register=False) == mean over the manually transformed
    forwards; registered x8 runs and keeps shape/finiteness; Model
    wiring + guards."""
    import jax
    import jax.numpy as jnp

    from highresnet_tpu.eval.evaluator import _EnsembleForward, _TTAForward
    from highresnet_tpu.models import HRNet
    from highresnet_tpu.ops.dihedral import dihedral_fwd, dihedral_inv

    root, config, model = eval_env
    hrnet = HRNet(config=TINY_NET)
    v = hrnet.init(jax.random.PRNGKey(5), jnp.zeros((1, 4, 16, 16)), jnp.ones((1, 4)))
    rng = np.random.default_rng(1)
    lrs = rng.random((2, 4, 16, 16)).astype(np.float32)
    alphas = np.ones((2, 4), np.float32)

    tta = _TTAForward(hrnet, v["params"], transforms=8, register=False)
    got = tta(lrs, alphas)
    manual = np.mean(
        [
            np.asarray(
                dihedral_inv(
                    hrnet.apply(v, dihedral_fwd(jnp.asarray(lrs), t), jnp.asarray(alphas)), t
                )
            )
            for t in range(8)
        ],
        axis=0,
    )
    np.testing.assert_allclose(got, manual, atol=1e-5)
    assert got.shape == (2, 48, 48)

    reg = _TTAForward(hrnet, v["params"], transforms=4, register=True)
    got_reg = reg(lrs, alphas)
    assert got_reg.shape == (2, 48, 48) and np.all(np.isfinite(got_reg))

    # Model.enable_tta swaps the forward in place and scoring still works
    m = Model(config)
    m.set_params(v["params"])
    m.enable_tta(transforms=8, register=False)
    ds = SceneDataset(discover_scenes(f"{root}/train"), top_k=-1)
    sr, score = m(ds[0])
    assert sr.shape == (48, 48) and score is not None and np.isfinite(score)

    # guards: non-square x8 input, and TTA over an ensemble forward
    with pytest.raises(ValueError, match="square"):
        tta(rng.random((1, 4, 16, 12)).astype(np.float32), np.ones((1, 4), np.float32))
    m.forward = _EnsembleForward(hrnet, [v["params"]], register=False)
    with pytest.raises(ValueError, match="single-checkpoint"):
        m.enable_tta()


def test_predict_cli_tta(eval_env, tmp_path, capsys):
    """predict CLI --tta wraps the single-checkpoint forward in the
    dihedral self-ensemble, and the flag is rejected for ensembles and
    for --registered scoring."""
    import json

    import jax.numpy as jnp

    from highresnet_tpu.cli.predict import main as predict_main
    from highresnet_tpu.models import HRNet
    from highresnet_tpu.train.checkpoint import CheckpointManager

    root, config, model = eval_env
    hrnet = HRNet(config=TINY_NET)
    v = hrnet.init(jax.random.PRNGKey(3), jnp.zeros((1, 4, 16, 16)), jnp.ones((1, 4)))
    ck = str(tmp_path / "ckpt_tta")
    cm = CheckpointManager(ck)
    cm.save_best(v["params"], {}, score=-10.0)
    cm.wait()

    cfg_path = str(tmp_path / "config.json")
    with open(cfg_path, "w") as f:
        json.dump({"paths": {"prefix": str(root)},
                   "network": TINY_NET,
                   "training": {"min_L": 4, "patch_size": 16}}, f)

    predict_main(["--config", cfg_path, "--checkpoint", ck, "--splits", "val", "--tta", "8"])
    assert "model" in capsys.readouterr().out  # benchmark table printed

    with pytest.raises(SystemExit):  # ensemble + --tta is a config error
        predict_main(["--config", cfg_path, "--checkpoint", ck, ck, "--tta", "4"])
    with pytest.raises(SystemExit):  # --registered + --tta is a config error
        predict_main(["--config", cfg_path, "--checkpoint", ck,
                      "--registered", "--tta", "8"])
