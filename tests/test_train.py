"""Training subsystem tests: scheduler parity, step correctness, e2e smoke,
checkpoint resume. Uses a shrunken config (tiny register crop + channels)
because this container has one CPU core."""

import numpy as np
import pytest

from highresnet_tpu.config import load_config
from highresnet_tpu.train.schedule import ReduceLROnPlateau

TINY_CONFIG = {
    "network": {
        "encoder": {"in_channels": 2, "num_layers": 1, "kernel_size": 3, "channel_size": 8},
        "recursive": {"alpha_residual": True, "in_channels": 8, "kernel_size": 3},
        "decoder": {
            "deconv": {"in_channels": 8, "kernel_size": 3, "stride": 3, "out_channels": 8},
            "final": {"in_channels": 8, "kernel_size": 1, "out_channels": 1},
        },
    },
    "training": {
        "batch_size": 2,
        "min_L": 4,
        "n_views": 4,
        "crop": 1,
        "lr": 1e-3,
        "lr_step": 2,
        "lr_decay": 0.97,
        "beta": 50.0,
        "create_patches": True,
        "patch_size": 16,
        "register_size": 32,
        "val_proportion": 0.34,
        "lambda": 1e-6,
        "num_epochs": 1,
        "n_workers": 2,
        "seed": 0,
        "eval_batch_size": 2,
    },
    "paths": {"prefix": "", "checkpoint_dir": "", "tb_log_file_dir": ""},
}


def test_plateau_matches_torch():
    torch = pytest.importorskip("torch")
    values = [10.0, 9.0, 9.5, 9.4, 9.3, 9.2, 8.0, 8.1, 8.2, 8.3, 8.4, 7.0]

    mine = ReduceLROnPlateau(0.1, factor=0.5, patience=2)
    mine_lrs = [mine.step(v) for v in values]

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=0.1)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(opt, mode="min", factor=0.5, patience=2)
    torch_lrs = []
    for v in values:
        sched.step(v)
        torch_lrs.append(opt.param_groups[0]["lr"])

    np.testing.assert_allclose(mine_lrs, torch_lrs)


def test_plateau_matches_torch_negative_values():
    """The no-norm.csv case monitors val = -shift_cPSNR (negative dB)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    values = (-40 + rng.normal(scale=0.5, size=24)).tolist()

    mine = ReduceLROnPlateau(0.1, factor=0.5, patience=2)
    mine_lrs = [mine.step(v) for v in values]

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=0.1)
    sched = torch.optim.lr_scheduler.ReduceLROnPlateau(opt, mode="min", factor=0.5, patience=2)
    torch_lrs = []
    for v in values:
        sched.step(v)
        torch_lrs.append(opt.param_groups[0]["lr"])

    np.testing.assert_allclose(mine_lrs, torch_lrs)


@pytest.fixture(scope="module")
def train_root(tmp_path_factory):
    from highresnet_tpu.data.synth import make_synthetic_dataset

    root = tmp_path_factory.mktemp("trainset")
    make_synthetic_dataset(
        str(root), n_scenes_per_channel=2, n_views=5, lr_size=24, seed=0, splits=("train",)
    )
    return str(root)


def _tiny_config(train_root, tmp_path):
    import copy

    cfg = copy.deepcopy(TINY_CONFIG)
    cfg["paths"]["prefix"] = str(train_root)
    cfg["paths"]["checkpoint_dir"] = str(tmp_path / "ckpt")
    cfg["paths"]["tb_log_file_dir"] = ""
    return cfg


def test_train_step_descends(train_root, tmp_path):
    """A few steps on one batch must reduce the loss (joint model learns)."""
    import jax

    from highresnet_tpu.data import BatchLoader, discover_scenes
    from highresnet_tpu.models import HRNet, ShiftNet
    from highresnet_tpu.train.state import create_train_state
    from highresnet_tpu.train.step import build_train_step

    cfg = _tiny_config(train_root, tmp_path)
    scenes = discover_scenes(f"{train_root}/train")
    loader = BatchLoader(
        scenes, batch_size=2, min_l=4, top_k=4, beta=50.0,
        create_patches=True, patch_size=16, seed=0, num_workers=1, drop_last=True,
    )
    batch = next(iter(loader))

    hrnet = HRNet(config=cfg["network"])
    shiftnet = ShiftNet()
    state = create_train_state(hrnet, shiftnet, cfg, jax.random.PRNGKey(0))
    step = build_train_step(hrnet, shiftnet, cfg)

    losses = []
    for _ in range(8):
        state, metrics = step(state, batch.lrs, batch.alphas, batch.hrs, batch.hr_maps)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_train_step_grad_clip(train_root, tmp_path):
    """training.grad_clip_norm bounds the global update norm (divergence
    rescue for unlucky seeds at scale) and keeps the scheduler's mutable
    learning rate working through the chained optimizer."""
    import jax

    from highresnet_tpu.data import BatchLoader, discover_scenes
    from highresnet_tpu.models import HRNet, ShiftNet
    from highresnet_tpu.train.state import create_train_state
    from highresnet_tpu.train.step import build_train_step

    cfg = _tiny_config(train_root, tmp_path)
    cfg["training"]["grad_clip_norm"] = 1e-4  # absurdly tight on purpose
    scenes = discover_scenes(f"{train_root}/train")
    loader = BatchLoader(
        scenes, batch_size=2, min_l=4, top_k=4, beta=50.0,
        create_patches=True, patch_size=16, seed=0, num_workers=1, drop_last=True,
    )
    batch = next(iter(loader))

    hrnet = HRNet(config=cfg["network"])
    shiftnet = ShiftNet()
    state = create_train_state(hrnet, shiftnet, cfg, jax.random.PRNGKey(0))
    step = build_train_step(hrnet, shiftnet, cfg)

    before = jax.tree.map(lambda x: np.asarray(x), state.params)
    state2, metrics = step(state, batch.lrs, batch.alphas, batch.hrs, batch.hr_maps)
    assert np.isfinite(float(metrics["loss"]))
    # Adam normalizes per-parameter, but with g clipped to 1e-4 the first
    # step's |update| stays ~lr-bounded and finite; crucially it must be
    # strictly smaller than the unclipped run's update
    cfg_unclipped = _tiny_config(train_root, tmp_path)
    state_u = create_train_state(hrnet, shiftnet, cfg_unclipped, jax.random.PRNGKey(0))
    step_u = build_train_step(hrnet, shiftnet, cfg_unclipped)
    state2_u, _ = step_u(state_u, batch.lrs, batch.alphas, batch.hrs, batch.hr_maps)

    def gnorm(a, b):
        leaves_a = jax.tree.leaves(jax.tree.map(lambda x, y: np.sum((np.asarray(x) - np.asarray(y)) ** 2), a, b))
        return float(np.sqrt(np.sum(leaves_a)))

    upd_clip = gnorm(state2.params, before)
    upd_raw = gnorm(state2_u.params, before)
    assert upd_clip < upd_raw, (upd_clip, upd_raw)

    # mutable learning rate still reachable through the chained optimizer
    state3 = state2.with_learning_rate(1e-5)
    assert float(state3.learning_rate) == pytest.approx(1e-5)
    state4, metrics4 = step(state3, batch.lrs, batch.alphas, batch.hrs, batch.hr_maps)
    assert np.isfinite(float(metrics4["loss"]))


def test_train_step_with_pallas_warp_flag(train_root, tmp_path):
    """training.use_pallas_warp dispatches by backend (XLA path on CPU)
    and produces the same loss as the default path."""
    import copy

    import jax

    from highresnet_tpu.data import BatchLoader, discover_scenes
    from highresnet_tpu.models import HRNet, ShiftNet
    from highresnet_tpu.train.state import create_train_state
    from highresnet_tpu.train.step import build_train_step

    cfg = _tiny_config(train_root, tmp_path)
    scenes = discover_scenes(f"{train_root}/train")
    batch = next(iter(BatchLoader(
        scenes, batch_size=2, min_l=4, top_k=4, beta=50.0,
        create_patches=True, patch_size=16, seed=0, num_workers=1, drop_last=True,
    )))

    hrnet = HRNet(config=cfg["network"])
    shiftnet = ShiftNet()
    losses = {}
    for flag in (False, True):
        c = copy.deepcopy(cfg)
        c["training"]["use_pallas_warp"] = flag
        state = create_train_state(hrnet, shiftnet, c, jax.random.PRNGKey(0))
        step = build_train_step(hrnet, shiftnet, c)
        _, m = step(state, batch.lrs, batch.alphas, batch.hrs, batch.hr_maps)
        losses[flag] = float(m["loss"])
    assert losses[True] == pytest.approx(losses[False], rel=1e-6)


def test_train_e2e_and_resume(train_root, tmp_path):
    """Full orchestration: train 1 epoch, checkpoint, resume for another."""
    from highresnet_tpu.train.loop import train_and_get_best_model

    cfg = _tiny_config(train_root, tmp_path)
    run_dir = str(tmp_path / "run")
    out = train_and_get_best_model(cfg, run_dir=run_dir)
    assert np.isfinite(out["best_score"])
    first_best = out["best_score"]

    # resume: epoch counter continues, best score only improves
    cfg["training"]["num_epochs"] = 2
    out2 = train_and_get_best_model(cfg, run_dir=run_dir)
    assert out2["best_score"] <= first_best + 1e-9

    # the returned best weights must be USABLE host copies — train_step
    # donates state buffers, so un-snapshotted references would be deleted
    import jax
    import jax.numpy as jnp

    from highresnet_tpu.models import HRNet

    hrnet = HRNet(config=cfg["network"])
    sr = hrnet.apply(
        {"params": out2["params"]["hrnet"]}, jnp.zeros((1, 4, 16, 16)), jnp.ones((1, 4))
    )
    assert np.isfinite(np.asarray(sr)).all()

    import os

    assert os.path.isdir(os.path.join(run_dir, "best"))
    # alternating-slot pointer exists and names a committed slot
    import json

    with open(os.path.join(run_dir, "latest.json")) as f:
        latest = json.load(f)
    assert latest["epoch"] == 2
    assert os.path.isdir(os.path.join(run_dir, latest["slot"]))


def test_loss_metric_selectable(train_root, tmp_path):
    """training.loss threads through to the objective (reference switch:
    src/train.py:66-87); all three metrics train a finite step."""
    import copy

    import jax

    from highresnet_tpu.data import BatchLoader, discover_scenes
    from highresnet_tpu.models import HRNet, ShiftNet
    from highresnet_tpu.train.state import create_train_state
    from highresnet_tpu.train.step import build_train_step

    cfg = _tiny_config(train_root, tmp_path)
    scenes = discover_scenes(f"{train_root}/train")
    batch = next(iter(BatchLoader(
        scenes, batch_size=2, min_l=4, top_k=4, beta=50.0,
        create_patches=True, patch_size=16, seed=0, num_workers=1, drop_last=True,
    )))

    hrnet = HRNet(config=cfg["network"])
    shiftnet = ShiftNet()
    losses = {}
    for metric in ("cPSNR", "cMSE", "masked_MSE"):
        c = copy.deepcopy(cfg)
        c["training"]["loss"] = metric
        state = create_train_state(hrnet, shiftnet, c, jax.random.PRNGKey(0))
        step = build_train_step(hrnet, shiftnet, c)
        _, m = step(state, batch.lrs, batch.alphas, batch.hrs, batch.hr_maps)
        losses[metric] = float(m["loss"])
    assert all(np.isfinite(v) for v in losses.values()), losses
    # -cPSNR is in (negative) dB; the MSE metrics are small positives
    assert losses["cPSNR"] < 0 < losses["cMSE"]
    assert losses["cMSE"] != losses["masked_MSE"]

    c = copy.deepcopy(cfg)
    c["training"]["loss"] = "nonsense"
    with pytest.raises(ValueError, match="training.loss"):
        build_train_step(hrnet, shiftnet, c)


def test_evaluate_model_guards_and_padding(train_root, tmp_path):
    """Missing norm.csv entries and nonpositive scores are skipped with a
    warning; ragged final batches are padded to the static compiled shape
    (padded scores discarded)."""
    from highresnet_tpu.train.loop import evaluate_model

    scenes = ["sA", "sB", "sC"]
    shapes_seen = []

    def fake_eval_step(params, lrs, alphas, hrs, hr_maps):
        shapes_seen.append(lrs.shape)
        b = lrs.shape[0]
        return np.zeros((b, 48, 48)), np.full((b,), 50.0)

    def fake_read(d, top_k=None, beta=0.0, rng=None):
        from highresnet_tpu.data.probav import ImageSet

        lr = np.zeros((4, 16, 16), np.float32)
        return ImageSet(
            name=d, lr=lr,
            hr=np.zeros((48, 48), np.float32),
            hr_map=np.ones((48, 48), np.float32),
            clearances=np.ones(4),
        )

    import highresnet_tpu.train.evaluation as loop_mod  # val scoring home

    orig = loop_mod.read_imageset
    loop_mod.read_imageset = fake_read
    try:
        # baseline has sA, sB but NOT sC -> sC skipped with a warning;
        # 3 scenes at batch_size=2 -> last batch padded to 2
        baseline = {"sA": 48.0, "sB": 52.0}
        with pytest.warns(UserWarning, match="missing from norm.csv"):
            score = evaluate_model(
                None, fake_eval_step, scenes, 4, baseline,
                top_k=4, beta=0.0, batch_size=2,
            )
        assert score == pytest.approx((48.0 / 50.0 + 52.0 / 50.0) / 2)
        assert all(s[0] == 2 for s in shapes_seen), shapes_seen

        # nonpositive model score is skipped, not divided by
        def zero_step(params, lrs, alphas, hrs, hr_maps):
            b = lrs.shape[0]
            scores = np.full((b,), 50.0)
            scores[0] = 0.0
            return np.zeros((b, 48, 48)), scores

        with pytest.warns(UserWarning, match="non-positive"):
            score = evaluate_model(
                None, zero_step, scenes[:2], 4, baseline,
                top_k=4, beta=0.0, batch_size=2,
            )
        assert score == pytest.approx(52.0 / 50.0)
    finally:
        loop_mod.read_imageset = orig


def test_tb_logging_images_and_scalars(train_root, tmp_path, monkeypatch):
    """The loop logs per-epoch SR image + error map (reference:
    src/train.py:226-228) and the shift/grad-norm scalars."""
    import tensorboardX

    from highresnet_tpu.train.loop import train_and_get_best_model

    records = {"scalars": [], "images": []}

    class FakeWriter:
        def __init__(self, *a, **k):
            pass

        def add_scalar(self, tag, value, step):
            records["scalars"].append((tag, float(value), step))

        def add_image(self, tag, img, step, dataformats="HW"):
            records["images"].append((tag, np.asarray(img), dataformats))

        def close(self):
            pass

    monkeypatch.setattr(tensorboardX, "SummaryWriter", FakeWriter)

    cfg = _tiny_config(train_root, tmp_path)
    cfg["paths"]["tb_log_file_dir"] = str(tmp_path / "tb")
    train_and_get_best_model(cfg, run_dir=str(tmp_path / "run_tb"))

    tags = {t for t, _, _ in records["scalars"]}
    assert {"train/loss", "train/val_loss", "train/lr",
            "train/mean_abs_shift", "train/grad_norm"} <= tags
    img_tags = [t for t, _, _ in records["images"]]
    assert img_tags.count("SR Image") == 1 and img_tags.count("Error Map") == 1
    sr_img = next(i for t, i, _ in records["images"] if t == "SR Image")
    assert sr_img.ndim == 2 and np.isfinite(sr_img).all()
    assert 0.0 <= sr_img.min() and sr_img.max() <= 1.0 + 1e-6


def test_eval_step_scores(train_root, tmp_path):
    import jax

    from highresnet_tpu.data import collate, discover_scenes, read_imageset
    from highresnet_tpu.models import HRNet
    from highresnet_tpu.train.step import build_eval_step

    cfg = _tiny_config(train_root, tmp_path)
    hrnet = HRNet(config=cfg["network"])
    scenes = discover_scenes(f"{train_root}/train")
    sets = [read_imageset(d, top_k=4, beta=0.0) for d in scenes[:2]]
    batch = collate(sets, 4)
    variables = hrnet.init(jax.random.PRNGKey(0), batch.lrs, batch.alphas)
    eval_step = build_eval_step(hrnet, cfg)
    srs, scores = eval_step(variables["params"], batch.lrs, batch.alphas, batch.hrs, batch.hr_maps)
    assert srs.shape == (2, 72, 72)
    assert scores.shape == (2,)
    assert np.isfinite(np.asarray(scores)).all()


def test_mesh_training_rounds_eval_batch_and_pins_xla_pack(train_root, tmp_path):
    """With a data mesh: (1) an eval_batch_size that does not divide the
    device count engages the sharded eval step by rounding UP to a device
    multiple instead of silently falling back to one-device eval; (2) the
    fusion pack defaults to the XLA path (a Pallas call cannot be
    auto-partitioned by the SPMD compiler)."""
    import jax

    if jax.device_count() < 2:
        pytest.skip("needs the virtual multi-device mesh")

    from highresnet_tpu.train.loop import train_and_get_best_model

    cfg = _tiny_config(train_root, tmp_path)
    # batch_size must fit the 2 train scenes (the loop now fails fast when
    # a meshed run cannot form one full batch); a 2-device data mesh still
    # engages the sharded paths
    cfg["training"]["batch_size"] = 2
    cfg["training"]["eval_batch_size"] = 3  # not a device multiple -> rounds up
    cfg["training"]["data_parallel"] = True
    out = train_and_get_best_model(cfg, run_dir=str(tmp_path / "run_mesh"))
    assert np.isfinite(out["best_score"])


def test_unregistered_training_arm(train_root, tmp_path):
    """training.register=False trains on the raw SR frame (paper Table 4's
    ablation arm): the step runs, descends, and leaves ShiftNet untouched."""
    import copy

    import jax

    from highresnet_tpu.data import BatchLoader, discover_scenes
    from highresnet_tpu.models import HRNet, ShiftNet
    from highresnet_tpu.train.state import create_train_state
    from highresnet_tpu.train.step import build_train_step

    cfg = _tiny_config(train_root, tmp_path)
    cfg["training"]["register"] = False
    scenes = discover_scenes(f"{train_root}/train")
    batch = next(iter(BatchLoader(
        scenes, batch_size=2, min_l=4, top_k=4, beta=50.0,
        create_patches=True, patch_size=16, seed=0, num_workers=1, drop_last=True,
    )))

    hrnet = HRNet(config=cfg["network"])
    shiftnet = ShiftNet()
    state = create_train_state(hrnet, shiftnet, cfg, jax.random.PRNGKey(0))
    sn_before = jax.device_get(state.params["shiftnet"])
    step = build_train_step(hrnet, shiftnet, cfg)
    losses = []
    for _ in range(4):
        state, m = step(state, batch.lrs, batch.alphas, batch.hrs, batch.hr_maps)
        losses.append(float(m["loss"]))
        assert float(m["mean_abs_shift"]) == 0.0
    assert np.isfinite(losses).all() and losses[-1] < losses[0]
    sn_after = jax.device_get(state.params["shiftnet"])
    for a, b in zip(
        jax.tree_util.tree_leaves(sn_before), jax.tree_util.tree_leaves(sn_after)
    ):
        np.testing.assert_array_equal(a, b)


def test_shiftnet_pretrain_recovers_shifts(train_root):
    """Warm-start (train/pretrain.py): after supervised pretraining on known
    Lanczos shifts, ShiftNet recovers a held-out offset with the exact sign
    convention the train step's warp consumes (theta = flip(d))."""
    import jax
    import jax.numpy as jnp

    from highresnet_tpu.data import discover_scenes
    from highresnet_tpu.models import ShiftNet
    from highresnet_tpu.ops.lanczos import lanczos_shift
    from highresnet_tpu.train.pretrain import hr_crop_pool, pretrain_shiftnet

    rs = 32
    scenes = discover_scenes(f"{train_root}/train")
    pool = hr_crop_pool(scenes, rs)
    assert pool.shape[1:] == (rs, rs)

    shiftnet = ShiftNet()
    variables = shiftnet.init(jax.random.PRNGKey(0), jnp.zeros((1, rs, rs, 2)), train=False)
    params, stats, rmse = pretrain_shiftnet(
        shiftnet,
        variables["params"],
        variables.get("batch_stats", {}),
        pool,
        jax.random.PRNGKey(1),
        steps=150,
        sigma=1.0,
        batch_size=16,
        lr=3e-4,
    )
    # zero-init ShiftNet predicts 0 => RMSE == sigma; pretraining must beat it
    assert rmse < 0.6, rmse

    # held-out pair with a known offset: ref = moving sampled at i + d
    moving = pool[:1]
    d = jnp.asarray([[0.8, -0.5]])  # (dy, dx)
    ref = lanczos_shift(jnp.asarray(moving), d)
    pairs = jnp.stack([ref, jnp.asarray(moving)], axis=-1)
    theta = shiftnet.apply({"params": params, "batch_stats": stats}, pairs, train=False)
    err = np.abs(np.asarray(theta)[0] - np.asarray(jnp.flip(d, -1))[0])
    assert err.max() < 0.5, (np.asarray(theta), err)


def test_train_loop_warmstart_and_curriculum(train_root, tmp_path):
    """training.shiftnet_warmup_steps pretrains ShiftNet before the joint
    loop and training.register_warmup_epochs runs unregistered epochs first;
    the loop completes and ShiftNet's params move away from their init."""
    import jax

    from highresnet_tpu.models import HRNet, ShiftNet
    from highresnet_tpu.train.loop import train_and_get_best_model
    from highresnet_tpu.train.state import create_train_state

    cfg = _tiny_config(train_root, tmp_path)
    cfg["training"]["num_epochs"] = 2
    cfg["training"]["shiftnet_warmup_steps"] = 2
    cfg["training"]["register_warmup_epochs"] = 1
    cfg["training"]["checkpoint_every"] = 0

    init_state = create_train_state(
        HRNet(config=cfg["network"]), ShiftNet(), cfg, jax.random.PRNGKey(cfg["training"]["seed"])
    )
    fc2_init = np.asarray(init_state.params["shiftnet"]["fc2"]["kernel"])

    result = train_and_get_best_model(cfg)
    assert np.isfinite(result["best_score"])
    fc2_after = np.asarray(result["params"]["shiftnet"]["fc2"]["kernel"])
    # zero-init fc2 must have been trained by the warm-start (and epoch 2)
    assert np.abs(fc2_after).max() > 0 and not np.array_equal(fc2_init, fc2_after)


def test_synth_hr_shift_sigma(tmp_path):
    """hr_shift_sigma writes per-scene Gaussian HR offsets: HRs differ from
    the aligned rendering, offsets vary across scenes, and the knob is
    mutually exclusive with hr_shift."""
    import numpy as np

    from highresnet_tpu.data.synth import make_scene, make_synthetic_dataset
    from highresnet_tpu.utils.imageio import imread_u16

    root = tmp_path / "sig"
    make_synthetic_dataset(
        str(root), n_scenes_per_channel=2, n_views=3, lr_size=16, seed=3,
        splits=("train",), hr_shift_sigma=1.0,
    )
    aligned = tmp_path / "aligned"
    make_synthetic_dataset(
        str(aligned), n_scenes_per_channel=2, n_views=3, lr_size=16, seed=3,
        splits=("train",),
    )
    import glob
    import os

    a = sorted(glob.glob(os.path.join(str(root), "train", "*", "*", "HR.png")))
    b = sorted(glob.glob(os.path.join(str(aligned), "train", "*", "*", "HR.png")))
    assert len(a) == len(b) == 4
    diffs = [
        np.abs(imread_u16(pa).astype(float) - imread_u16(pb).astype(float)).mean()
        for pa, pb in zip(a, b)
    ]
    assert any(d > 0 for d in diffs), "sigma offsets should perturb the HR"

    with pytest.raises(ValueError, match="mutually exclusive"):
        make_scene(str(tmp_path / "bad"), np.random.default_rng(0), n_views=1,
                   lr_size=8, hr_shift=1.0, hr_shift_sigma=1.0)


def test_mesh_safe_pack_guard_in_step_builders():
    """Meshed step builders must pin the XLA pair-pack path when the config
    leaves use_pallas_pack on auto (a Pallas call cannot be SPMD-
    partitioned); an explicit opt-in is honored; no mesh leaves auto."""
    from highresnet_tpu.models import HRNet
    from highresnet_tpu.parallel.mesh import make_mesh
    from highresnet_tpu.train.step import _mesh_safe_hrnet
    from highresnet_tpu.utils.flops import utilization

    mesh = make_mesh(n_devices=2)
    h_auto = HRNet(config={"recursive": {}})
    assert _mesh_safe_hrnet(h_auto, None) is h_auto
    pinned = _mesh_safe_hrnet(h_auto, mesh)
    assert pinned.config["recursive"]["use_pallas_pack"] is False
    h_opt = HRNet(config={"recursive": {"use_pallas_pack": True}})
    assert _mesh_safe_hrnet(h_opt, mesh) is h_opt

    # bench accounting guard: a broken two-point slope reports None fields,
    # never a divide-by-zero or plausible-looking garbage
    u = utilization(1e9, 0.0)
    assert u["achieved_tflops_per_s"] is None and u["mxu_utilization"] is None


def test_ema_tracks_params(train_root, tmp_path):
    """training.ema_decay maintains ema_t = d*ema_{t-1} + (1-d)*params_t,
    initialized AT the init point (no debias term needed)."""
    import jax

    from highresnet_tpu.data import BatchLoader, discover_scenes
    from highresnet_tpu.models import HRNet, ShiftNet
    from highresnet_tpu.train.state import create_train_state
    from highresnet_tpu.train.step import build_train_step

    cfg = _tiny_config(train_root, tmp_path)
    cfg["training"]["ema_decay"] = 0.5
    scenes = discover_scenes(f"{train_root}/train")
    loader = BatchLoader(
        scenes, batch_size=2, min_l=4, top_k=4, beta=50.0,
        create_patches=True, patch_size=16, seed=0, num_workers=1, drop_last=True,
    )
    batch = next(iter(loader))

    hrnet = HRNet(config=cfg["network"])
    shiftnet = ShiftNet()
    state = create_train_state(hrnet, shiftnet, cfg, jax.random.PRNGKey(0))
    step = build_train_step(hrnet, shiftnet, cfg)

    expected = jax.device_get(state.params)
    for _ in range(3):
        state, _ = step(state, batch.lrs, batch.alphas, batch.hrs, batch.hr_maps)
        params = jax.device_get(state.params)
        expected = jax.tree_util.tree_map(
            lambda e, p: 0.5 * e + 0.5 * p, expected, params
        )
    got = jax.device_get(state.ema_params)
    jax.tree_util.tree_map(
        lambda g, e: np.testing.assert_allclose(g, e, rtol=1e-6, atol=1e-7), got, expected
    )

    # disabled: no EMA tree at all (checkpoint structure unchanged)
    cfg2 = _tiny_config(train_root, tmp_path)
    s2 = create_train_state(hrnet, shiftnet, cfg2, jax.random.PRNGKey(0))
    assert s2.ema_params is None
    assert s2.eval_params is s2.params

    with pytest.raises(ValueError):
        cfg3 = _tiny_config(train_root, tmp_path)
        cfg3["training"]["ema_decay"] = 1.5
        build_train_step(hrnet, shiftnet, cfg3)


def test_ema_loop_selects_ema_weights_and_resumes(train_root, tmp_path):
    """The loop snapshots EMA weights when enabled: with decay=1.0 the EMA
    is frozen at init, and with lr=0 the raw params never leave init either,
    so selection over {raw, ema} must return exactly the (reproducible)
    init regardless of which candidate wins the tie. The resume leg
    exercises checkpoint restore of the EMA tree. (That selection prefers
    the better of raw/EMA on real trajectories is pinned separately by
    test_ema_best_selection_never_loses_to_raw.)"""
    import jax

    from highresnet_tpu.models import HRNet, ShiftNet
    from highresnet_tpu.train.loop import train_and_get_best_model
    from highresnet_tpu.train.state import create_train_state

    cfg = _tiny_config(train_root, tmp_path)
    cfg["training"]["ema_decay"] = 1.0
    cfg["training"]["lr"] = 0.0
    run_dir = str(tmp_path / "ema_run")
    out = train_and_get_best_model(cfg, run_dir=run_dir)

    hrnet = HRNet(config=cfg["network"])
    shiftnet = ShiftNet()
    init = create_train_state(
        hrnet, shiftnet, cfg, jax.random.PRNGKey(cfg["training"]["seed"])
    )
    init_params = jax.device_get(init.params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), out["params"], init_params
    )

    # resume restores the EMA tree (template includes it) and still returns it
    cfg["training"]["num_epochs"] = 2
    out2 = train_and_get_best_model(cfg, run_dir=run_dir)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), out2["params"], init_params
    )


def test_resume_returns_saved_best_when_no_improvement(train_root, tmp_path):
    """A resumed run whose remaining epochs never beat the restored
    best_score must return the SAVED best weights, not the restored
    current state mislabeled with the better score."""
    import json
    import os

    import jax

    from highresnet_tpu.train.checkpoint import CheckpointManager
    from highresnet_tpu.train.loop import train_and_get_best_model

    cfg = _tiny_config(train_root, tmp_path)
    run_dir = str(tmp_path / "resume_best_run")
    out1 = train_and_get_best_model(cfg, run_dir=run_dir)

    # forge an unbeatable best score into the resume pointer: epoch 2 can
    # then never improve on it, so the loop must serve best/ as-is
    latest_path = os.path.join(run_dir, "latest.json")
    with open(latest_path) as f:
        latest = json.load(f)
    latest["best_score"] = -1e9
    with open(latest_path, "w") as f:
        json.dump(latest, f)

    cfg["training"]["num_epochs"] = 2
    out2 = train_and_get_best_model(cfg, run_dir=run_dir)
    assert out2["best_score"] == -1e9  # never beaten

    saved = CheckpointManager(run_dir).load_best(
        {"params": out1["params"], "batch_stats": out1["batch_stats"]}
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), out2["params"], saved["params"]
    )


def test_val_batch_cache_deterministic_and_equivalent(train_root, tmp_path):
    """Cached val batches: identical scores on replay, and equivalent to
    the on-the-fly path given the same sampling rng."""
    import jax
    import numpy as np_

    from highresnet_tpu.data import discover_scenes, train_val_split
    from highresnet_tpu.models import HRNet, ShiftNet
    from highresnet_tpu.train.loop import build_val_batches, evaluate_model
    from highresnet_tpu.train.state import create_train_state
    from highresnet_tpu.train.step import build_eval_step

    cfg = _tiny_config(train_root, tmp_path)
    scenes = discover_scenes(f"{train_root}/train")
    _, val = train_val_split(scenes, 0.5, seed=1)
    hrnet = HRNet(config=cfg["network"])
    state = create_train_state(hrnet, ShiftNet(), cfg, jax.random.PRNGKey(0))
    eval_step = build_eval_step(hrnet, cfg)

    batches = build_val_batches(val, 4, 4, 50.0, 2, rng=np_.random.default_rng(5))
    kw = dict(min_l=4, baseline_cpsnrs=None, top_k=4, beta=50.0, batch_size=2)
    s1 = evaluate_model(state.params["hrnet"], eval_step, val, prebuilt_batches=batches, **kw)
    s2 = evaluate_model(state.params["hrnet"], eval_step, val, prebuilt_batches=batches, **kw)
    assert s1 == s2  # replay is exact

    # the REAL fallback path (no prebuilt batches, evaluate_model builds
    # internally) must reproduce the cached score given the same seed
    s3 = evaluate_model(
        state.params["hrnet"], eval_step, val,
        sample_rng=np_.random.default_rng(5), **kw,
    )
    assert s3 == s1


def test_early_stop_patience(train_root, tmp_path):
    """With lr=0 the val score never improves after epoch 1, so patience=2
    must end the run at exactly epoch 3 (and keep serving best weights)."""
    import json
    import os

    from highresnet_tpu.train.loop import train_and_get_best_model

    cfg = _tiny_config(train_root, tmp_path)
    cfg["training"]["lr"] = 0.0
    cfg["training"]["num_epochs"] = 10
    cfg["training"]["early_stop_patience"] = 2
    run_dir = str(tmp_path / "early_stop_run")
    out = train_and_get_best_model(cfg, run_dir=run_dir)

    with open(os.path.join(run_dir, "latest.json")) as f:
        latest = json.load(f)
    assert latest["epoch"] == 3  # stopped: best at 1, patience 2
    assert latest["best_epoch"] == 1
    assert out["best_epoch"] == 1
    assert out["best_score"] == latest["best_score"]


def test_ema_best_selection_never_loses_to_raw(train_root, tmp_path):
    """EMA tracking is passive — it never changes the training trajectory —
    so best-model selection over {raw, ema} minimizes over a superset of
    the raw-only candidates and can only match or beat the no-EMA run."""
    from highresnet_tpu.train.loop import train_and_get_best_model

    cfg = _tiny_config(train_root, tmp_path)
    cfg["training"]["num_epochs"] = 3

    cfg["training"]["ema_decay"] = 0.0
    raw_out = train_and_get_best_model(
        cfg, run_dir=str(tmp_path / "raw_run")
    )

    cfg["training"]["ema_decay"] = 0.9999
    ema_out = train_and_get_best_model(
        cfg, run_dir=str(tmp_path / "ema_run")
    )

    assert ema_out["best_score"] <= raw_out["best_score"]


def test_warp_int_range_step_and_window_guard(train_root, tmp_path):
    """training.warp_int_range compiles the extended-range warp into the
    registered step (finite loss, max_abs_shift metric present), and the
    loop's warp-window guard warns exactly once when shifts leave it."""
    import warnings as _warnings

    import jax

    from highresnet_tpu.data import BatchLoader, discover_scenes
    from highresnet_tpu.models import HRNet, ShiftNet
    from highresnet_tpu.train.loop import warn_warp_window, warp_window_px
    from highresnet_tpu.train.state import create_train_state
    from highresnet_tpu.train.step import build_train_step

    cfg = _tiny_config(train_root, tmp_path)
    cfg["training"]["warp_int_range"] = 4
    scenes = discover_scenes(f"{train_root}/train")
    loader = BatchLoader(
        scenes, batch_size=2, min_l=4, top_k=4, beta=50.0,
        create_patches=True, patch_size=16, seed=0, num_workers=1, drop_last=True,
    )
    batch = next(iter(loader))
    hrnet = HRNet(config=cfg["network"])
    shiftnet = ShiftNet()
    state = create_train_state(hrnet, shiftnet, cfg, jax.random.PRNGKey(0))
    step = build_train_step(hrnet, shiftnet, cfg)
    state, metrics = step(state, batch.lrs, batch.alphas, batch.hrs, batch.hr_maps)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["max_abs_shift"]) >= float(metrics["mean_abs_shift"]) - 1e-6

    # window math: ±3 px reference-exact, ±(K+0.5) px decomposed
    assert warp_window_px({"warp_int_range": 0}) == 3.0
    assert warp_window_px({}) == 3.0
    assert warp_window_px({"warp_int_range": 4}) == 4.5

    # guard semantics: only when registering and over-window; doubling
    # epoch back-off so a persistent violation stays visible while a
    # first-epoch ShiftNet transient warns exactly once
    t = {"register": True, "warp_int_range": 0}
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        assert warn_warp_window(t, 2.0, 1, 1) == 1  # in window: silent
        assert warn_warp_window(t, 3.5, 1, 1) == 2  # fires, re-arms at 2
        assert warn_warp_window(t, 5.0, 1, 2) == 2  # backed off: silent
        assert warn_warp_window(t, 5.0, 2, 2) == 4  # persistent: fires again
        assert warn_warp_window(t, 2.0, 3, 4) == 4  # recovered: silent
        assert warn_warp_window(t, 9.0, 50, 4) == 100  # re-emergence fires
        assert warn_warp_window({"register": False}, 9.0, 4, 1) == 1
    assert len(w) == 3 and all("warp" in str(x.message) for x in w)


def test_init_params_from_finetunes_saved_best(train_root, tmp_path):
    """training.init_params_from seeds a FRESH run (new optimizer/schedule)
    from another run's best/ snapshot — fine-tune, not resume."""
    import jax

    from highresnet_tpu.train.loop import train_and_get_best_model
    from highresnet_tpu.train.setup import build_models_and_steps

    cfg = _tiny_config(train_root, tmp_path)
    donor_dir = str(tmp_path / "donor_run")
    donor = train_and_get_best_model(cfg, run_dir=donor_dir)

    from highresnet_tpu.data import discover_scenes

    train_list = discover_scenes(f"{train_root}/train")

    cfg2 = _tiny_config(train_root, tmp_path)
    cfg2["training"]["init_params_from"] = donor_dir
    cfg2["training"]["ema_decay"] = 0.99  # EMA must start AT the loaded point
    pieces = build_models_and_steps(
        cfg2, None, False, multihost=False, seed=123,
        train_list=train_list, is_primary=True,
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b),
        jax.device_get(pieces.state.params), donor["params"],
    )
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b),
        jax.device_get(pieces.state.ema_params), donor["params"],
    )
    # fresh optimizer: Adam moments start at zero despite the loaded params
    mu = jax.tree_util.tree_leaves(pieces.state.opt_state.inner_state[0].mu)
    assert all(float(np.abs(m).max()) == 0.0 for m in mu)

    # and the loop accepts the knob end-to-end (1 epoch, loads then trains)
    cfg3 = _tiny_config(train_root, tmp_path)
    cfg3["training"]["init_params_from"] = donor_dir
    out = train_and_get_best_model(cfg3)
    assert np.isfinite(out["best_score"])


def test_range_penalty_targets_out_of_range_output(train_root, tmp_path):
    """training.range_penalty adds rp * mean(relu(sr-1) + relu(-sr)) on the
    raw SR output; 0 keeps the reference-exact loss bit-identical."""
    import jax

    from highresnet_tpu.data import BatchLoader, discover_scenes
    from highresnet_tpu.models import HRNet, ShiftNet
    from highresnet_tpu.train.state import create_train_state
    from highresnet_tpu.train.step import build_train_step

    cfg = _tiny_config(train_root, tmp_path)
    scenes = discover_scenes(f"{train_root}/train")
    loader = BatchLoader(
        scenes, batch_size=2, min_l=4, top_k=4, beta=50.0,
        create_patches=True, patch_size=16, seed=0, num_workers=1, drop_last=True,
    )
    batch = next(iter(loader))
    hrnet = HRNet(config=cfg["network"])
    shiftnet = ShiftNet()

    losses = {}
    params0 = None
    for rp in (0.0, 7.0):
        import copy

        c = copy.deepcopy(cfg)
        c["training"]["range_penalty"] = rp
        # the step donates its state buffers: rebuild the (identically
        # seeded) state per arm instead of reusing deleted arrays
        state = create_train_state(hrnet, shiftnet, c, jax.random.PRNGKey(0))
        if params0 is None:
            params0 = jax.device_get(state.params)
        step = build_train_step(hrnet, shiftnet, c)
        _, metrics = step(state, batch.lrs, batch.alphas, batch.hrs, batch.hr_maps)
        losses[rp] = float(metrics["loss"])

    # random-init output leaves [0,1] (see the views-ablation clip-floor
    # evidence), so the penalized loss must sit strictly above the base
    # loss, and the gap must scale with rp
    sr = hrnet.apply({"params": params0["hrnet"]}, batch.lrs, batch.alphas)
    overflow = float(
        np.mean(np.maximum(np.asarray(sr) - 1.0, 0) + np.maximum(-np.asarray(sr), 0))
    )
    assert overflow > 0  # precondition: the penalty has something to bite
    np.testing.assert_allclose(losses[7.0] - losses[0.0], 7.0 * overflow, rtol=1e-3)


def test_resume_prefers_best_score_sidecar_over_stale_latest(train_root, tmp_path):
    """After a crash between a synchronous best/ save and the next committed
    full-state slot, latest.json's best_score is stale; resume must label
    the restored best/ weights with best_score.json (written WITH them)."""
    import json
    import os

    from highresnet_tpu.train.loop import train_and_get_best_model

    cfg = _tiny_config(train_root, tmp_path)
    run_dir = str(tmp_path / "wedge_run")
    out1 = train_and_get_best_model(cfg, run_dir=run_dir)

    # simulate the wedge: the slot pointer carries an OLDER (worse) best
    latest_path = os.path.join(run_dir, "latest.json")
    with open(latest_path) as f:
        latest = json.load(f)
    true_best = latest["best_score"]
    latest["best_score"] = true_best + 1.0  # stale, worse
    latest["best_epoch"] = 0
    with open(latest_path, "w") as f:
        json.dump(latest, f)

    with open(os.path.join(run_dir, "best_score.json")) as f:
        sidecar = json.load(f)
    assert sidecar["score"] == out1["best_score"] == true_best
    assert sidecar["epoch"] == out1["best_epoch"]

    # relaunch of the finished run: no epochs run, so the returned label
    # must come from the sidecar, not the tampered slot pointer
    out2 = train_and_get_best_model(cfg, run_dir=run_dir)
    assert out2["best_score"] == true_best
    assert out2["best_epoch"] == out1["best_epoch"]


def test_val_views_mixture_selection(train_root, tmp_path):
    """training.val_views scores the val set at several view counts and
    selects on the mean (full stack always included)."""
    import jax

    from highresnet_tpu.train.evaluation import build_val_batches
    from highresnet_tpu.train.loop import train_and_get_best_model

    cfg = _tiny_config(train_root, tmp_path)
    cfg["training"]["val_views"] = [2, 1]
    out = train_and_get_best_model(cfg)
    assert np.isfinite(out["best_score"])

    # reproduce the mixture by hand on the returned best weights: the same
    # seeded rng per batch list, full stack + each truncated count
    from highresnet_tpu.data import discover_scenes, train_val_split
    from highresnet_tpu.models.hrnet import HRNet
    from highresnet_tpu.train.evaluation import evaluate_model
    from highresnet_tpu.train.step import build_eval_step

    import os

    from highresnet_tpu.data.probav import read_baseline_cpsnr

    scenes = discover_scenes(f"{train_root}/train")
    _, val = train_val_split(scenes, cfg["training"]["val_proportion"], seed=1)
    baseline = read_baseline_cpsnr(os.path.join(train_root, "norm.csv"))
    hrnet = HRNet(config=cfg["network"])
    eval_step = build_eval_step(hrnet, cfg)
    t = cfg["training"]
    scores = []
    for k in (None, 2, 1):
        batches = build_val_batches(
            val, t["min_L"], t["n_views"], t["beta"], t["eval_batch_size"],
            rng=np.random.default_rng(t.get("seed", 0) + 10007), truncate_to=k,
        )
        scores.append(evaluate_model(
            out["params"]["hrnet"], eval_step, val, t["min_L"], baseline,
            top_k=t["n_views"], beta=t["beta"],
            batch_size=t["eval_batch_size"], prebuilt_batches=batches,
        ))
    # truncating views must change the score (the mixture really scored
    # different stacks), and the loop's best must equal the hand mixture
    assert scores[0] != scores[1] or scores[0] != scores[2]
    np.testing.assert_allclose(out["best_score"], np.mean(scores), rtol=1e-6)
