"""Multi-device tests on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_shard_batch_layout():
    from highresnet_tpu.parallel.mesh import make_mesh, shard_batch

    mesh = make_mesh()
    x = np.arange(8 * 3 * 4, dtype=np.float32).reshape(8, 3, 4)
    sharded = shard_batch(mesh, (x, None))
    arr = sharded[0]
    assert sharded[1] is None
    assert arr.shape == (8, 3, 4)
    # each device holds one batch row
    assert len(arr.addressable_shards) == 8
    assert arr.addressable_shards[0].data.shape == (1, 3, 4)
    np.testing.assert_array_equal(np.asarray(arr), x)


def test_dp_train_step_matches_single_device():
    """The mesh-sharded train step must produce the same loss/params as the
    single-device step (XLA's grad all-reduce == serial computation)."""
    from highresnet_tpu.models.hrnet import HRNet
    from highresnet_tpu.models.shiftnet import ShiftNet
    from highresnet_tpu.parallel.mesh import make_mesh, shard_batch
    from highresnet_tpu.train.state import create_train_state
    from highresnet_tpu.train.step import build_train_step

    config = {
        "network": {
            "encoder": {"in_channels": 2, "num_layers": 1, "kernel_size": 3, "channel_size": 4},
            "recursive": {"alpha_residual": True, "in_channels": 4, "kernel_size": 3},
            "decoder": {
                "deconv": {"in_channels": 4, "kernel_size": 3, "stride": 3, "out_channels": 4},
                "final": {"in_channels": 4, "kernel_size": 1, "out_channels": 1},
            },
        },
        "training": {
            "batch_size": 8, "min_L": 2, "n_views": 2, "crop": 1, "lr": 1e-3,
            "lambda": 1e-6, "beta": 50.0, "patch_size": 12, "register_size": 24,
        },
    }
    hrnet = HRNet(config=config["network"])
    shiftnet = ShiftNet()

    rng = np.random.default_rng(0)
    b, l, p = 8, 2, 12
    batch = (
        rng.random((b, l, p, p)).astype(np.float32),
        np.ones((b, l), np.float32),
        rng.random((b, 3 * p, 3 * p)).astype(np.float32),
        np.ones((b, 3 * p, 3 * p), np.float32),
    )

    state1 = create_train_state(hrnet, shiftnet, config, jax.random.PRNGKey(0))
    step1 = build_train_step(hrnet, shiftnet, config, mesh=None)
    state1, m1 = step1(state1, *batch)

    mesh = make_mesh()
    state8 = create_train_state(hrnet, shiftnet, config, jax.random.PRNGKey(0))
    step8 = build_train_step(hrnet, shiftnet, config, mesh=mesh)
    state8, m8 = step8(state8, *shard_batch(mesh, batch))

    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-5)
    p1 = jax.device_get(state1.params)
    p8 = jax.device_get(state8.params)
    flat1 = jax.tree_util.tree_leaves(p1)
    flat8 = jax.tree_util.tree_leaves(p8)
    for a, b_ in zip(flat1, flat8):
        np.testing.assert_allclose(a, b_, atol=2e-5)


def test_2d_mesh_view_sharded_step_matches_single_device():
    """(data=4, view=2) mesh: batch AND view axes sharded; same numerics."""
    from jax.sharding import PartitionSpec as P

    from highresnet_tpu.models.hrnet import HRNet
    from highresnet_tpu.models.shiftnet import ShiftNet
    from highresnet_tpu.parallel.mesh import make_mesh, put_with_specs
    from highresnet_tpu.train.state import create_train_state
    from highresnet_tpu.train.step import build_train_step

    config = {
        "network": {
            "encoder": {"in_channels": 2, "num_layers": 1, "kernel_size": 3, "channel_size": 4},
            "recursive": {"alpha_residual": True, "in_channels": 4, "kernel_size": 3},
            "decoder": {
                "deconv": {"in_channels": 4, "kernel_size": 3, "stride": 3, "out_channels": 4},
                "final": {"in_channels": 4, "kernel_size": 1, "out_channels": 1},
            },
        },
        "training": {
            "batch_size": 4, "min_L": 4, "n_views": 4, "crop": 1, "lr": 1e-3,
            "lambda": 1e-6, "beta": 50.0, "patch_size": 12, "register_size": 24,
        },
    }
    hrnet = HRNet(config=config["network"])
    shiftnet = ShiftNet()
    rng = np.random.default_rng(1)
    b, l, p = 4, 4, 12
    batch = (
        rng.random((b, l, p, p)).astype(np.float32),
        np.ones((b, l), np.float32),
        rng.random((b, 3 * p, 3 * p)).astype(np.float32),
        np.ones((b, 3 * p, 3 * p), np.float32),
    )

    state1 = create_train_state(hrnet, shiftnet, config, jax.random.PRNGKey(0))
    step1 = build_train_step(hrnet, shiftnet, config, mesh=None)
    _, m1 = step1(state1, *batch)

    mesh = make_mesh(shape=(4, 2), axis_names=("data", "view"))
    state2 = create_train_state(hrnet, shiftnet, config, jax.random.PRNGKey(0))
    step2 = build_train_step(hrnet, shiftnet, config, mesh=mesh, shard_views=True)
    sharded = put_with_specs(
        mesh, batch,
        (P("data", "view", None, None), P("data", "view"),
         P("data", None, None), P("data", None, None)),
    )
    _, m2 = step2(state2, *sharded)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)


def test_mesh_sharded_eval_step():
    """build_eval_step with a mesh: SR + shift-search scores over sharded batch."""
    from highresnet_tpu.models.hrnet import HRNet
    from highresnet_tpu.parallel.mesh import make_mesh, shard_batch
    from highresnet_tpu.train.step import build_eval_step

    cfg = {
        "network": {
            "encoder": {"in_channels": 2, "num_layers": 1, "kernel_size": 3, "channel_size": 4},
            "recursive": {"alpha_residual": True, "in_channels": 4, "kernel_size": 3},
            "decoder": {
                "deconv": {"in_channels": 4, "kernel_size": 3, "stride": 3, "out_channels": 4},
                "final": {"in_channels": 4, "kernel_size": 1, "out_channels": 1},
            },
        },
        "training": {},
    }
    hrnet = HRNet(config=cfg["network"])
    rng = np.random.default_rng(0)
    b, l, p = 8, 2, 12
    lrs = rng.random((b, l, p, p)).astype(np.float32)
    alphas = np.ones((b, l), np.float32)
    hrs = rng.random((b, 3 * p, 3 * p)).astype(np.float32)
    maps = np.ones((b, 3 * p, 3 * p), np.float32)
    variables = hrnet.init(jax.random.PRNGKey(0), jnp_asarray(lrs), jnp_asarray(alphas))

    single = build_eval_step(hrnet, cfg)
    srs1, scores1 = single(variables["params"], lrs, alphas, hrs, maps)

    mesh = make_mesh()
    sharded = build_eval_step(hrnet, cfg, mesh=mesh)
    args = shard_batch(mesh, (lrs, alphas, hrs, maps))
    srs8, scores8 = sharded(variables["params"], *args)
    np.testing.assert_allclose(np.asarray(scores1), np.asarray(scores8), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(srs1), np.asarray(srs8), atol=1e-5)


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_forward_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (2, 192, 192)
    assert np.isfinite(np.asarray(out)).all()


def test_make_global_batch_matches_shard_batch():
    """Single-process equivalence of the two feeding paths: device_put with
    NamedSharding vs make_array_from_process_local_data (multi-host path)."""
    from jax.sharding import PartitionSpec as P

    from highresnet_tpu.parallel import make_global_batch, make_mesh, shard_batch

    mesh = make_mesh(n_devices=4)
    rng = np.random.default_rng(0)
    batch = (
        rng.random((8, 4, 8, 8)).astype(np.float32),
        np.ones((8, 4), np.float32),
        rng.random((8, 24, 24)).astype(np.float32),
        np.ones((8, 24, 24), np.float32),
    )
    specs = (P("data", None, None, None), P("data", None), P("data", None, None), P("data", None, None))
    a = shard_batch(mesh, batch)
    b = make_global_batch(mesh, batch, specs)
    for x, y in zip(a, b):
        assert x.sharding == y.sharding
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_global_from_replicated_cuts_local_shards():
    from jax.sharding import PartitionSpec as P

    from highresnet_tpu.parallel import global_from_replicated, make_mesh

    mesh = make_mesh(n_devices=4)
    full = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    (g,) = global_from_replicated(mesh, (full,), (P("data", None),))
    assert g.shape == (8, 3)
    np.testing.assert_array_equal(np.asarray(g), full)
    # each device holds exactly its slice
    for shard in g.addressable_shards:
        np.testing.assert_array_equal(np.asarray(shard.data), full[shard.index])


def test_replicate_to_mesh_and_broadcast_string():
    from highresnet_tpu.parallel import broadcast_string, make_mesh, replicate_to_mesh

    mesh = make_mesh(n_devices=4)
    tree = {"w": np.arange(6, dtype=np.float32).reshape(2, 3), "none": None}
    out = replicate_to_mesh(mesh, tree)
    assert out["none"] is None
    assert len(out["w"].sharding.device_set) == 4
    np.testing.assert_array_equal(np.asarray(out["w"]), tree["w"])
    # single-process: identity
    assert broadcast_string("models/run_x") == "models/run_x"


def test_maybe_initialize_noop_without_env(monkeypatch):
    from highresnet_tpu.parallel import maybe_initialize

    monkeypatch.delenv("HRN_DISTRIBUTED", raising=False)
    monkeypatch.delenv("HRN_COORDINATOR", raising=False)
    maybe_initialize()  # must not raise or re-init
    assert jax.process_count() == 1


@pytest.mark.slow
def test_loop_level_2d_mesh_matches_1d(tmp_path):
    """training.mesh={'data':2,'view':2} flows from the user-facing loop to
    a 2-D view-sharded train step; the PER-STEP LOSSES match the 1-D
    data-parallel layout (same seed, same deterministic batch order) to
    float tolerance. Losses — not params or val scores — are compared:
    eval view-sampling is unseeded, and Adam turns reduction-order noise in
    near-zero gradients into +-lr param flips (update ~ sign(g) on step 1),
    so bitwise param equality across layouts is not a meaningful bar."""
    import copy

    import jax

    import highresnet_tpu.train.setup as S
    from highresnet_tpu.data.synth import make_synthetic_dataset
    from highresnet_tpu.train.loop import train_and_get_best_model

    root = tmp_path / "data2d"
    make_synthetic_dataset(
        str(root), n_scenes_per_channel=8, n_views=4, lr_size=24, seed=0, splits=("train",)
    )
    base = {
        "network": {
            "encoder": {"in_channels": 2, "num_layers": 1, "kernel_size": 3, "channel_size": 8},
            "recursive": {"alpha_residual": True, "in_channels": 8, "kernel_size": 3},
            "decoder": {
                "deconv": {"in_channels": 8, "kernel_size": 3, "stride": 3, "out_channels": 8},
                "final": {"in_channels": 8, "kernel_size": 1, "out_channels": 1},
            },
        },
        "training": {
            "batch_size": 4, "min_L": 4, "n_views": 4, "crop": 1, "lr": 1e-3,
            "lr_step": 2, "lr_decay": 0.97, "beta": 50.0, "create_patches": True,
            "patch_size": 16, "register_size": 32, "val_proportion": 0.25,
            "lambda": 1e-6, "num_epochs": 1, "n_workers": 1, "seed": 0,
            "eval_batch_size": 2, "checkpoint_every": 0, "shuffle": False,
        },
        "paths": {"prefix": str(root), "checkpoint_dir": "", "tb_log_file_dir": ""},
    }

    losses = {}
    orig_build = S.build_train_step

    def capturing_build(*a, **k):
        step = orig_build(*a, **k)
        record = losses[_current[0]]

        def wrapped(state, *args):
            state, m = step(state, *args)
            record.append(float(m["loss"]))
            return state, m

        return wrapped

    _current = [None]
    S.build_train_step = capturing_build
    try:
        for name, mesh_cfg in (("1d", {"data": 4}), ("2d", {"data": 2, "view": 2})):
            cfg = copy.deepcopy(base)
            cfg["training"]["mesh"] = mesh_cfg
            cfg["paths"]["checkpoint_dir"] = str(tmp_path / f"ckpt_{name}")
            _current[0] = name
            losses[name] = []
            train_and_get_best_model(cfg)
    finally:
        S.build_train_step = orig_build

    assert len(losses["1d"]) == len(losses["2d"]) == 3, losses  # 12 scenes / batch 4
    np.testing.assert_allclose(losses["1d"], losses["2d"], rtol=1e-4, atol=1e-5)
    assert all(np.isfinite(v) for v in losses["1d"])


def test_loop_mesh_config_validation(tmp_path):
    """Bad training.mesh configs fail fast with actionable errors."""
    import copy

    from highresnet_tpu.data.synth import make_synthetic_dataset
    from highresnet_tpu.train.loop import train_and_get_best_model

    root = tmp_path / "data_v"
    make_synthetic_dataset(
        str(root), n_scenes_per_channel=1, n_views=4, lr_size=24, seed=0, splits=("train",)
    )
    base = {
        "network": {},
        "training": {
            "batch_size": 3, "min_L": 4, "n_views": 4, "crop": 1, "lr": 1e-3,
            "lr_step": 2, "lr_decay": 0.97, "beta": 50.0, "patch_size": 16,
            "register_size": 32, "val_proportion": 0.5, "lambda": 1e-6,
            "num_epochs": 1, "n_workers": 1, "seed": 0,
        },
        "paths": {"prefix": str(root), "checkpoint_dir": str(tmp_path / "c"), "tb_log_file_dir": ""},
    }
    for mesh_cfg, match in (
        ({"data": 16, "view": 1}, "exceeds"),
        ({"data": 2, "view": 1}, "batch_size"),
        ({"data": 1, "view": 3}, "min_L"),
        # fewer scenes than one batch: meshed runs drop ragged batches and
        # would otherwise silently train zero steps per epoch
        ({"data": 1, "view": 1}, "local training scenes"),
    ):
        cfg = copy.deepcopy(base)
        cfg["training"]["mesh"] = mesh_cfg
        with pytest.raises(ValueError, match=match):
            train_and_get_best_model(cfg)


def test_drop_cpu_persistent_cache_multiprocess_only(monkeypatch):
    """The persistent-cache guard fires only for multi-process CPU runtimes
    (on AMX-class hosts every cache load spams cpu_aot_loader feature-
    mismatch errors and rank hit/compile skew can trip coordination
    barriers; see distributed._drop_cpu_persistent_cache)."""
    from highresnet_tpu.parallel import distributed as dist

    cache_dir = "/tmp/jax_cache_guard_test"
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    try:
        # single process: untouched (the cache works fine in-process)
        dist._drop_cpu_persistent_cache()
        assert jax.config.jax_compilation_cache_dir == cache_dir

        # multi-process CPU: dropped
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        dist._drop_cpu_persistent_cache()
        assert not jax.config.jax_compilation_cache_dir
    finally:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
