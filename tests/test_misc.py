"""Coverage for auxiliary paths: integer resampler, profiling helpers,
pack CLI, loader error propagation, clearance CLI."""

import numpy as np
import pytest


def test_lanczos_resample_2d_properties():
    import jax.numpy as jnp

    from highresnet_tpu.ops.lanczos import lanczos_resample_2d

    const = jnp.full((24, 24), 0.7)
    out = np.asarray(lanczos_resample_2d(const, 3))
    assert out.shape == (8, 8)
    np.testing.assert_allclose(out, 0.7, atol=1e-5)

    # a linear ramp stays (approximately) a linear ramp under downscale
    ramp = jnp.broadcast_to(jnp.linspace(0, 1, 24), (24, 24))
    out = np.asarray(lanczos_resample_2d(ramp, 3))
    interior = out[2:-2, 2:-2]
    diffs = np.diff(interior, axis=1)
    np.testing.assert_allclose(diffs, diffs.mean(), atol=1e-3)


def test_profiling_timed_and_sync():
    import jax.numpy as jnp

    from highresnet_tpu.utils.profiling import sync, timed

    def f(x):
        return x * 2.0

    dt, result = timed(f, jnp.ones((8, 8)), iters=3, warmup=1)
    assert dt >= 0
    np.testing.assert_allclose(np.asarray(result), 2.0)
    sync(None)  # no-op on empty trees
    sync({"a": jnp.ones(3)})


def test_pack_cli(tmp_path):
    from highresnet_tpu.cli.pack_dataset import main as pack_main
    from highresnet_tpu.data.synth import make_synthetic_dataset
    import os

    make_synthetic_dataset(str(tmp_path), n_scenes_per_channel=1, n_views=3,
                           lr_size=16, seed=0, splits=("train",))
    pack_main(["--prefix", str(tmp_path)])
    from highresnet_tpu.data import discover_scenes

    for d in discover_scenes(f"{tmp_path}/train"):
        assert os.path.isfile(os.path.join(d, "packed.npz"))


def test_save_clearance_cli(tmp_path):
    from highresnet_tpu.cli.save_clearance import main as sc_main
    from highresnet_tpu.data.synth import make_synthetic_dataset
    import os

    make_synthetic_dataset(str(tmp_path), n_scenes_per_channel=1, n_views=3,
                           lr_size=16, seed=1, splits=("train",))
    sc_main(["--prefix", str(tmp_path)])
    from highresnet_tpu.data import discover_scenes

    for d in discover_scenes(f"{tmp_path}/train"):
        assert os.path.isfile(os.path.join(d, "clearance.npy"))


def test_batch_loader_propagates_errors(tmp_path):
    from highresnet_tpu.data.pipeline import BatchLoader

    loader = BatchLoader([str(tmp_path / "nonexistent_scene")], batch_size=1, min_l=2)
    with pytest.raises(Exception):
        list(loader)


def test_batch_loader_abandoned_iterator_stops_producer(tmp_path):
    """Breaking out of the loader must not leave the producer thread
    blocked on the bounded queue."""
    import threading
    import time

    from highresnet_tpu.data.pipeline import BatchLoader
    from highresnet_tpu.data.synth import make_synthetic_dataset
    from highresnet_tpu.data import discover_scenes

    make_synthetic_dataset(str(tmp_path), n_scenes_per_channel=3, n_views=3,
                           lr_size=16, seed=2, splits=("train",))
    scenes = discover_scenes(f"{tmp_path}/train") * 4  # 24 scenes
    loader = BatchLoader(scenes, batch_size=2, min_l=3, prefetch=1, num_workers=1)
    before = threading.active_count()
    it = iter(loader)
    next(it)
    it.close()  # abandon mid-epoch (generator finally -> stop event)
    deadline = time.time() + 5
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_bench_smoke():
    """bench.py must keep working — the driver's round metric depends on it."""
    import io
    import json
    import sys as _sys

    sys_path_added = "/root/repo" not in _sys.path
    import bench

    captured = io.StringIO()
    stdout = _sys.stdout
    _sys.stdout = captured
    try:
        bench.main(smoke=True)
    finally:
        _sys.stdout = stdout
    line = captured.getvalue().strip().splitlines()[-1]
    payload = json.loads(line)
    assert set(payload) == {"metric", "value", "unit", "vs_baseline"}
    assert payload["value"] > 0


def test_crop_mask_zero_crop():
    from highresnet_tpu.ops.losses import crop_mask

    m = crop_mask(patch_size=4, crop=0)
    assert m.min() == 1.0  # no border zeroed


def test_enqueue_timed_measures_slope():
    """The shared two-point protocol returns per-step time with fixed
    per-measurement overhead cancelled (the property the relay needs)."""
    import time as _time

    from highresnet_tpu.utils.profiling import enqueue_timed

    calls = {"n": 0}

    def step():
        calls["n"] += 1
        _time.sleep(0.002)  # 2 ms per enqueue
        return None

    dt = enqueue_timed(step, k1=3, k2=13, warmups=1)
    # slope should recover ~2 ms/step regardless of any fixed overhead
    assert 0.0015 < dt < 0.02, dt
    assert calls["n"] == 1 + 3 + 13
