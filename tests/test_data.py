"""Data pipeline tests on a generated synthetic Proba-V dataset."""

import numpy as np
import pytest

from highresnet_tpu.data import (
    BatchLoader,
    SceneDataset,
    collate,
    compute_clearance_scores,
    discover_scenes,
    read_baseline_cpsnr,
    read_imageset,
    sample_clearest,
    save_clearance_scores,
    shard_for_hosts,
    train_val_split,
)
from highresnet_tpu.data.synth import make_synthetic_dataset
from highresnet_tpu.utils.imageio import img_as_float32, img_as_uint16, imread_u16, imsave_u16


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("probav")
    make_synthetic_dataset(str(root), n_scenes_per_channel=3, n_views=6, lr_size=16, seed=0)
    return str(root)


def test_png_roundtrip(tmp_path):
    img = (np.arange(32 * 32).reshape(32, 32) * 61).astype(np.uint16)
    p = tmp_path / "x.png"
    imsave_u16(p, img)
    back = imread_u16(p)
    np.testing.assert_array_equal(img, back)


def test_img_as_float_semantics():
    u16 = np.array([0, 65535, 32768], np.uint16)
    f = img_as_float32(u16)
    np.testing.assert_allclose(f, [0.0, 1.0, 32768 / 65535], rtol=1e-6)
    u8 = np.array([0, 255], np.uint8)
    np.testing.assert_allclose(img_as_float32(u8), [0.0, 1.0])
    back = img_as_uint16(np.array([0.0, 1.0, 0.5]))
    np.testing.assert_array_equal(back, [0, 65535, 32768])


def test_discovery_and_clearance(dataset_root):
    scenes = discover_scenes(f"{dataset_root}/train")
    assert len(scenes) == 6  # 3 per channel x 2 channels
    scores = compute_clearance_scores(scenes[0])
    assert scores.shape == (6,)
    assert (scores > 0).all()
    save_clearance_scores(scenes[:1])
    import os

    assert os.path.isfile(os.path.join(scenes[0], "clearance.npy"))


def test_sample_clearest_distribution():
    """beta=inf-ish should pick the clearest; beta=0 is uniform."""
    rng = np.random.default_rng(0)
    c = np.array([1.0, 2.0, 3.0, 100.0])
    picks = [sample_clearest(c, n=1, beta=500.0, rng=rng)[0] for _ in range(50)]
    assert all(p == 3 for p in picks)

    counts = np.zeros(4)
    for _ in range(2000):
        counts[sample_clearest(c, n=1, beta=0.0, rng=rng)[0]] += 1
    assert counts.min() > 2000 / 4 * 0.7  # roughly uniform


def test_sample_clearest_no_replacement():
    rng = np.random.default_rng(1)
    c = np.ones(5)
    s = sample_clearest(c, n=5, beta=50.0, rng=rng)
    assert sorted(s.tolist()) == [0, 1, 2, 3, 4]


def test_sample_clearest_stable_at_huge_beta():
    rng = np.random.default_rng(2)
    c = np.array([1e9, 2e9, 3e9])
    s = sample_clearest(c, n=2, beta=1e6, rng=rng)  # reference overflows here
    assert s[0] == 2


def test_read_imageset_full(dataset_root):
    scenes = discover_scenes(f"{dataset_root}/train")
    s = read_imageset(scenes[0], top_k=None)
    assert s.lr.shape == (6, 16, 16)
    assert s.lr.dtype == np.float32
    assert 0 <= s.lr.min() and s.lr.max() <= 1
    assert s.hr.shape == (48, 48)
    assert s.hr_map.shape == (48, 48)
    # full read is sorted by clearance, descending
    assert (np.diff(s.clearances) <= 0).all()


def test_read_imageset_patches_and_topk(dataset_root):
    scenes = discover_scenes(f"{dataset_root}/train")
    rng = np.random.default_rng(3)
    s = read_imageset(scenes[1], create_patches=True, patch_size=8, top_k=4, beta=50.0, rng=rng)
    assert s.lr.shape == (4, 8, 8)
    assert s.hr.shape == (24, 24)
    assert s.hr_map.shape == (24, 24)


def test_test_split_has_no_hr(dataset_root):
    scenes = discover_scenes(f"{dataset_root}/test")
    s = read_imageset(scenes[0])
    assert s.hr is None
    assert s.hr_map is not None


def test_collate_pad_and_truncate(dataset_root):
    scenes = discover_scenes(f"{dataset_root}/train")
    sets = [read_imageset(d) for d in scenes[:2]]  # 6 views each
    b = collate(sets, min_l=4)  # truncate
    assert b.lrs.shape == (2, 4, 16, 16)
    assert (b.alphas == 1).all()
    b8 = collate(sets, min_l=8)  # pad
    assert b8.lrs.shape == (2, 8, 16, 16)
    np.testing.assert_array_equal(b8.alphas[:, 6:], 0)
    np.testing.assert_array_equal(b8.lrs[:, 6:], 0)
    assert b8.hrs.shape == (2, 48, 48)


def test_batch_loader_epoch(dataset_root):
    scenes = discover_scenes(f"{dataset_root}/train")
    loader = BatchLoader(
        scenes, batch_size=4, min_l=4, top_k=4, beta=50.0,
        create_patches=True, patch_size=8, seed=7, num_workers=2,
    )
    batches = list(loader)
    assert len(batches) == len(loader) == 2  # 6 scenes / bs 4 -> 2 batches
    assert batches[0].lrs.shape == (4, 4, 8, 8)
    assert batches[1].lrs.shape == (2, 4, 8, 8)
    # different epochs reshuffle
    names1 = [n for b in batches for n in b.names]
    names2 = [n for b in loader for n in b.names]
    assert sorted(names1) == sorted(names2)
    assert names1 != names2


def test_shard_for_hosts():
    dirs = [f"s{i}" for i in range(10)]
    shards = [shard_for_hosts(dirs, h, 4) for h in range(4)]
    # equal length per host (collective step counts must match)...
    assert len({len(s) for s in shards}) == 1
    # ...so the list is truncated to a multiple of n_hosts, no overlaps
    flat = sorted(d for s in shards for d in s)
    assert flat == sorted(dirs[:8])
    # evenly divisible case covers everything
    shards12 = [shard_for_hosts([f"s{i}" for i in range(12)], h, 4) for h in range(4)]
    assert sorted(d for s in shards12 for d in s) == sorted(f"s{i}" for i in range(12))


def test_norm_csv_and_split(dataset_root):
    scores = read_baseline_cpsnr(f"{dataset_root}/norm.csv")
    assert len(scores) == 6
    assert all(45 <= v <= 50 for v in scores.values())
    scenes = discover_scenes(f"{dataset_root}/train")
    tr, val = train_val_split(scenes, val_proportion=0.34, seed=1)
    assert len(tr) + len(val) == 6 and len(val) == 3
    # deterministic
    tr2, val2 = train_val_split(scenes, val_proportion=0.34, seed=1)
    assert tr == tr2 and val == val2


def test_scene_dataset_indexing(dataset_root):
    scenes = discover_scenes(f"{dataset_root}/train")
    ds = SceneDataset(scenes)
    assert len(ds) == 6
    s0 = ds[0]
    by_name = ds[s0.name]
    assert by_name.name == s0.name
    sl = ds[0:2]
    assert isinstance(sl, list) and len(sl) == 2


def test_synth_detail_adds_high_frequency(tmp_path):
    """detail>0 injects pixel-scale structure that decimation destroys."""
    from highresnet_tpu.data.synth import make_synthetic_dataset

    make_synthetic_dataset(str(tmp_path / "a"), n_scenes_per_channel=1, n_views=2,
                           lr_size=16, seed=0, splits=("train",), detail=0.0)
    make_synthetic_dataset(str(tmp_path / "b"), n_scenes_per_channel=1, n_views=2,
                           lr_size=16, seed=0, splits=("train",), detail=0.5)
    a = read_imageset(discover_scenes(f"{tmp_path}/a/train")[0]).hr
    b = read_imageset(discover_scenes(f"{tmp_path}/b/train")[0]).hr
    # high-frequency energy: mean squared neighbor difference
    hf = lambda x: float(np.mean(np.square(np.diff(x, axis=0))))
    assert hf(b) > 5 * hf(a)


def test_packed_cache_roundtrip(dataset_root):
    """Packed scenes load identically to PNG-decoded ones."""
    import shutil

    from highresnet_tpu.data.pack import PACK_NAME, pack_scene

    scenes = discover_scenes(f"{dataset_root}/train")
    scene = scenes[2]
    before = read_imageset(scene, top_k=None)
    pack_path = pack_scene(scene)
    try:
        after = read_imageset(scene, top_k=None)
        np.testing.assert_array_equal(before.lr, after.lr)
        np.testing.assert_array_equal(before.hr, after.hr)
        np.testing.assert_array_equal(before.hr_map, after.hr_map)
        np.testing.assert_array_equal(before.clearances, after.clearances)
        # sampling path works off the pack too
        rng = np.random.default_rng(0)
        s = read_imageset(scene, top_k=3, beta=50.0, rng=rng, create_patches=True, patch_size=8)
        assert s.lr.shape == (3, 8, 8)
    finally:
        import os

        os.remove(pack_path)


def test_packed_cache_staleness(dataset_root):
    """A pack older than its source PNGs is ignored with a warning."""
    import os

    from highresnet_tpu.data.pack import load_pack, pack_scene

    scenes = discover_scenes(f"{dataset_root}/train")
    scene = scenes[1]
    pack_path = pack_scene(scene)
    try:
        assert load_pack(scene) is not None
        # touch one source PNG to be newer than the pack
        lr0 = os.path.join(scene, "LR000.png")
        future = os.stat(pack_path).st_mtime + 10
        os.utime(lr0, (future, future))
        with pytest.warns(UserWarning, match="older than its source"):
            assert load_pack(scene) is None
        # re-packing makes it fresh again (the PNG was stamped 10 s into
        # the future above, so stamp the new pack past it)
        pack_scene(scene)
        os.utime(pack_path, (future + 10, future + 10))
        assert load_pack(scene) is not None
    finally:
        os.remove(pack_path)


def test_config_load(tmp_path):
    from highresnet_tpu.config import DEFAULT_CONFIG, load_config

    cfg = load_config("configs/config.json")
    assert cfg["network"]["encoder"]["channel_size"] == 64
    assert cfg["training"]["lambda"] == 1e-6
    # defaults survive partial configs
    import json

    p = tmp_path / "partial.json"
    p.write_text(json.dumps({"training": {"batch_size": 2}}))
    cfg2 = load_config(str(p))
    assert cfg2["training"]["batch_size"] == 2
    assert cfg2["training"]["lr"] == DEFAULT_CONFIG["training"]["lr"]


def test_synth_hr_shift_offsets_only_the_hr(tmp_path):
    """hr_shift>0 moves the written HR ground truth off the LR views'
    frame (modeling Proba-V's un-co-registered HR) without touching the
    views themselves."""
    from highresnet_tpu.data.synth import make_synthetic_dataset

    kw = dict(n_scenes_per_channel=1, n_views=2, lr_size=16, seed=0, splits=("train",))
    make_synthetic_dataset(str(tmp_path / "a"), **kw, hr_shift=0.0)
    make_synthetic_dataset(str(tmp_path / "b"), **kw, hr_shift=1.5)
    sa = read_imageset(discover_scenes(f"{tmp_path}/a/train")[0])
    sb = read_imageset(discover_scenes(f"{tmp_path}/b/train")[0])
    np.testing.assert_array_equal(sa.lr, sb.lr)  # views identical
    assert np.abs(sa.hr - sb.hr).max() > 0.01  # HR frame moved
    # the offset is a (sub-pixel) translation: correlation recovers after
    # compensating with an integer shift search over +-2 px
    def best_corr(x, y):
        best = -1.0
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                r = np.roll(y, (dy, dx), axis=(0, 1))
                c = np.corrcoef(x[4:-4, 4:-4].ravel(), r[4:-4, 4:-4].ravel())[0, 1]
                best = max(best, c)
        return best
    assert best_corr(sa.hr, sb.hr) > 0.9


def test_epoch_cache_replays_and_rotates(tmp_path):
    """EpochCache: the building epoch streams live batches while writing;
    later epochs replay the SAME collated arrays from mmap; n_variants
    rotates distinct sampling realizations (v0, v1, v0, ...)."""
    from highresnet_tpu.data.pipeline import BatchLoader, EpochCache
    from highresnet_tpu.data.synth import make_synthetic_dataset

    root = tmp_path / "ec"
    make_synthetic_dataset(str(root), n_scenes_per_channel=2, n_views=4, lr_size=24,
                           seed=0, splits=("train",))
    from highresnet_tpu.data.probav import discover_scenes

    scenes = discover_scenes(str(root / "train"))
    loader = BatchLoader(scenes, batch_size=2, min_l=3, top_k=3, beta=50.0,
                         create_patches=True, patch_size=16, seed=0, num_workers=1)
    cache = EpochCache(loader, str(tmp_path / "cache"), n_variants=2)
    assert len(cache) == len(loader) and cache.num_scenes == 4

    def pull():
        return [b for b in cache]

    e0, e1, e2, e3 = pull(), pull(), pull(), pull()
    assert len(e0) == 2

    # epoch 2 replays variant 0 byte-for-byte, epoch 3 replays variant 1
    for a, b in ((e0, e2), (e1, e3)):
        for ba, bb in zip(a, b):
            np.testing.assert_array_equal(np.asarray(ba.lrs), np.asarray(bb.lrs))
            np.testing.assert_array_equal(np.asarray(ba.hrs), np.asarray(bb.hrs))
            assert tuple(ba.names) == tuple(bb.names)
    # the two variants are distinct realizations (different patches/views)
    assert not all(
        np.array_equal(np.asarray(a.lrs), np.asarray(b.lrs)) for a, b in zip(e0, e1)
    )
    # replayed arrays are memory-mapped, not heap copies
    assert isinstance(np.asarray(e2[0].lrs).base, np.memmap) or isinstance(
        e2[0].lrs, np.memmap
    ) or getattr(e2[0].lrs, "base", None) is not None


def test_epoch_cache_in_train_loop(tmp_path):
    """training.epoch_cache_variants wires the cache into the loop; a short
    run completes and the cache directory holds the committed variants."""
    import os

    from highresnet_tpu.data.synth import make_synthetic_dataset
    from highresnet_tpu.train.loop import train_and_get_best_model

    root = tmp_path / "ecloop"
    make_synthetic_dataset(str(root), n_scenes_per_channel=2, n_views=5, lr_size=24,
                           seed=0, splits=("train",))
    cfg = {
        "network": {
            "encoder": {"in_channels": 2, "num_layers": 1, "kernel_size": 3, "channel_size": 8},
            "recursive": {"alpha_residual": True, "in_channels": 8, "kernel_size": 3},
            "decoder": {
                "deconv": {"in_channels": 8, "kernel_size": 3, "stride": 3, "out_channels": 8},
                "final": {"in_channels": 8, "kernel_size": 1, "out_channels": 1},
            },
        },
        "training": {
            "batch_size": 2, "min_L": 4, "n_views": 4, "crop": 1, "lr": 1e-3,
            "lr_step": 2, "lr_decay": 0.97, "beta": 50.0, "create_patches": True,
            "patch_size": 16, "register_size": 32, "val_proportion": 0.34,
            "lambda": 1e-6, "num_epochs": 2, "n_workers": 1, "seed": 0,
            "eval_batch_size": 2, "checkpoint_every": 0, "data_parallel": False,
            "epoch_cache_variants": 1,
        },
        "paths": {"prefix": str(root), "checkpoint_dir": str(tmp_path / "ck"),
                   "tb_log_file_dir": ""},
    }
    out = train_and_get_best_model(cfg)
    assert np.isfinite(out["best_score"])
    cache_root = os.path.join(str(root), ".epoch_cache")
    variants = [f for d, _, fs in os.walk(cache_root) for f in fs if f.endswith(".meta.json")]
    assert variants, "cache variants must have been committed"


def test_dihedral_transforms():
    """D4 helpers: identity at k=0, 8 distinct elements, exact LR<->HR
    co-transformation (HR = 3x corner-aligned upsample commutes with any
    dihedral element applied to the whole plane)."""
    from highresnet_tpu.data.augment import dihedral, dihedral_imageset
    from highresnet_tpu.data.probav import ImageSet

    rng = np.random.default_rng(0)
    img = rng.random((5, 7, 7), np.float32)  # asymmetric content
    np.testing.assert_array_equal(dihedral(img, 0), img)
    variants = [dihedral(img, k).tobytes() for k in range(8)]
    assert len(set(variants)) == 8
    for k in range(8):
        out = dihedral(img, k)
        assert out.flags["C_CONTIGUOUS"]
        assert out.shape == img.shape

    # nearest-3x upsample commutes with every dihedral element
    lr = rng.random((2, 4, 4), np.float32)
    hr = np.kron(lr[0], np.ones((3, 3), np.float32))
    s = ImageSet(name="x", lr=lr, hr=hr, hr_map=np.ones_like(hr))
    for k in range(8):
        a = dihedral_imageset(s, k)
        np.testing.assert_allclose(
            a.hr, np.kron(a.lr[0], np.ones((3, 3), np.float32)), rtol=0, atol=0
        )
        np.testing.assert_array_equal(a.hr_map, np.ones_like(a.hr))

    with pytest.raises(ValueError):
        dihedral(img, 8)


def test_batch_loader_augment_contract(dataset_root):
    """augment=True draws the D4 element from the SAME epoch-keyed rng
    stream as view/patch sampling — the exact per-scene contract a cache
    or a repro run can rely on."""
    from highresnet_tpu.data.augment import dihedral_imageset
    from highresnet_tpu.data.probav import read_imageset

    scenes = discover_scenes(f"{dataset_root}/train")
    kw = dict(
        batch_size=len(scenes), min_l=4, top_k=4, beta=50.0,
        create_patches=True, patch_size=8, seed=11, num_workers=1, shuffle=False,
    )
    plain = next(iter(BatchLoader(scenes, **kw)))
    aug = next(iter(BatchLoader(scenes, augment=True, **kw)))

    saw_nonidentity = False
    for i, d in enumerate(scenes):
        rng = np.random.default_rng((11, 0, i))
        s = read_imageset(d, create_patches=True, patch_size=8, top_k=4, beta=50.0, rng=rng)
        k = int(rng.integers(8))
        e = dihedral_imageset(s, k)
        np.testing.assert_array_equal(aug.lrs[i], e.lr)
        np.testing.assert_array_equal(aug.hrs[i], e.hr)
        np.testing.assert_array_equal(aug.hr_maps[i], e.hr_map)
        if k != 0:
            saw_nonidentity = True
            assert aug.lrs[i].tobytes() != plain.lrs[i].tobytes()
    assert saw_nonidentity  # 6 scenes, P(all k=0) = 8^-6


def test_synth_completion_marker(tmp_path):
    """A generator killed mid-write must be detectable: the .complete
    marker is written LAST, so partial trees report incomplete."""
    from highresnet_tpu.data.synth import make_synthetic_dataset, synthetic_dataset_complete

    root = tmp_path / "ds"
    assert not synthetic_dataset_complete(str(root))
    make_synthetic_dataset(str(root), n_scenes_per_channel=1, n_views=2, lr_size=8, seed=0)
    assert synthetic_dataset_complete(str(root))
    # simulate an interrupted regen: tree present, marker gone
    (root / ".complete").unlink()
    assert not synthetic_dataset_complete(str(root))


def test_clear_synthetic_dataset_policy(tmp_path):
    """clear removes only generated artifacts (checkpoints under root
    survive a deterministic rebuild) and refuses unmarked trees."""
    import os

    from highresnet_tpu.data.synth import (
        GENERATING_MARKER,
        clear_synthetic_dataset,
        make_synthetic_dataset,
        synthetic_dataset_complete,
    )

    root = tmp_path / "ds"
    make_synthetic_dataset(str(root), n_scenes_per_channel=1, n_views=2, lr_size=8, seed=0)
    (root / "ckpt").mkdir()
    (root / "ckpt" / "weights.bin").write_text("precious")

    clear_synthetic_dataset(str(root))
    assert not (root / "train").exists()
    assert not (root / "norm.csv").exists()
    assert not synthetic_dataset_complete(str(root))
    assert (root / "ckpt" / "weights.bin").read_text() == "precious"

    # unmarked tree (real data): refuse without force
    (root / "train").mkdir()
    (root / "train" / "real.png").write_text("x")
    with pytest.raises(RuntimeError, match="refusing to delete"):
        clear_synthetic_dataset(str(root))
    clear_synthetic_dataset(str(root), force=True)
    assert not (root / "train").exists()

    # a killed generator leaves .generating => tree is known-synthetic
    (root / "train").mkdir()
    (root / GENERATING_MARKER).write_text("in progress")
    clear_synthetic_dataset(str(root))  # no raise
    assert not (root / "train").exists()
    assert not (root / GENERATING_MARKER).exists()


def test_pack_write_is_atomic(dataset_root):
    """pack_scene commits via rename: no .tmp remains, and the pack loads."""
    import os

    from highresnet_tpu.data.pack import PACK_NAME, load_pack, pack_scene

    scene = discover_scenes(f"{dataset_root}/train")[0]
    out = pack_scene(scene)
    assert os.path.basename(out) == PACK_NAME
    assert not os.path.exists(out + ".tmp")
    assert load_pack(scene) is not None
    os.remove(out)


def test_batch_loader_variable_views(dataset_root):
    """variable_views_p truncates scenes to random k in [1, L-1]; collate
    zero-pads back so batch shapes stay STATIC and alpha marks the padding
    (the reference's any-L contract, src/utils.py:89-95)."""
    scenes = discover_scenes(f"{dataset_root}/train")
    loader = BatchLoader(
        scenes, batch_size=6, min_l=4, top_k=4, beta=50.0,
        create_patches=True, patch_size=8, seed=7, num_workers=2,
        variable_views_p=1.0,
    )
    batch = next(iter(loader))
    assert batch.lrs.shape == (6, 4, 8, 8)  # static shape preserved
    counts = batch.alphas.sum(axis=1)
    assert counts.min() >= 1
    # with p=1 every scene is truncated below the full 4 views
    assert counts.max() < 4, counts
    # padded views are zeroed wherever alpha says padding
    for i in range(6):
        k = int(counts[i])
        assert np.all(batch.alphas[i, :k] == 1.0)
        assert np.all(batch.alphas[i, k:] == 0.0)
        assert np.all(batch.lrs[i, k:] == 0.0)

    # reproducible: same seed/epoch -> identical draws
    loader2 = BatchLoader(
        scenes, batch_size=6, min_l=4, top_k=4, beta=50.0,
        create_patches=True, patch_size=8, seed=7, num_workers=2,
        variable_views_p=1.0,
    )
    batch2 = next(iter(loader2))
    np.testing.assert_array_equal(batch.alphas, batch2.alphas)
    np.testing.assert_array_equal(batch.lrs, batch2.lrs)

    # p=0 is the reference-exact fixed-L path
    loader0 = BatchLoader(
        scenes, batch_size=6, min_l=4, top_k=4, beta=50.0,
        create_patches=True, patch_size=8, seed=7, num_workers=2,
    )
    assert next(iter(loader0)).alphas.sum() == 24
