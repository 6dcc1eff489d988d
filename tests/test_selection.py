"""Unit tests for the split-out selection/TB subsystems (train/selection.py,
train/tb.py) — pure-host logic, no compiled steps."""

import numpy as np
import pytest


class _FakeCkpt:
    def __init__(self):
        self.saved = []

    def save_best(self, params, batch_stats, score, epoch=None):
        self.saved.append((params, batch_stats, score))


def _state(ema=None):
    """Minimal stand-in for TrainState's selection-relevant surface."""

    class S:
        pass

    s = S()
    s.params = {"hrnet": "raw-h", "shiftnet": "raw-s"}
    s.ema_params = ema
    s.eval_params = s.params if ema is None else ema
    return s


def test_dual_candidates_ema_off_passthrough():
    from highresnet_tpu.train.selection import dual_candidates

    s = _state()
    calls = []
    score, params, raw, ema = dual_candidates(s, 1.5, lambda p: calls.append(p) or 0.0)
    assert (score, params) == (1.5, s.params)
    assert raw is None and ema is None
    assert calls == []  # no extra val pass when EMA is off


def test_dual_candidates_picks_winner():
    from highresnet_tpu.train.selection import dual_candidates

    ema_p = {"hrnet": "ema-h", "shiftnet": "ema-s"}
    s = _state(ema=ema_p)
    # raw better -> raw wins
    score, params, raw, ema = dual_candidates(s, 2.0, lambda p: 1.0)
    assert (score, params, raw, ema) == (1.0, s.params, 1.0, 2.0)
    # ema better (or tie) -> ema (eval_params) wins
    score, params, raw, ema = dual_candidates(s, 2.0, lambda p: 3.0)
    assert (score, params, raw, ema) == (2.0, ema_p, 3.0, 2.0)


def test_best_tracker_update_persist_early_stop():
    from highresnet_tpu.train.selection import BestTracker

    ckpt = _FakeCkpt()
    tr = BestTracker(ckpt, patience=2)
    tr.seed({"params": "init", "batch_stats": {}})
    assert tr.best_score == float("inf")

    assert tr.update(1, 5.0, {"w": np.zeros(2)}, {"bn": np.ones(1)}) is True
    assert tr.best_epoch == 1 and tr.best_score == 5.0
    assert len(ckpt.saved) == 1
    # non-improving epochs don't touch the snapshot or the checkpoint
    assert tr.update(2, 5.0, {"w": np.ones(2)}, {}) is False
    assert tr.update(3, 6.0, {"w": np.ones(2)}, {}) is False
    assert len(ckpt.saved) == 1
    # patience=2 since best_epoch=1 -> stop at epoch 3, not epoch 2
    assert tr.early_stop(2) is False
    assert tr.early_stop(3) is True
    # an improvement resets the clock
    assert tr.update(4, 4.0, {"w": np.ones(2)}, {}) is True
    assert tr.early_stop(5) is False
    assert tr.early_stop(6) is True
    # patience=0 never stops (reference-exact)
    assert BestTracker(ckpt, patience=0).early_stop(10 ** 6) is False


def test_best_tracker_snapshot_is_host_copy():
    """The snapshot must be detached from the live arrays (the next train
    step donates/overwrites state buffers)."""
    from highresnet_tpu.train.selection import BestTracker

    tr = BestTracker(_FakeCkpt())
    w = np.zeros(3)
    tr.update(1, 1.0, {"w": w}, {})
    w += 99.0  # simulate the donated buffer being overwritten
    assert np.all(tr.best["params"]["w"] == 0.0)


def test_tb_writer_inert_and_scalar_filtering(tmp_path, monkeypatch):
    from highresnet_tpu.train import tb as tb_mod

    # disabled or missing tb_dir -> inert
    assert tb_mod.TBWriter("", "run").active is False
    assert tb_mod.TBWriter(str(tmp_path), "run", enabled=False).active is False
    tb_mod.TBWriter("", "run").log_epoch(1, {"a": 1.0})  # no-op, no crash

    class FakeWriter:
        def __init__(self, path):
            self.scalars = []
            self.images = []

        def add_scalar(self, k, v, e):
            self.scalars.append((k, v, e))

        def add_image(self, k, img, e, dataformats=None):
            self.images.append((k, np.asarray(img), e))

        def close(self):
            self.closed = True

    fake_mod = type("M", (), {"SummaryWriter": FakeWriter})
    monkeypatch.setitem(__import__("sys").modules, "tensorboardX", fake_mod)
    w = tb_mod.TBWriter(str(tmp_path), "run")
    assert w.active
    sr0 = np.linspace(0, 2, 16).reshape(4, 4).astype(np.float32)
    hr0 = np.ones((4, 4), np.float32)
    w.log_epoch(3, {"train/loss": 1.0, "train/val_loss_raw": None}, sr0=sr0, hr0=hr0)
    inner = w._writer
    # None scalars are skipped (EMA-off runs have no raw/ema curves)
    assert [s[0] for s in inner.scalars] == ["train/loss"]
    # SR image is min-max normalized; error map is raw HR - SR
    names = [i[0] for i in inner.images]
    assert names == ["SR Image", "Error Map"]
    np.testing.assert_allclose(inner.images[0][1].min(), 0.0, atol=1e-6)
    np.testing.assert_allclose(inner.images[0][1].max(), 1.0, atol=1e-6)
    np.testing.assert_allclose(inner.images[1][1], hr0 - sr0, atol=1e-6)
    w.close()
    assert inner.closed
