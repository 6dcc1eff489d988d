"""Tests for cPSNR/cMSE losses and the shift-search metric."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from highresnet_tpu.ops.losses import cmse, cpsnr_loss, crop_mask, masked_mse_loss, registered_loss
from highresnet_tpu.ops.metrics import (
    cpsnr,
    cpsnr_np,
    shift_cpsnr,
    shift_cpsnr_batch,
    shift_cpsnr_np,
)


def test_cpsnr_hand_computed():
    # 2x2 image, all clear, constant error 0.1 -> bias removes it entirely.
    sr = np.full((2, 2), 0.4)
    hr = np.full((2, 2), 0.5)
    mask = np.ones((2, 2))
    val = float(cpsnr(sr, hr, mask))
    # diff - bias == 0 -> cMSE = 0 -> +inf dB
    assert val > 100 or np.isinf(val)

    # Non-constant error: diff = [0.1, -0.1, 0, 0], bias = 0.
    sr2 = np.array([[0.4, 0.6], [0.5, 0.5]])
    expected = -10 * np.log10((0.01 + 0.01) / 4)
    assert float(cpsnr(sr2, hr, mask)) == pytest.approx(expected, abs=1e-3)


def test_cpsnr_respects_mask():
    sr = np.array([[0.2, 0.9], [0.4, 0.4]])
    hr = np.array([[0.5, 0.1], [0.4, 0.4]])
    mask = np.array([[0.0, 0.0], [1.0, 1.0]])  # only the perfect pixels count
    assert float(cpsnr(sr, hr, mask)) > 100


def test_cpsnr_uint16_normalization():
    rng = np.random.default_rng(0)
    hr16 = rng.integers(0, 65535, (8, 8)).astype(np.uint16)
    sr16 = rng.integers(0, 65535, (8, 8)).astype(np.uint16)
    mask = np.ones((8, 8))
    a = float(cpsnr(sr16, hr16, mask))
    b = float(cpsnr(sr16 / 65535.0, hr16 / 65535.0, mask))
    assert a == pytest.approx(b, abs=1e-3)


def test_jax_matches_numpy_cpsnr():
    rng = np.random.default_rng(1)
    sr = rng.random((4, 12, 12))
    hr = rng.random((4, 12, 12))
    mask = (rng.random((4, 12, 12)) > 0.3).astype(np.float64)
    got = np.asarray(cpsnr(sr, hr, mask))
    want = cpsnr_np(sr, hr, mask)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_shift_cpsnr_matches_numpy():
    rng = np.random.default_rng(2)
    sr = rng.random((24, 24))
    hr = rng.random((24, 24))
    mask = (rng.random((24, 24)) > 0.2).astype(np.float64)
    got = float(shift_cpsnr(sr, hr, mask))
    want = shift_cpsnr_np(sr, hr, mask)
    assert got == pytest.approx(want, abs=1e-4)


def test_shift_cpsnr_finds_registration():
    """A shifted copy must score (near-)infinite at the right offset."""
    rng = np.random.default_rng(3)
    hr = rng.random((30, 30))
    sr = np.zeros_like(hr)
    # sr content displaced by (+2, +1): sr[i,j] = hr[i+2, j+1]
    sr[: 30 - 2, : 30 - 1] = hr[2:, 1:]
    mask = np.ones_like(hr)
    plain = float(cpsnr(sr[3:-3, 3:-3], hr[3:-3, 3:-3], mask[3:-3, 3:-3]))
    shifted = float(shift_cpsnr(sr, hr, mask))
    assert shifted > plain + 10


def test_shift_cpsnr_batch():
    rng = np.random.default_rng(4)
    sr = rng.random((3, 18, 18))
    hr = rng.random((3, 18, 18))
    mask = np.ones((3, 18, 18))
    got = np.asarray(shift_cpsnr_batch(sr, hr, mask))
    want = np.array([shift_cpsnr_np(sr[i], hr[i], mask[i]) for i in range(3)])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_cmse_bias_is_detached():
    sr = jnp.array([[[0.4, 0.6], [0.5, 0.5]]])
    hr = jnp.full((1, 2, 2), 0.5)
    mask = jnp.ones((1, 2, 2))

    def f(s):
        return jnp.sum(cmse(s, hr, mask))

    g = jax.grad(f)(sr)
    # With bias detached, d(cMSE)/d(sr) = 2*mask*(sr + bias - hr)/nclear.
    bias = float(jnp.mean(hr - sr))
    expected = 2 * (np.asarray(sr) + bias - 0.5) / 4
    np.testing.assert_allclose(np.asarray(g), expected, rtol=1e-5)


def test_masked_mse_averages_full_area():
    sr = np.array([[[1.0, 0.0], [0.0, 0.0]]])
    hr = np.zeros((1, 2, 2))
    mask = np.array([[[1.0, 0.0], [0.0, 0.0]]])
    # (1-0)^2 averaged over 4 pixels = 0.25 (reference averages over all pixels)
    assert float(masked_mse_loss(sr, hr, mask)[0]) == pytest.approx(0.25)


def test_crop_mask():
    m = crop_mask(patch_size=4, crop=2)
    assert m.shape == (12, 12)
    assert m[:2].sum() == 0 and m[-2:].sum() == 0
    assert m[:, :2].sum() == 0 and m[:, -2:].sum() == 0
    assert m[2:-2, 2:-2].min() == 1.0


def test_registered_loss_regularizer_is_square_of_mean():
    sr = jnp.ones((2, 6, 6)) * 0.5
    hr = jnp.ones((2, 6, 6)) * 0.6
    hr = hr.at[:, 0, 0].set(0.2)  # avoid infinite cPSNR
    mask = jnp.ones((2, 6, 6))
    shifts = jnp.array([[[2.0, 0.0]], [[0.0, -2.0]]])  # mean = 0
    base = float(registered_loss(sr, hr, mask, jnp.zeros_like(shifts), lam=1.0))
    with_shifts = float(registered_loss(sr, hr, mask, shifts, lam=1.0))
    assert with_shifts == pytest.approx(base)  # mean-zero shifts: no penalty
    biased = float(registered_loss(sr, hr, mask, jnp.ones_like(shifts), lam=1.0))
    assert biased == pytest.approx(base + 1.0)
