"""Registration toolkit tests: warps, masked metrics, shift searches."""

import numpy as np
import pytest
from scipy.ndimage import shift as ndi_shift

from highresnet_tpu.registration.warp import cubic_shift_batch, linear_shift_batch
from highresnet_tpu.registration.metrics import (
    masked_mi,
    masked_ml1e,
    masked_mse,
    masked_ncc,
    masked_ssim,
)


@pytest.fixture(scope="module")
def field():
    rng = np.random.default_rng(0)
    base = rng.random((12, 12))
    big = np.kron(base, np.ones((4, 4)))  # smooth-ish 48x48
    from scipy.ndimage import gaussian_filter

    return gaussian_filter(big, 2.0).astype(np.float32)


def test_cubic_shift_integer_matches_roll(field):
    out = np.asarray(cubic_shift_batch(field[None], np.array([[2.0, -3.0]])))[0]
    expected = ndi_shift(field, (2.0, -3.0), mode="constant", order=3)
    np.testing.assert_allclose(out[4:-4, 4:-4], expected[4:-4, 4:-4], atol=1e-5)


def test_cubic_shift_subpixel_close_to_scipy(field):
    """Catmull-Rom vs scipy spline: close on smooth fields (not identical)."""
    out = np.asarray(cubic_shift_batch(field[None], np.array([[0.6, -1.3]])))[0]
    expected = ndi_shift(field, (0.6, -1.3), mode="constant", order=3)
    diff = np.abs(out[4:-4, 4:-4] - expected[4:-4, 4:-4])
    assert diff.max() < 5e-3


def test_linear_shift_matches_scipy_order1(field):
    out = np.asarray(linear_shift_batch(field[None], np.array([[1.25, -0.5]])))[0]
    expected = ndi_shift(field, (1.25, -0.5), mode="constant", order=1)
    np.testing.assert_allclose(out[2:-2, 2:-2], expected[2:-2, 2:-2], atol=1e-5)


def test_masked_ncc_properties(field):
    mask = np.ones_like(field)
    assert float(masked_ncc(field, field, mask, mask)) == pytest.approx(1.0, abs=1e-5)
    assert float(masked_ncc(field, -field, mask, mask)) == pytest.approx(-1.0, abs=1e-5)
    # affine invariance
    assert float(masked_ncc(field, 3 * field + 0.2, mask, mask)) == pytest.approx(1.0, abs=1e-5)
    # empty mask -> nan
    assert np.isnan(float(masked_ncc(field, field, np.zeros_like(mask), mask)))
    # mask localizes the comparison
    other = field.copy()
    other[:24] = 0.123
    m_bottom = np.zeros_like(field)
    m_bottom[24:] = 1
    assert float(masked_ncc(field, other, m_bottom, m_bottom)) == pytest.approx(1.0, abs=1e-5)


def test_masked_mse_ml1e(field):
    mask = np.ones_like(field)
    assert float(masked_mse(field, field, mask, mask)) == pytest.approx(0.0, abs=1e-6)
    assert float(masked_ml1e(field, field, mask, mask)) == pytest.approx(0.0, abs=1e-6)
    # normalization makes affine transforms a no-op
    assert float(masked_mse(field, 2 * field + 1, mask, mask)) == pytest.approx(0.0, abs=1e-4)
    # unnormalized picks up raw differences
    raw = float(masked_mse(field, field + 0.1, mask, mask, normalize=False))
    assert raw == pytest.approx(0.01, abs=1e-5)


def test_masked_ssim_identity_and_degradation(field):
    mask = np.ones_like(field)
    assert float(masked_ssim(field, field, mask, mask)) == pytest.approx(1.0, abs=1e-5)
    noisy = field + np.random.default_rng(1).normal(scale=0.1, size=field.shape).astype(np.float32)
    assert float(masked_ssim(field, noisy, mask, mask)) < 0.95


def test_masked_ssim_matches_skimage_formula(field):
    """Cross-check against an independent NumPy SSIM implementation."""
    from scipy.ndimage import uniform_filter

    mov = field + np.random.default_rng(2).normal(scale=0.05, size=field.shape).astype(np.float32)
    win = 7
    dmin, dmax = min(field.min(), mov.min()), max(field.max(), mov.max())
    dr = dmax - dmin
    c1, c2 = (0.01 * dr) ** 2, (0.03 * dr) ** 2
    n = win * win
    covn = n / (n - 1)
    ux = uniform_filter(field, win)
    uy = uniform_filter(mov, win)
    vx = covn * (uniform_filter(field**2, win) - ux**2)
    vy = covn * (uniform_filter(mov**2, win) - uy**2)
    vxy = covn * (uniform_filter(field * mov, win) - ux * uy)
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    pad = (win - 1) // 2
    want = s[pad:-pad, pad:-pad].mean()
    got = float(masked_ssim(field, mov, np.ones_like(field), np.ones_like(field)))
    assert got == pytest.approx(want, abs=2e-3)


def test_masked_mi(field):
    mask = np.ones_like(field)
    self_mi = float(masked_mi(field, field, mask, mask))
    rng = np.random.default_rng(3)
    noise = rng.random(field.shape).astype(np.float32)
    cross_mi = float(masked_mi(field, noise, mask, mask))
    assert self_mi > cross_mi  # identical images share maximal information
    assert cross_mi >= 1.0 - 1e-6  # NMI lower bound


def _border_mask(shape, border=3):
    m = np.zeros(shape, np.float32)
    m[border:-border, border:-border] = 1.0
    return m


def test_compute_shift_ncc_recovers_known_shift(field):
    from highresnet_tpu.registration.search import compute_shift_ncc

    true = (0.7, -0.4)
    shifted = ndi_shift(field, true, mode="constant", order=3)
    # the warped-in zero border must be masked invalid (as Proba-V QM maps do)
    mask = _border_mask(field.shape)
    dy, dx = compute_shift_ncc(field, shifted, mask, mask, points_per_dim=5, max_recursions=6)
    # search convention: applying (dy, dx) to the template aligns it to ref
    assert dy == pytest.approx(-true[0], abs=0.06)
    assert dx == pytest.approx(-true[1], abs=0.06)


def test_compute_shift_with_metric_mse(field):
    from highresnet_tpu.registration.search import compute_shift_with_metric
    from highresnet_tpu.registration.metrics import masked_mse as mse

    true = (-0.5, 0.8)
    shifted = ndi_shift(field, true, mode="constant", order=3)
    mask = _border_mask(field.shape)
    dy, dx = compute_shift_with_metric(
        mse, minimize=True, ref_image=field, template_image=shifted,
        ref_mask=mask, template_mask=mask, points_per_dim=5, max_recursions=6,
    )
    assert dy == pytest.approx(0.5, abs=0.06)
    assert dx == pytest.approx(-0.8, abs=0.06)


def test_compute_shift_pcc():
    from highresnet_tpu.registration.search import compute_shift_pcc

    # broadband image + exact Fourier-domain shift (the PCC model)
    rng = np.random.default_rng(7)
    img = rng.random((48, 48)).astype(np.float64)
    true = (1.3, -0.6)
    f = np.fft.fft2(img)
    fy = np.fft.fftfreq(48)[:, None]
    fx = np.fft.fftfreq(48)[None, :]
    shifted = np.real(np.fft.ifft2(f * np.exp(-2j * np.pi * (fy * true[0] + fx * true[1]))))
    dy, dx = compute_shift_pcc(img, shifted)
    assert dy == pytest.approx(-true[0], abs=0.01)
    assert dx == pytest.approx(-true[1], abs=0.01)


def test_pcc_align_batch_recovers_and_deblurs():
    """Registered-ensemble primitive: align mutually-offset copies.

    Two members of an SR ensemble are modeled as noisy copies of the same
    image whose output frames are offset ~2 px (the measured seed-to-seed
    behavior, ENSEMBLE_REPORT.json). pcc_align_batch must recover the
    offset to ~0.15 px and the registered average must beat both the naive
    average and the single member in reconstruction error."""
    import jax.numpy as jnp

    from highresnet_tpu.ops.lanczos import lanczos_shift
    from highresnet_tpu.registration.search import pcc_align_batch
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(3)
    x = gaussian_filter(rng.standard_normal((96, 96)).astype(np.float32), 1.0)
    x = jnp.asarray((x - x.min()) / (x.max() - x.min()))

    true_d = jnp.asarray([[0.7, -1.9]])
    mov = lanczos_shift(x[None], true_d)
    aligned, est = pcc_align_batch(x[None], mov)
    np.testing.assert_allclose(np.asarray(est), np.asarray(true_d), atol=0.15)
    c = 8  # crop the warp's reflect-pad edge band
    err_before = float(jnp.abs(mov - x)[:, c:-c, c:-c].mean())
    err_after = float(jnp.abs(aligned - x)[:, c:-c, c:-c].mean())
    assert err_after < 0.15 * err_before

    noise = lambda: 0.02 * jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))
    member_a = (x + noise())[None]
    member_b = lanczos_shift((x + noise())[None], jnp.asarray([[0.5, -2.0]]))
    naive = (member_a + member_b) / 2
    registered = (member_a + pcc_align_batch(member_a, member_b)[0]) / 2
    err = lambda img: float(jnp.abs(img - x)[:, c:-c, c:-c].mean())
    assert err(registered) < err(naive)
    assert err(registered) < err(member_a)


def test_compute_shift_point_matching():
    pytest.importorskip("cv2")
    from highresnet_tpu.registration.search import compute_shift_point_matching

    rng = np.random.default_rng(5)
    img = rng.random((96, 96)).astype(np.float32)
    from scipy.ndimage import gaussian_filter

    img = gaussian_filter(img, 1.0)
    shifted = ndi_shift(img, (3.0, -2.0), mode="constant", order=3)
    dy, dx = compute_shift_point_matching(img, shifted, scale=2)
    assert dy == pytest.approx(-3.0, abs=0.5)
    assert dx == pytest.approx(2.0, abs=0.5)


def test_perceptual_loss_and_pl_search(field):
    from highresnet_tpu.models.vgg import VGGFeatureExtractor
    from highresnet_tpu.registration.metrics import perceptual_loss
    from highresnet_tpu.registration.search import compute_shift_pl

    ex = VGGFeatureExtractor()  # random weights: still a usable embedding
    mask = np.ones_like(field)
    loss_same, diffs = perceptual_loss(field, field, mask, mask, ex)
    assert loss_same == pytest.approx(0.0, abs=1e-6)
    assert "0_loss" in diffs and "28_diff" in diffs

    shifted = ndi_shift(field, (1.0, 0.0), mode="constant", order=3)
    loss_shift, _ = perceptual_loss(field, shifted, mask, mask, ex)
    assert loss_shift > loss_same

    dy, dx = compute_shift_pl(ex, field, shifted, mask, mask, points_per_dim=3, max_recursions=3)
    assert abs(dy + 1.0) < 0.5  # moves toward alignment
