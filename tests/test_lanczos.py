"""Golden + property tests for the batched Lanczos resampler."""

import numpy as np
import pytest

from highresnet_tpu.ops.lanczos import lanczos_kernel, lanczos_shift, lanczos_shift_views


def _kernel_np(dx, a=3, n=7):
    """Independent float64 oracle for the normalized Lanczos kernel."""
    half = (n - 1) // 2
    x = np.linspace(-half, half, n) - dx
    pi_x = np.pi * x
    pi_x = np.where(pi_x == 0, 1e-6, pi_x)
    k = (np.sin(pi_x) / pi_x) * (np.sin(pi_x / a) / (pi_x / a))
    return k / k.sum()


def _shift_np(img, dy, dx, a=3, n=7):
    """Brute-force float64 oracle: reflect pad + explicit separable loops."""
    half = n // 2
    ky = _kernel_np(dy, a, n)
    kx = _kernel_np(dx, a, n)
    h, w = img.shape
    pad = np.pad(img, half, mode="reflect")
    rows = np.zeros((h, w + 2 * half))
    for i in range(h):
        for j in range(w + 2 * half):
            rows[i, j] = np.dot(ky, pad[i : i + n, j])
    out = np.zeros((h, w))
    for i in range(h):
        for j in range(w):
            out[i, j] = np.dot(kx, rows[i, j : j + n])
    return out


def test_kernel_normalized_and_delta_at_zero():
    k = np.asarray(lanczos_kernel(np.array([0.0, 0.25, -0.8, 2.0])))
    np.testing.assert_allclose(k.sum(axis=-1), 1.0, atol=1e-6)
    k0 = np.asarray(lanczos_kernel(np.array([0.0])))[0]
    assert k0[3] == pytest.approx(1.0, abs=1e-5)
    np.testing.assert_allclose(np.delete(k0, 3), 0.0, atol=1e-5)


def test_kernel_matches_oracle():
    for dx in [0.0, 0.3, -0.45, 1.7, -2.2]:
        got = np.asarray(lanczos_kernel(np.array([dx]), a=3, n=7))[0]
        np.testing.assert_allclose(got, _kernel_np(dx), rtol=1e-5, atol=1e-6)


def test_zero_shift_is_identity():
    rng = np.random.default_rng(1)
    img = rng.random((2, 16, 16)).astype(np.float32)
    out = np.asarray(lanczos_shift(img, np.zeros((2, 2), np.float32)))
    np.testing.assert_allclose(out, img, atol=1e-4)


def test_matches_bruteforce_oracle():
    rng = np.random.default_rng(2)
    img = rng.random((3, 12, 14)).astype(np.float64)
    shifts = np.array([[0.4, -0.3], [-1.2, 0.75], [2.0, 1.5]])
    out = np.asarray(lanczos_shift(img, shifts))
    for b in range(3):
        expected = _shift_np(img[b], shifts[b, 0], shifts[b, 1])
        np.testing.assert_allclose(out[b], expected, rtol=1e-4, atol=1e-6)


def test_integer_shift_rolls_interior():
    rng = np.random.default_rng(3)
    img = rng.random((1, 20, 20)).astype(np.float32)
    out = np.asarray(lanczos_shift(img, np.array([[1.0, 2.0]], np.float32)))
    # out[i, j] samples img at (i + dy, j + dx) in the interior.
    np.testing.assert_allclose(
        out[0, 5:12, 5:12], img[0, 6:13, 7:14], atol=1e-4
    )


def test_views_layout_equivalence():
    rng = np.random.default_rng(4)
    img = rng.random((2, 3, 10, 10)).astype(np.float32)
    shifts = rng.normal(size=(2, 3, 2)).astype(np.float32)
    out = np.asarray(lanczos_shift_views(img, shifts))
    flat = np.asarray(lanczos_shift(img.reshape(6, 10, 10), shifts.reshape(6, 2)))
    np.testing.assert_allclose(out.reshape(6, 10, 10), flat, atol=1e-6)


def test_shift_is_differentiable():
    import jax
    import jax.numpy as jnp

    img = jnp.ones((1, 8, 8)) * jnp.linspace(0, 1, 8)[None, None, :]

    def f(s):
        return jnp.sum(lanczos_shift(img, s))

    g = jax.grad(f)(jnp.array([[0.3, 0.3]]))
    assert np.all(np.isfinite(np.asarray(g)))


def test_int_range_zero_matches_default_path():
    rng = np.random.default_rng(5)
    img = rng.random((2, 16, 16)).astype(np.float32)
    shifts = np.array([[0.3, -0.4], [1.2, -2.1]], np.float32)
    a = np.asarray(lanczos_shift(img, shifts))
    b = np.asarray(lanczos_shift(img, shifts, int_range=0))
    np.testing.assert_allclose(a, b, atol=0)


def test_int_range_small_shifts_match_plain():
    """For |shift| <= 0.5 the integer part is 0 and the decomposed path must
    reproduce the single-pass result exactly (same kernel, same field)."""
    rng = np.random.default_rng(6)
    img = rng.random((3, 12, 12)).astype(np.float32)
    shifts = rng.uniform(-0.5, 0.5, size=(3, 2)).astype(np.float32)
    a = np.asarray(lanczos_shift(img, shifts))
    b = np.asarray(lanczos_shift(img, shifts, int_range=4))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_int_range_integer_shift_is_exact_roll():
    """Pure integer shifts within the range resolve to an exact slice (the
    fractional kernel is a delta), unlike the single-pass path whose kernel
    support leaves the tap window beyond ~3 px."""
    rng = np.random.default_rng(7)
    img = rng.random((1, 24, 24)).astype(np.float32)
    out = np.asarray(lanczos_shift(img, np.array([[5.0, -4.0]], np.float32), int_range=6))
    # out[i, j] = img[i + 5, j - 4] in the interior
    np.testing.assert_allclose(out[0, 4:16, 8:20], img[0, 9:21, 4:16], atol=1e-4)


def test_int_range_extends_accuracy_beyond_window():
    """On a smooth band-limited image with a 4.3-px shift, the decomposed
    warp tracks the analytic ground truth while the reference-exact single
    pass has left its accurate window."""
    h = w = 48
    y, x = np.meshgrid(np.arange(h, dtype=np.float64), np.arange(w, dtype=np.float64),
                       indexing="ij")
    f = 1.0 / 16.0  # low frequency: Lanczos-3 reconstructs it near-perfectly
    def field(yy, xx):
        return np.sin(2 * np.pi * f * yy) * np.cos(2 * np.pi * f * xx)

    img = field(y, x)[None].astype(np.float64)
    dy, dx = 4.3, -3.7
    truth = field(y + dy, x + dx)
    c = 10  # trim pad-affected borders
    plain = np.asarray(lanczos_shift(img, np.array([[dy, dx]])))[0]
    wide = np.asarray(lanczos_shift(img, np.array([[dy, dx]]), int_range=5))[0]
    err_plain = np.abs(plain[c:-c, c:-c] - truth[c:-c, c:-c]).max()
    err_wide = np.abs(wide[c:-c, c:-c] - truth[c:-c, c:-c]).max()
    # measured: plain 0.409 vs decomposed 0.017 (Lanczos-3 sidelobe
    # truncation bounds the latter; the former has left its tap window)
    assert err_wide < 0.03, err_wide
    assert err_plain > 10 * err_wide, (err_plain, err_wide)


def test_int_range_is_differentiable():
    import jax
    import jax.numpy as jnp

    img = jnp.ones((1, 16, 16)) * jnp.linspace(0, 1, 16)[None, None, :]

    def f(s):
        return jnp.sum(lanczos_shift(img, s, int_range=3))

    g = jax.grad(f)(jnp.array([[2.3, -1.7]]))
    assert np.all(np.isfinite(np.asarray(g)))
