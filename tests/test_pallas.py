"""Pallas kernel tests (interpreter mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from highresnet_tpu.ops.lanczos import lanczos_shift
from highresnet_tpu.ops.lanczos_pallas import lanczos_shift_fused, lanczos_shift_pallas


def test_pallas_matches_xla():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((4, 24, 40)), jnp.float32)
    shifts = jnp.asarray(rng.normal(size=(4, 2)), jnp.float32)
    xla = lanczos_shift(img, shifts)
    pls = lanczos_shift_pallas(img, shifts, interpret=True)
    # identical taps; tiny differences are float reassociation in the pad
    np.testing.assert_allclose(np.asarray(xla), np.asarray(pls), rtol=2e-5, atol=1e-6)


def test_pallas_gradient_matches():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((2, 16, 16)), jnp.float32)
    shifts = jnp.asarray([[0.3, -0.4], [1.1, 0.2]], jnp.float32)

    def loss_xla(s):
        return jnp.sum(jnp.square(lanczos_shift(img, s)))

    def loss_pls(s):
        return jnp.sum(jnp.square(lanczos_shift_pallas(img, s, interpret=True)))

    g_xla = jax.grad(loss_xla)(shifts)
    g_pls = jax.grad(loss_pls)(shifts)
    np.testing.assert_allclose(np.asarray(g_xla), np.asarray(g_pls), rtol=1e-4, atol=1e-5)


def test_fused_dispatch_falls_back_on_cpu():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.random((2, 12, 12)), jnp.float32)
    shifts = jnp.zeros((2, 2), jnp.float32)
    out = lanczos_shift_fused(img, shifts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-4)


def test_pack_pairs_pallas_matches_xla():
    """Exact equality: packing is pure data movement."""
    from highresnet_tpu.ops.fusion_pallas import pack_pairs_pallas, pack_pairs_xla

    rng = np.random.default_rng(3)
    for l in (2, 4, 5, 8):  # even, power-of-two, odd (view-drop)
        x = jnp.asarray(rng.random((2, l, 8, 16, 4)), jnp.float32)
        want = pack_pairs_xla(x)
        got = pack_pairs_pallas(x, interpret=True)
        assert got.shape == (2, l // 2, 8, 16, 8)
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_pack_pairs_gradient_matches():
    from highresnet_tpu.ops.fusion_pallas import pack_pairs_pallas, pack_pairs_xla

    rng = np.random.default_rng(4)
    for l in (4, 5):  # odd case: dropped view must get zero gradient
        x = jnp.asarray(rng.random((1, l, 4, 8, 4)), jnp.float32)
        w = jnp.asarray(rng.random((1, l // 2, 4, 8, 8)), jnp.float32)
        g_xla = jax.grad(lambda z: jnp.sum(w * pack_pairs_xla(z)))(x)
        g_pls = jax.grad(lambda z: jnp.sum(w * pack_pairs_pallas(z, interpret=True)))(x)
        np.testing.assert_array_equal(np.asarray(g_xla), np.asarray(g_pls))
