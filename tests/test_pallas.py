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
