"""Model tests: parameter-count parity, decoder==ConvTranspose oracle,
fusion alpha-gating properties, shiftnet shape/identity-at-init."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from highresnet_tpu.models.hrnet import Decoder, Encoder, FusionNet, HRNet, lower_median, param_count
from highresnet_tpu.models.shiftnet import ShiftNet, apply_shifts, register_views

KEY = jax.random.PRNGKey(0)

DEFAULT_NET_CONFIG = {
    "encoder": {"in_channels": 2, "num_layers": 2, "kernel_size": 3, "channel_size": 64},
    "recursive": {"alpha_residual": True, "in_channels": 64, "num_layers": 2, "kernel_size": 3},
    "decoder": {
        "deconv": {"in_channels": 64, "kernel_size": 3, "stride": 3, "out_channels": 64},
        "final": {"in_channels": 64, "kernel_size": 1, "out_channels": 1},
    },
}


def test_hrnet_param_count_matches_reference():
    model = HRNet(config=DEFAULT_NET_CONFIG)
    lrs = jnp.zeros((1, 4, 16, 16))
    alphas = jnp.ones((1, 4))
    params = model.init(KEY, lrs, alphas)["params"]
    # Reference HRNet: 591,818 params (paper Table 2, BASELINE.md)
    assert param_count(params) == 591_818


def test_shiftnet_param_count_matches_reference():
    model = ShiftNet()
    x = jnp.zeros((1, 128, 128, 2))
    variables = model.init(KEY, x, train=False)
    # Reference ShiftNet: 34,187,648 params. BatchNorm running stats are
    # state, not params, in both frameworks — torch counts only weight+bias.
    assert param_count(variables["params"]) == 34_187_648


def test_hrnet_output_shape():
    model = HRNet(config=DEFAULT_NET_CONFIG)
    lrs = jnp.ones((2, 8, 16, 16))
    alphas = jnp.ones((2, 8))
    variables = model.init(KEY, lrs, alphas)
    out = model.apply(variables, lrs, alphas)
    assert out.shape == (2, 48, 48)


def test_lower_median_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    for n in [4, 5, 8, 9]:
        x = rng.random((2, n, 5, 5)).astype(np.float32)
        got = np.asarray(lower_median(jnp.asarray(x), axis=1))
        want = torch.median(torch.from_numpy(x), dim=1).values.numpy()
        np.testing.assert_allclose(got, want)


def test_decoder_equals_torch_conv_transpose():
    """Depth-to-space decode must equal ConvTranspose2d(k=3, s=3) exactly."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    c_in, c_out, h, w = 8, 8, 6, 7
    x = rng.normal(size=(2, h, w, c_in)).astype(np.float32)
    dec = Decoder(channels=c_out, out_channels=1, scale=3, final_kernel=1)
    variables = dec.init(KEY, jnp.asarray(x))

    # Torch oracle for the deconv stage only: same weights, compare pre-PReLU.
    kernel = np.asarray(variables["params"]["deconv_kernel"])  # (3,3,Cin,Cout)
    bias = np.asarray(variables["params"]["deconv_bias"])
    tconv = torch.nn.ConvTranspose2d(c_in, c_out, kernel_size=3, stride=3)
    with torch.no_grad():
        # torch weight layout: (in, out, kh, kw)
        tconv.weight.copy_(torch.from_numpy(kernel.transpose(2, 3, 0, 1).copy()))
        tconv.bias.copy_(torch.from_numpy(bias.copy()))
        want = tconv(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    s = 3
    y = np.einsum("bhwc,uvcd->bhwuvd", x, kernel) + bias
    got = y.transpose(0, 1, 3, 2, 4, 5).reshape(2, s * h, s * w, c_out)
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-5)


def test_fusion_alpha_gating_ignores_padded_views():
    """Zero-padded views (alpha=0) must not change the fused output."""
    fusion = FusionNet(channels=8)
    rng = np.random.default_rng(2)
    real = rng.normal(size=(1, 2, 6, 6, 8)).astype(np.float32)

    # L=4 with 2 real + 2 padded-zero views vs plain L=2.
    x4 = np.concatenate([real, np.zeros_like(real)], axis=1)
    a4 = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
    x2 = real
    a2 = jnp.asarray([[1.0, 1.0]])

    variables = fusion.init(KEY, jnp.asarray(x4), a4)
    out4 = fusion.apply(variables, jnp.asarray(x4), a4)
    out2 = fusion.apply(variables, jnp.asarray(x2), a2)
    # Round 1 of L=4: alice=(v0,v1), bob=(0,0) flipped; alpha_bob=0 so
    # x = alice. Round 2 then fuses (v0, v1) exactly like the L=2 case.
    np.testing.assert_allclose(np.asarray(out4), np.asarray(out2), atol=1e-5)


def test_fusion_drops_odd_leftover_view():
    """With odd L, the trailing view is dropped (reference behavior)."""
    fusion = FusionNet(channels=4)
    rng = np.random.default_rng(3)
    x3 = rng.normal(size=(1, 3, 4, 4, 4)).astype(np.float32)
    a3 = jnp.ones((1, 3))
    variables = fusion.init(KEY, jnp.asarray(x3), a3)
    out3 = fusion.apply(variables, jnp.asarray(x3), a3)

    # Changing the dropped 3rd view must not affect the output.
    x3b = x3.copy()
    x3b[:, 2] = rng.normal(size=(1, 4, 4, 4))
    out3b = fusion.apply(variables, jnp.asarray(x3b), a3)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(out3b), atol=1e-6)


def test_shiftnet_identity_at_init():
    """fc2 is zero-init, so initial predicted shifts are exactly zero."""
    model = ShiftNet()
    x = jnp.asarray(np.random.default_rng(4).random((2, 128, 128, 2)), jnp.float32)
    variables = model.init(KEY, x, train=False)
    out = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_register_and_apply_shapes():
    model = ShiftNet()
    rng = np.random.default_rng(5)
    views = jnp.asarray(rng.random((2, 3, 128, 128)), jnp.float32)
    ref = jnp.asarray(rng.random((2, 128, 128)), jnp.float32)
    variables = model.init(KEY, jnp.zeros((1, 128, 128, 2)), train=False)
    thetas, _ = register_views(model, variables, views, ref, train=False)
    assert thetas.shape == (2, 3, 2)
    warped = apply_shifts(views, thetas)
    assert warped.shape == views.shape
    # zero-init shifts -> identity warp
    np.testing.assert_allclose(np.asarray(warped), np.asarray(views), atol=1e-4)


def test_hrnet_invariant_to_padded_views_end_to_end():
    model = HRNet(config=DEFAULT_NET_CONFIG)
    rng = np.random.default_rng(6)
    lr2 = rng.random((1, 2, 12, 12)).astype(np.float32)
    lrs4 = np.concatenate([lr2, np.zeros((1, 2, 12, 12), np.float32)], axis=1)
    a4 = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
    variables = model.init(KEY, jnp.asarray(lrs4), a4)
    out4 = model.apply(variables, jnp.asarray(lrs4), a4)
    assert out4.shape == (1, 36, 36)
    assert np.isfinite(np.asarray(out4)).all()


def test_pack_impl_knob_identical():
    """recursive.use_pallas_pack switches the pack lowering, never values."""
    import copy

    import jax
    import jax.numpy as jnp

    from highresnet_tpu.models.hrnet import HRNet

    rng = np.random.default_rng(5)
    lrs = jnp.asarray(rng.random((1, 4, 12, 12)), jnp.float32)
    alphas = jnp.ones((1, 4), jnp.float32)
    cfg = {
        "encoder": {"in_channels": 2, "num_layers": 1, "kernel_size": 3, "channel_size": 8},
        "recursive": {"alpha_residual": True, "in_channels": 8, "kernel_size": 3},
        "decoder": {
            "deconv": {"in_channels": 8, "kernel_size": 3, "stride": 3, "out_channels": 8},
            "final": {"in_channels": 8, "kernel_size": 1, "out_channels": 1},
        },
    }
    auto = HRNet(config=cfg)
    params = auto.init(jax.random.PRNGKey(0), lrs, alphas)["params"]
    want = auto.apply({"params": params}, lrs, alphas)
    cfg_xla = copy.deepcopy(cfg)
    cfg_xla["recursive"]["use_pallas_pack"] = False
    got = HRNet(config=cfg_xla).apply({"params": params}, lrs, alphas)
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_max_pool_2x2_matches_nn_max_pool():
    """Reshape-max pooling == flax nn.max_pool forward; same grads off-ties.

    max_pool_2x2 replaces nn.max_pool in ShiftNet because its backward
    avoids XLA select-and-scatter (9.7 ms/step in the bf16 train trace).
    The forward must be bit-identical; the backward must agree whenever
    window maxima are untied (ties are measure-zero for conv outputs).
    """
    import flax.linen as nn

    from highresnet_tpu.models.shiftnet import max_pool_2x2

    x = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 6, 5), jnp.float32)
    ref = nn.max_pool(x, (2, 2), strides=(2, 2))
    got = max_pool_2x2(x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # gradient parity on untied windows (continuous random input)
    g_ref = jax.grad(lambda t: jnp.sum(nn.max_pool(t, (2, 2), strides=(2, 2)) ** 2))(x)
    g_got = jax.grad(lambda t: jnp.sum(max_pool_2x2(t) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref), rtol=0, atol=0)
