"""HRNet: multi-frame super-resolution by recursive pairwise fusion.

TPU-first re-design of the reference architecture (behavioral spec at
/root/reference/src/DeepNetworks/HRNet.py:7-211; parameter shapes from
config/config.json). Differences from the reference are representational,
not semantic:

- NHWC layout throughout (TPU native; convs tile onto the MXU).
- The view axis is folded into the batch axis for the shared encoder —
  one big conv batch instead of L small ones.
- The fusion tree is an unrolled static halving loop (L is static under
  jit, so the trip count log2(L) is known at trace time and XLA fuses each
  round into a single fused conv block).
- The decoder's ConvTranspose2d(kernel=3, stride=3) is non-overlapping, so
  it is implemented as a per-pixel linear map to 3x3 sub-pixel blocks
  (einsum + depth-to-space). This is numerically identical and turns the
  scatter-style deconv into one MXU matmul.
- The shared reference frame is the LOWER median over the first 9 views,
  matching torch.median's tie-breaking for even counts
  (reference: HRNet.py:200).

Parameter count matches the reference exactly: 591,818 for the default
config (verified by tests/test_models.py).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp


def lower_median(x: jax.Array, axis: int) -> jax.Array:
    """Median that returns the lower of the two middle values for even n.

    torch.median semantics (the reference's anchor-frame op), unlike
    jnp.median which averages the middle pair.
    """
    n = x.shape[axis]
    xs = jnp.sort(x, axis=axis)
    return jax.lax.index_in_dim(xs, (n - 1) // 2, axis=axis, keepdims=False)


class PReLU(nn.Module):
    """Channel-shared PReLU with a single learned slope (torch default)."""

    init: float = 0.25

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        alpha = self.param("alpha", lambda _: jnp.full((1,), self.init, jnp.float32))
        a = alpha.astype(x.dtype)
        return jnp.where(x >= 0, x, a * x)


class ResidualBlock(nn.Module):
    """conv3x3 -> PReLU -> conv3x3 -> PReLU, with skip."""

    channels: int = 64
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = (self.kernel_size, self.kernel_size)
        h = nn.Conv(self.channels, k, padding="SAME", dtype=self.dtype, name="conv0")(x)
        h = PReLU(name="prelu0")(h)
        h = nn.Conv(self.channels, k, padding="SAME", dtype=self.dtype, name="conv1")(h)
        h = PReLU(name="prelu1")(h)
        return x + h


class Encoder(nn.Module):
    """Shared per-view encoder: init conv+PReLU, N residual blocks, final conv."""

    in_channels: int = 2
    channels: int = 64
    num_layers: int = 2
    kernel_size: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        k = (self.kernel_size, self.kernel_size)
        x = nn.Conv(self.channels, k, padding="SAME", dtype=self.dtype, name="init_conv")(x)
        x = PReLU(name="init_prelu")(x)
        for i in range(self.num_layers):
            x = ResidualBlock(self.channels, self.kernel_size, dtype=self.dtype, name=f"res{i}")(x)
        x = nn.Conv(self.channels, k, padding="SAME", dtype=self.dtype, name="final_conv")(x)
        return x


class FusionNet(nn.Module):
    """Recursive pairwise fusion with a shared fuse block.

    Per round: split L states into (alice, bob-reversed) halves, concat on
    channels, apply ResidualBlock(2C) + conv 2C->C + PReLU, and (if
    alpha_residual) gate by bob's alpha so padded views pass alice through
    unchanged: x = alice + alpha_bob * fused. Odd leftover views are dropped
    (reference: HRNet.py:113-132). Final reduction is a mean over the
    remaining view axis.
    """

    channels: int = 64
    kernel_size: int = 3
    alpha_residual: bool = True
    dtype: Any = jnp.float32
    # None = auto (Pallas on TPU, XLA elsewhere). Set False when the view
    # axis is sharded over a mesh: a Pallas call cannot be partitioned
    # across the axis it gathers over, so view-sharded configurations must
    # use the XLA concat path (config key: recursive.use_pallas_pack).
    use_pallas_pack: bool | None = None

    @nn.compact
    def __call__(self, x: jax.Array, alphas: jax.Array) -> jax.Array:
        # x: (B, L, H, W, C); alphas: (B, L)
        b, l, h, w, c = x.shape
        k = (self.kernel_size, self.kernel_size)
        fuse = nn.Sequential(
            [
                ResidualBlock(2 * self.channels, self.kernel_size, dtype=self.dtype, name="fuse_res"),
                nn.Conv(self.channels, k, padding="SAME", dtype=self.dtype, name="fuse_conv"),
                PReLU(name="fuse_prelu"),
            ]
        )
        alphas = alphas[..., None, None, None]  # (B, L, 1, 1, 1)

        # pair packing (alice ++ flipped-bob channel concat) goes through a
        # Pallas kernel on TPU: the XLA channel-concat runs at ~1/4 copy
        # bandwidth across the 128-lane boundary (ops/fusion_pallas.py)
        from highresnet_tpu.ops.fusion_pallas import (
            pack_pairs_pallas,
            pack_pairs_xla,
        )

        if self.use_pallas_pack is None:
            from highresnet_tpu.ops.fusion_pallas import pack_pairs
        elif self.use_pallas_pack:
            pack_pairs = pack_pairs_pallas
        else:
            pack_pairs = pack_pairs_xla

        nviews = l
        while nviews // 2 > 0:
            half = nviews // 2
            pair = pack_pairs(x)  # (B, half, H, W, 2C)
            fused = fuse(pair.reshape(b * half, h, w, 2 * c))
            fused = fused.reshape(b, half, h, w, c)

            if self.alpha_residual:
                a_bob = jnp.flip(alphas[:, half : 2 * half], axis=1)
                x = x[:, :half] + a_bob * fused
                alphas = alphas[:, :half]
            else:
                x = fused
            nviews = half

        return jnp.mean(x, axis=1)  # (B, H, W, C)


class PointwiseConv(nn.Module):
    """1x1 convolution expressed as an einsum channel contraction.

    XLA lowers a convolution op with very few output features (the
    decoder's final C->1 projection) poorly on TPU — measured ~6x slower
    than the identical contraction written as a matmul (FUSION_LAB.json:
    0.37 ms vs 2.3 ms for the decoder stage at the benchmark shape).
    Param names/shapes match nn.Conv(features, (1, 1)) exactly, so
    checkpoints and the torch converter are unaffected.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        y = jnp.einsum(
            "...c,co->...o",
            x,
            kernel[0, 0].astype(x.dtype),
            preferred_element_type=x.dtype,
        )
        return y + bias.astype(x.dtype)


class Decoder(nn.Module):
    """3x upsampling decoder.

    The reference's ConvTranspose2d(C->C, kernel=3, stride=3) has
    kernel==stride, so each input pixel independently produces a 3x3 output
    block: out[3i+di, 3j+dj, co] = sum_ci x[i,j,ci] * W[di,dj,ci,co] + b.
    That is one einsum (MXU matmul over C) followed by depth-to-space —
    no overlap, no scatter. Then PReLU and a final 1x1 conv C->1
    (einsum-lowered; see PointwiseConv).
    """

    channels: int = 64
    out_channels: int = 1
    scale: int = 3
    final_kernel: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # honor the decoder's own compute dtype: under the "mixed" recipe
        # the body runs bf16 and the decoder tail f32 (the cast adds no new
        # error; it stops FURTHER rounding after this point)
        x = x.astype(self.dtype)
        b, h, w, c = x.shape
        s = self.scale
        kernel = self.param(
            "deconv_kernel",
            nn.initializers.lecun_normal(),
            (s, s, c, self.channels),
            jnp.float32,
        )
        bias = self.param("deconv_bias", nn.initializers.zeros, (self.channels,), jnp.float32)
        # (B,H,W,C) x (s,s,C,Co) -> (B,H,W,s,s,Co)
        y = jnp.einsum(
            "bhwc,uvcd->bhwuvd",
            x,
            kernel.astype(x.dtype),
            preferred_element_type=x.dtype,
        )
        y = y + bias.astype(x.dtype)
        # depth-to-space: (B,H,s,W,s,Co) -> (B,sH,sW,Co)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(b, s * h, s * w, self.channels)
        y = PReLU(name="deconv_prelu")(y)
        if self.final_kernel == 1:
            y = PointwiseConv(self.out_channels, dtype=self.dtype, name="final_conv")(y)
        else:
            fk = (self.final_kernel, self.final_kernel)
            y = nn.Conv(
                self.out_channels, fk, padding="SAME", dtype=self.dtype, name="final_conv"
            )(y)
        return y


class HRNet(nn.Module):
    """Top-level multi-frame SR model.

    forward(lrs (B, L, H, W), alphas (B, L)) -> (B, 3H, 3W) SR images.

    The anchor frame is the lower-median of the first min(9, L) views,
    broadcast to every view and stacked as a second input channel
    (implicit co-registration; reference HRNet.py:200-204).
    """

    config: Dict[str, Any] | None = None
    dtype: Any = jnp.float32
    # decoder tail dtype; None = same as dtype. The "mixed" precision
    # recipe (resolve_compute_dtypes) runs encoder+fusion in bf16 and the
    # decoder in f32. Measured effect (PRECISION_ABLATION.json): ~13%
    # lower output RMS than full bf16 — the rounding error is spread
    # across ALL conv stages, so removing the decoder's share helps only
    # marginally; see precision_ablation.py for why no bf16 island recipe
    # can reach the 0.01 dB budget at 50 dB.
    decoder_dtype: Any = None

    def setup(self):
        cfg = self.config or {}
        enc = cfg.get("encoder", {})
        rec = cfg.get("recursive", {})
        dec = cfg.get("decoder", {})
        self.encode = Encoder(
            in_channels=enc.get("in_channels", 2),
            channels=enc.get("channel_size", 64),
            num_layers=enc.get("num_layers", 2),
            kernel_size=enc.get("kernel_size", 3),
            dtype=self.dtype,
        )
        self.fuse = FusionNet(
            channels=rec.get("in_channels", 64),
            kernel_size=rec.get("kernel_size", 3),
            alpha_residual=rec.get("alpha_residual", True),
            dtype=self.dtype,
            use_pallas_pack=rec.get("use_pallas_pack"),
        )
        dd = dec.get("deconv", {})
        df = dec.get("final", {})
        self.decode = Decoder(
            channels=dd.get("out_channels", 64),
            out_channels=df.get("out_channels", 1),
            scale=dd.get("stride", 3),
            final_kernel=df.get("kernel_size", 1),
            dtype=self.decoder_dtype if self.decoder_dtype is not None else self.dtype,
        )

    def __call__(self, lrs: jax.Array, alphas: jax.Array) -> jax.Array:
        b, l, h, w = lrs.shape
        refs = lower_median(lrs[:, : min(9, l)], axis=1)  # (B, H, W)
        refs = jnp.broadcast_to(refs[:, None], (b, l, h, w))
        x = jnp.stack([lrs, refs], axis=-1)  # (B, L, H, W, 2)
        x = x.astype(self.dtype)

        states = self.encode(x.reshape(b * l, h, w, 2))
        states = states.reshape(b, l, h, w, -1)

        fused = self.fuse(states, alphas.astype(states.dtype))  # (B, H, W, C)
        sr = self.decode(fused)  # (B, 3H, 3W, 1)
        return sr[..., 0].astype(jnp.float32)


def param_count(params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))


def resolve_compute_dtypes(compute_dtype: str | None):
    """Map a config ``training.compute_dtype`` string to HRNet dtypes.

    Returns (body_dtype, decoder_dtype):
      "float32"/None -> (f32, f32)       scoring-grade (XLA executes f32
                                         convs as 3-pass bf16 on the MXU)
      "bfloat16"     -> (bf16, bf16)     fastest; ~0.5 dB cPSNR error at
                                         ~50 dB output quality
      "mixed"        -> (bf16, f32)      bf16 body + f32 decoder tail:
                                         ~13% lower output error than plain
                                         bf16 at ~bf16 speed (the decoder
                                         is a small share of both FLOPs and
                                         rounding; PRECISION_ABLATION.json)
    """
    if compute_dtype in (None, "float32"):
        return jnp.float32, jnp.float32
    if compute_dtype == "bfloat16":
        return jnp.bfloat16, jnp.bfloat16
    if compute_dtype == "mixed":
        return jnp.bfloat16, jnp.float32
    raise ValueError(
        f"compute_dtype must be float32 | bfloat16 | mixed, got {compute_dtype!r}"
    )
