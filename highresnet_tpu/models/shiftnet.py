"""ShiftNet: sub-pixel pairwise registration network.

Behavioral spec from /root/reference/src/DeepNetworks/ShiftNet.py:6-90:
8 conv(+BN+ReLU) layers with 2x maxpool after layers 2/4/6 (128 -> 16),
dropout(0.5) on the flattened features, fc 32768->1024->2 with the last
layer bias-free and zero-initialized (identity transform at init), and the
per-channel spatial mean subtracted from the input.

TPU-first notes:
- NHWC; the flatten before fc1 transposes to channel-major (C, H, W) order
  so fc weights are layout-compatible with torch checkpoints.
- ``register_views`` folds the view axis into the batch axis: the reference
  loops over views in Python calling the net once per view
  (src/train.py:26-44); here all B*L pairs go through one conv stack.
  (BatchNorm batch statistics are then computed over all views jointly
  rather than per-view — identical at eval time, where running averages
  are used.)
- Parameter count matches the reference: 34,187,648.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch-exact TRAINING semantics.

    torch.nn.BatchNorm2d normalizes the batch with the biased variance but
    updates ``running_var`` with the UNBIASED (n/(n-1)) variance, momentum
    0.1 torch-style (new = (1-m)*old + m*batch). flax's nn.BatchNorm
    updates with the biased variance, which drifts eval-time statistics by
    n/(n-1) per step relative to a torch training run — the one remaining
    train-dynamics divergence flagged in round 1. Eval-mode math is
    identical to nn.BatchNorm. Stats are kept/updated in float32 even
    under bfloat16 compute.

    Variable/param names match nn.BatchNorm (scale/bias, mean/var) so
    checkpoints and models/convert.py are unaffected.
    """

    momentum: float = 0.1  # torch convention
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool) -> jax.Array:
        feat = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf - mean), axis=axes)  # biased: normalizes
            n = x.size // feat
            unbiased = var * (n / max(n - 1, 1))  # torch's running_var update
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1.0 - m) * ra_mean.value + m * mean
                ra_var.value = (1.0 - m) * ra_var.value + m * unbiased

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(self.dtype)


def max_pool_2x2(h: jax.Array) -> jax.Array:
    """Non-overlapping 2x2/stride-2 max pool via reshape + max.

    Forward-identical to ``nn.max_pool(h, (2, 2), strides=(2, 2))`` — the max
    is taken over the same disjoint windows (reference pooling:
    src/DeepNetworks/ShiftNet.py:22,29,36 ``nn.MaxPool2d(2)``). Written as a
    reshape-max so the BACKWARD lowers to elementwise compare/broadcast
    fusions instead of XLA's select-and-scatter, which the bf16 train-step
    trace measured at 9.7 ms/step (TRACE_BF16_TRAIN_SUMMARY.json, 'ShiftNet
    maxpool backward'). Gradients differ from select-and-scatter only on
    exactly-tied window maxima: reshape-max splits the cotangent evenly among
    ties while select-and-scatter routes it to one element. Ties are
    measure-zero for continuous conv outputs except post-ReLU zeros, where
    the upstream ReLU backward zeroes the gradient under either routing.
    """
    b, height, width, c = h.shape
    h = h.reshape(b, height // 2, 2, width // 2, 2, c)
    return h.max(axis=(2, 4))


class ShiftNet(nn.Module):
    in_channels: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        """x: (B, H, W, 2*in_channels) image pairs -> (B, 2) translations."""
        x = x - jnp.mean(x, axis=(1, 2), keepdims=True)
        x = x.astype(self.dtype)

        def block(h, features, idx, pool):
            h = nn.Conv(features, (3, 3), padding="SAME", dtype=self.dtype, name=f"conv{idx}")(h)
            h = TorchBatchNorm(dtype=self.dtype, name=f"bn{idx}")(
                h, use_running_average=not train
            )
            h = nn.relu(h)
            if pool:
                h = max_pool_2x2(h)
            return h

        widths = [64, 64, 64, 64, 128, 128, 128, 128]
        pools = [False, True, False, True, False, True, False, False]
        for i, (ch, p) in enumerate(zip(widths, pools), start=1):
            x = block(x, ch, i, p)

        b = x.shape[0]
        # channel-major flatten for torch fc-weight compatibility
        x = x.transpose(0, 3, 1, 2).reshape(b, -1)

        x = nn.Dropout(rate=0.5, deterministic=not train)(x)
        x = nn.Dense(1024, dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(
            2, use_bias=False, kernel_init=nn.initializers.zeros, dtype=self.dtype, name="fc2"
        )(x)
        return x.astype(jnp.float32)


def register_views(
    shiftnet: ShiftNet,
    variables,
    views: jax.Array,
    reference: jax.Array,
    train: bool = False,
    dropout_rng=None,
):
    """Predict per-view translations against a shared reference frame.

    Args:
      views: (B, L, H, W) images to register.
      reference: (B, H, W) reference images.

    Returns:
      thetas (B, L, 2); and, when training, the updated batch_stats dict.

    Channel order matches the reference: [reference, view]
    (src/train.py:40 concatenates reference first).
    """
    b, l, h, w = views.shape
    ref = jnp.broadcast_to(reference[:, None], (b, l, h, w))
    pairs = jnp.stack([ref, views], axis=-1).reshape(b * l, h, w, 2)
    rngs = {"dropout": dropout_rng} if dropout_rng is not None else {}
    if train:
        thetas, mutated = shiftnet.apply(
            variables, pairs, train=True, rngs=rngs, mutable=["batch_stats"]
        )
        return thetas.reshape(b, l, 2), mutated["batch_stats"]
    thetas = shiftnet.apply(variables, pairs, train=False)
    return thetas.reshape(b, l, 2), None


def apply_shifts(images: jax.Array, thetas: jax.Array, a: int = 3, n: int = 7) -> jax.Array:
    """Warp (B, L, H, W) images by per-view thetas (B, L, 2).

    The network predicts (dx, dy); the resampler consumes (dy, dx), so the
    last axis is flipped (reference: ShiftNet.transform flips theta,
    src/DeepNetworks/ShiftNet.py:88).
    """
    from highresnet_tpu.ops.lanczos import lanczos_shift_views

    return lanczos_shift_views(images, jnp.flip(thetas, axis=-1), a=a, n=n)
