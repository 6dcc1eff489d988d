"""VGG19 feature extractor for perceptual metrics.

Re-implements the capability of the reference VGGFeatureExtractor
(/root/reference/VGGFeatureExtractor.py:10-73): the VGG19 conv stack up to
features[28], tapping the CONV outputs at torchvision feature indices
{0, 5, 10, 19, 28} (first conv, ends of blocks 1-2, deep block 3/4 convs),
with grayscale->RGB replication and ImageNet normalization.

Weights: torchvision is not available in this image and there is no
network egress, so weights load from a local file when provided —
either a torch ``vgg19`` state dict (.pth, via torch.load) or an .npz of
the same tensors — converted to NHWC/HWIO. Without a weights file the
extractor initializes randomly (still a valid perceptual embedding for
relative comparisons, and exactly reproducible from the seed).
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

# VGG19 conv plan: (out_channels, tap?) per conv; 'M' = 2x2 maxpool.
# torchvision feature indices of the convs are listed for reference; taps
# at {0, 5, 10, 19, 28} are marked.
_VGG19_PLAN = [
    (64, True),  # idx 0  <- tap '0'
    (64, False),  # idx 2
    "M",
    (128, True),  # idx 5  <- tap '5'
    (128, False),  # idx 7
    "M",
    (256, True),  # idx 10 <- tap '10'
    (256, False),  # idx 12
    (256, False),  # idx 14
    (256, False),  # idx 16
    "M",
    (512, True),  # idx 19 <- tap '19'
    (512, False),  # idx 21
    (512, False),  # idx 23
    (512, False),  # idx 25
    "M",
    (512, True),  # idx 28 <- tap '28'
]

TAP_NAMES = ["0", "5", "10", "19", "28"]


class VGG19Features(nn.Module):
    """Truncated VGG19 conv stack returning tapped conv outputs."""

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        taps: Dict[str, jax.Array] = {}
        tap_iter = iter(TAP_NAMES)
        conv_i = 0
        for item in _VGG19_PLAN:
            if item == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
                continue
            ch, is_tap = item
            x = nn.Conv(ch, (3, 3), padding="SAME", name=f"conv{conv_i}")(x)
            if is_tap:
                taps[next(tap_iter)] = x
            x = nn.relu(x)
            conv_i += 1
        return taps


def preprocess(img: jax.Array) -> jax.Array:
    """Grayscale (H, W) or (H, W, C) -> normalized (1, H, W, 3)."""
    img = jnp.asarray(img, jnp.float32)
    if img.ndim == 2:
        img = img[..., None]
    if img.shape[-1] == 1:
        img = jnp.repeat(img, 3, axis=-1)
    img = (img - IMAGENET_MEAN) / IMAGENET_STD
    return img[None]


def _torch_state_to_params(state: dict) -> dict:
    """Map a torchvision vgg19 ``features`` state dict to flax params."""
    convs = {}
    # Accept both 'features.0.weight' and '0.weight' key styles.
    items: Dict[int, Dict[str, np.ndarray]] = {}
    for k, v in state.items():
        parts = k.split(".")
        try:
            idx = int(parts[1] if parts[0] == "features" else parts[0])
        except (ValueError, IndexError):
            continue
        kind = parts[-1]
        items.setdefault(idx, {})[kind] = np.asarray(v)
    conv_indices = sorted(items)
    for local_i, idx in enumerate(conv_indices):
        w = items[idx]["weight"]  # (O, I, kh, kw)
        b = items[idx]["bias"]
        convs[f"conv{local_i}"] = {
            "kernel": w.transpose(2, 3, 1, 0),  # HWIO
            "bias": b,
        }
    return convs


class VGGFeatureExtractor:
    """Frozen feature extractor facade (jitted apply, host-friendly API)."""

    def __init__(self, weights_path: Optional[str] = None, seed: int = 0):
        self.module = VGG19Features()
        if weights_path is not None:
            if weights_path.endswith(".npz"):
                state = dict(np.load(weights_path))
            else:
                import torch

                state = {
                    k: v.numpy() for k, v in torch.load(weights_path, map_location="cpu").items()
                }
            params = _torch_state_to_params(state)
            self.params = jax.tree_util.tree_map(jnp.asarray, params)
        else:
            dummy = jnp.zeros((1, 64, 64, 3))
            self.params = self.module.init(jax.random.PRNGKey(seed), dummy)["params"]
        self._apply = jax.jit(lambda p, x: self.module.apply({"params": p}, x))

    def __call__(self, img) -> Dict[str, jax.Array]:
        """img: (H, W) grayscale in [0, 1] (or (H,W,3)) -> dict of tapped features."""
        return self._apply(self.params, preprocess(img))

    def features_batched(self, imgs: jax.Array) -> Dict[str, jax.Array]:
        """(B, H, W) -> taps with leading batch dim (for vmapped shift grids)."""
        x = jnp.asarray(imgs, jnp.float32)[..., None]
        x = jnp.repeat(x, 3, axis=-1)
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        return self._apply(self.params, x)
