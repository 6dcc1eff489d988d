"""Training losses: ESA cMSE / cPSNR with detached brightness bias.

Contract matches the reference math (re-derived from
/root/reference/src/train.py:66-106):

  nclear = sum(mask)
  bias   = stop_gradient( sum(mask * (hr - sr)) / nclear )
  cMSE   = sum(mask * (sr + bias - hr)^2) / nclear
  cPSNR  = -10 * log10(cMSE)

The bias term is detached so gradients do not flow through the brightness
correction (reference detaches at src/train.py:83).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def masked_mse_loss(sr: jax.Array, hr: jax.Array, mask: jax.Array) -> jax.Array:
    """Per-image mean over ALL pixels of (mask*sr - mask*hr)^2.

    Mirrors the reference 'masked_MSE' branch, which averages over the full
    image area including masked-out zeros (src/train.py:79-81).
    """
    diff = mask * sr - mask * hr
    return jnp.mean(jnp.square(diff), axis=(-2, -1))


def cmse(sr: jax.Array, hr: jax.Array, mask: jax.Array) -> jax.Array:
    """Bias-corrected masked MSE, per image. Inputs (..., H, W)."""
    nclear = jnp.sum(mask, axis=(-2, -1))
    bias = jax.lax.stop_gradient(
        jnp.sum(mask * (hr - sr), axis=(-2, -1)) / nclear
    )
    err = sr + bias[..., None, None] - hr
    return jnp.sum(mask * jnp.square(err), axis=(-2, -1)) / nclear


def cpsnr_loss(sr: jax.Array, hr: jax.Array, mask: jax.Array) -> jax.Array:
    """Per-image cPSNR (dB). Differentiable; bias term detached."""
    return -10.0 * jnp.log10(cmse(sr, hr, mask))


LOSS_METRICS = ("cPSNR", "cMSE", "masked_MSE")


def get_loss(sr: jax.Array, hr: jax.Array, mask: jax.Array, metric: str = "cMSE") -> jax.Array:
    """Per-image training criterion, selected by name.

    Mirrors the reference's three-way `get_loss` switch
    (/root/reference/src/train.py:66-87): 'masked_MSE' averages over the
    full image area, 'cMSE' is the bias-corrected masked MSE, and 'cPSNR'
    is -10*log10(cMSE) (higher is better — callers minimizing it negate).
    """
    if metric == "masked_MSE":
        return masked_mse_loss(sr, hr, mask)
    if metric == "cMSE":
        return cmse(sr, hr, mask)
    if metric == "cPSNR":
        return cpsnr_loss(sr, hr, mask)
    raise ValueError(f"unknown loss metric {metric!r}; expected one of {LOSS_METRICS}")


def registered_loss(
    sr_shifted: jax.Array,
    hr: jax.Array,
    mask: jax.Array,
    shifts: jax.Array,
    lam: float,
    metric: str = "cPSNR",
) -> jax.Array:
    """Total training loss: mean(criterion) + lam * mean(shifts)^2.

    With the default metric the criterion is -cPSNR, matching the
    reference training objective (`loss = -get_loss(..., metric='cPSNR')`,
    src/train.py:185); 'cMSE'/'masked_MSE' are minimized directly.

    Note the regularizer is lambda times the SQUARE OF THE MEAN of all shift
    components (reference: `lambda * torch.mean(shifts)**2`,
    src/train.py:187) — it penalizes a net translation bias, not magnitude.
    """
    per_image = get_loss(sr_shifted, hr, mask, metric=metric)
    if metric == "cPSNR":
        per_image = -per_image
    return jnp.mean(per_image) + lam * jnp.square(jnp.mean(shifts))


def crop_mask(patch_size: int, crop: int) -> np.ndarray:
    """(3P, 3P) float mask zeroing a `crop`-wide border of the SR frame.

    Host-side constant (reference: src/train.py:90-106).
    """
    size = 3 * patch_size
    m = np.ones((size, size), dtype=np.float32)
    if crop > 0:
        m[:crop, :] = 0.0
        m[-crop:, :] = 0.0
        m[:, :crop] = 0.0
        m[:, -crop:] = 0.0
    return m
