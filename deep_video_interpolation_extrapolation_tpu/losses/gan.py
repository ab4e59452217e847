"""GAN losses (reference losses.py:247-336).

The active GAN loss is the hinge ``GANScalarLoss`` (losses.py:247-256):
  D real:  weight * mean(relu(1 - D(real)))
  D fake:  weight * mean(relu(1 + D(fake)))
  G:       weight * mean(relu(1 - D(fake)))   (called with is_target_True=True)
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def gan_scalar_loss(
    logits: jnp.ndarray, target_is_real: bool, weight: float = 1.0
) -> jnp.ndarray:
    """Hinge loss matching reference GANScalarLoss.forward (losses.py:252-256)."""
    if target_is_real:
        return weight * jnp.mean(jax.nn.relu(1.0 - logits))
    return weight * jnp.mean(jax.nn.relu(logits + 1.0))


def hinge_d_loss(real_logits: jnp.ndarray, fake_logits: jnp.ndarray, weight: float = 1.0) -> jnp.ndarray:
    return gan_scalar_loss(real_logits, True, weight) + gan_scalar_loss(
        fake_logits, False, weight
    )


def hinge_g_loss(fake_logits: jnp.ndarray, weight: float = 1.0) -> jnp.ndarray:
    return gan_scalar_loss(fake_logits, True, weight)


def bce_gan_loss(preds, target_is_real: bool) -> jnp.ndarray:
    """BCE loss on sigmoid outputs (legacy GANLoss, losses.py:260-300).

    ``preds`` is either a prediction array, or a list of per-scale lists whose
    last element is the prediction (pix2pixHD multiscale output format).
    """
    def one(p):
        target = jnp.ones_like(p) if target_is_real else jnp.zeros_like(p)
        eps = 1e-12
        p = jnp.clip(p, eps, 1 - eps)
        return -jnp.mean(target * jnp.log(p) + (1 - target) * jnp.log(1 - p))

    if isinstance(preds, (list, tuple)) and isinstance(preds[0], (list, tuple)):
        return sum(one(p[-1]) for p in preds)
    if isinstance(preds, (list, tuple)):
        return one(preds[-1])
    return one(preds)


def gan_map_loss(preds: Sequence, label_map: jnp.ndarray, target_is_real: bool) -> jnp.ndarray:
    """Legacy patch-map L1 GAN loss (losses.py:302-336, with its ratio
    overrides: both ratios are forced to 1 and the fake-path label map is
    zero-filled, losses.py:319-331)."""
    from deep_video_interpolation_extrapolation_tpu.ops.resize import interpolate_nearest

    loss = 0.0
    for pred_list in preds:
        pred = pred_list[-1] if isinstance(pred_list, (list, tuple)) else pred_list
        if target_is_real:
            loss = loss + jnp.mean(jnp.abs(pred - 1.0))
        else:
            lm = jnp.zeros_like(pred)
            fake_loss = jnp.mean(jnp.abs(pred - lm) * (1 - lm))
            real_loss = jnp.mean(jnp.abs(pred - lm) * lm)
            loss = loss + fake_loss + real_loss
    return loss / len(preds)
