"""VAE KL-divergence loss (reference losses.py:50-60)."""

from __future__ import annotations

import jax.numpy as jnp


def kld_loss(mu: jnp.ndarray, logvar: jnp.ndarray, weight: float = 1.0) -> jnp.ndarray:
    """-0.5 * sum(1 + logvar - mu^2 - exp(logvar)) / batch, times weight."""
    bs = mu.shape[0]
    kld = -0.5 * jnp.sum(1.0 + logvar - jnp.square(mu) - jnp.exp(logvar))
    return weight * kld / bs
