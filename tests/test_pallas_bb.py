"""ops/pallas_bb.py: fused HWNC BasicBlock == the XLA packed composition.

Interpret-mode (CPU) exactness across block counts / edge programs,
gradient parity via the custom_vjp, and the BasicBlock module routing
(DVIE_BB_FUSED=1 produces the same numbers and the same param tree as
the default path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_video_interpolation_extrapolation_tpu.ops import pallas_bb
from deep_video_interpolation_extrapolation_tpu.ops.packed_conv import pack_w


def _mk(rng, shape):
    return jnp.asarray(rng.uniform(-1, 1, shape), jnp.float32)


@pytest.mark.parametrize("h,wp,b", [(8, 16, 2), (16, 8, 1), (12, 24, 2)])
def test_fused_bb_matches_ref(h, wp, b):
    rng = np.random.RandomState(41)
    c = 64
    fc = 2 * c
    x = _mk(rng, (h, wp, b, fc))
    k1 = jnp.asarray(rng.uniform(-0.2, 0.2, (3, 3, c, c)), jnp.float32)
    k2 = jnp.asarray(rng.uniform(-0.2, 0.2, (3, 3, c, c)), jnp.float32)
    assert pallas_bb.bb_fits(x)
    y = pallas_bb.fused_basicblock_hwnc(x, k1, k2, 2, True)
    yr = pallas_bb._ref(x, k1, k2, 2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               atol=3e-5, rtol=3e-5)


def test_fused_bb_gradients_match():
    rng = np.random.RandomState(42)
    h, wp, b, c = 8, 8, 1, 64
    x = _mk(rng, (h, wp, b, 2 * c))
    k1 = jnp.asarray(rng.uniform(-0.2, 0.2, (3, 3, c, c)), jnp.float32)
    k2 = jnp.asarray(rng.uniform(-0.2, 0.2, (3, 3, c, c)), jnp.float32)

    def loss_fused(x, k1, k2):
        return jnp.sum(pallas_bb.fused_basicblock_hwnc(x, k1, k2, 2, True)
                       ** 2)

    def loss_ref(x, k1, k2):
        return jnp.sum(pallas_bb._ref(x, k1, k2, 2) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, k1, k2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k1, k2)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_basicblock_module_routing(monkeypatch):
    """DVIE_BB_FUSED=1 routes BasicBlock through the fused kernel with an
    identical param tree and identical outputs (interpret mode)."""
    from deep_video_interpolation_extrapolation_tpu.core import hw
    from deep_video_interpolation_extrapolation_tpu.models.blocks import (
        BasicBlock,
    )

    monkeypatch.setattr(hw, "pallas_enabled", lambda: True)
    # keep the other kernel routes out of the baseline (they would run
    # non-interpret pallas_calls on CPU)
    monkeypatch.setenv("DVIE_AE_HWNC", "0")
    monkeypatch.setenv("DVIE_AE_CONV", "0")
    monkeypatch.setenv("DVIE_FUSED_BLOCK", "0")
    # interpret-mode under the hood: force the kernel path but run on CPU
    orig = pallas_bb._impl
    monkeypatch.setattr(
        pallas_bb, "_impl",
        lambda x, k1, k2, f=2, interpret=False: orig(x, k1, k2, f, True))

    rng = np.random.RandomState(43)
    x = _mk(rng, (2, 8, 32, 64))          # NHWC
    xp = pack_w(x, 2)                      # (2, 8, 16, 128)
    blk = BasicBlock(64, packed_io=2, dtype=jnp.float32)

    monkeypatch.setenv("DVIE_BB_FUSED", "0")
    v = blk.init(jax.random.PRNGKey(0), xp)
    base = blk.apply(v, xp)

    monkeypatch.setenv("DVIE_BB_FUSED", "1")
    v2 = blk.init(jax.random.PRNGKey(0), xp)
    assert jax.tree_util.tree_structure(v2) == jax.tree_util.tree_structure(v)
    fused = blk.apply(v, xp)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               atol=3e-5, rtol=3e-5)
