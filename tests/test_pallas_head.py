"""Fused dual-head kernel: exactness vs the XLA head composition
(interpret mode; the kernel itself is experimental, ops/pallas_head.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from deep_video_interpolation_extrapolation_tpu.ops.pallas_head import (
    fused_dual_head,
)


def test_matches_xla_heads():
    rng = np.random.RandomState(0)
    b, h, w, c = 1, 16, 32, 16
    feat = jnp.asarray(rng.uniform(-1, 1, (b, h, w, c)), jnp.float32)

    def mk(*shape):
        return jnp.asarray(rng.normal(0, 0.1, shape), jnp.float32)
    w1r, b1r = mk(c, c), mk(c)
    w1s, b1s = mk(c, c), mk(c)
    w2r, b2r = mk(3, 3, c, 3), mk(3)
    w2s, b2s = mk(3, 3, c, 20), mk(20)

    def ref_head(x, w1, b1, w2, b2):
        hh = jax.nn.leaky_relu(
            jax.lax.dot_general(x, w1, (((3,), (0,)), ((), ()))) + b1, 0.2)
        return jax.lax.conv_general_dilated(
            hh, w2, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b2

    rr = ref_head(feat, w1r, b1r, w2r, b2r)
    rs = ref_head(feat, w1s, b1s, w2s, b2s)
    orr, ors = fused_dual_head(feat, w1r, b1r, w2r, b2r,
                               w1s, b1s, w2s, b2s, seg_dim=20, interpret=True)
    np.testing.assert_allclose(np.asarray(orr), np.asarray(rr), atol=1e-5)
    np.testing.assert_allclose(np.asarray(ors), np.asarray(rs), atol=1e-5)
