"""Parity for the fused fwd+bwd packed train-chain kernels
(ops/pallas_trainchain.py) against the plain XLA composition of the
stem + layer1 Bottleneck chain (nets/HRNet.py:47-85, 367-375).

Interpret mode on the CPU mesh; f32 so the tolerance is rounding-noise
tight.  The TPU in-model A/B lives in docs/TRAINBENCH_r5.md
(228.3 -> 244.65 samples/s at the author's 128x128 bs32 recipe).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_video_interpolation_extrapolation_tpu.ops import (
    pallas_trainchain as tc,
)

pytestmark = pytest.mark.quick


def _lrelu(v):
    return jnp.where(v >= 0, v, jnp.asarray(0.2, v.dtype) * v)


def _ref_chain(x, stem_params, block_params, dt):
    k1s, b1s, k2s, b2s = stem_params

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32), k.astype(jnp.float32), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(dt)

    x = _lrelu(conv(x, k1s) + b1s.astype(dt))
    x = _lrelu(conv(x, k2s) + b2s.astype(dt))
    for (k1, k2, k3, kres) in block_params:
        h1 = _lrelu(conv(x, k1))
        h2 = _lrelu(conv(h1, k2))
        out = conv(h2, k3)
        res = conv(x, kres) if kres is not None else x
        x = _lrelu(out + res)
    return x


def _make_params(key, ci, planes, blocks=4):
    ks = jax.random.split(key, 32)
    it = iter(range(32))

    def w(shape):
        # fan-in scaled: keeps 6-layer chain activations O(1) so the f32
        # reorder noise stays within tolerance at 64 planes
        fan = np.prod(shape[:-1])
        return (1.0 / np.sqrt(fan)) * jax.random.normal(
            ks[next(it)], shape, jnp.float32)

    stem = (w((3, 3, ci, planes)), w((planes,)),
            w((3, 3, planes, planes)), w((planes,)))
    bp = []
    cin, out_ch = planes, 4 * planes
    for _ in range(blocks):
        bp.append((w((1, 1, cin, planes)), w((3, 3, planes, planes)),
                   w((1, 1, planes, out_ch)),
                   w((1, 1, cin, out_ch)) if cin != out_ch else None))
        cin = out_ch
    return stem, bp


class TestTrainChainParity:
    @pytest.mark.parametrize("planes", [16, 64])
    def test_forward_and_grads_match_xla(self, planes):
        """planes=16 exercises the dense 9-tap path; planes=64 (128
        packed lanes) the A+E 6-dot path (_ae_ok)."""
        B, H, W, CI = 4, 32, 32, 14
        if planes == 64:
            B, H, W = 2, 16, 16
        dt = jnp.float32
        stem, bp = _make_params(jax.random.PRNGKey(1), CI, planes)
        x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, CI),
                              jnp.float32)
        ct = jax.random.normal(jax.random.PRNGKey(7),
                               (B, H, W, 4 * planes), jnp.float32)

        y_ref = _ref_chain(x, stem, bp, dt)
        y_new = tc.stem_layer1_chain(x, stem, bp, f=2, interpret=True)
        np.testing.assert_allclose(np.asarray(y_ref), np.asarray(y_new),
                                   atol=2e-4, rtol=2e-4)

        def loss_ref(x, stem, bp):
            return jnp.sum(_ref_chain(x, stem, bp, dt) * ct)

        def loss_new(x, stem, bp):
            return jnp.sum(tc.stem_layer1_chain(x, stem, bp, 2, True) * ct)

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, stem, bp)
        g_new = jax.grad(loss_new, argnums=(0, 1, 2))(x, stem, bp)
        # Gradients through stacked LeakyReLUs are DISCRETELY sensitive
        # to forward rounding: a 1e-6 perturbation of the reference's own
        # intermediate flips masks at near-zero pre-activations and moves
        # ~0.3% of dx elements by up to ~3e-3 (measured on the pure-XLA
        # composition).  So: the bulk must be rounding-tight, the kink
        # tail bounded.
        leaves_ref = jax.tree_util.tree_leaves(g_ref)
        leaves_new = jax.tree_util.tree_leaves(g_new)
        for a, b in zip(leaves_ref, leaves_new):
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            rel_l2 = np.sqrt(((a - b) ** 2).sum()
                             / max((a ** 2).sum(), 1e-30))
            assert rel_l2 < 1e-2, rel_l2
        # dx (elementwise-local): the bulk must be rounding-tight; only
        # the kink tail may move
        a = np.asarray(leaves_ref[0], np.float64)
        b = np.asarray(leaves_new[0], np.float64)
        rel = np.abs(a - b) / (np.abs(a).max() + 1e-6)
        assert np.quantile(rel, 0.9) < 5e-5, np.quantile(rel, 0.9)

    def test_fits_gates_on_compute_dtype_and_shape(self):
        # f32 carrier sized as bf16 compute must pass at the recipe shape
        x32 = jnp.zeros((32, 128, 128, 14), jnp.float32)
        assert tc.fits(x32, dtype=jnp.bfloat16)
        # 512x1024 full-res must NOT fit (keeps the HWNC inference chain)
        big = jnp.zeros((8, 512, 1024, 14), jnp.bfloat16)
        assert not tc.fits(big)
        # odd W cannot pack
        odd = jnp.zeros((4, 32, 33, 14), jnp.bfloat16)
        assert not tc.fits(odd)

    def test_weight_grad_accumulates_over_batch_grid(self):
        """bt < B exercises the constant-index accumulation blocks."""
        B, H, W, CI = 4, 16, 16, 6
        stem, bp = _make_params(jax.random.PRNGKey(3), CI, 8, blocks=2)
        x = jax.random.normal(jax.random.PRNGKey(2), (B, H, W, CI),
                              jnp.float32)

        def loss(bp):
            y = tc.stem_layer1_chain(x, stem, bp, 2, True)
            return jnp.sum(y ** 2)

        g_whole = jax.grad(loss)(bp)
        # oracle: sum of per-sample grads (linearity of the batch sum)
        g_parts = None
        for i in range(B):
            xi = x[i:i + 1]

            def loss_i(bp, xi=xi):
                y = tc.stem_layer1_chain(xi, stem, bp, 2, True)
                return jnp.sum(y ** 2)

            gi = jax.grad(loss_i)(bp)
            g_parts = gi if g_parts is None else jax.tree_util.tree_map(
                lambda a, b: a + b, g_parts, gi)
        for a, b in zip(jax.tree_util.tree_leaves(g_whole),
                        jax.tree_util.tree_leaves(g_parts)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3, rtol=1e-4)
