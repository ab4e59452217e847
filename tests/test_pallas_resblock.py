"""Fused packed residual blocks vs the XLA packed reference.

Interpret mode on the CPU test mesh; exercised compiled on real TPU by
the bench.  Reference math: the packed Bottleneck/BasicBlock composition
(ops/packed_conv.py kernels; reference nets/HRNet.py:15-85).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_video_interpolation_extrapolation_tpu.ops.packed_conv import pack_w, unpack_w
from deep_video_interpolation_extrapolation_tpu.ops.pallas_resblock import (
    _basicblock_ref,
    _bb_impl,
    _bn_impl,
    _bottleneck_ref,
)


def _interp():
    return jax.default_backend() != "tpu"


@pytest.mark.parametrize("cin,has_res", [(16, True), (16, False)])
def test_fused_bottleneck_matches_ref(cin, has_res):
    rng = np.random.RandomState(0)
    p = 4
    x = jnp.asarray(rng.uniform(-1, 1, (1, 32, 64, cin)), jnp.float32)
    k1 = jnp.asarray(rng.uniform(-0.4, 0.4, (1, 1, cin, p)), jnp.float32)
    k2 = jnp.asarray(rng.uniform(-0.4, 0.4, (3, 3, p, p)), jnp.float32)
    k3 = jnp.asarray(rng.uniform(-0.4, 0.4, (1, 1, p, cin)), jnp.float32)
    kres = (jnp.asarray(rng.uniform(-0.4, 0.4, (1, 1, cin, cin)), jnp.float32)
            if has_res else None)
    xp = pack_w(x, 2)
    ref = np.asarray(_bottleneck_ref(xp, k1, k2, k3, kres, 2))
    out = np.asarray(_bn_impl(xp, k1, k2, k3, kres, 2, interpret=_interp()))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_fused_bottleneck_border_zero_pad():
    """Borders must follow SAME zero padding exactly (zero-padded input +
    bias-free convs propagate zeros; halo roll wrap must not leak)."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.uniform(1, 2, (1, 32, 128, 8)), jnp.float32)
    k1 = jnp.asarray(rng.uniform(0.1, 0.4, (1, 1, 8, 4)), jnp.float32)
    k2 = jnp.asarray(rng.uniform(0.1, 0.4, (3, 3, 4, 4)), jnp.float32)
    k3 = jnp.asarray(rng.uniform(0.1, 0.4, (1, 1, 4, 8)), jnp.float32)
    xp = pack_w(x, 2)
    ref = np.asarray(_bottleneck_ref(xp, k1, k2, k3, None, 2))
    out = np.asarray(_bn_impl(xp, k1, k2, k3, None, 2, interpret=_interp()))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_fused_basicblock_matches_ref():
    rng = np.random.RandomState(2)
    c = 8
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 64, c)), jnp.float32)
    k1 = jnp.asarray(rng.uniform(-0.4, 0.4, (3, 3, c, c)), jnp.float32)
    k2 = jnp.asarray(rng.uniform(-0.4, 0.4, (3, 3, c, c)), jnp.float32)
    xp = pack_w(x, 2)
    ref = np.asarray(_basicblock_ref(xp, k1, k2, 2))
    out = np.asarray(_bb_impl(xp, k1, k2, 2, interpret=_interp()))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_fused_basicblock_border_mask():
    """conv1's out-of-image rows read in-image values; without the h1 mask
    conv2 would see nonzero where the reference has zero padding."""
    rng = np.random.RandomState(3)
    c = 8
    x = jnp.asarray(rng.uniform(1, 2, (1, 32, 128, c)), jnp.float32)
    k1 = jnp.asarray(rng.uniform(0.1, 0.4, (3, 3, c, c)), jnp.float32)
    k2 = jnp.asarray(rng.uniform(0.1, 0.4, (3, 3, c, c)), jnp.float32)
    xp = pack_w(x, 2)
    ref = np.asarray(_basicblock_ref(xp, k1, k2, 2))
    out = np.asarray(_bb_impl(xp, k1, k2, 2, interpret=_interp()))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_fused_bottleneck_equals_logical_block():
    """End-to-end: packed fused block == unpacked logical Bottleneck math."""
    from deep_video_interpolation_extrapolation_tpu.models.blocks import Bottleneck

    rng = np.random.RandomState(4)
    for cin in (8, 16):  # with and without the residual projection
        x = jnp.asarray(rng.uniform(-1, 1, (1, 32, 64, cin)), jnp.float32)
        m = Bottleneck(4, dtype=jnp.float32)
        v = m.init(jax.random.PRNGKey(0), x)
        ref = np.asarray(m.apply(v, x))
        p = v["params"]
        ks = [p[n]["kernel"] for n in sorted(p.keys())]
        k1, k2, k3 = ks[:3]
        kres = ks[3] if len(ks) == 4 else None
        out = unpack_w(np.asarray(
            _bn_impl(pack_w(x, 2), k1, k2, k3, kres, 2, interpret=_interp())), 2)
        np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-4)
