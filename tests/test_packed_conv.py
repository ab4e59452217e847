"""Width-packed conv must be bit-compatible with the plain 3x3 conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_video_interpolation_extrapolation_tpu.ops.packed_conv import (
    conv3x3_wpacked,
    pack_w,
    unpack_w,
)


def _conv_ref(x, k):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def test_pack_roundtrip_is_identity():
    x = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (2, 4, 8, 3)),
                    jnp.float32)
    np.testing.assert_array_equal(np.asarray(unpack_w(pack_w(x))), np.asarray(x))


@pytest.mark.parametrize("factor", [2, 4])
@pytest.mark.parametrize("shape", [(1, 6, 8, 4, 5), (2, 8, 16, 8, 8)])
def test_packed_conv_exact(shape, factor):
    b, h, w, c, o = shape
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.uniform(-1, 1, (b, h, w, c)), jnp.float32)
    k = jnp.asarray(rng.uniform(-0.5, 0.5, (3, 3, c, o)), jnp.float32)
    bias = jnp.asarray(rng.uniform(-0.1, 0.1, (o,)), jnp.float32)

    ref = _conv_ref(x, k) + bias
    out = conv3x3_wpacked(x, k, bias, factor=factor)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_packed_basicblock_matches_plain():
    """BasicBlock(packed_io=True) on packed input == plain BasicBlock on the
    same params (the HRNet branch-0 fast path)."""
    import jax.numpy as jnp
    from deep_video_interpolation_extrapolation_tpu.models.blocks import BasicBlock

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 4, 8, 4)), jnp.float32)
    plain = BasicBlock(4, dtype=jnp.float32)
    packed = BasicBlock(4, dtype=jnp.float32, packed_io=2)
    v = plain.init(jax.random.PRNGKey(0), x)
    ref = plain.apply(v, x)
    out = unpack_w(packed.apply(v, pack_w(x)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_packed_conv_gradients_match():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 4, 8, 4)), jnp.float32)
    k = jnp.asarray(rng.uniform(-0.5, 0.5, (3, 3, 4, 4)), jnp.float32)

    g_ref = jax.grad(lambda kk: jnp.sum(_conv_ref(x, kk) ** 2))(k)
    g_pk = jax.grad(lambda kk: jnp.sum(conv3x3_wpacked(x, kk) ** 2))(k)
    np.testing.assert_allclose(np.asarray(g_pk), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)
