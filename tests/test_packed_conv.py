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


@pytest.mark.parametrize("factor", [2, 4])
def test_packed_1x1_exact(factor):
    from deep_video_interpolation_extrapolation_tpu.ops.packed_conv import (
        pack_kernel_1x1,
    )
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 4, 8, 6)), jnp.float32)
    k = jnp.asarray(rng.uniform(-0.5, 0.5, (1, 1, 6, 10)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = unpack_w(jax.lax.conv_general_dilated(
        pack_w(x, factor), pack_kernel_1x1(k, factor), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")), factor)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_packed_stride2_consume_exact():
    """Stride-2 conv consuming f=2-packed input == plain stride-2 SAME conv
    (the _Transition boundary out of a packed region)."""
    from deep_video_interpolation_extrapolation_tpu.ops.packed_conv import (
        pack_kernel_3x3_stride2_in,
    )
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 8, 16, 6)), jnp.float32)
    k = jnp.asarray(rng.uniform(-0.5, 0.5, (3, 3, 6, 10)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = jax.lax.conv_general_dilated(
        pack_w(x, 2), pack_kernel_3x3_stride2_in(k), (2, 1),
        ((1, 1), (1, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_packed_bottleneck_matches_plain():
    """Bottleneck(packed_io=2) on packed input == plain Bottleneck on the
    same params (the HRNet layer1 fast path), incl. residual projection."""
    from deep_video_interpolation_extrapolation_tpu.models.blocks import Bottleneck

    rng = np.random.RandomState(6)
    for cin in (4, 16):  # with and without the residual 1x1
        x = jnp.asarray(rng.uniform(-1, 1, (1, 4, 8, cin)), jnp.float32)
        plain = Bottleneck(4, dtype=jnp.float32)
        packed = Bottleneck(4, dtype=jnp.float32, packed_io=2)
        v = plain.init(jax.random.PRNGKey(0), x)
        ref = plain.apply(v, x)
        out = unpack_w(packed.apply(v, pack_w(x)))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_packed_transition_and_module_handoff():
    """_Transition(packed_in=2) + HighResolutionModule(branch0_packed=True)
    reproduce the unpacked pipeline on the same params."""
    from deep_video_interpolation_extrapolation_tpu.models.hrnet import (
        STAGE2_CFG,
        HighResolutionModule,
        _Transition,
    )

    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 8, 16, 12)), jnp.float32)
    t0 = _Transition((12,), (4, 8), dtype=jnp.float32)
    t2 = _Transition((12,), (4, 8), dtype=jnp.float32, packed_in=2)
    p = t0.init(jax.random.PRNGKey(1), [x])
    a0, b0 = t0.apply(p, [x])
    a2, b2 = t2.apply(p, [pack_w(x, 2)])
    np.testing.assert_allclose(np.asarray(unpack_w(a2, 2)), np.asarray(a0),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b0),
                               atol=1e-5, rtol=1e-5)

    xs = [jnp.asarray(rng.uniform(-1, 1, (1, 8, 16, 64)), jnp.float32),
          jnp.asarray(rng.uniform(-1, 1, (1, 4, 8, 128)), jnp.float32)]
    m0 = HighResolutionModule(dtype=jnp.float32, **STAGE2_CFG)
    mp = HighResolutionModule(dtype=jnp.float32, branch0_packed=True,
                              **STAGE2_CFG)
    pm = m0.init(jax.random.PRNGKey(2), xs)
    y0 = m0.apply(pm, xs)
    y2 = mp.apply(pm, [pack_w(xs[0], 2), xs[1]])
    for u, v in zip(y0, y2):
        np.testing.assert_allclose(np.asarray(v), np.asarray(u),
                                   atol=1e-4, rtol=1e-4)


def test_packed_conv_gradients_match():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 4, 8, 4)), jnp.float32)
    k = jnp.asarray(rng.uniform(-0.5, 0.5, (3, 3, 4, 4)), jnp.float32)

    g_ref = jax.grad(lambda kk: jnp.sum(_conv_ref(x, kk) ** 2))(k)
    g_pk = jax.grad(lambda kk: jnp.sum(conv3x3_wpacked(x, kk) ** 2))(k)
    np.testing.assert_allclose(np.asarray(g_pk), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("factor", [2, 4])
@pytest.mark.parametrize("shape", [(1, 6, 8, 4, 5), (2, 8, 16, 8, 8)])
def test_ae_conv_exact(shape, factor):
    """A+E decomposition == plain 3x3 SAME conv (and == single packed kernel)."""
    from deep_video_interpolation_extrapolation_tpu.ops.packed_conv import (
        conv3x3_packed_ae_xla,
    )
    b, h, w, c, o = shape
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.uniform(-1, 1, (b, h, w, c)), jnp.float32)
    k = jnp.asarray(rng.uniform(-0.5, 0.5, (3, 3, c, o)), jnp.float32)
    ref = _conv_ref(x, k)
    out = unpack_w(conv3x3_packed_ae_xla(pack_w(x, factor), k, factor), factor)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_ae_conv_gradients_match():
    from deep_video_interpolation_extrapolation_tpu.ops.packed_conv import (
        conv3x3_packed_ae_xla,
    )
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 4, 8, 4)), jnp.float32)
    k = jnp.asarray(rng.uniform(-0.5, 0.5, (3, 3, 4, 4)), jnp.float32)
    g_ref = jax.grad(lambda kk: jnp.sum(_conv_ref(x, kk) ** 2))(k)
    g_ae = jax.grad(lambda kk: jnp.sum(
        unpack_w(conv3x3_packed_ae_xla(pack_w(x, 2), kk, 2), 2) ** 2))(k)
    np.testing.assert_allclose(np.asarray(g_ae), np.asarray(g_ref),
                               atol=1e-4, rtol=1e-4)


def test_keep_packed_out0_matches_unpacked():
    """HighResolutionModule(keep_packed_out0=True) == the unpacked module
    on the same params: packed fuse sum, elementwise packed 2x upsampler,
    packed-consuming down-fuse convs, packed out-0."""
    from deep_video_interpolation_extrapolation_tpu.models.hrnet import (
        STAGE2_CFG,
        STAGE3_CFG,
        HighResolutionModule,
    )

    rng = np.random.RandomState(8)
    # 2-branch (stage2 shape) and 3-branch (stage3 shape, exercises the
    # 4x pack path and multi-hop down fuses)
    for cfg, shapes in [
        (STAGE2_CFG, [(1, 8, 16, 64), (1, 4, 8, 128)]),
        (STAGE3_CFG, [(1, 8, 16, 64), (1, 4, 8, 128), (1, 2, 4, 256)]),
    ]:
        xs = [jnp.asarray(rng.uniform(-1, 1, s), jnp.float32) for s in shapes]
        m0 = HighResolutionModule(dtype=jnp.float32, **cfg)
        mp = HighResolutionModule(dtype=jnp.float32, branch0_packed=True,
                                  keep_packed_out0=True, **cfg)
        p = m0.init(jax.random.PRNGKey(2), xs)
        y0 = m0.apply(p, xs)
        yp = mp.apply(p, [pack_w(xs[0], 2)] + xs[1:])
        np.testing.assert_allclose(np.asarray(unpack_w(yp[0], 2)),
                                   np.asarray(y0[0]), atol=2e-4, rtol=2e-4)
        for u, v in zip(y0[1:], yp[1:]):
            np.testing.assert_allclose(np.asarray(v), np.asarray(u),
                                       atol=2e-4, rtol=2e-4)


def test_upsample2x_to_packed_exact():
    from deep_video_interpolation_extrapolation_tpu.ops.resize import (
        interpolate_bilinear,
        upsample2x_to_packed,
    )
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 5, 7, 3)), jnp.float32)
    ref = np.asarray(interpolate_bilinear(x, scale_factor=2.0))
    out = np.asarray(unpack_w(upsample2x_to_packed(x), 2))
    np.testing.assert_allclose(out, ref, atol=1e-6, rtol=1e-6)
