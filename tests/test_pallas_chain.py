"""Fused Bottleneck boundary kernel (ops/pallas_chain.py) vs the XLA
composition, and the full layer1 boundary chain vs the unfused Bottleneck
stack — interpret mode off-TPU, fwd + gradients."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_video_interpolation_extrapolation_tpu.ops import pallas_chain
from deep_video_interpolation_extrapolation_tpu.ops.packed_conv import (
    pack_kernel_1x1,
    pack_kernel_3x3,
    pack_w,
    unpack_w,
)

KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize("has_res", [True, False])
@pytest.mark.parametrize("has_next", [True, False])
def test_boundary_matches_ref(has_res, has_next):
    rng = np.random.RandomState(1)
    b, h, wp = 1, 8, 16
    fp, fcin, fo, fpn = 128, 256, 256, 128
    h2 = jnp.asarray(rng.uniform(-1, 1, (b, h, wp, fp)), jnp.float32)
    x = jnp.asarray(rng.uniform(-1, 1, (b, h, wp, fcin if has_res else fo)),
                    jnp.float32)
    k3 = jnp.asarray(rng.uniform(-0.2, 0.2, (fp, fo)), jnp.float32)
    kres = (jnp.asarray(rng.uniform(-0.2, 0.2, (x.shape[-1], fo)), jnp.float32)
            if has_res else None)
    k1n = (jnp.asarray(rng.uniform(-0.2, 0.2, (fo, fpn)), jnp.float32)
           if has_next else None)

    y, h1 = pallas_chain.fused_boundary(h2, x, k3, kres, k1n, True)
    yr, h1r = pallas_chain._boundary_ref(h2, x, k3, kres, k1n)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               atol=1e-5, rtol=1e-5)
    if has_next:
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h1r),
                                   atol=1e-5, rtol=1e-5)
    else:
        assert h1 is None and h1r is None


def test_boundary_gradients_match():
    rng = np.random.RandomState(2)
    b, h, wp = 1, 8, 8
    h2 = jnp.asarray(rng.uniform(-1, 1, (b, h, wp, 128)), jnp.float32)
    x = jnp.asarray(rng.uniform(-1, 1, (b, h, wp, 256)), jnp.float32)
    k3 = jnp.asarray(rng.uniform(-0.2, 0.2, (128, 256)), jnp.float32)
    kres = jnp.asarray(rng.uniform(-0.2, 0.2, (256, 256)), jnp.float32)
    k1n = jnp.asarray(rng.uniform(-0.2, 0.2, (256, 128)), jnp.float32)

    def loss_fused(h2, x, k3, kres, k1n):
        y, h1 = pallas_chain.fused_boundary(h2, x, k3, kres, k1n, True)
        return jnp.sum(y ** 2) + jnp.sum(h1 ** 2)

    def loss_ref(h2, x, k3, kres, k1n):
        y, h1 = pallas_chain._boundary_ref(h2, x, k3, kres, k1n)
        return jnp.sum(y ** 2) + jnp.sum(h1 ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(h2, x, k3, kres, k1n)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(h2, x, k3, kres, k1n)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_layer1_chain_matches_unfused():
    """The fused boundary chain == 4 packed Bottlenecks on the same params
    (the composition _layer1_boundary_chain runs on TPU)."""
    from deep_video_interpolation_extrapolation_tpu.models.blocks import (
        Bottleneck,
        lrelu,
    )

    rng = np.random.RandomState(3)
    f = 2
    x = jnp.asarray(rng.uniform(-1, 1, (1, 8, 16, 64)), jnp.float32)
    xp = pack_w(x, f)

    blocks = [Bottleneck(4, dtype=jnp.float32, packed_io=f,
                         in_features=64 if i == 0 else 16)
              for i in range(4)]
    variables = []
    h = xp
    for blk in blocks:
        v = blk.init(jax.random.PRNGKey(len(variables)), h)
        variables.append(v)
        h = blk.apply(v, h)
    ref = h

    # fused composition on the same params (raw kernels from the trees)
    def kparams(v, name):
        return v["params"][name]["kernel"]

    conv = functools.partial(
        jax.lax.conv_general_dilated, window_strides=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    cur_x = xp
    h1 = lrelu(conv(cur_x, pack_kernel_1x1(kparams(variables[0], "Conv_0"), f),
                    padding="VALID"))
    for i in range(4):
        v = variables[i]
        h2 = lrelu(conv(h1, pack_kernel_3x3(kparams(v, "Conv_1"), f),
                        padding="SAME"))
        k3p = pack_kernel_1x1(kparams(v, "Conv_2"), f)[0, 0]
        kresp = (pack_kernel_1x1(kparams(v, "Conv_3"), f)[0, 0]
                 if "Conv_3" in v["params"] else None)
        k1np = (pack_kernel_1x1(kparams(variables[i + 1], "Conv_0"), f)[0, 0]
                if i < 3 else None)
        cur_x, h1 = pallas_chain.fused_boundary(h2, cur_x, k3p, kresp, k1np,
                                                True)
    np.testing.assert_allclose(np.asarray(unpack_w(cur_x, f)),
                               np.asarray(unpack_w(ref, f)),
                               atol=1e-4, rtol=1e-4)


def test_bottleneck_return_params_names():
    """return_params creates the same param tree as the compute path."""
    from deep_video_interpolation_extrapolation_tpu.models.blocks import (
        Bottleneck,
    )
    x = jnp.zeros((1, 4, 8, 64), jnp.float32)
    blk_c = Bottleneck(4, dtype=jnp.float32)
    v_c = blk_c.init(KEY, x)
    blk_p = Bottleneck(4, dtype=jnp.float32, in_features=64)
    v_p = blk_p.init(KEY, None, return_params=True)
    ka = jax.tree_util.tree_map(np.shape, v_c["params"])
    kb = jax.tree_util.tree_map(np.shape, v_p["params"])
    assert ka == kb


def test_layer1_hwnc_chain_matches_unfused():
    """The HWNC chain form (stem-style transposed (H,W/f,B,fC) tensors,
    HWNC conv2s, fused boundaries) == 4 packed NHWC Bottlenecks on the
    same params.  Pins the layout-agnosticism of fused_boundary (it
    flattens leading dims) and the HWNC conv dimension numbers."""
    from deep_video_interpolation_extrapolation_tpu.models.blocks import (
        Bottleneck,
        lrelu,
    )

    rng = np.random.RandomState(7)
    f = 2
    x = jnp.asarray(rng.uniform(-1, 1, (2, 8, 16, 64)), jnp.float32)
    xp = pack_w(x, f)

    blocks = [Bottleneck(4, dtype=jnp.float32, packed_io=f,
                         in_features=64 if i == 0 else 16)
              for i in range(4)]
    variables = []
    h = xp
    for blk in blocks:
        v = blk.init(jax.random.PRNGKey(len(variables)), h)
        variables.append(v)
        h = blk.apply(v, h)
    ref = h

    def kparams(v, name):
        return v["params"][name]["kernel"]

    conv = functools.partial(
        jax.lax.conv_general_dilated, window_strides=(1, 1),
        dimension_numbers=("HWNC", "HWIO", "HWNC"),
        preferred_element_type=jnp.float32)
    cur_x = jnp.transpose(xp, (1, 2, 0, 3))  # (H, W/f, B, f*C)
    h1 = lrelu(conv(cur_x, pack_kernel_1x1(kparams(variables[0], "Conv_0"), f),
                    padding="VALID"))
    for i in range(4):
        v = variables[i]
        h2 = lrelu(conv(h1, pack_kernel_3x3(kparams(v, "Conv_1"), f),
                        padding="SAME"))
        k3p = pack_kernel_1x1(kparams(v, "Conv_2"), f)[0, 0]
        kresp = (pack_kernel_1x1(kparams(v, "Conv_3"), f)[0, 0]
                 if "Conv_3" in v["params"] else None)
        k1np = (pack_kernel_1x1(kparams(variables[i + 1], "Conv_0"), f)[0, 0]
                if i < 3 else None)
        cur_x, h1 = pallas_chain.fused_boundary(h2, cur_x, k3p, kresp, k1np,
                                                True)
    out = jnp.transpose(cur_x, (2, 0, 1, 3))
    np.testing.assert_allclose(np.asarray(unpack_w(out, f)),
                               np.asarray(unpack_w(ref, f)),
                               atol=1e-4, rtol=1e-4)


def test_hwnc_conv_matches_nhwc():
    """blocks.Conv(hwnc=True) on transposed input == the NHWC module,
    across the packed stride-1, packed stride-2-in, and plain paths."""
    from deep_video_interpolation_extrapolation_tpu.models.blocks import Conv

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 8, 16, 64)), jnp.float32)
    xp = pack_w(x, 2)
    for kwargs, inp in [
        (dict(kernel=3, packed_io=2, use_bias=False), xp),
        (dict(kernel=1, padding=0, packed_io=2, use_bias=False), xp),
        (dict(kernel=3, stride=2, packed_io=2, use_bias=False), xp),
        (dict(kernel=3, use_bias=True), x),
    ]:
        m_n = Conv(32, dtype=jnp.float32, **kwargs)
        m_h = Conv(32, dtype=jnp.float32, hwnc=True, **kwargs)
        v = m_n.init(KEY, inp)
        a = m_n.apply(v, inp)
        b = m_h.apply(v, jnp.transpose(inp, (1, 2, 0, 3)))
        np.testing.assert_allclose(np.asarray(jnp.transpose(b, (2, 0, 1, 3))),
                                   np.asarray(a), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("has_res", [True, False])
@pytest.mark.parametrize("has_next", [True, False])
def test_fused_block_matches_ref(has_res, has_next):
    """fused_block (conv2 + boundary in one pass, HWNC tiles) == the XLA
    composition, including the SAME-padding H/W borders that cross the
    kernel's 3-view halo assembly."""
    rng = np.random.RandomState(21)
    h, w2, b = 8, 16, 2
    fp, fo = 128, 256
    fcin = 256 if has_res else fo
    h1 = jnp.asarray(rng.uniform(-1, 1, (h, w2, b, fp)), jnp.float32)
    x = jnp.asarray(rng.uniform(-1, 1, (h, w2, b, fcin)), jnp.float32)
    k2 = jnp.asarray(rng.uniform(-0.2, 0.2, (3, 3, fp, fp)), jnp.float32)
    k3 = jnp.asarray(rng.uniform(-0.2, 0.2, (fp, fo)), jnp.float32)
    kres = (jnp.asarray(rng.uniform(-0.2, 0.2, (fcin, fo)), jnp.float32)
            if has_res else None)
    k1n = (jnp.asarray(rng.uniform(-0.2, 0.2, (fo, fp)), jnp.float32)
           if has_next else None)

    y, h1n = pallas_chain.fused_block(h1, x, k2, k3, kres, k1n, True)
    yr, h1nr = pallas_chain._block_ref(h1, x, k2, k3, kres, k1n)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               atol=2e-5, rtol=2e-5)
    if has_next:
        np.testing.assert_allclose(np.asarray(h1n), np.asarray(h1nr),
                                   atol=2e-5, rtol=2e-5)
    else:
        assert h1n is None and h1nr is None


@pytest.mark.parametrize("dma", ["0", "1"])
def test_fused_block_ae_matches_ref(dma, monkeypatch):
    """ae=True: conv2 via the A+E split (valid only for
    pack_kernel_3x3-structured kernels) == the dense-tap reference."""
    monkeypatch.setenv("DVIE_BLOCK_DMA", dma)
    rng = np.random.RandomState(31)
    h, w2, b, fp, fo = 8, 16, 2, 128, 256
    h1 = jnp.asarray(rng.uniform(-1, 1, (h, w2, b, fp)), jnp.float32)
    x = jnp.asarray(rng.uniform(-1, 1, (h, w2, b, fo)), jnp.float32)
    k2 = pack_kernel_3x3(
        jnp.asarray(rng.uniform(-0.2, 0.2, (3, 3, 64, 64)), jnp.float32), 2)
    k3 = jnp.asarray(rng.uniform(-0.2, 0.2, (fp, fo)), jnp.float32)
    k1n = jnp.asarray(rng.uniform(-0.2, 0.2, (fo, fp)), jnp.float32)

    y, h1n = pallas_chain.fused_block(h1, x, k2, k3, None, k1n, True, True)
    yr, h1nr = pallas_chain._block_ref(h1, x, k2, k3, None, k1n)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(h1n), np.asarray(h1nr),
                               atol=2e-5, rtol=2e-5)


def test_fused_block_ae_requires_packed_structure():
    """ae=True on a dense (unpacked) k2 must NOT be silently applied by
    the default path: fused_block(ae=False) handles arbitrary kernels,
    and the regression here is the env gate leaking into the generic
    API (caught on 2026-08-17: DVIE_BLOCK_AE default-on inside the
    kernel broke dense-kernel callers)."""
    rng = np.random.RandomState(33)
    h, w2, b, fp, fo = 8, 8, 1, 128, 256
    h1 = jnp.asarray(rng.uniform(-1, 1, (h, w2, b, fp)), jnp.float32)
    x = jnp.asarray(rng.uniform(-1, 1, (h, w2, b, fo)), jnp.float32)
    k2 = jnp.asarray(rng.uniform(-0.2, 0.2, (3, 3, fp, fp)), jnp.float32)
    k3 = jnp.asarray(rng.uniform(-0.2, 0.2, (fp, fo)), jnp.float32)
    y, _ = pallas_chain.fused_block(h1, x, k2, k3, None, None, True)
    yr, _ = pallas_chain._block_ref(h1, x, k2, k3, None, None)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr),
                               atol=2e-5, rtol=2e-5)


def test_fused_block_gradients_match():
    rng = np.random.RandomState(22)
    h, w2, b, fp, fo = 8, 8, 1, 128, 256
    h1 = jnp.asarray(rng.uniform(-1, 1, (h, w2, b, fp)), jnp.float32)
    x = jnp.asarray(rng.uniform(-1, 1, (h, w2, b, fo)), jnp.float32)
    k2 = jnp.asarray(rng.uniform(-0.2, 0.2, (3, 3, fp, fp)), jnp.float32)
    k3 = jnp.asarray(rng.uniform(-0.2, 0.2, (fp, fo)), jnp.float32)
    k1n = jnp.asarray(rng.uniform(-0.2, 0.2, (fo, fp)), jnp.float32)

    def loss_fused(h1, x, k2, k3, k1n):
        y, h1n = pallas_chain.fused_block(h1, x, k2, k3, None, k1n, True)
        return jnp.sum(y ** 2) + jnp.sum(h1n ** 2)

    def loss_ref(h1, x, k2, k3, k1n):
        y, h1n = pallas_chain._block_ref(h1, x, k2, k3, None, k1n)
        return jnp.sum(y ** 2) + jnp.sum(h1n ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(h1, x, k2, k3, k1n)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(h1, x, k2, k3, k1n)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_layer1_hwnc_fused_block_chain_matches_unfused():
    """The fused_block layer1 composition == 4 packed NHWC Bottlenecks."""
    from deep_video_interpolation_extrapolation_tpu.models.blocks import (
        Bottleneck,
        lrelu,
    )

    rng = np.random.RandomState(23)
    f = 2
    x = jnp.asarray(rng.uniform(-1, 1, (2, 8, 16, 64)), jnp.float32)
    xp = pack_w(x, f)

    blocks = [Bottleneck(4, dtype=jnp.float32, packed_io=f,
                         in_features=64 if i == 0 else 16)
              for i in range(4)]
    variables = []
    h = xp
    for blk in blocks:
        v = blk.init(jax.random.PRNGKey(len(variables)), h)
        variables.append(v)
        h = blk.apply(v, h)
    ref = h

    def kparams(v, name):
        return v["params"][name]["kernel"]

    conv = functools.partial(
        jax.lax.conv_general_dilated, window_strides=(1, 1),
        dimension_numbers=("HWNC", "HWIO", "HWNC"),
        preferred_element_type=jnp.float32)
    cur_x = jnp.transpose(xp, (1, 2, 0, 3))
    h1 = lrelu(conv(cur_x, pack_kernel_1x1(kparams(variables[0], "Conv_0"), f),
                    padding="VALID"))
    for i in range(4):
        v = variables[i]
        k3p = pack_kernel_1x1(kparams(v, "Conv_2"), f)[0, 0]
        kresp = (pack_kernel_1x1(kparams(v, "Conv_3"), f)[0, 0]
                 if "Conv_3" in v["params"] else None)
        k1np = (pack_kernel_1x1(kparams(variables[i + 1], "Conv_0"), f)[0, 0]
                if i < 3 else None)
        cur_x, h1 = pallas_chain.fused_block(
            h1, cur_x, pack_kernel_3x3(kparams(v, "Conv_1"), f),
            k3p, kresp, k1np, True)
    out = jnp.transpose(cur_x, (2, 0, 1, 3))
    np.testing.assert_allclose(np.asarray(unpack_w(out, f)),
                               np.asarray(unpack_w(ref, f)),
                               atol=1e-4, rtol=1e-4)
