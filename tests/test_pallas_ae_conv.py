"""Single-conv A+E packed 3x3 kernel (ops/pallas_ae_conv.py) vs the XLA
packed conv — interpret mode off-TPU: fwd (with/without residual+lrelu),
gradients, and the BasicBlock composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_video_interpolation_extrapolation_tpu.ops import pallas_ae_conv
from deep_video_interpolation_extrapolation_tpu.ops.packed_conv import (
    pack_w,
    unpack_w,
)


def _mk(b=1, h=8, wp=128, c=64, o=64, seed=0):
    rng = np.random.RandomState(seed)
    xp = jnp.asarray(rng.uniform(-1, 1, (b, h, wp, 2 * c)), jnp.float32)
    k = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 3, c, o)), jnp.float32)
    res = jnp.asarray(rng.uniform(-1, 1, (b, h, wp, 2 * o)), jnp.float32)
    return xp, k, res


@pytest.mark.parametrize("relu", [False, True])
@pytest.mark.parametrize("with_res", [False, True])
def test_ae_conv_matches_packed_ref(relu, with_res):
    xp, k, res = _mk()
    r = res if with_res else None
    out = pallas_ae_conv.conv3x3_packed_ae(xp, k, r, relu, 2, True)
    ref = pallas_ae_conv._ref(xp, k, r, relu, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_ae_conv_unpacked_equals_plain_conv():
    """End-to-end: packed AE conv on pack_w(x) == plain SAME conv on x."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 8, 256, 64)), jnp.float32)
    k = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 3, 64, 64)), jnp.float32)
    out = unpack_w(pallas_ae_conv.conv3x3_packed_ae(
        pack_w(x, 2), k, None, False, 2, True), 2)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_ae_conv_gradients():
    xp, k, res = _mk(h=8, wp=128)

    def lf(a, b, r):
        return jnp.sum(pallas_ae_conv.conv3x3_packed_ae(
            a, b, r, True, 2, True) ** 2)

    def lr(a, b, r):
        return jnp.sum(pallas_ae_conv._ref(a, b, r, True, 2) ** 2)

    gf = jax.grad(lf, argnums=(0, 1, 2))(xp, k, res)
    gr = jax.grad(lr, argnums=(0, 1, 2))(xp, k, res)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_basicblock_ae_composition(monkeypatch):
    """BasicBlock's AE route == the plain packed BasicBlock on the same
    params (kernel in interpret mode, backend faked to 'tpu')."""
    from deep_video_interpolation_extrapolation_tpu.models.blocks import (
        BasicBlock,
    )

    orig = pallas_ae_conv._impl
    monkeypatch.setattr(
        pallas_ae_conv, "_impl",
        lambda xp, k, res, relu, f=2, interpret=False: orig(
            xp, k, res, relu, f, interpret=True))

    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 8, 256, 64)), jnp.float32)
    xp = pack_w(x, 2)
    blk = BasicBlock(64, dtype=jnp.float32, packed_io=2)
    v = blk.init(jax.random.PRNGKey(0), xp)

    monkeypatch.setenv("DVIE_AE_CONV", "0")
    ref = blk.apply(v, xp)

    import jax as _jax
    monkeypatch.setenv("DVIE_TRAINCHAIN", "0")  # chain routes off (route-pin)
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("DVIE_AE_CONV", "1")
    monkeypatch.setenv("DVIE_AE_HWNC", "0")   # pin the NHWC route under test
    out = blk.apply(v, xp)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def _mk_hwnc(h=16, wp=32, b=2, c=64, o=64, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.uniform(-1, 1, (h, wp, b, 2 * c)), jnp.float32)
    k = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 3, c, o)), jnp.float32)
    res = jnp.asarray(rng.uniform(-1, 1, (h, wp, b, 2 * o)), jnp.float32)
    return x, k, res


@pytest.mark.parametrize("relu", [False, True])
@pytest.mark.parametrize("with_res", [False, True])
def test_ae_hwnc_matches_packed_ref(relu, with_res):
    x, k, res = _mk_hwnc()
    r = res if with_res else None
    out = pallas_ae_conv.conv3x3_packed_ae_hwnc(x, k, r, relu, 2, True)
    ref = pallas_ae_conv._ref_hwnc(x, k, r, relu, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_ae_hwnc_equals_plain_conv():
    """HWNC packed AE conv == plain NHWC SAME conv through the (free)
    transposes and pack/unpack views — the whole route is exact."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 16, 64, 64)), jnp.float32)
    k = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 3, 64, 64)), jnp.float32)
    xh = jnp.transpose(pack_w(x, 2), (1, 2, 0, 3))
    out = pallas_ae_conv.conv3x3_packed_ae_hwnc(xh, k, None, False, 2, True)
    out = unpack_w(jnp.transpose(out, (2, 0, 1, 3)), 2)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_ae_hwnc_gradients():
    x, k, res = _mk_hwnc()

    def lf(a, b, r):
        return jnp.sum(pallas_ae_conv.conv3x3_packed_ae_hwnc(
            a, b, r, True, 2, True) ** 2)

    def lr(a, b, r):
        return jnp.sum(pallas_ae_conv._ref_hwnc(a, b, r, True, 2) ** 2)

    gf = jax.grad(lf, argnums=(0, 1, 2))(x, k, res)
    gr = jax.grad(lr, argnums=(0, 1, 2))(x, k, res)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_basicblock_hwnc_composition(monkeypatch):
    """BasicBlock's HWNC A+E route == the plain packed BasicBlock on the
    same params (kernel in interpret mode, backend faked to 'tpu')."""
    from deep_video_interpolation_extrapolation_tpu.models.blocks import (
        BasicBlock,
    )

    orig = pallas_ae_conv._impl_hwnc
    monkeypatch.setattr(
        pallas_ae_conv, "_impl_hwnc",
        lambda x, k, res, relu, f=2, interpret=False, bias=None: orig(
            x, k, res, relu, f, True, bias))

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 16, 256, 64)), jnp.float32)
    xp = pack_w(x, 2)
    blk = BasicBlock(64, dtype=jnp.float32, packed_io=2)
    v = blk.init(jax.random.PRNGKey(0), xp)

    monkeypatch.setenv("DVIE_AE_HWNC", "0")
    ref = blk.apply(v, xp)

    import jax as _jax
    monkeypatch.setenv("DVIE_TRAINCHAIN", "0")  # chain routes off (route-pin)
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("DVIE_AE_HWNC", "1")
    out = blk.apply(v, xp)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_transition_hwnc_composition(monkeypatch):
    """_Transition's trans_0 HWNC A+E route == the packed XLA conv."""
    from deep_video_interpolation_extrapolation_tpu.models.hrnet import (
        _Transition,
    )

    orig = pallas_ae_conv._impl_hwnc
    monkeypatch.setattr(
        pallas_ae_conv, "_impl_hwnc",
        lambda x, k, res, relu, f=2, interpret=False, bias=None: orig(
            x, k, res, relu, f, True, bias))

    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 16, 256, 256)), jnp.float32)
    xp = pack_w(x, 2)
    tr = _Transition((256,), (64, 128), dtype=jnp.float32, packed_in=2)
    v = tr.init(jax.random.PRNGKey(0), [xp])

    monkeypatch.setenv("DVIE_AE_HWNC", "0")
    ref = tr.apply(v, [xp])

    import jax as _jax
    monkeypatch.setenv("DVIE_TRAINCHAIN", "0")  # chain routes off (route-pin)
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("DVIE_AE_HWNC", "1")
    out = tr.apply(v, [xp])
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("relu", [False, True])
def test_ae_hwnc_bias_matches_packed_ref(relu):
    """bias mode (the stem-conv form): added before residual/lrelu."""
    x, k, res = _mk_hwnc(seed=7)
    rng = np.random.RandomState(8)
    bias = jnp.asarray(rng.uniform(-0.5, 0.5, (k.shape[3],)), jnp.float32)
    out = pallas_ae_conv.conv3x3_packed_ae_hwnc(x, k, res, relu, 2, True,
                                                bias)
    ref = pallas_ae_conv._ref_hwnc(x, k, res, relu, 2, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_ae_hwnc_bias_gradients():
    x, k, _ = _mk_hwnc(seed=9)
    rng = np.random.RandomState(10)
    bias = jnp.asarray(rng.uniform(-0.5, 0.5, (k.shape[3],)), jnp.float32)

    def lf(a, b, bi):
        return jnp.sum(pallas_ae_conv.conv3x3_packed_ae_hwnc(
            a, b, None, True, 2, True, bi) ** 2)

    def lr(a, b, bi):
        return jnp.sum(pallas_ae_conv._ref_hwnc(
            a, b, None, True, 2, bias=bi) ** 2)

    gf = jax.grad(lf, argnums=(0, 1, 2))(x, k, bias)
    gr = jax.grad(lr, argnums=(0, 1, 2))(x, k, bias)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_stem_ae_composition(monkeypatch):
    """DVIE_AE_STEM=1: the backbone's stem conv2 AE route (inside the
    HWNC stem+layer1 region) == the HWNC stem without it, on the same
    params (identical param tree)."""
    from deep_video_interpolation_extrapolation_tpu.models.hrnet import (
        _HRBackbone,
    )
    from deep_video_interpolation_extrapolation_tpu.ops import pallas_chain

    orig = pallas_ae_conv._impl_hwnc
    monkeypatch.setattr(
        pallas_ae_conv, "_impl_hwnc",
        lambda x, k, res, relu, f=2, interpret=False, bias=None: orig(
            x, k, res, relu, f, True, bias))
    # the HWNC layer1 region also runs chain kernels — interpret them too
    ob = pallas_chain._block_impl
    monkeypatch.setattr(
        pallas_chain, "_block_impl",
        lambda h1, x, k2p, k3p, kresp, k1np, interpret=False, ae=False: ob(
            h1, x, k2p, k3p, kresp, k1np, True, ae))
    of = pallas_chain._boundary_impl
    monkeypatch.setattr(
        pallas_chain, "_boundary_impl",
        lambda h2, x, k3p, kresp, k1np, interpret=False: of(
            h2, x, k3p, kresp, k1np, True))

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 32, 256, 14)), jnp.float32)
    bb = _HRBackbone(dtype=jnp.float32)

    import jax as _jax
    monkeypatch.setenv("DVIE_TRAINCHAIN", "0")  # chain routes off (route-pin)
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    # keep the non-stem kernel routes fixed across the A/B
    monkeypatch.setenv("DVIE_AE_HWNC", "0")
    monkeypatch.setenv("DVIE_FUSE0", "0")

    monkeypatch.setenv("DVIE_AE_STEM", "0")
    v = bb.init(jax.random.PRNGKey(0), x)
    ref = bb.apply(v, x)

    monkeypatch.setenv("DVIE_AE_STEM", "1")
    v2 = bb.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v2)
            == jax.tree_util.tree_structure(v))
    out = bb.apply(v, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
