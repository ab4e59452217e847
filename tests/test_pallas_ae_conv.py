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
        lambda x, k, res, relu, f=2, interpret=False: orig(
            x, k, res, relu, f, interpret=True))

    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 16, 256, 64)), jnp.float32)
    xp = pack_w(x, 2)
    blk = BasicBlock(64, dtype=jnp.float32, packed_io=2)
    v = blk.init(jax.random.PRNGKey(0), xp)

    monkeypatch.setenv("DVIE_AE_HWNC", "0")
    ref = blk.apply(v, xp)

    import jax as _jax
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
        lambda x, k, res, relu, f=2, interpret=False: orig(
            x, k, res, relu, f, interpret=True))

    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 16, 256, 256)), jnp.float32)
    xp = pack_w(x, 2)
    tr = _Transition((256,), (64, 128), dtype=jnp.float32, packed_in=2)
    v = tr.init(jax.random.PRNGKey(0), [xp])

    monkeypatch.setenv("DVIE_AE_HWNC", "0")
    ref = tr.apply(v, [xp])

    import jax as _jax
    monkeypatch.setattr(_jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("DVIE_AE_HWNC", "1")
    out = tr.apply(v, [xp])
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)
