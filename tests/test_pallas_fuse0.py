"""Fused stage fuse-out0 kernel (ops/pallas_fuse0.py) vs the XLA
composition — interpret mode off-TPU: forward (packed/unpacked out, with
and without the 4x branch), gradients, and the HighResolutionModule wiring
(stage2 packed-out -> stage3 packed-in) against the plain module."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_video_interpolation_extrapolation_tpu.ops import pallas_fuse0
from deep_video_interpolation_extrapolation_tpu.ops.packed_conv import (
    pack_w,
    unpack_w,
)


def _mk(b=1, h=16, w=64, c=64, with_t2=True, seed=0):
    rng = np.random.RandomState(seed)
    y0 = jnp.asarray(rng.uniform(-1, 1, (b, h, w, c)), jnp.float32)
    t1 = jnp.asarray(rng.uniform(-1, 1, (b, h // 2, w // 2, c)), jnp.float32)
    t2 = (jnp.asarray(rng.uniform(-1, 1, (b, h // 4, w // 4, c)), jnp.float32)
          if with_t2 else None)
    return pack_w(y0, 2), t1, t2


@pytest.mark.parametrize("with_t2", [False, True])
@pytest.mark.parametrize("packed_out", [False, True])
def test_fused_out0_matches_ref(with_t2, packed_out):
    y0p, t1, t2 = _mk(with_t2=with_t2)
    out = pallas_fuse0.fused_out0(y0p, t1, t2, packed_out, True)
    ref = pallas_fuse0._ref(y0p, t1, t2, packed_out)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_fused_out0_gradients():
    y0p, t1, t2 = _mk()

    def loss_f(a, b, c):
        return jnp.sum(pallas_fuse0.fused_out0(a, b, c, False, True) ** 2)

    def loss_r(a, b, c):
        return jnp.sum(pallas_fuse0._ref(a, b, c, False) ** 2)

    gf = jax.grad(loss_f, argnums=(0, 1, 2))(y0p, t1, t2)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(y0p, t1, t2)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def _hw(a):
    return jnp.transpose(a, (1, 2, 0, 3))


@pytest.mark.parametrize("with_t2", [False, True])
def test_fused_out0_hwnc_matches_ref(with_t2):
    y0p, t1, t2 = _mk(b=2, with_t2=with_t2)
    t2h = None if t2 is None else _hw(t2)
    out = pallas_fuse0.fused_out0_hwnc(_hw(y0p), _hw(t1), t2h, True)
    ref = pallas_fuse0._ref_hwnc(_hw(y0p), _hw(t1), t2h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    # ... and against the NHWC kernel's packed output through the
    # transposes (same math, different tiling)
    packed = pallas_fuse0.fused_out0(y0p, t1, t2, True, True)
    np.testing.assert_allclose(np.asarray(jnp.transpose(out, (2, 0, 1, 3))),
                               np.asarray(packed), atol=1e-5, rtol=1e-5)


def test_fused_out0_hwnc_gradients():
    y0p, t1, t2 = _mk(b=2)
    a, b, c = _hw(y0p), _hw(t1), _hw(t2)

    def lf(a, b, c):
        return jnp.sum(pallas_fuse0.fused_out0_hwnc(a, b, c, True) ** 2)

    def lr(a, b, c):
        return jnp.sum(pallas_fuse0._ref_hwnc(a, b, c) ** 2)

    gf = jax.grad(lf, argnums=(0, 1, 2))(a, b, c)
    gr = jax.grad(lr, argnums=(0, 1, 2))(a, b, c)
    for u, v in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(u), np.asarray(v),
                                   atol=1e-4, rtol=1e-4)


def test_module_wiring_stage2_stage3(monkeypatch):
    """HighResolutionModule with the fuse0 kernel (stage2 emits packed
    out-0, stage3 consumes it packed) == the plain unfused modules on the
    same params.  default_backend is faked to 'tpu' and the kernel runs in
    interpret mode (all TPU-gated paths here are exact math)."""
    from deep_video_interpolation_extrapolation_tpu.models.hrnet import (
        STAGE2_CFG,
        STAGE3_CFG,
        HighResolutionModule,
        _Transition,
    )

    from deep_video_interpolation_extrapolation_tpu.ops import pallas_ae_conv

    orig_impl = pallas_fuse0._impl
    monkeypatch.setattr(
        pallas_fuse0, "_impl",
        lambda y0p, t1, t2, po, interpret=False: orig_impl(
            y0p, t1, t2, po, interpret=True))
    orig_impl_h = pallas_fuse0._impl_hwnc
    monkeypatch.setattr(
        pallas_fuse0, "_impl_hwnc",
        lambda y0, t1, t2, interpret=False: orig_impl_h(
            y0, t1, t2, interpret=True))
    orig_ae = pallas_ae_conv._impl
    monkeypatch.setattr(
        pallas_ae_conv, "_impl",
        lambda xp, k, res, relu, f=2, interpret=False: orig_ae(
            xp, k, res, relu, f, interpret=True))
    orig_hwnc = pallas_ae_conv._impl_hwnc
    monkeypatch.setattr(
        pallas_ae_conv, "_impl_hwnc",
        lambda x, k, res, relu, f=2, interpret=False, bias=None: orig_hwnc(
            x, k, res, relu, f, True, bias))
    monkeypatch.setenv("DVIE_TRAINCHAIN", "0")  # chain routes off (route-pin)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("DVIE_FUSE0", "1")
    monkeypatch.setenv("DVIE_FUSED_BLOCK", "0")

    rng = np.random.RandomState(5)
    xs2 = [jnp.asarray(rng.uniform(-1, 1, (1, 16, 64, 64)), jnp.float32),
           jnp.asarray(rng.uniform(-1, 1, (1, 8, 32, 128)), jnp.float32)]

    m_plain2 = HighResolutionModule(dtype=jnp.float32, **STAGE2_CFG)
    m_fuse2 = HighResolutionModule(dtype=jnp.float32, branch0_packed=True,
                                   fuse0_packed_out=True, **STAGE2_CFG)
    p2 = m_plain2.init(jax.random.PRNGKey(0), xs2)
    ref2 = m_plain2.apply(p2, xs2)
    out2 = m_fuse2.apply(p2, [pack_w(xs2[0], 2), xs2[1]])
    # stage2 out-0 comes back packed
    np.testing.assert_allclose(np.asarray(unpack_w(out2[0], 2)),
                               np.asarray(ref2[0]), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out2[1]), np.asarray(ref2[1]),
                               atol=1e-4, rtol=1e-4)

    # feed stage3 the packed out-0 through an identity transition
    tr = _Transition(tuple(STAGE2_CFG["num_channels"]),
                     tuple(STAGE3_CFG["num_channels"]), dtype=jnp.float32)
    pt = tr.init(jax.random.PRNGKey(1), ref2)
    ref3_in = tr.apply(pt, ref2)
    fuse3_in = tr.apply(pt, [out2[0], out2[1]])  # branch0 passes packed

    m_plain3 = HighResolutionModule(dtype=jnp.float32, **STAGE3_CFG)
    m_fuse3 = HighResolutionModule(dtype=jnp.float32, branch0_packed=True,
                                   **STAGE3_CFG)
    p3 = m_plain3.init(jax.random.PRNGKey(2),
                       [unpack_w(fuse3_in[0], 2)] + list(fuse3_in[1:]))
    ref3 = m_plain3.apply(p3, ref3_in)
    out3 = m_fuse3.apply(p3, fuse3_in)
    for u, v in zip(ref3, out3):   # stage3 out-0 unpacked (head stage)
        np.testing.assert_allclose(np.asarray(v), np.asarray(u),
                                   atol=1e-4, rtol=1e-4)


def test_fits_rejects_odd_packed_width():
    """W ≡ 2 (mod 4): the (w//4) floor-division lane check used to pass
    but the kernel's f2->f4 input reshape is impossible (129*128 !=
    64*256) — fits() must reject it."""
    y0p = jax.ShapeDtypeStruct((1, 8, 129, 128), jnp.float32)
    t1 = jax.ShapeDtypeStruct((1, 4, 129, 64), jnp.float32)
    assert not pallas_fuse0.fits(y0p, t1)
    y0p_ok = jax.ShapeDtypeStruct((1, 8, 128, 128), jnp.float32)
    t1_ok = jax.ShapeDtypeStruct((1, 4, 128, 64), jnp.float32)
    assert pallas_fuse0.fits(y0p_ok, t1_ok)


def test_module_packed_out_contract_when_fuse0_unfittable(monkeypatch):
    """``fuse0_packed_out=True`` promises the NEXT stage a packed out-0.
    At a shape the fused kernel cannot run (W=272: (272//4)%8 != 0) the
    module must still emit packed out-0 via the generic path — it used to
    emit UNPACKED and trip the consumer stage's packed BasicBlock channel
    assert (valid CLI resolutions like 512x272 crashed at trace time)."""
    from deep_video_interpolation_extrapolation_tpu.core import hw
    from deep_video_interpolation_extrapolation_tpu.models.hrnet import (
        STAGE2_CFG,
        HighResolutionModule,
    )
    from deep_video_interpolation_extrapolation_tpu.ops import pallas_ae_conv

    # interpret-mode reroutes for any kernels the packed blocks reach
    orig_ae = pallas_ae_conv._impl
    monkeypatch.setattr(
        pallas_ae_conv, "_impl",
        lambda xp, k, res, relu, f=2, interpret=False: orig_ae(
            xp, k, res, relu, f, interpret=True))
    orig_hwnc = pallas_ae_conv._impl_hwnc
    monkeypatch.setattr(
        pallas_ae_conv, "_impl_hwnc",
        lambda x, k, res, relu, f=2, interpret=False, bias=None: orig_hwnc(
            x, k, res, relu, f, True, bias))
    monkeypatch.setenv("DVIE_TRAINCHAIN", "0")  # chain routes off (route-pin)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(hw, "pallas_enabled", lambda: True)
    monkeypatch.setenv("DVIE_FUSE0", "1")

    rng = np.random.RandomState(7)
    xs = [jnp.asarray(rng.uniform(-1, 1, (1, 8, 272, 64)), jnp.float32),
          jnp.asarray(rng.uniform(-1, 1, (1, 4, 136, 128)), jnp.float32)]
    m_plain = HighResolutionModule(dtype=jnp.float32, **STAGE2_CFG)
    params = m_plain.init(jax.random.PRNGKey(0), xs)
    ref = m_plain.apply(params, xs)

    m = HighResolutionModule(dtype=jnp.float32, branch0_packed=True,
                             fuse0_packed_out=True, **STAGE2_CFG)
    out = m.apply(params, [pack_w(xs[0], 2), xs[1]])
    assert out[0].shape == (1, 8, 136, 128), out[0].shape  # packed out-0
    np.testing.assert_allclose(np.asarray(unpack_w(out[0], 2)),
                               np.asarray(ref[0]), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(ref[1]),
                               atol=1e-4, rtol=1e-4)


def test_highres_large_packed_backbone(monkeypatch):
    """DVIE_HL4_PACK=1: branch-0 stays packed through stage4 (stage3
    fuse-out0 packed -> transition3 passthrough -> stage4 packed chain ->
    final unpack) == the default highres_large backbone on the same
    params (all kernels interpreted, backend faked to 'tpu')."""
    from deep_video_interpolation_extrapolation_tpu.models.hrnet import (
        _HRBackbone,
    )
    from deep_video_interpolation_extrapolation_tpu.ops import (
        pallas_ae_conv,
        pallas_chain,
    )

    orig_impl = pallas_fuse0._impl
    monkeypatch.setattr(
        pallas_fuse0, "_impl",
        lambda y0p, t1, t2, po, interpret=False: orig_impl(
            y0p, t1, t2, po, interpret=True))
    orig_impl_h = pallas_fuse0._impl_hwnc
    monkeypatch.setattr(
        pallas_fuse0, "_impl_hwnc",
        lambda y0, t1, t2, interpret=False: orig_impl_h(
            y0, t1, t2, interpret=True))
    orig_ae = pallas_ae_conv._impl
    monkeypatch.setattr(
        pallas_ae_conv, "_impl",
        lambda xp, k, res, relu, f=2, interpret=False: orig_ae(
            xp, k, res, relu, f, interpret=True))
    orig_hwnc = pallas_ae_conv._impl_hwnc
    monkeypatch.setattr(
        pallas_ae_conv, "_impl_hwnc",
        lambda x, k, res, relu, f=2, interpret=False, bias=None: orig_hwnc(
            x, k, res, relu, f, True, bias))
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
    monkeypatch.setenv("DVIE_TRAINCHAIN", "0")  # chain routes off (route-pin)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 16, 256, 14)), jnp.float32)
    bb = _HRBackbone(highres_large=True, dtype=jnp.float32)

    monkeypatch.setenv("DVIE_HL4_PACK", "0")
    v = bb.init(jax.random.PRNGKey(0), x)
    ref = bb.apply(v, x)

    monkeypatch.setenv("DVIE_HL4_PACK", "1")
    v2 = bb.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v2)
            == jax.tree_util.tree_structure(v))
    out = bb.apply(v, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)
