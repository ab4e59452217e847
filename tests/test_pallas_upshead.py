"""Fused upsample-concat + dual-head 1x1 kernel vs the XLA composition.

On the CPU test mesh the kernel runs in interpret mode; the same parity
(plus gradients through the custom_vjp) is exercised on real TPU by the
scratch bench runs.  Reference math: ops/resize.interpolate_bilinear
(align_corners=False, torch half-pixel convention) + concat + 1x1 + lrelu
(reference nets/HRNet.py:575-582,410-442).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_video_interpolation_extrapolation_tpu.ops.pallas_upshead import (
    _pallas_impl,
    _ups_head_ref,
    fits,
)


def _mk(b, h, w, dtype=jnp.float32, seed=0):
    rng = np.random.RandomState(seed)
    p0 = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 64)), dtype)
    p1 = jnp.asarray(rng.uniform(-1, 1, (b, h // 2, w // 2, 128)), dtype)
    p2 = jnp.asarray(rng.uniform(-1, 1, (b, h // 4, w // 4, 256)), dtype)
    w1 = jnp.asarray(rng.uniform(-0.1, 0.1, (448, 896)), jnp.float32)
    b1 = jnp.asarray(rng.uniform(-0.1, 0.1, (896,)), jnp.float32)
    return p0, p1, p2, w1, b1


@pytest.mark.parametrize("shape", [(1, 16, 32), (2, 32, 64), (1, 8, 96)])
def test_fused_ups_head_matches_ref(shape):
    b, h, w = shape
    p0, p1, p2, w1, b1 = _mk(b, h, w)
    assert fits(p0, p1, p2)
    interpret = jax.default_backend() != "tpu"
    out = np.asarray(_pallas_impl(p0, p1, p2, w1, b1, interpret=interpret))
    ref = np.asarray(_ups_head_ref(p0, p1, p2, w1, b1))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_fused_ups_head_edge_clamp():
    """Border columns/rows must follow the align_corners=False clamp, not
    zero padding (the kernel edge-pads packed arrays logically)."""
    p0, p1, p2, w1, b1 = _mk(1, 16, 32, seed=3)
    # make border values extreme so a clamp/zero mixup is visible
    p1 = p1.at[:, :, 0, :].set(7.0).at[:, :, -1, :].set(-7.0)
    p2 = p2.at[:, 0, :, :].set(5.0).at[:, -1, :, :].set(-5.0)
    interpret = jax.default_backend() != "tpu"
    out = np.asarray(_pallas_impl(p0, p1, p2, w1, b1, interpret=interpret))
    ref = np.asarray(_ups_head_ref(p0, p1, p2, w1, b1))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_fits_gate():
    p0, p1, p2, _, _ = _mk(1, 16, 32)
    assert fits(p0, p1, p2)
    assert not fits(p0[:, :12], p1, p2)          # H % 8
    assert not fits(p0[:, :, :24], p1, p2)       # W % 32
    assert not fits(p0, p1[:, :, :, :64], p2)    # C1 % 128


def test_hrnet_fused_path_matches_unfused():
    """HRNet with DVIE_FUSED_HEAD toggled produces identical params; on
    non-TPU backends both settings take the XLA path (gate check)."""
    import os
    from deep_video_interpolation_extrapolation_tpu.models.hrnet import HRNet

    m = HRNet(dtype=jnp.float32)
    rgb = jnp.zeros((1, 16, 32, 6))
    seg = jnp.zeros((1, 16, 32, 40))
    v = m.init(jax.random.PRNGKey(0), rgb, seg, train=False)
    # param tree unchanged by the restructured _Head (checkpoint contract)
    assert set(v["params"].keys()) == {
        "backbone", "rgb_layer", "seg_layer", "seg_encoder"}
    assert set(v["params"]["rgb_layer"].keys()) == {"Conv_0", "Conv_1"}
    assert v["params"]["rgb_layer"]["Conv_0"]["kernel"].shape == (1, 1, 448, 448)
    old = os.environ.get("DVIE_FUSED_HEAD")
    try:
        os.environ["DVIE_FUSED_HEAD"] = "0"
        r0, s0 = m.apply(v, rgb, seg, train=False)
    finally:
        if old is None:
            os.environ.pop("DVIE_FUSED_HEAD", None)
        else:
            os.environ["DVIE_FUSED_HEAD"] = old
    r1, s1 = m.apply(v, rgb, seg, train=False)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), atol=1e-5)


def test_dual_conv3x3_tapped_matches_separate():
    from deep_video_interpolation_extrapolation_tpu.ops.tapped_conv import (
        dual_conv3x3_tapped,
    )
    rng = np.random.RandomState(5)
    h = jnp.asarray(rng.uniform(-1, 1, (2, 8, 12, 32)), jnp.float32)
    wr = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 3, 16, 3)), jnp.float32)
    ws = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 3, 16, 20)), jnp.float32)
    br = jnp.asarray(rng.uniform(-0.1, 0.1, (3,)), jnp.float32)
    bs = jnp.asarray(rng.uniform(-0.1, 0.1, (20,)), jnp.float32)

    def ref(x, w, b):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    r, s = dual_conv3x3_tapped(h, wr, br, ws, bs)
    np.testing.assert_allclose(np.asarray(r), np.asarray(ref(h[..., :16], wr, br)),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s), np.asarray(ref(h[..., 16:], ws, bs)),
                               atol=1e-5, rtol=1e-5)


def test_fused_ups_head_taps_matches_ref():
    from deep_video_interpolation_extrapolation_tpu.ops.pallas_upshead import (
        _ups_head_taps_ref,
    )
    from deep_video_interpolation_extrapolation_tpu.ops.pallas_upshead import (
        _pallas_impl as impl,
    )
    from deep_video_interpolation_extrapolation_tpu.ops.tapped_conv import (
        build_dual_tap_kernel,
    )
    rng = np.random.RandomState(7)
    p0, p1, p2, w1, b1 = _mk(1, 16, 32, seed=7)
    w2r = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 3, 448, 3)), jnp.float32)
    w2s = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 3, 448, 20)), jnp.float32)
    w2t = build_dual_tap_kernel(w2r, w2s, jnp.float32)
    interpret = jax.default_backend() != "tpu"
    out = np.asarray(impl(p0, p1, p2, w1, b1, w2t=w2t, interpret=interpret))
    ref = np.asarray(_ups_head_taps_ref(p0, p1, p2, w1, b1, w2t))
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-3)


def test_fused_ups_head_taps_x0f4_matches_ref():
    """The f4-x0 consumer form (FOUR-DOT interleave, kills copy.361):
    must match both the XLA reference and the NHWC-x0 kernel on the same
    inputs (TPU run measured them bit-identical; 36.34 vs 35.85 fps at
    the bench config)."""
    from deep_video_interpolation_extrapolation_tpu.ops.pallas_upshead import (
        _pallas_impl as impl,
        _ups_head_taps_x0f4_ref,
        fits_x0f4,
    )
    from deep_video_interpolation_extrapolation_tpu.ops.tapped_conv import (
        build_dual_tap_kernel,
    )
    rng = np.random.RandomState(11)
    p0, p1, p2, w1, b1 = _mk(1, 16, 32, seed=11)
    w2r = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 3, 448, 3)), jnp.float32)
    w2s = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 3, 448, 20)), jnp.float32)
    w2t = build_dual_tap_kernel(w2r, w2s, jnp.float32)
    b, h, w, c0 = p0.shape
    x0f4 = p0.reshape(b, h, w // 4, 4 * c0)
    assert fits_x0f4(x0f4, p1, p2, w1.shape[1])
    interpret = jax.default_backend() != "tpu"
    out = np.asarray(impl(x0f4, p1, p2, w1, b1, w2t=w2t,
                          interpret=interpret, x0_f4=True))
    ref = np.asarray(_ups_head_taps_x0f4_ref(x0f4, p1, p2, w1, b1, w2t))
    nhwc = np.asarray(impl(p0, p1, p2, w1, b1, w2t=w2t,
                           interpret=interpret))
    np.testing.assert_allclose(out, ref, atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(out, nhwc, atol=1e-5, rtol=1e-5)


def test_x0f4_gradients_match_ref():
    """custom_vjp of the f4-x0 form: gradients flow to every operand and
    match jax.grad of the XLA reference composition."""
    from deep_video_interpolation_extrapolation_tpu.ops.pallas_upshead import (
        _ups_head_taps_x0f4_ref,
        ups_head_taps_x0f4,
    )
    from deep_video_interpolation_extrapolation_tpu.ops.tapped_conv import (
        build_dual_tap_kernel,
    )
    if jax.default_backend() != "tpu":
        pytest.skip("fwd runs the compiled kernel; covered in interpret "
                    "form by test_fused_ups_head_taps_x0f4_matches_ref "
                    "(bwd is the XLA ref composition on any backend)")
    rng = np.random.RandomState(13)
    p0, p1, p2, w1, b1 = _mk(1, 16, 32, seed=13)
    w2r = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 3, 448, 3)), jnp.float32)
    w2s = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 3, 448, 20)), jnp.float32)
    w2t = build_dual_tap_kernel(w2r, w2s, jnp.float32)
    b, h, w, c0 = p0.shape
    x0f4 = p0.reshape(b, h, w // 4, 4 * c0)
    loss = lambda fn: lambda *a: jnp.sum(fn(*a) ** 2)
    gk = jax.grad(loss(ups_head_taps_x0f4), argnums=(0, 1, 3))(
        x0f4, p1, p2, w1, b1, w2t)
    gr = jax.grad(loss(_ups_head_taps_x0f4_ref), argnums=(0, 1, 3))(
        x0f4, p1, p2, w1, b1, w2t)
    for a, r in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   atol=1e-3, rtol=1e-3)


@pytest.mark.parametrize("scale", [2, 4])
def test_upsample_variants_exact(scale):
    """convt / lane upsamplers == interpolate_bilinear (f32, CPU-exact)."""
    from deep_video_interpolation_extrapolation_tpu.ops.resize import (
        interpolate_bilinear, upsample2x_convt, upsample2x_lane,
        upsample4x_convt, upsample4x_lane)
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 5, 7, 3)), jnp.float32)
    ref = np.asarray(interpolate_bilinear(x, scale_factor=float(scale)))
    fns = ((upsample2x_convt, upsample2x_lane) if scale == 2
           else (upsample4x_convt, upsample4x_lane))
    for fn in fns:
        np.testing.assert_allclose(np.asarray(fn(x)), ref, atol=3e-3,
                                   rtol=3e-3)  # conv path rounds internally


def test_fused_ups_head_gradients_match_ref():
    """custom_vjp backward (XLA-reference) == autodiff through the ref for
    both wrappers; run in interpret mode off-TPU."""
    from deep_video_interpolation_extrapolation_tpu.ops import pallas_upshead as m

    p0, p1, p2, w1, b1 = _mk(1, 16, 32, seed=13)
    rng = np.random.RandomState(13)
    w2r = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 3, 448, 3)), jnp.float32)
    w2s = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 3, 448, 20)), jnp.float32)
    from deep_video_interpolation_extrapolation_tpu.ops.tapped_conv import (
        build_dual_tap_kernel,
    )
    w2t = build_dual_tap_kernel(w2r, w2s, jnp.float32)

    interpret = jax.default_backend() != "tpu"
    if interpret:
        # route the forward through interpret mode so the vjp pair runs
        orig = m._pallas_impl
        m_impl = lambda *a, **k: orig(*a, **{**k, "interpret": True})
        m.__dict__["_pallas_impl"] = m_impl
    try:
        for fn, ref, args in [
            (m.ups_head_1x1, m._ups_head_ref, (p0, p1, p2, w1, b1)),
            (m.ups_head_taps, m._ups_head_taps_ref, (p0, p1, p2, w1, b1, w2t)),
        ]:
            def loss(f):
                return lambda w: jnp.sum(
                    f(args[0], args[1], args[2], w, *args[4:]).astype(jnp.float32) ** 2)
            g1 = jax.grad(loss(fn))(w1)
            g2 = jax.grad(loss(ref))(w1)
            scale = float(jnp.abs(g2).max())
            assert float(jnp.abs(g1 - g2).max()) < 2e-3 * max(scale, 1.0), (
                float(jnp.abs(g1 - g2).max()), scale)
    finally:
        if interpret:
            m.__dict__["_pallas_impl"] = orig


def _mk_taps(b, h, w, co_r=3, co_s=20, seed=12):
    rng = np.random.RandomState(seed)
    p0, p1, p2, w1, b1 = _mk(b, h, w, seed=seed)
    co = co_r + co_s
    w2t = jnp.asarray(rng.uniform(-0.2, 0.2, (896, 9 * co)), jnp.float32)
    b2 = jnp.asarray(rng.uniform(-0.3, 0.3, (co,)), jnp.float32)
    return p0, p1, p2, w1, b1, w2t, b2


@pytest.mark.parametrize("shape", [(1, 16, 64), (2, 24, 64)])
def test_fold_matches_ref(shape):
    """Folded shifted-add variant == taps + f32 shifted add + bias,
    including the row-tile carry across every program boundary."""
    from deep_video_interpolation_extrapolation_tpu.ops.pallas_upshead import (
        _fold_impl,
        _ups_head_taps_fold_ref,
        fits_fold,
    )

    b, h, w = shape
    p0, p1, p2, w1, b1, w2t, b2 = _mk_taps(b, h, w)
    assert fits_fold(p0, p1, p2)
    out = np.asarray(_fold_impl(p0, p1, p2, w1, b1, w2t, b2,
                                interpret=True))
    ref = np.asarray(_ups_head_taps_fold_ref(p0, p1, p2, w1, b1, w2t, b2))
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=3e-4)


def test_fold_tile_env(monkeypatch):
    """DVIE_FOLD_TILE overrides (th, ns); invalid values are ignored."""
    from deep_video_interpolation_extrapolation_tpu.ops.pallas_upshead import (
        _fold_impl,
        _ups_head_taps_fold_ref,
    )

    p0, p1, p2, w1, b1, w2t, b2 = _mk_taps(1, 16, 64, seed=13)
    ref = np.asarray(_ups_head_taps_fold_ref(p0, p1, p2, w1, b1, w2t, b2))
    for env in ("4,4", "3,2", "16,1"):
        monkeypatch.setenv("DVIE_FOLD_TILE", env)
        out = np.asarray(_fold_impl(p0, p1, p2, w1, b1, w2t, b2,
                                    interpret=True))
        np.testing.assert_allclose(out, ref, atol=3e-4, rtol=3e-4)


def test_fold_gradients_match_ref():
    from deep_video_interpolation_extrapolation_tpu.ops.pallas_upshead import (
        _ups_head_taps_fold_ref,
        ups_head_taps_fold,
    )

    p0, p1, p2, w1, b1, w2t, b2 = _mk_taps(1, 8, 32, seed=14)

    def lf(*a):
        return jnp.sum(ups_head_taps_fold(*a, True) ** 2)

    def lr(*a):
        return jnp.sum(_ups_head_taps_fold_ref(*a) ** 2)

    gf = jax.grad(lf, argnums=tuple(range(7)))(p0, p1, p2, w1, b1, w2t, b2)
    gr = jax.grad(lr, argnums=tuple(range(7)))(p0, p1, p2, w1, b1, w2t, b2)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3)


def test_hrnet_fold_path_matches_taps_path(monkeypatch):
    """DVIE_UPSHEAD_FOLD=1 in _apply_heads == the taps + XLA shifted-add
    path on the same params."""
    from deep_video_interpolation_extrapolation_tpu.models.hrnet import HRNet
    from deep_video_interpolation_extrapolation_tpu.core.config import Config
    from deep_video_interpolation_extrapolation_tpu.core import hw
    from deep_video_interpolation_extrapolation_tpu.ops import pallas_upshead as m

    monkeypatch.setattr(hw, "pallas_enabled", lambda: True)
    orig_impl = m._pallas_impl
    monkeypatch.setattr(
        m, "_pallas_impl",
        lambda *a, **k: orig_impl(*a, **{**k, "interpret": True}))
    orig_fold = m._fold_impl
    monkeypatch.setattr(
        m, "_fold_impl",
        lambda *a, **k: orig_fold(*a[:7], True))

    from deep_video_interpolation_extrapolation_tpu.models import registry
    cfg = Config(runner="INTER", model="InterNet", syn_type="inter",
                 mode="xs2xs", coarse_model="HRNet", input_h=16,
                 input_w=32, batch_size=1, dataset="synthetic",
                 compute_dtype="float32")
    model = registry.build_coarse(cfg, name=None)
    rng = np.random.RandomState(15)
    rgb = jnp.asarray(rng.uniform(-1, 1, (1, 16, 32, 6)), jnp.float32)
    seg = jnp.asarray(rng.uniform(-1, 1, (1, 16, 32, 40)), jnp.float32)

    monkeypatch.setenv("DVIE_UPSHEAD_FOLD", "0")
    v = model.init(jax.random.PRNGKey(0), rgb, seg, train=False)
    base = model.apply(v, rgb, seg, train=False)

    monkeypatch.setenv("DVIE_UPSHEAD_FOLD", "1")
    v2 = model.init(jax.random.PRNGKey(0), rgb, seg, train=False)
    assert (jax.tree_util.tree_structure(v2)
            == jax.tree_util.tree_structure(v))
    out = model.apply(v, rgb, seg, train=False)
    for a, b in zip(out, base):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=3e-4)


def _mk4(b, h, w, seed=30):
    rng = np.random.RandomState(seed)
    p0 = jnp.asarray(rng.uniform(-1, 1, (b, h, w, 64)), jnp.float32)
    p1 = jnp.asarray(rng.uniform(-1, 1, (b, h // 2, w // 2, 128)), jnp.float32)
    p2 = jnp.asarray(rng.uniform(-1, 1, (b, h // 4, w // 4, 256)), jnp.float32)
    p3 = jnp.asarray(rng.uniform(-1, 1, (b, h // 8, w // 8, 512)), jnp.float32)
    w1 = jnp.asarray(rng.uniform(-0.05, 0.05, (960, 1920)), jnp.float32)
    b1 = jnp.asarray(rng.uniform(-0.1, 0.1, (1920,)), jnp.float32)
    w2t = jnp.asarray(rng.uniform(-0.1, 0.1, (1920, 207)), jnp.float32)
    return p0, p1, p2, p3, w1, b1, w2t


@pytest.mark.parametrize("shape", [(1, 16, 64), (2, 24, 128)])
def test_ups_head_taps4_matches_ref(shape):
    """4-part (highres_large) kernel == upsample-concat + 1x1 + taps,
    incl. the x8 row/column phase blends and edge clamps."""
    from deep_video_interpolation_extrapolation_tpu.ops.pallas_upshead import (
        _pallas_impl4,
        _ups_head_taps_ref4,
        fits4,
    )

    b, h, w = shape
    p0, p1, p2, p3, w1, b1, w2t = _mk4(b, h, w)
    assert fits4(p0, p1, p2, p3)
    out = np.asarray(_pallas_impl4(p0, p1, p2, p3, w1, b1, w2t,
                                   interpret=True))
    ref = np.asarray(_ups_head_taps_ref4(p0, p1, p2, p3, w1, b1, w2t))
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=3e-4)


def test_ups_head_taps4_edge_clamp():
    from deep_video_interpolation_extrapolation_tpu.ops.pallas_upshead import (
        _pallas_impl4,
        _ups_head_taps_ref4,
    )

    p0, p1, p2, p3, w1, b1, w2t = _mk4(1, 16, 64, seed=31)
    p3 = p3.at[:, 0, :, :].set(6.0).at[:, -1, :, :].set(-6.0)
    p3 = p3.at[:, :, 0, :].set(4.0).at[:, :, -1, :].set(-4.0)
    out = np.asarray(_pallas_impl4(p0, p1, p2, p3, w1, b1, w2t,
                                   interpret=True))
    ref = np.asarray(_ups_head_taps_ref4(p0, p1, p2, p3, w1, b1, w2t))
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=3e-4)


def test_ups_head_taps4_gradients():
    from deep_video_interpolation_extrapolation_tpu.ops.pallas_upshead import (
        _ups_head_taps_ref4,
        ups_head_taps4,
    )

    p0, p1, p2, p3, w1, b1, w2t = _mk4(1, 8, 64, seed=32)

    def lf(*a):
        return jnp.sum(ups_head_taps4(*a, True) ** 2)

    def lr(*a):
        return jnp.sum(_ups_head_taps_ref4(*a) ** 2)

    args = (p0, p1, p2, p3, w1, b1, w2t)
    gf = jax.grad(lf, argnums=tuple(range(7)))(*args)
    gr = jax.grad(lr, argnums=tuple(range(7)))(*args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3, rtol=2e-3)


def test_highres_large_fused_heads_match_unfused(monkeypatch):
    """DVIE_FUSED_HEAD4=1 == the XLA composition on the same params for
    the 4-branch (--highres_large) HRNet."""
    from deep_video_interpolation_extrapolation_tpu.models.hrnet import HRNet
    from deep_video_interpolation_extrapolation_tpu.core.config import Config
    from deep_video_interpolation_extrapolation_tpu.core import hw
    from deep_video_interpolation_extrapolation_tpu.ops import pallas_upshead as m

    monkeypatch.setattr(hw, "pallas_enabled", lambda: True)
    orig = m._pallas_impl4
    monkeypatch.setattr(
        m, "_pallas_impl4",
        lambda *a, **k: orig(*a[:7], interpret=True))

    from deep_video_interpolation_extrapolation_tpu.models import registry
    cfg = Config(runner="INTER", model="InterNet", syn_type="inter",
                 mode="xs2xs", coarse_model="HRNet", input_h=16,
                 input_w=64, batch_size=1, dataset="synthetic",
                 highres_large=True, compute_dtype="float32")
    model = registry.build_coarse(cfg, name=None)
    rng = np.random.RandomState(33)
    rgb = jnp.asarray(rng.uniform(-1, 1, (1, 16, 64, 6)), jnp.float32)
    seg = jnp.asarray(rng.uniform(-1, 1, (1, 16, 64, 40)), jnp.float32)

    monkeypatch.setenv("DVIE_FUSED_HEAD4", "0")
    v = model.init(jax.random.PRNGKey(0), rgb, seg, train=False)
    base = model.apply(v, rgb, seg, train=False)

    monkeypatch.setenv("DVIE_FUSED_HEAD4", "1")
    v2 = model.init(jax.random.PRNGKey(0), rgb, seg, train=False)
    assert (jax.tree_util.tree_structure(v2)
            == jax.tree_util.tree_structure(v))
    out = model.apply(v, rgb, seg, train=False)
    for a, b in zip(out, base):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=3e-4)


def test_explicit_bwd_matches_autodiff_bwd(monkeypatch):
    """The hand-scheduled backward (DVIE_HEAD_EXPL_BWD, default) and the
    jax.vjp-of-reference backward are the same math: in f32 they must
    agree to float tolerance for every operand grad."""
    from deep_video_interpolation_extrapolation_tpu.ops import pallas_upshead as m
    from deep_video_interpolation_extrapolation_tpu.ops.tapped_conv import (
        build_dual_tap_kernel,
    )

    rng = np.random.RandomState(7)
    p0, p1, p2, w1, b1 = _mk(1, 16, 32, seed=7)
    w2r = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 3, 448, 3)), jnp.float32)
    w2s = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 3, 448, 20)), jnp.float32)
    w2t = build_dual_tap_kernel(w2r, w2s, jnp.float32)

    interpret = jax.default_backend() != "tpu"
    orig = m._pallas_impl
    if interpret:
        monkeypatch.setitem(
            m.__dict__, "_pallas_impl",
            lambda *a, **k: orig(*a, **{**k, "interpret": True}))

    def loss(*a):
        return jnp.sum(m.ups_head_taps(*a).astype(jnp.float32) ** 2)

    grads = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("DVIE_HEAD_EXPL_BWD", flag)
        grads[flag] = jax.grad(loss, argnums=tuple(range(6)))(
            p0, p1, p2, w1, b1, w2t)
    for name, a, b in zip(("dp0", "dp1", "dp2", "dw1", "db1", "dw2t"),
                          grads["0"], grads["1"]):
        scale = max(float(jnp.abs(a).max()), 1e-6)
        dev = float(jnp.abs(a - b).max()) / scale
        assert dev < 5e-5, (name, dev)
