"""Shape/dtype tests for the model zoo (tiny inputs, fp32).

The reference has no tests (SURVEY.md §4); these pin each Flax module's
call signature and output contract against the reference's documented
shapes (SURVEY.md §2.3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import deep_video_interpolation_extrapolation_tpu.models as M

B, H, W = 1, 16, 32
KEY = jax.random.PRNGKey(0)


def _rgb(k=2, h=H, w=W):
    return jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (B, h, w, 3 * k)), jnp.float32)


def _seg(k=2, h=H, w=W):
    ids = np.random.RandomState(1).randint(0, 20, (B, h, w, k))
    return jnp.asarray(
        np.concatenate([np.eye(20, dtype=np.float32)[ids[..., i]] for i in range(k)], -1))


def _boxes(n=4):
    rng = np.random.RandomState(2)
    out = np.zeros((B, 3, n, 4), np.float32)
    for f in range(3):
        for t in range(n):
            y1, x1 = rng.randint(0, H - 6), rng.randint(0, W - 6)
            out[:, f, t] = (y1, x1, y1 + 5, x1 + 5)
    return jnp.asarray(out)


class TestUNet:
    def test_shapes(self):
        m = M.UNet(dtype=jnp.float32)
        v = m.init(KEY, _rgb(), _seg(), train=False)
        rgb, seg = m.apply(v, _rgb(), _seg(), train=False)
        assert rgb.shape == (B, H, W, 3)
        assert seg.shape == (B, H, W, 20)
        # tanh rgb head is bounded
        assert float(jnp.max(jnp.abs(rgb))) <= 1.0


class TestSepUNet:
    def test_shapes(self):
        m = M.SepUNet(dtype=jnp.float32)
        fg = jnp.zeros((B, H, W, 2), jnp.float32).at[:, 4:10, 8:20].set(1.0)
        v = m.init(KEY, _rgb(), _seg(), fg, train=False)
        rgb, seg = m.apply(v, _rgb(), _seg(), fg, train=False)
        assert rgb.shape == (B, H, W, 3) and seg.shape == (B, H, W, 20)


class TestSRNRefine:
    @pytest.mark.parametrize("n_scales", [1, 2])
    def test_multiscale_list(self, n_scales):
        m = M.SRNRefine(n_scales=n_scales, dtype=jnp.float32)
        coarse = _rgb(1)
        seg = _seg(1)
        feat = jnp.concatenate([_rgb(2), jnp.zeros((B, H, W, 8))], -1)  # 3*2+4*2
        v = m.init(KEY, coarse, seg, feat, train=False)
        outs = m.apply(v, coarse, seg, feat, train=False)
        assert isinstance(outs, (list, tuple)) and len(outs) == n_scales
        # scale i has resolution H/2^(n-1-i) (reference refine_nets.py:102-135)
        for i, o in enumerate(outs):
            f = 2 ** (n_scales - 1 - i)
            assert o.shape == (B, H // f, W // f, 3), (i, o.shape)


class TestAttnRefine:
    def test_v1(self):
        m = M.MSResAttnRefine(n_scales=1, dtype=jnp.float32)
        v = m.init(KEY, _rgb(1), _seg(1), _rgb(2), _seg(2), train=False)
        outs, flows = m.apply(v, _rgb(1), _seg(1), _rgb(2), _seg(2), train=False)
        assert len(outs) == 1 and outs[0].shape == (B, H, W, 3)
        assert flows is not None

    @pytest.mark.parametrize("name", ["MSResAttnRefineV2", "MSResAttnRefineV2Base", "MSResAttnRefineV3"])
    def test_pyramid_variants(self, name):
        m = getattr(M, name)(dtype=jnp.float32)
        h, w = 32, 32  # 3-level pyramid with /4 attention needs >=32
        rgb1, seg1 = _rgb(1, h, w), _seg(1, h, w)
        rgbn, segn = _rgb(2, h, w), _seg(2, h, w)
        v = m.init(KEY, rgb1, seg1, rgbn, segn, train=False)
        outs, flows = m.apply(v, rgb1, seg1, rgbn, segn, train=False)
        assert len(outs) == 3
        assert outs[-1].shape == (B, h, w, 3)
        if name == "MSResAttnRefineV2Base":
            assert flows is None


class TestTrackGen:
    def test_v1(self):
        m = M.TrackGen(num_track=4, dtype=jnp.float32)
        coarse_rgb, coarse_seg = _rgb(1), _seg(1)
        v = m.init(KEY, _rgb(2), _seg(2), coarse_rgb, coarse_seg, _boxes(), train=False)
        rgb, seg, gen_bbox, aux = m.apply(
            v, _rgb(2), _seg(2), coarse_rgb, coarse_seg, _boxes(), train=False)
        assert rgb.shape == (B, H, W, 3) and seg.shape == (B, H, W, 20)
        assert gen_bbox is None
        assert aux.shape == ()

    def test_v2_predicts_boxes(self):
        m = M.TrackGenV2(num_track=4, dtype=jnp.float32)
        coarse_rgb, coarse_seg = _rgb(1), _seg(1)
        v = m.init(KEY, _rgb(2), _seg(2), coarse_rgb, coarse_seg, _boxes(), train=False)
        rgb, seg, gen_boxes, aux = m.apply(
            v, _rgb(2), _seg(2), coarse_rgb, coarse_seg, _boxes(), train=False)
        assert rgb.shape == (B, H, W, 3)
        assert gen_boxes is not None and gen_boxes.shape[-1] == 4
        assert np.isfinite(float(aux))


class TestDiscriminators:
    def _fs(self):
        return _rgb(1), _seg(1)

    @pytest.mark.parametrize("name,scalar", [
        ("FrameDiscriminator", True),
        ("FrameLocalDiscriminator", False),
        ("FrameSNDiscriminator", True),
        ("FrameSNLocalDiscriminator", False),
    ])
    def test_frame_family(self, name, scalar):
        m = getattr(M, name)(seg_disc=True, dtype=jnp.float32)
        x, s = self._fs()
        v = m.init(KEY, x, s, train=False)
        out = m.apply(v, x, s, train=False)
        if scalar:
            assert out.shape == (B,)
        else:
            assert out.ndim == 4 and out.shape[0] == B

    @pytest.mark.parametrize("name,scalar", [
        ("VideoDiscriminator", True),
        ("VideoLocalDiscriminator", False),
        ("VideoSNDiscriminator", True),
        ("VideoSNLocalDiscriminator", False),
    ])
    def test_video_family(self, name, scalar):
        m = getattr(M, name)(seg_disc=True, dtype=jnp.float32)
        x, s = self._fs()
        ix, is_ = _rgb(2), _seg(2)
        v = m.init(KEY, x, s, ix, is_, train=False)
        out = m.apply(v, x, s, ix, is_, train=False)
        if scalar:
            assert out.shape == (B,)
        else:
            assert out.ndim == 4 and out.shape[0] == B

    def test_sn_power_iteration_updates(self):
        m = M.FrameSNDiscriminator(seg_disc=False, dtype=jnp.float32)
        x = _rgb(1)
        v = m.init(KEY, x, train=True)
        assert "batch_stats" in v  # SpectralNorm u/v live in batch_stats
        out, mutated = m.apply(v, x, train=True, mutable=["batch_stats"])
        # power-iteration vectors change after a forward pass
        leaves0 = jax.tree_util.tree_leaves(v["batch_stats"])
        leaves1 = jax.tree_util.tree_leaves(mutated["batch_stats"])
        assert any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(leaves0, leaves1))


class TestOptical:
    def test_optical_unet_warp(self):
        m = M.OpticalUnet(dtype=jnp.float32)
        x = _rgb(2, 32, 32)
        v = m.init(KEY, x, train=False)
        out = m.apply(v, x, train=False)
        # returns (pred, for_warp, back_warp, flows...) or similar tuple
        pred = out[0] if isinstance(out, (list, tuple)) else out
        assert pred.shape == (B, 32, 32, 3)

    def test_refine_unet(self):
        m = M.RefineUnet(dtype=jnp.float32)
        img = _rgb(1, 32, 32)
        v = m.init(KEY, img, train=False)
        out = m.apply(v, img, train=False)
        assert out.shape == (B, 32, 32, 3)


class TestInpaintUnet:
    def test_composites_masked_regions(self):
        m = M.InpaintUnet(num_pred_once=1, dtype=jnp.float32)
        rgb = _rgb(1)
        seg = _seg(1)
        mask = jnp.ones((B, H, W, 1), jnp.float32).at[:, 4:8, 8:16].set(0.0)
        v = m.init(KEY, rgb, mask, seg, train=False)
        out = m.apply(v, rgb, mask, seg, train=False)
        assert out.shape == (B, H, W, 3)
        # where mask==1 the coarse rgb passes through unchanged
        np.testing.assert_allclose(
            np.asarray(out[:, 0, 0]), np.asarray(rgb[:, 0, 0]), atol=1e-6)


class TestFeatures:
    def test_vgg19_returns_5_stages(self):
        m = M.VGG19Features(dtype=jnp.float32)
        x = jnp.zeros((B, 32, 32, 3))
        v = m.init(KEY, x)
        feats = m.apply(v, x)
        assert len(feats) == 5
        # relu1_2 .. relu5_4 halving resolutions, 64..512 channels
        assert feats[0].shape == (B, 32, 32, 64)
        assert feats[-1].shape[-1] == 512

    def test_resnet101_returns_3_stages(self):
        m = M.ResNet101Features(dtype=jnp.float32)
        x = jnp.zeros((B, 64, 64, 3))
        v = m.init(KEY, x, train=False)
        feats = m.apply(v, x, train=False)
        assert len(feats) == 3
        assert [f.shape[-1] for f in feats] == [512, 1024, 2048]
