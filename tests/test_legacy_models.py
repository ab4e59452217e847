"""Legacy model zoo shape tests (MyFRRN/PSPNet/B2SNet/GridNet/multiscale
discriminators/video VAE/legacy heads)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import deep_video_interpolation_extrapolation_tpu.models as M
from deep_video_interpolation_extrapolation_tpu.core.config import Config

B, H, W = 1, 16, 32
KEY = jax.random.PRNGKey(0)


def _rgb(k=2, h=H, w=W):
    return jnp.asarray(
        np.random.RandomState(0).uniform(-1, 1, (B, h, w, 3 * k)), jnp.float32)


def _seg(k=2, h=H, w=W):
    ids = np.random.RandomState(1).randint(0, 20, (B, h, w, k))
    return jnp.asarray(np.concatenate(
        [np.eye(20, dtype=np.float32)[ids[..., i]] for i in range(k)], -1))


class TestLegacyGenerators:
    @pytest.mark.parametrize("cls", ["MyFRRN", "PSPNet", "PSPNetV2"])
    def test_xs2xs(self, cls):
        if cls == "PSPNetV2":
            m = M.PSPNetV2(mode="xs2xs", dtype=jnp.float32)
        else:
            m = getattr(M, cls)(mode="xs2xs", dtype=jnp.float32)
        v = m.init(KEY, _rgb(), _seg(), train=False)
        rgb, seg = m.apply(v, _rgb(), _seg(), train=False)
        assert rgb.shape == (B, H, W, 3)
        assert seg.shape == (B, H, W, 20)

    def test_b2snet_xx2x(self):
        m = M.B2SNet(dtype=jnp.float32)
        v = m.init(KEY, _rgb(), train=False)
        rgb, seg = m.apply(v, _rgb(), train=False)
        assert rgb.shape == (B, H, W, 3) and seg is None

    def test_gridnet(self):
        m = M.GridNet(mode="xs2xs", dtype=jnp.float32)
        x = jnp.concatenate([_rgb(), _seg()], axis=-1)
        v = m.init(KEY, x, train=False)
        rgb, seg = m.apply(v, x, train=False)
        assert rgb.shape == (B, H, W, 3) and seg.shape == (B, H, W, 20)


class TestLegacyDiscriminators:
    def test_multiscale_interm(self):
        m = M.MultiscaleDiscriminator(num_d=2, use_sigmoid=True,
                                      get_interm_feat=True, dtype=jnp.float32)
        x = _rgb(1, 32, 32)
        v = m.init(KEY, x, train=False)
        outs = m.apply(v, x, train=False)
        assert len(outs) == 2          # num_D scales
        assert len(outs[0]) == 9       # per-layer features + head
        final = outs[0][-1]
        assert np.all((np.asarray(final) >= 0) & (np.asarray(final) <= 1))

    def test_multiscale_plain(self):
        m = M.MultiscaleDiscriminator(num_d=3, dtype=jnp.float32)
        x = _rgb(1, 32, 32)
        v = m.init(KEY, x, train=False)
        outs = m.apply(v, x, train=False)
        assert len(outs) == 3 and outs[0][0].ndim == 4

    def test_motion(self):
        m = M.MotionDiscriminator(dtype=jnp.float32)
        x = jnp.concatenate([_rgb(1), _rgb(1), _rgb(1)], -1)
        v = m.init(KEY, x, train=False)
        out = m.apply(v, x, train=False)
        assert out.shape == (B, H // 4, W // 4, 1)


class TestVideoVAE:
    @pytest.mark.parametrize("variant", ["vae", "vae_s"])
    def test_forward(self, variant):
        t = 2
        h = w = 32  # LegacyRefineNet pools 5 levels -> needs >=32 px
        m = M.VideoVAE(vid_length=t, variant=variant, dtype=jnp.float32)
        rng = np.random.RandomState(0)
        rgb_seq = jnp.asarray(rng.uniform(0, 1, (B, t + 1, h, w, 3)), jnp.float32)
        seg_seq = jnp.asarray(
            np.eye(20, dtype=np.float32)[rng.randint(0, 20, (B, t + 1, h, w))])
        fg = jnp.asarray(rng.randint(0, 2, (B, t + 1, h, w, 1)), jnp.float32)
        bg = 1 - fg
        v = m.init({"params": KEY, "noise": jax.random.PRNGKey(1)},
                   rgb_seq, seg_seq, bg, fg, train=True)
        out = m.apply(v, rgb_seq, seg_seq, bg, fg, train=True,
                      rngs={"noise": jax.random.PRNGKey(2)},
                      mutable=["batch_stats"])[0]
        output, y_pred, mu, logvar, flow, flowback, mask_fw, mask_bw = out
        assert output.shape == (B, t, h, w, 3)
        assert y_pred.shape == (B, t, h, w, 3)
        assert flow.shape == (B, t, h, w, 2)
        assert mask_fw.shape == (B, t, h, w, 1)
        assert mu is not None and logvar is not None
        assert np.all(np.isfinite(np.asarray(y_pred)))


class TestLegacyHeads:
    def test_gan_head(self):
        m = M.GAN(net_d="multi_scale_img_seg", num_d=2, dtype=jnp.float32)
        v = m.init(KEY, _rgb(), _seg(), _rgb(1), _seg(1), train=True)
        out = m.apply(v, _rgb(), _seg(), _rgb(1), _seg(1), train=True,
                      mutable=["batch_stats"])[0]
        fake_rgb, fake_seg, d_fake, d_real, g_fake = out
        assert fake_rgb.shape == (B, H, W, 3)
        assert len(d_fake) == 2

    def test_refine_gan_head(self):
        cfg = Config(
            runner="INTER", model="RefineGAN", syn_type="inter", mode="xs2xs",
            coarse_model="MyFRRN", refine_model="SRNRefine", n_scales=1,
            compute_dtype="float32", input_h=H, input_w=W)
        from deep_video_interpolation_extrapolation_tpu.models.registry import (
            build_model,
        )
        # RefineGAN needs a coarse with seg_encoder; MyFRRN exposes one only
        # in xs2xs compact scope -> use HRNet for the wiring test
        cfg = cfg.replace(coarse_model="HRNet")
        m = build_model(cfg)
        v = m.init(KEY, _rgb(), _seg(), _rgb(1), _seg(1), train=True)
        out = m.apply(v, _rgb(), _seg(), _rgb(1), _seg(1), train=True,
                      mutable=["batch_stats"])[0]
        coarse_rgb, refine_rgbs, seg, d_fake, d_real, g_fake = out
        assert coarse_rgb.shape == (B, H, W, 3)
        assert refine_rgbs[-1].shape == (B, H, W, 3)
