"""Legacy composite heads (reference nets/GAN.py, RefineNet.py,
RefineGAN.py) — the GANer/Refiner-era model wiring, kept addressable by the
same names.  As with InterGANNet, training-time gradient isolation (the
reference's detach + requires_grad toggling) belongs to the train step; the
modules return raw discriminator outputs."""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from deep_video_interpolation_extrapolation_tpu.models.legacy_disc import (
    MotionDiscriminator,
    MultiscaleDiscriminator,
)
from deep_video_interpolation_extrapolation_tpu.models.legacy_gen import MyFRRN

Dtype = Any


class GAN(nn.Module):
    """MyFRRN generator + multiscale/motion discriminator
    (nets/GAN.py:14-217).

    Call ``(rgb, seg, gt_rgb, gt_seg)``; returns
    (fake_rgb, fake_seg, pred_fake_D, pred_real_D, pred_fake_G) at train,
    (fake_rgb, fake_seg) at eval.
    """
    net_d: str = "multi_scale_img_seg"   # --netD choices (nets/GAN.py:21-31)
    num_d: int = 2
    mode: str = "xs2xs"
    dtype: Optional[Dtype] = None

    def setup(self):
        self.netG = MyFRRN(mode=self.mode, dtype=self.dtype)
        if self.net_d.startswith("multi_scale"):
            self.netD = MultiscaleDiscriminator(
                num_d=self.num_d, use_sigmoid=True, get_interm_feat=True,
                dtype=self.dtype)
        else:
            self.netD = MotionDiscriminator(dtype=self.dtype)

    def _d_input(self, rgb_pred, gt_seg, rgb_in):
        if self.net_d == "multi_scale":
            # 3 frames rgb concat (input pair + prediction)
            return jnp.concatenate([rgb_in[..., :6], rgb_pred], axis=-1)
        if self.net_d == "multi_scale_img":
            return rgb_pred
        if self.net_d == "motion_img":
            # (frame1, pred, frame2) temporal sandwich (nets/GAN.py:133-135)
            return jnp.concatenate(
                [rgb_in[..., :3], rgb_pred, rgb_in[..., 3:6]], axis=-1)
        # multi_scale_img_seg: the GROUND-TRUTH seg rides along on BOTH
        # the fake and real inputs (nets/GAN.py:120-126) — identical seg
        # channels force D to discriminate on rgb realism, not on the
        # predicted seg's softness
        return jnp.concatenate([rgb_pred, gt_seg], axis=-1)

    def __call__(self, rgb, seg, gt_rgb=None, gt_seg=None, train: bool = True):
        fake_rgb, fake_seg = self.netG(rgb, seg, train=train)
        if not train:
            return fake_rgb, fake_seg
        sg = jax.lax.stop_gradient
        pred_fake_d = self.netD(
            self._d_input(sg(fake_rgb), gt_seg, rgb), train=train)
        pred_real_d = self.netD(self._d_input(gt_rgb, gt_seg, rgb), train=train)
        # G adversarial pass: D params frozen by the TRAIN STEP (it
        # re-applies with a stop_gradient'ed netD subtree — the functional
        # analog of the reference's set_net_grad(netD, False),
        # nets/GAN.py:101-104); this live-params output serves the D
        # losses only
        pred_fake_g = self.netD(self._d_input(fake_rgb, gt_seg, rgb), train=train)
        return fake_rgb, fake_seg, pred_fake_d, pred_real_d, pred_fake_g


class RefineNet(nn.Module):
    """Legacy coarse(+refine) head (nets/RefineNet.py:13-41).

    The reference's inter branch is broken (uses ``coarse_rgb`` before
    assignment, SURVEY §2.7); implemented here as coarse -> refine on the
    detached coarse, the evident intent.
    """
    cfg: Any
    dtype: Optional[Dtype] = None

    def setup(self):
        from deep_video_interpolation_extrapolation_tpu.models import registry
        self.coarse_model = registry.build_coarse(self.cfg)
        self.refine_model = registry.build_refine(self.cfg)

    def __call__(self, rgb, seg, gt_rgb=None, gt_seg=None, train: bool = True):
        out = self.coarse_model(rgb, seg, train=train)
        coarse_rgb, out_seg = out[0], out[1]
        if self.cfg.syn_type == "extra":
            return coarse_rgb, out_seg
        soft = jax.nn.softmax(out_seg, axis=-1)
        enc = [
            jax.lax.stop_gradient(self.coarse_model.seg_encoder(seg[..., :20])),
            jax.lax.stop_gradient(self.coarse_model.seg_encoder(seg[..., 20:40])),
        ]
        feat = jnp.concatenate([rgb] + enc, axis=-1)
        refine_rgbs = self.refine_model(
            jax.lax.stop_gradient(coarse_rgb), soft, feat, train=train)
        return coarse_rgb, out_seg, refine_rgbs


class RefineGAN(nn.Module):
    """Coarse + refine + 23-ch multiscale discriminator
    (nets/RefineGAN.py:14-46)."""
    cfg: Any
    dtype: Optional[Dtype] = None

    def setup(self):
        from deep_video_interpolation_extrapolation_tpu.models import registry
        self.coarse_model = registry.build_coarse(self.cfg)
        self.refine_model = registry.build_refine(self.cfg)
        self.discriminator = MultiscaleDiscriminator(
            num_d=2, use_sigmoid=True, get_interm_feat=False, dtype=self.dtype)

    def __call__(self, rgb, seg, gt_rgb=None, gt_seg=None, train: bool = True,
                 with_disc: bool = True):
        out = self.coarse_model(rgb, seg, train=train)
        coarse_rgb, out_seg = out[0], out[1]
        # the reference feeds the refiner ONLY the detached coarse rgb
        # (nets/RefineGAN.py:29), so refine losses never reach the coarse
        # model's params
        refine_rgbs = self.refine_model(
            jax.lax.stop_gradient(coarse_rgb), train=train)
        if not isinstance(refine_rgbs, (list, tuple)):
            refine_rgbs = [refine_rgbs]   # single-scale refiners (refineUnet)
        last = refine_rgbs[-1]
        if not train or not with_disc:
            # with_disc=False: train-mode generator forward only (norm
            # state updates, no D passes) — the train step applies the
            # discriminator itself with explicit param freezing
            return coarse_rgb, refine_rgbs, out_seg
        sg = jax.lax.stop_gradient
        pred_fake_d = self.discriminator(
            jnp.concatenate([sg(last), gt_seg], axis=-1), train=train)
        pred_real_d = self.discriminator(
            jnp.concatenate([gt_rgb, gt_seg], axis=-1), train=train)
        pred_fake_g = self.discriminator(
            jnp.concatenate([last, gt_seg], axis=-1), train=train)
        return coarse_rgb, refine_rgbs, out_seg, pred_fake_d, pred_real_d, pred_fake_g
