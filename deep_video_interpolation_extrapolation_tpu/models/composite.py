"""Composite model heads (reference nets/InterNet.py, InterRefineNet.py,
ExtraNet.py, ExtraInpaintNet.py, InterGANNet.py).

These wire coarse/refine/stage3/inpaint/track submodels together exactly like
the reference's ``--model`` heads.  Inputs are NHWC: ``rgb`` (B,H,W,3*k)
frame-concat and ``seg`` (B,H,W,20*k) one-hot concat.

GAN gradient routing note: the reference trains G and all Ds from a single
backward using fake-detach + requires_grad toggling
(nets/InterGANNet.py:44-107).  The JAX-exact equivalent lives in the train
step (train/inter_gan.py), which stop-gradients the *fake* for D losses and
the *discriminator param trees* for G losses inside one ``jax.grad``.
``InterGANNet.__call__`` here computes the same 19-tuple for eval/monitoring.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from deep_video_interpolation_extrapolation_tpu.core.config import Config
from deep_video_interpolation_extrapolation_tpu.models import registry


class InterNet(nn.Module):
    """Coarse-only interpolation (nets/InterNet.py:8-17)."""
    cfg: Config

    def setup(self):
        self.coarse_model = registry.build_coarse(self.cfg, name=None)

    def __call__(self, rgb, seg, gt_rgb=None, gt_seg=None, train: bool = True):
        out = registry.apply_coarse(
            self.cfg, self.coarse_model, rgb, seg, gt_rgb, gt_seg, train)
        if train and len(out) == 4:
            # VAE coarse in train mode: surface (mu, logvar) for the KLD
            # term (train/inter.py); eval keeps the 2-tuple contract
            return out
        return out[:2]


def _as_scale_list(refine_out):
    """Normalize a refiner's output to the per-scale list contract:
    SRNRefine returns a list, refineUnet a single array — iterating the
    latter would walk the BATCH axis (the legacy runners normalize the
    same way, train/legacy.py:226-227)."""
    if isinstance(refine_out, (list, tuple)):
        return list(refine_out)
    return [refine_out]


class InterRefineNet(nn.Module):
    """Coarse + SRN refine (nets/InterRefineNet.py:8-28)."""
    cfg: Config

    def setup(self):
        self.coarse_model = registry.build_coarse(self.cfg)
        self.refine_model = registry.build_refine(self.cfg)

    def __call__(self, rgb, seg, gt_rgb=None, gt_seg=None, train: bool = True):
        coarse_rgb, coarse_seg = registry.apply_coarse(
            self.cfg, self.coarse_model, rgb, seg, gt_rgb, gt_seg, train)[:2]
        soft = jax.lax.stop_gradient(jax.nn.softmax(coarse_seg, axis=-1))
        if (not train) and self.cfg.with_gt_seg and gt_seg is not None:
            soft = gt_seg
        # detached per-frame seg embeddings from the coarse model's encoder
        # (nets/InterRefineNet.py:20-23)
        enc = [
            jax.lax.stop_gradient(self.coarse_model.seg_encoder(seg[..., :20])),
            jax.lax.stop_gradient(self.coarse_model.seg_encoder(seg[..., 20:40])),
        ]
        encoded_feat = jnp.concatenate([rgb] + enc, axis=-1)
        coarse_in = jnp.clip(jax.lax.stop_gradient(coarse_rgb), -1, 1)
        refine_rgbs = self.refine_model(coarse_in, soft, encoded_feat, train=train)
        refine_rgbs = _as_scale_list(refine_rgbs)
        refine_rgbs = [jnp.clip(r, -10, 10) for r in refine_rgbs]
        return coarse_rgb, coarse_seg, refine_rgbs


class InterStage3Net(nn.Module):
    """Coarse + refine + attention re-refine (nets/InterRefineNet.py:30-53)."""
    cfg: Config

    def setup(self):
        self.coarse_model = registry.build_coarse(self.cfg)
        self.refine_model = registry.build_refine(self.cfg)
        self.stage3_model = registry.build_stage3(self.cfg)

    def __call__(self, rgb, seg, gt_rgb=None, gt_seg=None, train: bool = True):
        coarse_rgb, coarse_seg = registry.apply_coarse(
            self.cfg, self.coarse_model, rgb, seg, gt_rgb, gt_seg, train)[:2]
        soft = jax.lax.stop_gradient(jax.nn.softmax(coarse_seg, axis=-1))
        if (not train) and self.cfg.with_gt_seg and gt_seg is not None:
            soft = gt_seg
        enc = [
            jax.lax.stop_gradient(self.coarse_model.seg_encoder(seg[..., :20])),
            jax.lax.stop_gradient(self.coarse_model.seg_encoder(seg[..., 20:40])),
        ]
        encoded_feat = jnp.concatenate([rgb] + enc, axis=-1)
        coarse_in = jnp.clip(jax.lax.stop_gradient(coarse_rgb), -1, 1)
        refine_rgbs = self.refine_model(coarse_in, soft, encoded_feat, train=train)
        refine_rgbs = _as_scale_list(refine_rgbs)
        refine_rgbs = [jnp.clip(r, -1, 1) for r in refine_rgbs]
        stage3_in = jax.lax.stop_gradient(refine_rgbs[-1])
        stage3_rgbs, flow_maps = self.stage3_model(
            stage3_in, soft, rgb, seg, train=train)
        stage3_rgbs = [jnp.clip(r, -10, 10) for r in stage3_rgbs]
        return coarse_rgb, coarse_seg, refine_rgbs, stage3_rgbs, flow_maps


class ExtraNet(nn.Module):
    """Coarse-only extrapolation (nets/ExtraNet.py:8-17)."""
    cfg: Config

    def setup(self):
        self.coarse_model = registry.build_coarse(self.cfg)

    def __call__(self, rgb, seg, gt_rgb=None, gt_seg=None, train: bool = True):
        out = registry.apply_coarse(
            self.cfg, self.coarse_model, rgb, seg, gt_rgb, gt_seg, train)
        if train and len(out) == 4:
            # VAE coarse in train mode: surface (mu, logvar) so the train
            # step can KLD-regularize the posterior (extra.py); eval keeps
            # the 2-tuple so rollout/product paths stay uniform
            return out
        return out[:2]


class ExtraInpaintNet(nn.Module):
    """Coarse + occlusion-mask inpainting (nets/ExtraInpaintNet.py:8-19)."""
    cfg: Config

    def setup(self):
        self.coarse_model = registry.build_coarse(self.cfg)
        self.inpaint_model = registry.build_inpaint(self.cfg)

    def __call__(self, rgb, seg, gt_rgb=None, gt_seg=None, train: bool = True):
        out = registry.apply_coarse(
            self.cfg, self.coarse_model, rgb, seg, gt_rgb, gt_seg, train)
        if len(out) != 3:
            raise ValueError(
                f"ExtraInpaintNet needs a mask-producing coarse model "
                f"(HRNet with inpaint, nets/HRNet.py:585-601); "
                f"{self.cfg.coarse_model!r} returned {len(out)} outputs")
        coarse_rgb, out_seg, mask = out
        inpainted = self.inpaint_model(coarse_rgb, mask, out_seg, train=train)
        return coarse_rgb, out_seg, mask, inpainted


class InterGANNet(nn.Module):
    """VAE coarse + optional TrackGen + 4 discriminator families
    (nets/InterGANNet.py:8-127).  Returns the reference's 19-tuple; see the
    module docstring for where training-time gradient isolation happens.
    """
    cfg: Config

    def setup(self):
        cfg = self.cfg
        self.coarse_model = registry.build_coarse(cfg)
        if cfg.track_gen:
            self.track_gen_model = registry.build_track_gen(cfg)
        if cfg.frame_disc:
            self.frame_disc_model = registry.build_disc(cfg, cfg.frame_disc_model)
        if cfg.frame_det_disc:
            self.frame_det_disc_model = registry.build_disc(cfg, cfg.frame_det_disc_model)
        if cfg.video_disc:
            self.video_disc_model = registry.build_disc(cfg, cfg.video_disc_model)
        if cfg.video_det_disc:
            self.video_det_disc_model = registry.build_disc(cfg, cfg.video_det_disc_model)

    def __call__(self, rgb, seg, gt_rgb=None, gt_seg=None, bboxes=None,
                 train: bool = True):
        cfg = self.cfg
        coarse_rgb, coarse_seg, mu, logvar = registry.apply_coarse(
            cfg, self.coarse_model, rgb, seg, gt_rgb, gt_seg, train)
        # eval without boxes (serving export, generator-only inference)
        # skips the track branch — the reference's cycgen likewise runs the
        # coarse generator only; training without boxes still fails loudly
        if cfg.track_gen and (train or bboxes is not None):
            coarse_rgb, coarse_seg, gen_bbox, loc_diff_loss = self.track_gen_model(
                rgb, seg, coarse_rgb, coarse_seg, bboxes,
                **({"gt_bbox_for_loss": True} if "V2" in cfg.track_gen_model else {}),
                train=train)
        else:
            gen_bbox = None
            loc_diff_loss = jnp.zeros(())

        soft = jax.nn.softmax(coarse_seg, axis=-1)
        sg = jax.lax.stop_gradient

        def d_pair(disc, *extra):
            fake = disc(sg(coarse_rgb), sg(soft), *extra, bboxes=bboxes, train=train)
            real = disc(gt_rgb, gt_seg, *extra, bboxes=bboxes, train=train)
            gen = disc(coarse_rgb, soft, *extra, bboxes=bboxes, train=train)
            return fake, real, gen

        D_fake_frame = D_real_frame = G_fake_frame = None
        D_fake_fdet = D_real_fdet = G_fake_fdet = None
        D_fake_video = D_real_video = G_fake_video = None
        D_fake_vdet = D_real_vdet = D_syncfake_vdet = G_fake_vdet = None
        if train:
            if cfg.frame_disc:
                D_fake_frame, D_real_frame, G_fake_frame = d_pair(self.frame_disc_model)
            if cfg.frame_det_disc:
                D_fake_fdet, D_real_fdet, G_fake_fdet = d_pair(self.frame_det_disc_model)
            if cfg.video_disc:
                D_fake_video, D_real_video, G_fake_video = d_pair(
                    self.video_disc_model, rgb, seg)
            if cfg.video_det_disc:
                D_fake_vdet, D_real_vdet, G_fake_vdet = d_pair(
                    self.video_det_disc_model, rgb, seg)
                D_syncfake_vdet = self.video_det_disc_model(
                    gt_rgb, gt_seg, rgb, seg, bboxes=bboxes, sync_neg=True, train=train)

        return (coarse_rgb, coarse_seg, mu, logvar,
                D_fake_frame, D_real_frame,
                D_fake_video, D_real_video,
                G_fake_frame, G_fake_video,
                D_fake_fdet, D_real_fdet,
                D_fake_vdet, D_syncfake_vdet, D_real_vdet,
                G_fake_fdet, G_fake_vdet, gen_bbox, loc_diff_loss)
