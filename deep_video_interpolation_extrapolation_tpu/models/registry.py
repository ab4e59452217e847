"""Model registry — maps reference ``--model``/``--*_model`` names to Flax
modules (the TPU equivalent of ``nets.__dict__[args.model](args)``,
reference runners/InterTrainer.py:31-34, nets/__init__.py:1-33)."""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp

from deep_video_interpolation_extrapolation_tpu.core.config import Config


def compute_dtype(cfg: Config):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.compute_dtype]


def build_coarse(cfg: Config, name: Optional[str] = "coarse_model"):
    from deep_video_interpolation_extrapolation_tpu.models.hrnet import HRNet, VAEHRNet
    d = compute_dtype(cfg)
    if cfg.coarse_model in ("HRNet", "VAEHRNet"):
        kw = dict(
            syn_type=cfg.syn_type,
            num_pred_once=cfg.num_pred_once,
            inpaint=cfg.inpaint,
            inpaint_mask=cfg.inpaint_mask,
            highres_large=cfg.highres_large,
            dtype=d,
            # Pallas fast paths assume unsharded spatial extents; under a
            # spatial mesh the XLA compositions (which SPMD-partition
            # correctly) are used instead
            spatial_sharded=cfg.num_spatial_shards > 1,
            # --remat checkpoints the backbone at stage granularity inside
            # the model (models/hrnet.py _HRBackbone.remat); see
            # remat_internal() for the runner-side contract
            remat=cfg.remat,
        )
        cls = {"HRNet": HRNet, "VAEHRNet": VAEHRNet}[cfg.coarse_model]
        return cls(**kw)
    # legacy coarse generators, addressable by the reference names
    from deep_video_interpolation_extrapolation_tpu.models import legacy_gen
    from deep_video_interpolation_extrapolation_tpu.models.unet import UNet, SepUNet
    legacy = {
        "MyFRRN": lambda: legacy_gen.MyFRRN(mode=cfg.mode, dtype=d),
        "PSPNet": lambda: legacy_gen.PSPNet(mode=cfg.mode, dtype=d),
        "PSPNetV2": lambda: legacy_gen.PSPNetV2(mode=cfg.mode, dtype=d),
        "B2SNet": lambda: legacy_gen.B2SNet(dtype=d),
        "UNet": lambda: UNet(dtype=d),
        "SepUNet": lambda: SepUNet(dtype=d),
    }
    return legacy[cfg.coarse_model]()


def remat_internal(cfg: Config) -> bool:
    """True when the built model already rematerializes itself at stage
    granularity under ``cfg.remat`` (models/hrnet.py ``_HRBackbone.remat``),
    so the runner must NOT wrap the forward in a whole-region
    ``jax.checkpoint`` on top: the nested outer region would recompute the
    forward a third time in backprop for zero extra memory benefit.

    Conservative: only the plain composites whose compute is dominated by
    the HRNet-family coarse qualify; anything with an un-rematted tail
    (refine/stage3 nets, InpaintUnet) keeps the runner's outer checkpoint
    (nesting is correct, just costs one more forward).
    """
    return (bool(cfg.remat)
            and cfg.coarse_model in ("HRNet", "VAEHRNet")
            and cfg.model in ("InterNet", "ExtraNet")
            and not getattr(cfg, "inpaint", False))


def apply_coarse(cfg: Config, model, rgb, seg, gt_rgb=None, gt_seg=None,
                 train: bool = True):
    """Normalize coarse-model call signatures (HRNet vs VAEHRNet).

    Returns the raw tuple: (rgb, seg) / (rgb, seg, mask) / (rgb, seg, mu, logvar).
    """
    if cfg.coarse_model == "VAEHRNet":
        return model(rgb, seg, gt_rgb, gt_seg, train=train)
    out = model(rgb, seg, train=train)
    return out


def build_refine(cfg: Config):
    from deep_video_interpolation_extrapolation_tpu.models.refine import SRNRefine
    if cfg.refine_model == "SRNRefine":
        return SRNRefine(n_scales=cfg.n_scales, dtype=compute_dtype(cfg))
    # 'refineUnet' is listed in the reference CLI but unreferenced in its
    # registry (nets/__init__.py exposes RefineUnet from OpticalUnet.py);
    # we map it to the working SRN refiner shape via OpticalUnet's RefineUnet.
    from deep_video_interpolation_extrapolation_tpu.models.optical import RefineUnet
    return RefineUnet(dtype=compute_dtype(cfg))


def build_stage3(cfg: Config):
    from deep_video_interpolation_extrapolation_tpu.models import attn_refine as ar
    d = compute_dtype(cfg)
    if cfg.stage3_model == "MSResAttnRefine":
        return ar.MSResAttnRefine(
            n_scales=cfg.n_scales, stage3_prop=cfg.stage3_prop, dtype=d,
            spatial_sharded=cfg.num_spatial_shards > 1)
    if cfg.stage3_model == "MSResAttnRefineV2":
        return ar.MSResAttnRefineV2(stage3_prop=cfg.stage3_prop, dtype=d)
    if cfg.stage3_model == "MSResAttnRefineV2Base":
        return ar.MSResAttnRefineV2Base(stage3_prop=cfg.stage3_prop, dtype=d)
    if cfg.stage3_model == "MSResAttnRefineV3":
        return ar.MSResAttnRefineV3(stage3_prop=cfg.stage3_prop, dtype=d)
    raise KeyError(cfg.stage3_model)


def build_inpaint(cfg: Config):
    from deep_video_interpolation_extrapolation_tpu.models.hrnet import InpaintUnet
    assert cfg.inpaint_model == "InpaintUnet", cfg.inpaint_model
    return InpaintUnet(num_pred_once=cfg.num_pred_once, dtype=compute_dtype(cfg))


def build_track_gen(cfg: Config):
    from deep_video_interpolation_extrapolation_tpu.models.trackgen import (
        TrackGen, TrackGenV2,
    )
    cls = {"TrackGen": TrackGen, "TrackGenV2": TrackGenV2}[cfg.track_gen_model]
    return cls(num_track=cfg.num_track_per_img, dtype=compute_dtype(cfg))


def build_disc(cfg: Config, name: str):
    from deep_video_interpolation_extrapolation_tpu.models import discriminators as dd
    d = compute_dtype(cfg)
    simple = {
        "FrameDiscriminator": lambda: dd.FrameDiscriminator(seg_disc=cfg.seg_disc, dtype=d),
        "FrameLocalDiscriminator": lambda: dd.FrameLocalDiscriminator(seg_disc=cfg.seg_disc, dtype=d),
        "FrameSNDiscriminator": lambda: dd.FrameSNDiscriminator(seg_disc=cfg.seg_disc, dtype=d),
        "FrameSNLocalDiscriminator": lambda: dd.FrameSNLocalDiscriminator(seg_disc=cfg.seg_disc, dtype=d),
        "VideoDiscriminator": lambda: dd.VideoDiscriminator(seg_disc=cfg.seg_disc, dtype=d),
        "VideoLocalDiscriminator": lambda: dd.VideoLocalDiscriminator(seg_disc=cfg.seg_disc, dtype=d),
        "VideoSNDiscriminator": lambda: dd.VideoSNDiscriminator(seg_disc=cfg.seg_disc, dtype=d),
        "VideoSNLocalDiscriminator": lambda: dd.VideoSNLocalDiscriminator(seg_disc=cfg.seg_disc, dtype=d),
    }
    if name in simple:
        return simple[name]()
    from deep_video_interpolation_extrapolation_tpu.models import detdisc
    return detdisc.build(name, cfg, dtype=d)


def build_model(cfg: Config):
    """Build the composite head named by ``cfg.model`` (--model)."""
    from deep_video_interpolation_extrapolation_tpu.models import composite as cp
    heads = {
        "InterNet": cp.InterNet,
        "InterRefineNet": cp.InterRefineNet,
        "InterStage3Net": cp.InterStage3Net,
        "InterGANNet": cp.InterGANNet,
        "ExtraNet": cp.ExtraNet,
        "ExtraInpaintNet": cp.ExtraInpaintNet,
    }
    if cfg.model in heads:
        return heads[cfg.model](cfg=cfg)
    # legacy generators / heads remain addressable by the reference names
    from deep_video_interpolation_extrapolation_tpu.models import (
        gridnet,
        legacy_gen,
        legacy_heads,
        vae_video,
    )
    from deep_video_interpolation_extrapolation_tpu.models.unet import UNet, SepUNet
    d = compute_dtype(cfg)
    legacy = {
        "UNet": lambda: UNet(dtype=d),
        "SepUNet": lambda: SepUNet(dtype=d),
        "MyFRRN": lambda: legacy_gen.MyFRRN(mode=cfg.mode, dtype=d),
        "PSPNet": lambda: legacy_gen.PSPNet(mode=cfg.mode, dtype=d),
        "PSPNetV2": lambda: legacy_gen.PSPNetV2(mode=cfg.mode, dtype=d),
        "B2SNet": lambda: legacy_gen.B2SNet(dtype=d),
        "GridNet": lambda: gridnet.GridNet(mode=cfg.mode, dtype=d),
        "GAN": lambda: legacy_heads.GAN(mode=cfg.mode, dtype=d),
        "RefineNet": lambda: legacy_heads.RefineNet(cfg=cfg, dtype=d),
        "RefineGAN": lambda: legacy_heads.RefineGAN(cfg=cfg, dtype=d),
        "VAE": lambda: vae_video.VAE(vid_length=cfg.vid_length, dtype=d),
        "VAE_S": lambda: vae_video.VAE_S(vid_length=cfg.vid_length, dtype=d),
        "VAE_SD": lambda: vae_video.VAE_SD(vid_length=cfg.vid_length, dtype=d),
    }
    if cfg.model in legacy:
        return legacy[cfg.model]()
    raise KeyError(cfg.model)
