"""Flow-based video VAE family (reference nets/VAE.py, VAE_S.py, VAE_SD.py).

frame1 + latent motion code -> per-step forward/backward flows + occlusion
masks -> backward-warp frame1 into ``vid_length`` future frames -> optional
encoder-decoder refinement.  The three variants differ in how segmentation
conditions the posterior:

- ``VAE``   (nets/VAE.py:15-149): first-frame seg embedding only; fg/bg
  posterior split latent 896/128; refine on rgb (3 ch).
- ``VAE_S`` (nets/VAE_S.py): per-frame seg embeddings in the posterior, the
  motion input is frame differences, refine on rgb+seg (23 ch); latent
  512/512.
- ``VAE_SD``: VAE_S plus disparity channel handling (identical module
  structure; the disparity enters as an extra mask channel upstream).

TPU redesign notes:
- time is an explicit axis (B, T, ...) end-to-end — no chunk/unbind folds;
- warping uses ops.warp.backward_warp (grid = base - flow);
- the frozen VGG perceptual features the reference computes *inside*
  forward (nets/VAE.py:137-143) live in the loss layer here, keeping the
  model a pure function.

Returns (train): (output, y_pred, mu, logvar, flow, flowback, mask_fw,
mask_bw); (eval): (output, y_pred, flow, flowback, mask_fw, mask_bw).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from deep_video_interpolation_extrapolation_tpu.models.blocks import Conv
from deep_video_interpolation_extrapolation_tpu.models.subnets import (
    ConvBase,
    FlowDecoder,
    FlowEncoder,
    FrameEncoder,
    GetFlow,
    GetFrames,
    GetOcclusionMask,
    LegacyRefineNet,
    SegEncoderBN,
)
from deep_video_interpolation_extrapolation_tpu.ops.warp import backward_warp

Dtype = Any


class VideoVAE(nn.Module):
    """Shared implementation; ``variant`` in {'vae', 'vae_s', 'vae_sd'}."""
    vid_length: int = 1
    variant: str = "vae"
    refine: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, rgb_seq, seg_seq, bg_mask, fg_mask, noise_bg=None,
                 z_m=None, train: bool = True):
        """rgb_seq (B, T+1, H, W, 3) in [0,1]; seg_seq (B, T+1, H, W, 20)
        one-hot; masks (B, T+1, H, W, 1); noise_bg (B, H, W, 3)."""
        t = self.vid_length
        b, _, h, w, _ = rgb_seq.shape
        frame1 = rgb_seq[:, 0]
        future = rgb_seq[:, 1:]

        seg_enc = SegEncoderBN(dtype=self.dtype, name="seg_encoder")
        if self.variant == "vae":
            seg0 = seg_enc(seg_seq[:, 0], train)
            fg_seg = seg0 * fg_mask[:, 0]
            bg_seg = seg0 * bg_mask[:, 0]
            latent_bg, latent_fg = 128, 896
            y = jnp.concatenate(
                [frame1] + [future[:, i] for i in range(t)], axis=-1)
        else:  # vae_s / vae_sd: per-frame embeddings, difference motion
            segs = [seg_enc(seg_seq[:, i], train) for i in range(t + 1)]
            fg_seg = jnp.concatenate(
                [segs[i] * fg_mask[:, i] for i in range(t + 1)], axis=-1)
            bg_seg = jnp.concatenate(
                [segs[i] * bg_mask[:, i] for i in range(t + 1)], axis=-1)
            seg0 = segs[0]
            latent_bg, latent_fg = 512, 512
            y = jnp.concatenate(
                [frame1] + [future[:, i] - frame1 for i in range(t)], axis=-1)

        x_in = jnp.concatenate([frame1, seg0], axis=-1)
        enco1, enco2, enco3, codex = FrameEncoder(
            dtype=self.dtype, name="encoder")(x_in, train)

        mu = logvar = None
        if z_m is None:
            if train:
                mu_bg, logvar_bg = FlowEncoder(
                    latent_bg, dtype=self.dtype, name="flow_encoder_bg")(
                        jnp.concatenate([y, bg_seg], -1), train)
                mu_fg, logvar_fg = FlowEncoder(
                    latent_fg, dtype=self.dtype, name="flow_encoder_fg")(
                        jnp.concatenate([y, fg_seg], -1), train)
                mu = jnp.concatenate([mu_bg, mu_fg], axis=-1)
                logvar = jnp.concatenate([logvar_bg, logvar_fg], axis=-1)
                eps = jax.random.normal(self.make_rng("noise"), mu.shape, mu.dtype)
                z_m = mu + eps * jnp.exp(0.5 * logvar)
            else:
                z_m = jax.random.normal(
                    self.make_rng("noise"), (b, latent_bg + latent_fg),
                    frame1.dtype)

        zh, zw = codex.shape[1], codex.shape[2]
        fc = nn.Dense(48 * zh * zw, dtype=self.dtype, name="fc")(z_m)
        fc = fc.reshape(b, zh, zw, 48)
        codey = ConvBase(16 * t, dtype=self.dtype, name="zconv")(
            jnp.concatenate([fc, codex], axis=-1))
        codey = codey.reshape(b, zh, zw, t, 16).transpose(0, 3, 1, 2, 4)
        codex_t = jnp.broadcast_to(
            codex[:, None], (b, t) + codex.shape[1:])
        z = jnp.concatenate([codex_t, codey], axis=-1)  # (B,T,zh,zw,272)

        deco = FlowDecoder(t, dtype=self.dtype, name="flow_decoder")(
            enco1, enco2, enco3, z, train)  # (B,T,H,W,64)
        df = deco.reshape((b * t,) + deco.shape[2:])
        flow = GetFlow(dtype=self.dtype, name="flownext")(df, train)
        flowback = GetFlow(dtype=self.dtype, name="flowprev")(df, train)
        masks = GetOcclusionMask(dtype=self.dtype, name="get_mask")(df, train)
        flow = flow.reshape(b, t, h, w, 2)
        flowback = flowback.reshape(b, t, h, w, 2)
        masks = masks.reshape(b, t, h, w, 2)
        mask_fw = masks[..., 0:1]
        mask_bw = masks[..., 1:2]

        # masked backward warp of frame1 per step (utils/net_utils.py:116-122)
        outs = []
        for i in range(t):
            outs.append(backward_warp(frame1, flow[:, i] * mask_fw[:, i]))
        output = jnp.stack(outs, axis=1)  # (B, T, H, W, 3)

        y_pred = output
        if self.refine:
            nc = 3 if self.variant == "vae" else 23
            refine_net = LegacyRefineNet(nc, dtype=self.dtype, name="refine_net")
            if noise_bg is None:
                noise_bg = jnp.zeros_like(frame1)
            noise = noise_bg
            if nc == 23:
                noise = jnp.concatenate(
                    [noise_bg, jnp.zeros((b, h, w, 20), noise_bg.dtype)], -1)
            preds = []
            for i in range(t):
                inp = output[:, i] * mask_fw[:, i]
                if nc == 23:
                    inp = jnp.concatenate(
                        [inp, jnp.zeros((b, h, w, 20), inp.dtype)], -1)
                inp = inp + noise * (1.0 - mask_fw[:, i])
                preds.append(refine_net(inp, flow[:, i], train)[..., :3])
            y_pred = jnp.stack(preds, axis=1)

        if train:
            return output, y_pred, mu, logvar, flow, flowback, mask_fw, mask_bw
        return output, y_pred, flow, flowback, mask_fw, mask_bw


def VAE(vid_length: int = 1, dtype=None) -> VideoVAE:
    return VideoVAE(vid_length=vid_length, variant="vae", dtype=dtype)


def VAE_S(vid_length: int = 1, dtype=None) -> VideoVAE:
    return VideoVAE(vid_length=vid_length, variant="vae_s", dtype=dtype)


def VAE_SD(vid_length: int = 1, dtype=None) -> VideoVAE:
    return VideoVAE(vid_length=vid_length, variant="vae_sd", dtype=dtype)
