"""Stage-3 multi-scale patch-correlation attention refiners.

Flax NHWC rewrites of the reference stage-3 zoo (nets/refine_nets.py):
- ``MSResAttnRefine``   (refine_nets.py:138-399): per-scale loop, window 5x9
  correlation at 1/4 feature resolution, dual-stream (attn + dilated img).
- ``MSResAttnRefineV2`` (refine_nets.py:403-704): 3-level coarse-to-fine
  pyramid, window 5x5 correlation computed at 1/4 of each level then
  bilinearly upsampled x4 before the softmax; low-level prob maps re-warp
  higher-level neighbor features.
- ``MSResAttnRefineV2Base`` (refine_nets.py:709-930): ablation without
  attention (plain sum of neighbor features).
- ``MSResAttnRefineV3`` (refine_nets.py:934-1246): V2 with ResnetBlocks and
  a direct-residual fuse at upper levels.

The correlation/aggregation cores use the shift-accumulate formulation in
``ops/corr.py`` (see that module for why it beats unfold on TPU).
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from deep_video_interpolation_extrapolation_tpu.models.blocks import (
    Conv,
    ConvT,
    ConvLReLU,
    ResnetBlock,
    lrelu,
)
from deep_video_interpolation_extrapolation_tpu.ops.corr import (
    argmax_flow,
    window_aggregate,
    window_aggregate_per_neighbor,
    window_correlation,
)
from deep_video_interpolation_extrapolation_tpu.ops.resize import (
    avg_pool,
    interpolate_bilinear,
)

Dtype = Any


def _corr_probmap(
    x, t_for, t_back, win_h, win_w, prop: bool,
    upsample4: bool = False, prop_window: Tuple[int, int] = (3, 5),
):
    """Cosine window correlation -> (prob_map, flow_map).

    ``upsample4`` mirrors the V2/V3 variants that compute similarity at 1/4
    resolution and bilinearly upsample the sim logits x4 before the softmax
    (refine_nets.py:596-599).  ``prop`` applies the count_include_pad=False
    avg-pool smoothing (refine_nets.py:283-285,600-602).
    """
    sim = window_correlation(x, [t_for, t_back], win_h, win_w)
    flow = argmax_flow(sim, 2, win_h, win_w)
    if upsample4:
        sim = interpolate_bilinear(sim, scale_factor=4.0, align_corners=True)
    prob = jax.nn.softmax(sim, axis=-1)
    if prop:
        ph, pw = prop_window
        prob = avg_pool(
            prob, (ph, pw), stride=(1, 1),
            padding=((ph // 2, ph // 2), (pw // 2, pw // 2)),
            count_include_pad=False,
        )
    return prob, flow


class MSResAttnRefine(nn.Module):
    """V1: per-scale dual-stream attention refiner (refine_nets.py:138-399).

    Call: ``(coarse_img, coarse_seg_soft, neighbors_img(B,H,W,6),
    neighbors_seg(B,H,W,40))`` -> (outputs list, flow_maps list).
    """
    n_scales: int = 1
    stage3_prop: bool = False
    win_h: int = 5
    win_w: int = 9
    dtype: Optional[Dtype] = None
    # activations sharded over a spatial mesh axis: bypass the fused Pallas
    # window-attention (its halo-row tiling assumes full spatial extents)
    spatial_sharded: bool = False

    @nn.compact
    def __call__(self, coarse_img, coarse_seg, neighbors_img, neighbors_seg,
                 train: bool = True):
        d = self.dtype

        def seq(name, specs):
            mods = [
                ConvLReLU(ch, 3, stride=stride, dilation=dil, dtype=d,
                          name=f"{name}_{i}")
                for i, (ch, stride, dil) in enumerate(specs)
            ]
            def apply(x):
                for m in mods:
                    x = m(x)
                return x
            return apply

        input_layer = seq("input_layer", [(32, 1, 1), (64, 1, 1)])
        attn_input = seq("attn_input_layer", [(64, 1, 1), (64, 1, 1)])
        attn_enc1 = seq("attn_encoder_1", [(64, 2, 1), (64, 1, 1)])
        attn_enc2 = seq("attn_encoder_2", [(128, 2, 1), (128, 1, 1)])
        attn_fuse = seq("attn_fuse_layer", [(128, 1, 1), (128, 1, 1)])
        attn_img_fuse = seq("attn_img_fuse_layer", [(128, 1, 1), (128, 1, 1)])
        img_input = seq("img_input_layer", [(64, 1, 1), (64, 1, 1)])
        img_enc1 = seq("img_encoder_1", [(64, 2, 1), (64, 1, 1)])
        img_enc2 = seq("img_encoder_2", [(128, 2, 1), (128, 1, 1)])
        img_atrous = seq("img_atrous_layer",
                         [(128, 1, 1), (128, 1, 2), (128, 1, 4), (128, 1, 8)])
        img_fuse = seq("img_fuse_layer", [(128, 1, 1), (128, 1, 1)])
        dec2_t = ConvT(64, dtype=d, name="decoder_2_t")
        dec2_r = ResnetBlock(64, dtype=d, name="decoder_2_r")
        dec1_t = ConvT(64, dtype=d, name="decoder_1_t")
        dec1_r = ResnetBlock(64, dtype=d, name="decoder_1_r")
        out_l = seq("output_layer", [(64, 1, 1), (32, 1, 1)])
        out_conv = Conv(3, 3, dtype=d, name="output_conv")

        img1, img2 = neighbors_img[..., :3], neighbors_img[..., 3:6]
        seg1, seg2 = neighbors_seg[..., :20], neighbors_seg[..., 20:40]
        x_comb = jnp.concatenate([coarse_img, coarse_seg], axis=-1)
        for_comb = jnp.concatenate([img1, seg1], axis=-1)
        back_comb = jnp.concatenate([img2, seg2], axis=-1)

        prob_maps: List[jnp.ndarray] = []
        flow_maps: List[jnp.ndarray] = []
        outputs: List[jnp.ndarray] = []
        for scale_idx in range(self.n_scales - 1, -1, -1):
            scale = 1.0 / (2 ** scale_idx)
            def sc(t):
                return interpolate_bilinear(t, scale_factor=scale, align_corners=True) \
                    if scale != 1.0 else t
            xs, fs, bs = sc(x_comb), sc(for_comb), sc(back_comb)

            x_in = input_layer(xs)
            f_in = input_layer(fs)
            b_in = input_layer(bs)
            x_e2 = attn_enc2(attn_enc1(attn_input(x_in)))
            f_e2 = attn_enc2(attn_enc1(attn_input(f_in)))
            b_e2 = attn_enc2(attn_enc1(attn_input(b_in)))

            f_w, b_w = f_e2, b_e2
            if scale != 1.0 / (2 ** (self.n_scales - 1)):
                for k in range(len(prob_maps)):
                    low = interpolate_bilinear(
                        prob_maps[k], scale_factor=float(2 ** (len(prob_maps) - k)),
                        align_corners=True)
                    f_w, b_w = window_aggregate_per_neighbor(
                        [f_w, b_w], low, self.win_h, self.win_w)
                f_w = attn_fuse(f_w)
                b_w = attn_fuse(b_w)

            if self.n_scales == 1 and not self.stage3_prop:
                # hot path: single-scale attention without prob-map reuse —
                # one fused VMEM pass (ops/pallas_corr.py) when it fits,
                # XLA composition otherwise; identical numerics.
                from deep_video_interpolation_extrapolation_tpu.ops import (
                    pallas_corr,
                )
                bh, bw_, bc = x_e2.shape[1], x_e2.shape[2], x_e2.shape[3]
                from deep_video_interpolation_extrapolation_tpu.core.hw import (
                    pallas_enabled,
                )
                on_tpu = pallas_enabled()
                if (on_tpu and not self.spatial_sharded
                        and pallas_corr.fits_vmem(bh, bw_, bc, bc)):
                    agg, flow4 = pallas_corr.fused_window_attention(
                        x_e2, f_w, b_w, f_e2, b_e2, self.win_h, self.win_w)
                else:
                    agg, flow4 = pallas_corr.fused_window_attention_reference(
                        x_e2, f_w, b_w, f_e2, b_e2, self.win_h, self.win_w)
                flow = jnp.stack(
                    [flow4[..., 0:2], flow4[..., 2:4]], axis=1)
                flow_maps.append(flow)
            else:
                prob, flow = _corr_probmap(
                    x_e2, f_w, b_w, self.win_h, self.win_w, self.stage3_prop)
                prob_maps.append(prob)
                flow_maps.append(flow)
                agg = window_aggregate(
                    [f_e2, b_e2], prob, self.win_h, self.win_w)
            attn_fused = attn_img_fuse(jnp.concatenate([x_e2, agg], axis=-1))

            im = img_input(jnp.concatenate([x_in, f_in, b_in], axis=-1))
            im1 = img_enc1(im)
            im2 = img_enc2(im1)
            atrous = img_atrous(im2)

            fused = img_fuse(jnp.concatenate([atrous, attn_fused], axis=-1))
            d2 = dec2_r(lrelu(dec2_t(fused)))
            d1 = dec1_r(lrelu(dec1_t(d2 + im1)))
            outputs.append(out_conv(out_l(d1 + im)))
        return outputs, flow_maps


class _PyramidAttnRefine(nn.Module):
    """Shared 3-level coarse-to-fine skeleton for V2 / V2Base / V3."""
    variant: str = "v2"        # v2 | v2base | v3
    stage3_prop: bool = False
    dtype: Optional[Dtype] = None
    win: int = 5

    @nn.compact
    def __call__(self, coarse_img, coarse_seg, neighbors_img, neighbors_seg,
                 train: bool = True):
        d = self.dtype
        res = self.variant == "v3"

        def seq(name, specs, resblocks=0):
            mods = [
                ConvLReLU(ch, 3, stride=stride, dtype=d, name=f"{name}_{i}")
                for i, (ch, stride) in enumerate(specs)
            ]
            res_mods = [
                ResnetBlock(specs[-1][0], dtype=d, name=f"{name}_res{i}")
                for i in range(resblocks)
            ]
            def apply(x):
                for m in mods:
                    x = m(x)
                for m in res_mods:
                    x = m(x)
                return x
            return apply

        nres = 2 if res else 0
        input_layer = seq("input_layer", [(32, 1), (32, 1)], nres)
        enc1 = seq("encoder_layer_1", [(32, 1)] + ([] if res else [(32, 1)]), nres)
        enc2 = seq("encoder_layer_2", [(64, 2), (64, 1)] + ([] if res else [(64, 1)]), nres)
        enc3 = seq("encoder_layer_3", [(128, 2), (128, 1)] + ([] if res else [(128, 1)]), nres)
        down1 = seq("attn_down_layer_1", [(64, 2), (128, 2), (128, 1)])
        down2 = seq("attn_down_layer_2", [(128, 2), (256, 2), (256, 1)])
        down3 = seq("attn_down_layer_3", [(256, 2), (512, 2), (512, 1)])
        tf1 = seq("layer_1_neighbor_tf", [(32, 1), (32, 1)], nres)
        tf2 = seq("layer_2_neighbor_tf", [(64, 1), (64, 1)], nres)
        fuse3 = seq("layer_3_fuse", [(256, 1), (128, 1)], nres)
        if self.variant != "v3":
            fuse2 = seq("layer_2_fuse", [(128, 1), (64, 1)])
            fuse1 = seq("layer_1_fuse", [(64, 1), (32, 1)])

        def deconv_block(name, ch):
            convt = ConvT(ch, dtype=d, name=f"{name}_t")
            conv = ConvLReLU(ch, 3, dtype=d, name=f"{name}_c")
            if res:
                tail = [ResnetBlock(ch, dtype=d, name=f"{name}_r0"),
                        ResnetBlock(ch, dtype=d, name=f"{name}_r1")]
            else:
                tail = [ConvLReLU(ch, 3, dtype=d, name=f"{name}_c2")]
            def apply(x):
                x = conv(lrelu(convt(x)))
                for m in tail:
                    x = m(x)
                return x
            return apply

        dec3 = deconv_block("decoder_layer_3", 64)
        dec2 = deconv_block("decoder_layer_2", 32)

        def out_block(name, chs):
            if res:
                body = [ConvLReLU(chs[1], 3, dtype=d, name=f"{name}_0"),
                        ResnetBlock(chs[1], dtype=d, name=f"{name}_r0"),
                        ResnetBlock(chs[1], dtype=d, name=f"{name}_r1")]
            else:
                body = [ConvLReLU(chs[0], 3, dtype=d, name=f"{name}_0"),
                        ConvLReLU(chs[1], 3, dtype=d, name=f"{name}_1")]
            final = Conv(3, 3, dtype=d, name=f"{name}_out")
            def apply(x):
                for m in body:
                    x = m(x)
                return final(x)
            return apply

        out3 = out_block("out_layer_3", (128, 64))
        out2 = out_block("out_layer_2", (64, 32))
        out1 = out_block("out_layer_1", (32, 32))

        img1, img2 = neighbors_img[..., :3], neighbors_img[..., 3:6]
        seg1, seg2 = neighbors_seg[..., :20], neighbors_seg[..., 20:40]
        x_comb = jnp.concatenate([coarse_img, coarse_seg], axis=-1)
        for_comb = jnp.concatenate([img1, seg1], axis=-1)
        back_comb = jnp.concatenate([img2, seg2], axis=-1)

        def pyramid(t):
            l0 = input_layer(t)
            e1 = enc1(l0)
            e2 = enc2(e1)
            e3 = enc3(e2)
            return [e3, e2, e1]   # coarse -> fine

        x_f = pyramid(x_comb)
        f_f = pyramid(for_comb)
        b_f = pyramid(back_comb)

        downs = [down3, down2, down1]
        tfs = [None, tf2, tf1]
        fuses = [fuse3, None if self.variant == "v3" else fuse2,
                 None if self.variant == "v3" else fuse1]
        decs = [dec3, dec2, None]
        outs = [out3, out2, out1]

        prob_maps: List[jnp.ndarray] = []
        flow_maps: List[jnp.ndarray] = []
        outputs: List[jnp.ndarray] = []
        fused_prev = None
        for i in range(3):
            if self.variant != "v2base":
                for k in range(len(prob_maps)):
                    low = interpolate_bilinear(
                        prob_maps[k], scale_factor=float(2 ** (len(prob_maps) - k)),
                        align_corners=True)
                    f_f[i], b_f[i] = window_aggregate_per_neighbor(
                        [f_f[i], b_f[i]], low, self.win, self.win)
            if i != 0:
                f_f[i] = tfs[i](f_f[i])
                b_f[i] = tfs[i](b_f[i])

            if self.variant == "v2base":
                agg = f_f[i] + b_f[i]
                fused = fuses[i](jnp.concatenate([x_f[i], agg], axis=-1))
            else:
                dx = downs[i](x_f[i])
                dfor = downs[i](f_f[i])
                dback = downs[i](b_f[i])
                prob, flow = _corr_probmap(
                    dx, dfor, dback, self.win, self.win, self.stage3_prop,
                    upsample4=True, prop_window=(3, 3))
                prob_maps.append(prob)
                flow_maps.append(flow)
                agg = window_aggregate([f_f[i], b_f[i]], prob, self.win, self.win)
                if self.variant == "v3" and i != 0:
                    fused = agg
                else:
                    fused = fuses[i](jnp.concatenate([x_f[i], agg], axis=-1))
            if i != 0:
                fused = fused + fused_prev
            if i != 2:
                fused_prev = decs[i](fused)
            outputs.append(outs[i](fused))
        return outputs, (flow_maps if self.variant != "v2base" else None)


def MSResAttnRefineV2(stage3_prop: bool = False, dtype=None, **kw):
    return _PyramidAttnRefine(variant="v2", stage3_prop=stage3_prop, dtype=dtype, **kw)


def MSResAttnRefineV2Base(stage3_prop: bool = False, dtype=None, **kw):
    return _PyramidAttnRefine(variant="v2base", stage3_prop=stage3_prop, dtype=dtype, **kw)


def MSResAttnRefineV3(stage3_prop: bool = False, dtype=None, **kw):
    return _PyramidAttnRefine(variant="v3", stage3_prop=stage3_prop, dtype=dtype, **kw)
