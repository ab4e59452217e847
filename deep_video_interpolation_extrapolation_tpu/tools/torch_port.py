"""Torch -> Flax checkpoint conversion for the reference's models.

Converts reference ``torch.save`` checkpoints (runners/InterTrainer.py:
867-886 format: per-submodel ``state_dict``s keyed 'coarse_model',
'refine_model', ...) into this framework's parameter trees, so users can
bring trained reference weights across.  The per-model mapping functions
are verified by the torch-oracle parity tests (tests/test_hrnet_parity.py,
test_srn_parity.py, test_attn_parity.py): random reference weights ported
through these functions reproduce the reference's forward outputs.

Conventions:
- conv weights: torch OIHW -> flax HWIO (transpose (2, 3, 1, 0));
- transposed conv: torch (in, out, kh, kw) -> flax (kh, kw, in, out) with a
  180-degree spatial flip (flax conv_transpose is the conv gradient);
- VGG19: see models/features.load_torch_vgg19_state.
"""

from __future__ import annotations

from typing import Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np


def conv_w(sd: Mapping, name: str) -> jnp.ndarray:
    """torch conv weight OIHW -> flax HWIO."""
    return jnp.asarray(np.transpose(np.asarray(sd[name]), (2, 3, 1, 0)))


def convT_w(sd: Mapping, name: str) -> jnp.ndarray:
    """torch ConvTranspose2d weight -> flax ConvTranspose kernel."""
    w = np.transpose(np.asarray(sd[name]), (2, 3, 0, 1))
    return jnp.asarray(w[::-1, ::-1].copy())


def vec(sd: Mapping, name: str) -> jnp.ndarray:
    return jnp.asarray(np.asarray(sd[name]))


def port_hrnet(sd: Mapping, params: Dict) -> Dict:
    """Map a reference HRNet state_dict onto our HRNet params
    (verified: tests/test_hrnet_parity.py)."""
    p = jax.tree_util.tree_map(lambda x: x, params)
    se = p["seg_encoder"]
    for cv, tid in (("Conv_0", 0), ("Conv_1", 2), ("Conv_2", 4)):
        se[cv]["kernel"] = conv_w(sd, f"seg_encoder.{tid}.weight")
        se[cv]["bias"] = vec(sd, f"seg_encoder.{tid}.bias")
    bb = p["backbone"]
    for cv in ("conv1", "conv2"):
        bb[cv]["kernel"] = conv_w(sd, f"{cv}.weight")
        bb[cv]["bias"] = vec(sd, f"{cv}.bias")
    for i in range(4):
        blk = bb[f"layer1_{i}"]
        blk["Conv_0"]["kernel"] = conv_w(sd, f"layer1.{i}.conv1.weight")
        blk["Conv_1"]["kernel"] = conv_w(sd, f"layer1.{i}.conv2.weight")
        blk["Conv_2"]["kernel"] = conv_w(sd, f"layer1.{i}.conv3.weight")
        if f"layer1.{i}.downsample.0.weight" in sd:
            blk["Conv_3"]["kernel"] = conv_w(
                sd, f"layer1.{i}.downsample.0.weight")
    bb["transition1"]["trans_0"]["kernel"] = conv_w(
        sd, "transition1.0.0.weight")
    bb["transition1"]["trans_1_0"]["kernel"] = conv_w(
        sd, "transition1.1.0.0.weight")
    bb["transition2"]["trans_2_0"]["kernel"] = conv_w(
        sd, "transition2.2.0.0.weight")
    for stage, n_br in (("stage2", 2), ("stage3", 3)):
        sp = bb[stage]
        for br in range(n_br):
            for k in range(4):
                blk = sp[f"BasicBlock_{br * 4 + k}"]
                blk["Conv_0"]["kernel"] = conv_w(
                    sd, f"{stage}.0.branches.{br}.{k}.conv1.weight")
                blk["Conv_1"]["kernel"] = conv_w(
                    sd, f"{stage}.0.branches.{br}.{k}.conv2.weight")
        for i in range(n_br):
            for j in range(n_br):
                if j > i:
                    sp[f"fuse_{i}_{j}"]["kernel"] = conv_w(
                        sd, f"{stage}.0.fuse_layers.{i}.{j}.0.weight")
                elif j < i:
                    for k in range(i - j):
                        sp[f"fuse_{i}_{j}_{k}"]["kernel"] = conv_w(
                            sd, f"{stage}.0.fuse_layers.{i}.{j}.{k}.0.weight")
    for head in ("rgb_layer", "seg_layer"):
        hp = p[head]
        hp["Conv_0"]["kernel"] = conv_w(sd, f"{head}.0.weight")
        hp["Conv_0"]["bias"] = vec(sd, f"{head}.0.bias")
        hp["Conv_1"]["kernel"] = conv_w(sd, f"{head}.2.weight")
        hp["Conv_1"]["bias"] = vec(sd, f"{head}.2.bias")
    return p


def port_srn_refine(sd: Mapping, params: Dict) -> Dict:
    """Map a reference SRNRefine state_dict onto our params
    (verified: tests/test_srn_parity.py)."""
    p = jax.tree_util.tree_map(lambda x: x, params)
    core = p["core"]

    def conv(dst, tname):
        dst["kernel"] = conv_w(sd, tname + ".weight")
        if tname + ".bias" in sd:
            dst["bias"] = vec(sd, tname + ".bias")

    def clrelu(i, tname):
        conv(core[f"ConvLReLU_{i}"]["Conv_0"], tname)

    def res(i, tname):
        conv(core[f"ResnetBlock_{i}"]["Conv_0"], tname + ".conv.0")
        conv(core[f"ResnetBlock_{i}"]["Conv_1"], tname + ".conv.2")

    clrelu(0, "input_layer.0")
    clrelu(1, "input_layer.2")
    clrelu(2, "input_layer.4")
    for k, t in enumerate((6, 7, 8)):
        res(k, f"input_layer.{t}")
    clrelu(3, "encoder_1.0")
    for k, t in enumerate((2, 3, 4)):
        res(3 + k, f"encoder_1.{t}")
    clrelu(4, "encoder_2.0")
    for k, t in enumerate((2, 3, 4)):
        res(6 + k, f"encoder_2.{t}")
    for k, t in enumerate((0, 2, 4, 6)):
        clrelu(5 + k, f"bottle_dilated.{t}")
    clrelu(9, "hidden_comb.0")
    clrelu(10, "hidden_comb.2")
    for k in range(3):
        res(9 + k, f"decoder_2.{k}")
    ct0 = core["ConvT_0"]["ConvTranspose_0"]
    ct0["kernel"] = convT_w(sd, "decoder_2.3.weight")
    ct0["bias"] = vec(sd, "decoder_2.3.bias")
    for k in range(3):
        res(12 + k, f"decoder_1.{k}")
    ct1 = core["ConvT_1"]["ConvTranspose_0"]
    ct1["kernel"] = convT_w(sd, "decoder_1.3.weight")
    ct1["bias"] = vec(sd, "decoder_1.3.bias")
    for k in range(3):
        res(15 + k, f"output_layer.{k}")
    clrelu(11, "output_layer.3")
    conv(core["Conv_0"], "output_layer.5")
    return p


_ATTN_CONV_PAIRS = [
    ("input_layer_0", "input_layer.0"), ("input_layer_1", "input_layer.2"),
    ("attn_input_layer_0", "attn_input_layer.0"),
    ("attn_input_layer_1", "attn_input_layer.2"),
    ("attn_encoder_1_0", "attn_encoder_1.0"),
    ("attn_encoder_1_1", "attn_encoder_1.2"),
    ("attn_encoder_2_0", "attn_encoder_2.0"),
    ("attn_encoder_2_1", "attn_encoder_2.2"),
    ("attn_fuse_layer_0", "attn_fuse_layer.0"),
    ("attn_fuse_layer_1", "attn_fuse_layer.2"),
    ("attn_img_fuse_layer_0", "attn_img_fuse_layer.0"),
    ("attn_img_fuse_layer_1", "attn_img_fuse_layer.2"),
    ("img_input_layer_0", "img_input_layer.0"),
    ("img_input_layer_1", "img_input_layer.2"),
    ("img_encoder_1_0", "img_encoder_1.0"),
    ("img_encoder_1_1", "img_encoder_1.2"),
    ("img_encoder_2_0", "img_encoder_2.0"),
    ("img_encoder_2_1", "img_encoder_2.2"),
    ("img_atrous_layer_0", "img_atrous_layer.0"),
    ("img_atrous_layer_1", "img_atrous_layer.2"),
    ("img_atrous_layer_2", "img_atrous_layer.4"),
    ("img_atrous_layer_3", "img_atrous_layer.6"),
    ("img_fuse_layer_0", "img_fuse_layer.0"),
    ("img_fuse_layer_1", "img_fuse_layer.2"),
    ("output_layer_0", "output_layer.0"),
    ("output_layer_1", "output_layer.2"),
]


def port_ms_res_attn_refine(sd: Mapping, params: Dict) -> Dict:
    """Map a reference MSResAttnRefine state_dict onto our params
    (verified: tests/test_attn_parity.py)."""
    p = jax.tree_util.tree_map(lambda x: x, params)

    def conv(dst, tname):
        dst["kernel"] = conv_w(sd, tname + ".weight")
        dst["bias"] = vec(sd, tname + ".bias")

    for ours, theirs in _ATTN_CONV_PAIRS:
        if ours in p:
            conv(p[ours]["Conv_0"], theirs)
    conv(p["output_conv"], "output_layer.4")
    for dec in ("decoder_2", "decoder_1"):
        ct = p[f"{dec}_t"]["ConvTranspose_0"]
        ct["kernel"] = convT_w(sd, f"{dec}.0.weight")
        ct["bias"] = vec(sd, f"{dec}.0.bias")
        conv(p[f"{dec}_r"]["Conv_0"], f"{dec}.2.conv.0")
        conv(p[f"{dec}_r"]["Conv_1"], f"{dec}.2.conv.2")
    return p


def _bn(sd: Mapping, prefix: str, dst_params: Dict, dst_stats: Dict) -> None:
    """torch BatchNorm2d -> flax BatchNorm (scale/bias params,
    running mean/var batch_stats)."""
    dst_params["scale"] = vec(sd, prefix + ".weight")
    dst_params["bias"] = vec(sd, prefix + ".bias")
    dst_stats["mean"] = vec(sd, prefix + ".running_mean")
    dst_stats["var"] = vec(sd, prefix + ".running_var")


def _latent_perm(zh: int, zw: int, c: int = 16) -> np.ndarray:
    """our-flat-index -> torch-flat-index for the VAE latent.

    torch flattens (C, zh, zw) channel-major (nets/HRNet.py:974,981); we
    flatten (zh, zw, C).  Element (y, x, ch) of the returned table holds
    the torch index ch*zh*zw + y*zw + x.
    """
    return np.transpose(
        np.arange(c * zh * zw).reshape(c, zh, zw), (1, 2, 0)).reshape(-1)


def port_vaehrnet(sd: Mapping, params: Dict, batch_stats: Dict,
                  zh: int = 8, zw: int = 8):
    """Map a reference VAEHRNet state_dict (nets/HRNet.py:702-1061) onto
    our VAEHRNet params + batch_stats (verified:
    tests/test_vaehrnet_parity.py).

    The HRNet portion shares the plain HRNet naming (port_hrnet).  The
    VAE encoder/decoder carry BatchNorms (running stats -> batch_stats),
    and the mu/logvar Linears need the latent flatten permutation: torch
    flattens the (16, 8, 8) code channel-major, we flatten (8, 8, 16).
    ``zh``/``zw`` are the latent spatial dims (the reference hard-codes
    8x8 = 128x128 inputs, nets/HRNet.py:762-763).
    """
    p = port_hrnet(sd, params)
    bs = jax.tree_util.tree_map(lambda x: x, batch_stats)

    # vae_encoder: Sequential conv/BN indices (nets/HRNet.py:722-761)
    enc = p["vae_encoder"]
    enc_bs = bs.setdefault("vae_encoder", {})
    for k, t in enumerate((0, 2, 5, 8, 11, 14, 17, 20, 23, 26, 29, 32)):
        enc[f"Conv_{k}"]["kernel"] = conv_w(sd, f"vae_encoder.{t}.weight")
        enc[f"Conv_{k}"]["bias"] = vec(sd, f"vae_encoder.{t}.bias")
    for k, t in enumerate((3, 6, 9, 12, 15, 18, 21, 24, 27, 30)):
        _bn(sd, f"vae_encoder.{t}", enc[f"BatchNorm_{k}"],
            enc_bs.setdefault(f"BatchNorm_{k}", {}))

    # vae_decoder: convT at 0/6/12/18, conv at 3/9/15/21, BN at
    # 1/4/7/10/13/16/19 (nets/HRNet.py:764-791)
    dec = p["vae_decoder"]
    dec_bs = bs.setdefault("vae_decoder", {})
    for k, t in enumerate((0, 6, 12, 18)):
        ct = dec[f"ConvT_{k}"]["ConvTranspose_0"]
        ct["kernel"] = convT_w(sd, f"vae_decoder.{t}.weight")
        ct["bias"] = vec(sd, f"vae_decoder.{t}.bias")
    for k, t in enumerate((3, 9, 15, 21)):
        dec[f"Conv_{k}"]["kernel"] = conv_w(sd, f"vae_decoder.{t}.weight")
        dec[f"Conv_{k}"]["bias"] = vec(sd, f"vae_decoder.{t}.bias")
    for k, t in enumerate((1, 4, 7, 10, 13, 16, 19)):
        _bn(sd, f"vae_decoder.{t}", dec[f"BatchNorm_{k}"],
            dec_bs.setdefault(f"BatchNorm_{k}", {}))

    # mu/logvar Linears with the flatten permutation on BOTH ends:
    # out = W[o_t, i_t] -> kernel[i_our, o_our] = W[perm[o_our], perm[i_our]]
    perm = _latent_perm(zh, zw)
    for name in ("mu_fc", "logvar_fc"):
        w = np.asarray(sd[f"{name}.weight"])        # (out_t, in_t)
        b = np.asarray(sd[f"{name}.bias"])
        p[name]["kernel"] = jnp.asarray(w[np.ix_(perm, perm)].T)
        p[name]["bias"] = jnp.asarray(b[perm])
    return p, bs


def port_pyramid_attn(sd: Mapping, params: Dict, variant: str = "v2") -> Dict:
    """Map a reference MSResAttnRefineV2 / V2Base / V3 state_dict
    (nets/refine_nets.py:403-704, 709-930, 934-1246) onto our
    _PyramidAttnRefine params (verified: tests/test_attn_parity.py).

    The three variants share submodule names; V3 swaps trailing convs for
    ResnetBlocks and drops layer_1/2_fuse, V2Base drops the attn_down
    layers (no correlation attention).
    """
    p = jax.tree_util.tree_map(lambda x: x, params)
    res = variant == "v3"

    def conv(dst, tname):
        dst["kernel"] = conv_w(sd, tname + ".weight")
        dst["bias"] = vec(sd, tname + ".bias")

    def group(name, conv_ids, res_ids=()):
        for k, t in enumerate(conv_ids):
            conv(p[f"{name}_{k}"]["Conv_0"], f"{name}.{t}")
        for k, t in enumerate(res_ids):
            conv(p[f"{name}_res{k}"]["Conv_0"], f"{name}.{t}.conv.0")
            conv(p[f"{name}_res{k}"]["Conv_1"], f"{name}.{t}.conv.2")

    if res:
        group("input_layer", (0, 2), (4, 5))
        group("encoder_layer_1", (0,), (2, 3))
        group("encoder_layer_2", (0, 2), (4, 5))
        group("encoder_layer_3", (0, 2), (4, 5))
        group("layer_1_neighbor_tf", (0, 2), (4, 5))
        group("layer_2_neighbor_tf", (0, 2), (4, 5))
        group("layer_3_fuse", (0, 2), (4, 5))
    else:
        group("input_layer", (0, 2))
        group("encoder_layer_1", (0, 2))
        group("encoder_layer_2", (0, 2, 4))
        group("encoder_layer_3", (0, 2, 4))
        group("layer_1_neighbor_tf", (0, 2))
        group("layer_2_neighbor_tf", (0, 2))
        group("layer_3_fuse", (0, 2))
        group("layer_1_fuse", (0, 2))
        group("layer_2_fuse", (0, 2))
    if variant != "v2base":
        for k in (1, 2, 3):
            group(f"attn_down_layer_{k}", (0, 2, 4))
    for k in (3, 2):
        name = f"decoder_layer_{k}"
        ct = p[f"{name}_t"]["ConvTranspose_0"]
        ct["kernel"] = convT_w(sd, f"{name}.0.weight")
        ct["bias"] = vec(sd, f"{name}.0.bias")
        conv(p[f"{name}_c"]["Conv_0"], f"{name}.2")
        if res:
            for j, t in ((0, 4), (1, 5)):
                conv(p[f"{name}_r{j}"]["Conv_0"], f"{name}.{t}.conv.0")
                conv(p[f"{name}_r{j}"]["Conv_1"], f"{name}.{t}.conv.2")
        else:
            conv(p[f"{name}_c2"]["Conv_0"], f"{name}.4")
    for k in (3, 2, 1):
        name = f"out_layer_{k}"
        if res:
            conv(p[f"{name}_0"]["Conv_0"], f"{name}.0")
            for j, t in ((0, 2), (1, 3)):
                conv(p[f"{name}_r{j}"]["Conv_0"], f"{name}.{t}.conv.0")
                conv(p[f"{name}_r{j}"]["Conv_1"], f"{name}.{t}.conv.2")
        else:
            conv(p[f"{name}_0"]["Conv_0"], f"{name}.0")
            conv(p[f"{name}_1"]["Conv_0"], f"{name}.2")
        conv(p[f"{name}_out"], f"{name}.4")
    return p


def port_track_gen(sd: Mapping, params: Dict) -> Dict:
    """Map a reference TrackGen / TrackGenV2 state_dict (nets/TrackGen.py:
    8-434; both share submodule names) onto our params (verified:
    tests/test_disc_parity.py::test_trackgen_unet_parity)."""
    p = jax.tree_util.tree_map(lambda x: x, params)
    unet = p["unet"]

    def conv_into(dst, tname):
        dst["kernel"] = conv_w(sd, tname + ".weight")
        dst["bias"] = vec(sd, tname + ".bias")

    for grp in ("encoder_1", "encoder_2", "encoder_3", "encoder_4",
                "bottom_layer", "decoder_4", "decoder_3", "decoder_2"):
        for k, t in enumerate((0, 2, 4)):
            conv_into(unet[f"{grp}_{k}"]["Conv_0"], f"{grp}.{t}")
    for k, t in enumerate((0, 2, 4)):
        dst = unet[f"decoder_1_{k}"]
        # V1's trailing conv is a ConvLReLU; V2's is a bare linear Conv
        conv_into(dst["Conv_0"] if "Conv_0" in dst else dst,
                  f"decoder_1.{t}")
    for up in ("up_4", "up_3", "up_2", "up_1"):
        ct = unet[up]["ConvTranspose_0"]
        ct["kernel"] = convT_w(sd, f"{up}.0.weight")
        ct["bias"] = vec(sd, f"{up}.0.bias")

    head = p["head"]
    conv_into(head["ConvLReLU_0"]["Conv_0"], "track_fusion_layer.0")
    conv_into(head["ConvLReLU_1"]["Conv_0"], "track_fusion_layer.2")
    conv_into(head["Conv_0"], "track_fusion_layer.4")
    for k, t in enumerate((0, 2, 4, 6, 8)):
        conv_into(head[f"ConvLReLU_{2 + k}"]["Conv_0"], f"fusion_layer.{t}")
    for stem in ("rgb_out", "seg_out"):
        conv_into(head[f"{stem}_0"]["Conv_0"], f"{stem}_layer.0")
        conv_into(head[f"{stem}_1"], f"{stem}_layer.2")
    return p


# --------------------------------------------------------------------------
# Discriminator families (reference nets/FrameDisc.py, nets/VidDisc.py).
# Each spec row maps our auto-named submodule to the torch Sequential index:
#   ("blk",  "_Block_k",    conv_idx, bn_idx|None)
#   ("res",  "_ResBlock_k", res_idx)            # ResnetBlock conv.0/conv.2
#   ("conv", "Conv_0",      conv_idx)           # bare top-level conv
_FRAME_DISC_SPEC = (
    ("blk", "_Block_0", 0, None), ("blk", "_Block_1", 2, 3),
    ("blk", "_Block_2", 5, None), ("res", "_ResBlock_0", 7),
    ("blk", "_Block_3", 8, None), ("res", "_ResBlock_1", 10),
    ("blk", "_Block_4", 11, None), ("res", "_ResBlock_2", 13),
    ("blk", "_Block_5", 14, None), ("res", "_ResBlock_3", 16),
    ("blk", "_Block_6", 17, None),
)
_FRAME_LOCAL_DISC_SPEC = (
    ("blk", "_Block_0", 0, None), ("blk", "_Block_1", 2, 3),
    ("blk", "_Block_2", 5, 6), ("blk", "_Block_3", 8, 9),
    ("blk", "_Block_4", 11, 12), ("blk", "_Block_5", 14, 15),
    ("blk", "_Block_6", 17, 18), ("conv", "Conv_0", 20),
)
_VIDEO_DISC_SPEC = (
    ("blk", "_Block_0", 0, None), ("blk", "_Block_1", 2, 3),
    ("blk", "_Block_2", 5, 6),
    ("blk", "_Block_3", 8, None), ("res", "_ResBlock_0", 10),
    ("blk", "_Block_4", 11, None), ("res", "_ResBlock_1", 13),
    ("blk", "_Block_5", 14, None), ("res", "_ResBlock_2", 16),
    ("blk", "_Block_6", 17, None), ("res", "_ResBlock_3", 19),
    ("blk", "_Block_7", 20, None),
)
_VIDEO_LOCAL_DISC_SPEC = (
    ("blk", "_Block_0", 0, None), ("blk", "_Block_1", 2, 3),
    ("blk", "_Block_2", 5, 6), ("blk", "_Block_3", 8, 9),
    ("blk", "_Block_4", 11, 12), ("blk", "_Block_5", 14, 15),
    ("blk", "_Block_6", 17, 18), ("blk", "_Block_7", 20, 21),
    ("blk", "_Block_8", 23, 24), ("blk", "_Block_9", 26, 27),
    ("blk", "_Block_10", 29, 30), ("blk", "_Block_11", 32, 33),
    ("conv", "Conv_0", 35),
)


def _port_disc(sd: Mapping, params: Dict, batch_stats: Dict, spec):
    p = jax.tree_util.tree_map(lambda x: x, params)
    bs = jax.tree_util.tree_map(lambda x: x, batch_stats)
    for row in spec:
        if row[0] == "blk":
            _, ours, ci, bi = row
            p[ours]["Conv_0"]["kernel"] = conv_w(sd, f"layer.{ci}.weight")
            p[ours]["Conv_0"]["bias"] = vec(sd, f"layer.{ci}.bias")
            if bi is not None:
                _bn(sd, f"layer.{bi}", p[ours]["BatchNorm_0"],
                    bs.setdefault(ours, {}).setdefault("BatchNorm_0", {}))
        elif row[0] == "res":
            _, ours, ri = row
            for k, t in (("_Block_0", 0), ("_Block_1", 2)):
                p[ours][k]["Conv_0"]["kernel"] = conv_w(
                    sd, f"layer.{ri}.conv.{t}.weight")
                p[ours][k]["Conv_0"]["bias"] = vec(
                    sd, f"layer.{ri}.conv.{t}.bias")
        else:
            _, ours, ci = row
            p[ours]["kernel"] = conv_w(sd, f"layer.{ci}.weight")
            p[ours]["bias"] = vec(sd, f"layer.{ci}.bias")
    return p, bs


def port_frame_disc(sd, params, batch_stats):
    """FrameDiscriminator (nets/FrameDisc.py:35-75);
    verified: tests/test_disc_parity.py."""
    return _port_disc(sd, params, batch_stats, _FRAME_DISC_SPEC)


def port_frame_local_disc(sd, params, batch_stats):
    """FrameLocalDiscriminator (nets/FrameDisc.py:77-114)."""
    return _port_disc(sd, params, batch_stats, _FRAME_LOCAL_DISC_SPEC)


def port_video_disc(sd, params, batch_stats):
    """VideoDiscriminator (nets/VidDisc.py:34-84)."""
    return _port_disc(sd, params, batch_stats, _VIDEO_DISC_SPEC)


def port_video_local_disc(sd, params, batch_stats):
    """VideoLocalDiscriminator (nets/VidDisc.py:87-138)."""
    return _port_disc(sd, params, batch_stats, _VIDEO_LOCAL_DISC_SPEC)


# FrameSNDiscriminator Sequential slots (nets/FrameDisc.py:116-148):
# plain SN convs at layer.{0,2,4,7,10,13}, ResnetSNBlocks at
# layer.{6,9,12} with SN convs at .conv.{0,2}.  Our traversal order:
# _Block_0.._Block_2, _ResBlock_0, _Block_3, _ResBlock_1, _Block_4,
# _ResBlock_2, _Block_5 (models/discriminators.FrameDiscriminator sn=True).
_FRAME_SN_DISC_SLOTS = [
    ("_Block_0", "layer.0"), ("_Block_1", "layer.2"),
    ("_Block_2", "layer.4"),
    (("_ResBlock_0", "_Block_0"), "layer.6.conv.0"),
    (("_ResBlock_0", "_Block_1"), "layer.6.conv.2"),
    ("_Block_3", "layer.7"),
    (("_ResBlock_1", "_Block_0"), "layer.9.conv.0"),
    (("_ResBlock_1", "_Block_1"), "layer.9.conv.2"),
    ("_Block_4", "layer.10"),
    (("_ResBlock_2", "_Block_0"), "layer.12.conv.0"),
    (("_ResBlock_2", "_Block_1"), "layer.12.conv.2"),
    ("_Block_5", "layer.13"),
]


def port_frame_sn_disc(sd: Mapping, params: Dict, batch_stats: Dict):
    """FrameSNDiscriminator (nets/FrameDisc.py:116-148) with the
    hand-rolled SpectralNorm wrapper (nets/SpectralNorm.py:14-68).

    SN state mapping: torch stores ``weight_bar`` (raw kernel), ``u``
    (out-dim iteration vector) and ``v``; with power_iterations=1 the
    stored ``v`` is overwritten from ``u`` before use, so ``u`` is the
    only live iteration state.  flax.linen.SpectralNorm keeps ``u`` of
    shape (1, O) on the (kh*kw*I, O) matrix — the SAME out-dim vector
    (sigma(W) = sigma(W^T); the contraction-dim permutation between
    torch's (O, I*kh*kw) view and flax's flatten cancels because v is
    recomputed from u each call).  ``sigma`` is recomputed every train
    forward on both sides, so its stored value is not ported.
    """
    p = jax.tree_util.tree_map(lambda x: x, params)
    bs = jax.tree_util.tree_map(lambda x: x, batch_stats)
    for ours, ref in _FRAME_SN_DISC_SLOTS:
        path = (ours,) if isinstance(ours, str) else ours
        node = p
        bnode = bs
        for key in path:
            node = node[key]
            bnode = bnode.setdefault(key, {})
        conv = node["_SNConv_0"]["Conv_0"]
        conv["kernel"] = conv_w(sd, f"{ref}.module.weight_bar")
        conv["bias"] = vec(sd, f"{ref}.module.bias")
        sn = bnode.setdefault("_SNConv_0", {}).setdefault(
            "SpectralNorm_0", {})
        u = np.asarray(sd[f"{ref}.module.weight_u"]).reshape(1, -1)
        sn["Conv_0/kernel/u"] = jnp.asarray(u, jnp.float32)
        sn["Conv_0/kernel/sigma"] = jnp.ones((), jnp.float32)
    return p, bs


def _detect_disc_porter(sd: Mapping):
    """Pick the porter for a frame/video discriminator state_dict by its
    key signature (the checkpoint stores no model name)."""
    if "layer.35.weight" in sd:
        return port_video_local_disc
    if "layer.19.conv.0.weight" in sd:
        return port_video_disc
    if "layer.20.weight" in sd:
        return port_frame_local_disc
    if "layer.16.conv.0.weight" in sd:
        return port_frame_disc
    raise KeyError(
        "unrecognized discriminator state_dict (supported: Frame/Video "
        "Discriminator + Local variants); keys: "
        + ", ".join(sorted(sd)[:8]))


def port_reference_checkpoint(ckpt: Mapping, states: Dict[str, Dict],
                              batch_stats: Optional[Dict] = None):
    """Convert a full reference checkpoint dict.

    ``ckpt``: the torch.load result ({'coarse_model': state_dict, ...},
    runners/InterTrainer.py:867-886 or InterGANTrainer.py:910-938).
    ``states``: our per-submodel param trees to fill; ``batch_stats``: our
    per-submodel batch_stats trees (BatchNorm running stats live there).
    Returns ``(params, batch_stats)`` — unknown submodels are untouched.
    Backward compatibility: when ``batch_stats`` is None, returns params
    only (the pre-GAN call shape).
    """
    legacy_shape = batch_stats is None
    bs_states: Dict = dict(batch_stats or {})
    out = dict(states)

    def sd_of(name):
        return {k: np.asarray(v) for k, v in ckpt[name].items()}

    if "coarse_model" in ckpt and "coarse_model" in states:
        sd = sd_of("coarse_model")
        if "vae_encoder.0.weight" in sd:
            out["coarse_model"], bs_states["coarse_model"] = port_vaehrnet(
                sd, states["coarse_model"],
                bs_states.get("coarse_model", {}))
        else:
            out["coarse_model"] = port_hrnet(sd, states["coarse_model"])
    if "refine_model" in ckpt and "refine_model" in states:
        out["refine_model"] = port_srn_refine(
            sd_of("refine_model"), states["refine_model"])
    if "stage3_model" in ckpt and "stage3_model" in states:
        sd = sd_of("stage3_model")
        # V2/V3/V2Base detected by key signature; V1 otherwise
        if "attn_down_layer_1.0.weight" in sd:
            variant = ("v3" if "input_layer.4.conv.0.weight" in sd else "v2")
            out["stage3_model"] = port_pyramid_attn(
                sd, states["stage3_model"], variant)
        elif "layer_3_fuse.0.weight" in sd:
            out["stage3_model"] = port_pyramid_attn(
                sd, states["stage3_model"], "v2base")
        else:
            out["stage3_model"] = port_ms_res_attn_refine(
                sd, states["stage3_model"])
    if "track_gen_model" in ckpt and "track_gen_model" in states:
        out["track_gen_model"] = port_track_gen(
            sd_of("track_gen_model"), states["track_gen_model"])
    for name in ("frame_disc_model", "frame_det_disc_model",
                 "video_disc_model", "video_det_disc_model"):
        if name in ckpt and name in states:
            sd = sd_of(name)
            porter = _detect_disc_porter(sd)
            out[name], bs_states[name] = porter(
                sd, states[name], bs_states.get(name, {}))
    if legacy_shape:
        return out
    return out, bs_states


def port_attn_legacy(sd: Mapping, variables: Dict, variant: str) -> Dict:
    """Map a reference AttnRefineV2..V4 state_dict (nets/SRN.py:581-1242)
    onto our models/attn_legacy variables (verified:
    tests/test_attn_legacy_parity.py).

    ``variant``: v2 | v2o | v2base | v3 | v3base | v4 | v4base.  For v2,
    ``variables`` must carry batch_stats (the nested ResNet101Features);
    torch keys arrive under the double prefix ``resnet101.resnet101.``
    (my_resnet101 wraps the torchvision net, nets/resnet101.py:5-9).
    """
    import jax

    new = jax.tree_util.tree_map(lambda x: x, variables)
    p = new["params"] if "params" in new else new

    def conv(dst, t):
        dst["kernel"] = conv_w(sd, t + ".weight")
        if t + ".bias" in sd:
            dst["bias"] = vec(sd, t + ".bias")

    def res(dst, t):
        conv(dst["Conv_0"], t + ".conv.0")
        conv(dst["Conv_1"], t + ".conv.2")

    def enc_head(node, t, blocks=3):
        # torch: Sequential[Conv2d, LReLU, RB x blocks]
        conv(node["Conv_0"], f"{t}.0")
        for k in range(blocks):
            res(node[f"ResnetBlock_{k}"], f"{t}.{2 + k}")

    def enc_l3(node, t):
        conv(node["Conv_0"], f"{t}.conv.0")
        for k in range(3):
            res(node[f"ResnetBlock_{k}"], f"{t}.conv.{2 + k}")

    def dec_l5(node, t):
        for k in range(3):
            res(node[f"ResnetBlock_{k}"], f"{t}.conv.{k}")
        ct = node["ConvT_0"]["ConvTranspose_0"]
        ct["kernel"] = convT_w(sd, f"{t}.conv.3.weight")
        ct["bias"] = vec(sd, f"{t}.conv.3.bias")

    def dec_out(node, t):
        for k in range(3):
            res(node[f"ResnetBlock_{k}"], f"{t}.conv.{k}")
        conv(node["Conv_0"], f"{t}.conv.3")

    def mid(node, t, rb_at):
        conv(node["Conv_0"], f"{t}.0")
        if rb_at == 4:
            conv(node["Conv_1"], f"{t}.2")
        for k in range(2):
            res(node[f"ResnetBlock_{k}"], f"{t}.{rb_at + k}")

    if variant in ("v2", "v2o", "v2base"):
        enc_head(p["encoder_1"], "encoder_1")
        for i in (2, 3, 4):
            enc_l3(p[f"encoder_{i}"], f"encoder_{i}")
        mid(p["mid"], "mid", rb_at=2)
        for i in (4, 3, 2):
            dec_l5(p[f"decoder_{i}"], f"decoder_{i}")
        dec_out(p["decoder_1"], "decoder_1")
        if variant == "v2":
            from deep_video_interpolation_extrapolation_tpu.models.features import (
                load_torch_resnet101_state,
            )
            pref = "resnet101.resnet101."
            sub_sd = {k[len(pref):]: v for k, v in sd.items()
                      if k.startswith(pref)}
            sub = load_torch_resnet101_state(
                {"params": p["resnet101"],
                 "batch_stats": new["batch_stats"]["resnet101"]}, sub_sd)
            p["resnet101"] = sub["params"]
            new["batch_stats"]["resnet101"] = sub["batch_stats"]
    elif variant in ("v3", "v3base", "v4", "v4base"):
        enc_head(p["img_encoder_1"], "img_encoder_1")
        enc_l3(p["img_encoder_2"], "img_encoder_2")
        enc_l3(p["img_encoder_3"], "img_encoder_3")
        if variant in ("v3", "v4"):
            enc_head(p["attn_encoder_1"], "attn_encoder_1",
                     blocks=1 if variant == "v4" else 3)
            enc_l3(p["attn_encoder_2"], "attn_encoder_2")
            if (variant == "v3"
                    or any(k.startswith("attn_encoder_3.") for k in sd)):
                enc_l3(p["attn_encoder_3"], "attn_encoder_3")
            # v4: the reference never defines attn_encoder_3 (documented
            # bug, models/attn_legacy.py) — our completion keeps its init
        mid(p["mid"], "mid", rb_at=4)
        for i in (3, 2):
            dec_l5(p[f"decoder_{i}"], f"decoder_{i}")
        dec_out(p["decoder_1"], "decoder_1")
    else:
        raise KeyError(variant)
    return new
