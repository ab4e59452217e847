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

from typing import Dict, Mapping

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


def port_reference_checkpoint(ckpt: Mapping, states: Dict[str, Dict]) -> Dict:
    """Convert a full reference checkpoint dict.

    ``ckpt``: the torch.load result ({'coarse_model': state_dict, ...}).
    ``states``: our per-submodel param trees to fill.
    Returns the updated trees (unknown submodels are left untouched).
    """
    porters = {
        "coarse_model": port_hrnet,
        "refine_model": port_srn_refine,
        "stage3_model": port_ms_res_attn_refine,
    }
    out = dict(states)
    for name, porter in porters.items():
        if name in ckpt and name in states:
            sd = {k: np.asarray(v) for k, v in ckpt[name].items()}
            out[name] = porter(sd, states[name])
    return out
