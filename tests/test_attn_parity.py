"""MSResAttnRefine torch-oracle parity (reference nets/refine_nets.py:138-399).

n_scales=2 exercises the full recipe: windowed cosine correlation, joint
softmax over both neighbors' windows, probability-weighted aggregation,
AND the cross-scale per-neighbor renormalized re-warping + fuse layer.
Outputs must match; flow maps are intentionally NOT compared (the
reference decodes argmax offsets with a documented h/w mix-up,
refine_nets.py:274 — we decode correctly; ops/corr.py docstring)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_srn_parity import _b, _load_ref, _w, _wt  # reuse the shims

pytestmark = pytest.mark.skipif(
    not os.path.exists("/root/reference/nets/refine_nets.py"),
    reason="reference tree not mounted")


_CONV_PAIRS = [
    ("input_layer_0", "input_layer.0"),
    ("input_layer_1", "input_layer.2"),
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


def _port(sd, params):
    p = jax.tree_util.tree_map(lambda x: x, params)

    def conv(dst, tname):
        dst["kernel"] = _w(sd, tname + ".weight")
        dst["bias"] = _b(sd, tname + ".bias")

    for ours, theirs in _CONV_PAIRS:
        conv(p[ours]["Conv_0"], theirs)
    conv(p["output_conv"], "output_layer.4")
    for dec, tdec in (("decoder_2", "decoder_2"), ("decoder_1", "decoder_1")):
        ct = p[f"{dec}_t"]["ConvTranspose_0"]
        ct["kernel"] = _wt(sd, f"{tdec}.0.weight")
        ct["bias"] = _b(sd, f"{tdec}.0.bias")
        conv(p[f"{dec}_r"]["Conv_0"], f"{tdec}.2.conv.0")
        conv(p[f"{dec}_r"]["Conv_1"], f"{tdec}.2.conv.2")
    return p


def test_attn_refine_parity_two_scales():
    import argparse
    import torch

    ref = _load_ref()
    args = argparse.Namespace(n_scales=2, stage3_prop=False, mode="xs2xs",
                              rank=0)
    torch.manual_seed(0)
    tm = ref.MSResAttnRefine(args)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    from deep_video_interpolation_extrapolation_tpu.models.attn_refine import (
        MSResAttnRefine,
    )
    ours = MSResAttnRefine(n_scales=2, stage3_prop=False, dtype=jnp.float32)

    rng = np.random.RandomState(0)
    b, h, w = 1, 32, 64
    coarse = rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32)
    seg = np.eye(20, dtype=np.float32)[rng.randint(0, 20, (b, h, w))]
    nb_img = rng.uniform(-1, 1, (b, h, w, 6)).astype(np.float32)
    nb_seg = np.concatenate(
        [np.eye(20, dtype=np.float32)[rng.randint(0, 20, (b, h, w))]
         for _ in range(2)], -1)

    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(coarse),
                          jnp.asarray(seg), jnp.asarray(nb_img),
                          jnp.asarray(nb_seg), train=False)
    assert len(jax.tree_util.tree_leaves(variables["params"])) == len(sd)
    from deep_video_interpolation_extrapolation_tpu.tools.torch_port import port_ms_res_attn_refine
    params = port_ms_res_attn_refine(sd, variables["params"])

    our_outs, _ = ours.apply(
        {"params": params}, jnp.asarray(coarse), jnp.asarray(seg),
        jnp.asarray(nb_img), jnp.asarray(nb_seg), train=False)

    def t(x):
        return torch.from_numpy(x).permute(0, 3, 1, 2)
    with torch.no_grad():
        ref_outs, _ = tm(t(coarse), t(seg), t(nb_img), t(nb_seg))
    assert len(our_outs) == len(ref_outs) == 2
    for o, r in zip(our_outs, ref_outs):
        np.testing.assert_allclose(
            np.asarray(o), r.permute(0, 2, 3, 1).numpy(), atol=1e-3, rtol=1e-2)


@pytest.mark.parametrize("variant", ["v2", "v2base", "v3"])
def test_pyramid_attn_parity(variant):
    """V2/V2Base/V3 coarse-to-fine refiners vs the torch oracles
    (refine_nets.py:403-704, 709-930, 934-1246) through
    tools/torch_port.port_pyramid_attn."""
    import argparse
    import torch

    ref = _load_ref()
    cls = {"v2": ref.MSResAttnRefineV2, "v2base": ref.MSResAttnRefineV2Base,
           "v3": ref.MSResAttnRefineV3}[variant]
    args = argparse.Namespace(n_scales=3, stage3_prop=False, mode="xs2xs",
                              rank=0)
    torch.manual_seed(0)
    tm = cls(args)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    from deep_video_interpolation_extrapolation_tpu.models.attn_refine import (
        MSResAttnRefineV2,
        MSResAttnRefineV2Base,
        MSResAttnRefineV3,
    )
    ours = {"v2": MSResAttnRefineV2, "v2base": MSResAttnRefineV2Base,
            "v3": MSResAttnRefineV3}[variant](
        stage3_prop=False, dtype=jnp.float32)

    rng = np.random.RandomState(0)
    # level-3 attention runs at 1/16 (two enc strides + two down strides):
    # 64x64 keeps every level >= the 5x5 window
    b, h, w = 1, 64, 64
    coarse = rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32)
    seg = np.eye(20, dtype=np.float32)[rng.randint(0, 20, (b, h, w))]
    nb_img = rng.uniform(-1, 1, (b, h, w, 6)).astype(np.float32)
    nb_seg = np.concatenate(
        [np.eye(20, dtype=np.float32)[rng.randint(0, 20, (b, h, w))]
         for _ in range(2)], -1)

    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(coarse),
                          jnp.asarray(seg), jnp.asarray(nb_img),
                          jnp.asarray(nb_seg), train=False)
    assert len(jax.tree_util.tree_leaves(variables["params"])) == len(sd), (
        len(jax.tree_util.tree_leaves(variables["params"])), len(sd))
    from deep_video_interpolation_extrapolation_tpu.tools.torch_port import (
        port_pyramid_attn,
    )
    params = port_pyramid_attn(sd, variables["params"], variant)

    our_outs, _ = ours.apply(
        {"params": params}, jnp.asarray(coarse), jnp.asarray(seg),
        jnp.asarray(nb_img), jnp.asarray(nb_seg), train=False)

    def t(x):
        return torch.from_numpy(x).permute(0, 3, 1, 2)
    with torch.no_grad():
        ref_outs, _ = tm(t(coarse), t(seg), t(nb_img), t(nb_seg))
    assert len(our_outs) == len(ref_outs) == 3
    for i, (o, r) in enumerate(zip(our_outs, ref_outs)):
        np.testing.assert_allclose(
            np.asarray(o), r.permute(0, 2, 3, 1).numpy(),
            atol=2e-3, rtol=1e-2, err_msg=f"{variant} level {i}")
