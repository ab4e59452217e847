"""SRNRefine torch-oracle parity (reference nets/refine_nets.py:27-135).

Same technique as test_hrnet_parity: import the reference module with its
missing deps stubbed, port its random state_dict into our tree, compare
multi-scale outputs.  Also pins the torch ConvTranspose2d -> flax
ConvTranspose weight mapping (transpose + spatial flip)."""

import importlib
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF_ROOT = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_ROOT, "nets/refine_nets.py")),
    reason="reference tree not mounted")


def _load_ref():
    np.int = getattr(np, "int", int)
    np.float = getattr(np, "float", float)
    np.bool = getattr(np, "bool", bool)
    if "torchvision" not in sys.modules or not hasattr(
            sys.modules.get("torchvision", None), "utils"):
        tv = types.ModuleType("torchvision")
        tv.__path__ = []
        tvm = types.ModuleType("torchvision.models")
        tvu = types.ModuleType("torchvision.utils")

        def _no(*a, **k):
            raise RuntimeError("stub")
        tvm.vgg19 = _no
        tvm.resnet101 = _no
        tvu.make_grid = _no
        tv.models, tv.utils = tvm, tvu
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tvm
        sys.modules["torchvision.utils"] = tvu
    if "yacs" not in sys.modules:
        class _CN(dict):
            def __getattr__(s, k):
                return s[k]

            def __setattr__(s, k, v):
                s[k] = v
        y = types.ModuleType("yacs")
        yc = types.ModuleType("yacs.config")
        yc.CfgNode = _CN
        y.config = yc
        sys.modules["yacs"] = y
        sys.modules["yacs.config"] = yc
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    return importlib.import_module("nets.refine_nets")


def _w(sd, name):
    return jnp.asarray(np.transpose(np.asarray(sd[name]), (2, 3, 1, 0)))


def _wt(sd, name):
    # torch ConvTranspose2d (in, out, kh, kw) -> flax (kh, kw, in, out),
    # spatially flipped (flax conv_transpose is the conv gradient)
    w = np.transpose(np.asarray(sd[name]), (2, 3, 0, 1))
    return jnp.asarray(w[::-1, ::-1].copy())


def _b(sd, name):
    return jnp.asarray(np.asarray(sd[name]))


def _port(sd, params):
    p = jax.tree_util.tree_map(lambda x: x, params)
    core = p["core"]

    def conv(dst, tname):
        dst["kernel"] = _w(sd, tname + ".weight")
        if tname + ".bias" in sd:
            dst["bias"] = _b(sd, tname + ".bias")

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
    ct0["kernel"] = _wt(sd, "decoder_2.3.weight")
    ct0["bias"] = _b(sd, "decoder_2.3.bias")
    for k in range(3):
        res(12 + k, f"decoder_1.{k}")
    ct1 = core["ConvT_1"]["ConvTranspose_0"]
    ct1["kernel"] = _wt(sd, "decoder_1.3.weight")
    ct1["bias"] = _b(sd, "decoder_1.3.bias")
    for k in range(3):
        res(15 + k, f"output_layer.{k}")
    clrelu(11, "output_layer.3")
    conv(core["Conv_0"], "output_layer.5")
    return p


def test_srn_refine_parity():
    import argparse
    import torch

    ref = _load_ref()
    args = argparse.Namespace(n_scales=2, mode="xs2xs", rank=0)
    torch.manual_seed(0)
    tm = ref.SRNRefine(args)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    from deep_video_interpolation_extrapolation_tpu.models.refine import SRNRefine
    ours = SRNRefine(n_scales=2, dtype=jnp.float32)

    rng = np.random.RandomState(0)
    b, h, w = 1, 32, 64
    coarse = rng.uniform(-1, 1, (b, h, w, 3)).astype(np.float32)
    seg = np.eye(20, dtype=np.float32)[rng.randint(0, 20, (b, h, w))]
    feat = rng.uniform(-1, 1, (b, h, w, 14)).astype(np.float32)

    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(coarse),
                          jnp.asarray(seg), jnp.asarray(feat), train=False)
    n_ours = len(jax.tree_util.tree_leaves(variables["params"]))
    assert n_ours == len(sd), (n_ours, len(sd))
    from deep_video_interpolation_extrapolation_tpu.tools.torch_port import port_srn_refine
    params = port_srn_refine(sd, variables["params"])

    our_preds = ours.apply({"params": params}, jnp.asarray(coarse),
                           jnp.asarray(seg), jnp.asarray(feat), train=False)

    def t(x):
        return torch.from_numpy(x).permute(0, 3, 1, 2)
    with torch.no_grad():
        ref_preds = tm(t(coarse), t(seg), t(feat))
    assert len(our_preds) == len(ref_preds) == 2
    for o, r in zip(our_preds, ref_preds):
        np.testing.assert_allclose(
            np.asarray(o), r.permute(0, 2, 3, 1).numpy(), atol=5e-4, rtol=1e-3)
