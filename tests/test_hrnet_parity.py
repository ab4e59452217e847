"""Numerical parity of our Flax HRNet against the reference's torch HRNet.

Loads /root/reference/nets/HRNet.py standalone as a CPU torch oracle
(stubbing its unused yacs/torchvision imports), ports its randomly
initialized weights into our parameter tree, and compares full forward
outputs — the strongest architecture-parity evidence available without
reference checkpoints.  Skipped when the reference tree is absent.
"""

import importlib.util
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF = "/root/reference/nets/HRNet.py"
pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference tree not mounted")


def _load_ref_hrnet():
    # stub the imports HRNet.py pulls in but never uses for HRNet itself
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    if "yacs" not in sys.modules:
        class _CN(dict):
            def __getattr__(self, k):
                return self[k]

            def __setattr__(self, k, v):
                self[k] = v
        yacs = types.ModuleType("yacs")
        cfg = types.ModuleType("yacs.config")
        cfg.CfgNode = _CN
        yacs.config = cfg
        sys.modules["yacs"] = yacs
        sys.modules["yacs.config"] = cfg
    # the reference predates numpy 2 (np.int removed)
    if not hasattr(np, "int"):
        np.int = int  # type: ignore[attr-defined]
    spec = importlib.util.spec_from_file_location("ref_hrnet", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _w(sd, name):
    return jnp.asarray(np.transpose(np.asarray(sd[name]), (2, 3, 1, 0)))


def _b(sd, name):
    return jnp.asarray(np.asarray(sd[name]))


def _port(sd, params):
    p = jax.tree_util.tree_map(lambda x: x, params)  # copy

    se = p["seg_encoder"]
    for cv, tid in (("Conv_0", 0), ("Conv_1", 2), ("Conv_2", 4)):
        se[cv]["kernel"] = _w(sd, f"seg_encoder.{tid}.weight")
        se[cv]["bias"] = _b(sd, f"seg_encoder.{tid}.bias")

    bb = p["backbone"]
    for cv in ("conv1", "conv2"):
        bb[cv]["kernel"] = _w(sd, f"{cv}.weight")
        bb[cv]["bias"] = _b(sd, f"{cv}.bias")

    for i in range(4):
        blk = bb[f"layer1_{i}"]
        blk["Conv_0"]["kernel"] = _w(sd, f"layer1.{i}.conv1.weight")
        blk["Conv_1"]["kernel"] = _w(sd, f"layer1.{i}.conv2.weight")
        blk["Conv_2"]["kernel"] = _w(sd, f"layer1.{i}.conv3.weight")
        if f"layer1.{i}.downsample.0.weight" in sd:
            blk["Conv_3"]["kernel"] = _w(sd, f"layer1.{i}.downsample.0.weight")

    bb["transition1"]["trans_0"]["kernel"] = _w(sd, "transition1.0.0.weight")
    bb["transition1"]["trans_1_0"]["kernel"] = _w(sd, "transition1.1.0.0.weight")
    bb["transition2"]["trans_2_0"]["kernel"] = _w(sd, "transition2.2.0.0.weight")

    for stage, n_br in (("stage2", 2), ("stage3", 3)):
        sp = bb[stage]
        for br in range(n_br):
            for k in range(4):
                blk = sp[f"BasicBlock_{br * 4 + k}"]
                blk["Conv_0"]["kernel"] = _w(
                    sd, f"{stage}.0.branches.{br}.{k}.conv1.weight")
                blk["Conv_1"]["kernel"] = _w(
                    sd, f"{stage}.0.branches.{br}.{k}.conv2.weight")
        for i in range(n_br):
            for j in range(n_br):
                if j > i:
                    sp[f"fuse_{i}_{j}"]["kernel"] = _w(
                        sd, f"{stage}.0.fuse_layers.{i}.{j}.0.weight")
                elif j < i:
                    for k in range(i - j):
                        sp[f"fuse_{i}_{j}_{k}"]["kernel"] = _w(
                            sd, f"{stage}.0.fuse_layers.{i}.{j}.{k}.0.weight")

    for head, tname in (("rgb_layer", "rgb_layer"), ("seg_layer", "seg_layer")):
        hp = p[head]
        hp["Conv_0"]["kernel"] = _w(sd, f"{tname}.0.weight")
        hp["Conv_0"]["bias"] = _b(sd, f"{tname}.0.bias")
        hp["Conv_1"]["kernel"] = _w(sd, f"{tname}.2.weight")
        hp["Conv_1"]["bias"] = _b(sd, f"{tname}.2.bias")
    return p


def test_hrnet_forward_parity_with_reference():
    import argparse
    import torch

    ref = _load_ref_hrnet()
    args = argparse.Namespace(
        syn_type="inter", mode="xs2xs", num_pred_once=1, inpaint=False,
        inpaint_mask=False, highres_large=False, fix_init_frames=False)
    torch.manual_seed(0)
    tm = ref.HRNet(args)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    from deep_video_interpolation_extrapolation_tpu.models.hrnet import HRNet
    ours = HRNet(syn_type="inter", dtype=jnp.float32)

    rng = np.random.RandomState(0)
    b, h, w = 1, 32, 64
    rgb = rng.uniform(-1, 1, (b, h, w, 6)).astype(np.float32)
    ids = rng.randint(0, 20, (b, h, w, 2))
    seg = np.concatenate(
        [np.eye(20, dtype=np.float32)[ids[..., i]] for i in range(2)], -1)

    variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(rgb),
                          jnp.asarray(seg), train=False)
    from deep_video_interpolation_extrapolation_tpu.tools.torch_port import port_hrnet
    params = port_hrnet(sd, variables["params"])

    # every ported leaf must exist with the right shape (catches silent
    # mapping gaps); 8 fuse/transition/downsample convs have no torch twin
    # only if the mapping missed them — compare leaf counts
    n_ours = len(jax.tree_util.tree_leaves(variables["params"]))
    n_torch = len(sd)
    assert n_ours == n_torch, (n_ours, n_torch)

    our_rgb, our_seg = ours.apply({"params": params}, jnp.asarray(rgb),
                                  jnp.asarray(seg), train=False)

    tin = torch.from_numpy(np.concatenate([rgb, seg], -1)).permute(0, 3, 1, 2)
    with torch.no_grad():
        ref_rgb, ref_seg = tm(tin)
    ref_rgb = ref_rgb.permute(0, 2, 3, 1).numpy()
    ref_seg = ref_seg.permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(np.asarray(our_rgb), ref_rgb, atol=2e-4,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(our_seg), ref_seg, atol=2e-4,
                               rtol=1e-3)
