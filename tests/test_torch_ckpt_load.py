"""--torch_ckpt end-to-end: a reference-format .pth checkpoint (torch.save
of per-submodel state_dicts) converts into the runner's params at startup."""

import os

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.path.exists("/root/reference/nets/HRNet.py"),
    reason="reference tree not mounted")


def test_runner_loads_reference_checkpoint(tmp_path):
    import argparse
    import torch
    from tests.test_hrnet_parity import _load_ref_hrnet

    ref = _load_ref_hrnet()
    args = argparse.Namespace(
        syn_type="inter", mode="xs2xs", num_pred_once=1, inpaint=False,
        inpaint_mask=False, highres_large=False, fix_init_frames=False)
    torch.manual_seed(0)
    tm = ref.HRNet(args)
    ckpt_path = str(tmp_path / "ref.pth")
    torch.save({"session": 1, "epoch": 2,
                "coarse_model": tm.state_dict()}, ckpt_path)

    from deep_video_interpolation_extrapolation_tpu.cli.options import parse_args
    from deep_video_interpolation_extrapolation_tpu.train.runner import Runner

    cfg = parse_args(
        (f"--dataset synthetic --input_h 32 --input_w 64 --bs 2 "
         f"--compute_dtype float32 --split val --syn_type inter "
         f"--torch_ckpt {ckpt_path} INTER --model InterNet").split())
    runner = Runner(cfg, str(tmp_path / "exp"))

    # the runner's coarse params now equal the ported torch weights
    from deep_video_interpolation_extrapolation_tpu.tools.torch_port import (
        port_hrnet,
    )
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    expect = port_hrnet(sd, runner.state.params["coarse_model"])
    got = jax.tree_util.tree_leaves(runner.state.params["coarse_model"])
    want = jax.tree_util.tree_leaves(expect)
    assert all(np.allclose(np.asarray(g), np.asarray(w))
               for g, w in zip(got, want))
