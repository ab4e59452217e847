"""Measured baseline anchor for the reference's torch HRNet forward.

The reference publishes no numbers (SURVEY.md §6), so bench.py's
``vs_baseline`` needs a defensible denominator.  This tool replaces the
round-1/2 guess (a flat 3.5 fps "typical torch conv efficiency"
assumption) with measurements:

1. **Exact FLOPs + activation bytes per frame** for the reference model
   (`/root/reference/nets/HRNet.py`, loaded standalone as a CPU oracle
   exactly like tests/test_hrnet_parity.py), counted with forward hooks
   on every Conv2d — no 200-GFLOP hand estimate.
2. **Measured torch-CPU forward fps** on this host (bs1 fp32), plus the
   host's measured GEMM peak via a big torch matmul.  The ratio
   conv-throughput / GEMM-throughput is torch's achieved conv efficiency
   on this backend (oneDNN), a transferable proxy for cuDNN's.
3. **A roofline-bounded reference-GPU estimate** for the hardware the
   reference actually trained on (GTX 1080 Ti class, 11GB — reference
   cmd:160-162): published peak 11.34 TFLOP/s fp32, 484 GB/s HBM.  The
   *upper bound* fps is the per-frame time at the max of the compute
   roofline (FLOPs / (peak x best-case conv efficiency)) and the
   bandwidth roofline (activation bytes / BW); the central estimate uses
   the measured torch conv-efficiency fraction.

Writes docs/REFBENCH.json and prints one JSON line.  Run on the CPU
host (JAX not required; pure torch).
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time
import types

REF = "/root/reference/nets/HRNet.py"

# Published GTX 1080 Ti specs (the reference's 11GB GTX/RTX-class training
# hardware, /root/reference/cmd:160-162): 3584 CUDA cores x 2 flop x
# 1.582 GHz boost = 11.34 TFLOP/s fp32; 484 GB/s GDDR5X.
GPU_PEAK_TFLOPS = 11.34
GPU_BW_GBPS = 484.0
# Best-case cuDNN conv efficiency on Pascal for large-batch convnets
# (public convnet-benchmarks / DAWNBench-era data: ResNet/VGG layers
# reach 30-50% of peak; full-res 64-ch stems run lower).  Used ONLY for
# the upper bound.
GPU_CONV_EFF_BEST = 0.50


def load_ref_hrnet():
    """Load /root/reference/nets/HRNet.py standalone (same stubbing as
    tests/test_hrnet_parity.py)."""
    import numpy as np
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
    if not hasattr(np, "int"):
        np.int = int  # type: ignore[attr-defined]
    spec = importlib.util.spec_from_file_location("ref_hrnet_bench", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=str, default="512,1024")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--highres-large", action="store_true")
    ap.add_argument("--out", default="docs/REFBENCH.json")
    args = ap.parse_args()
    h, w = (int(v) for v in args.hw.split(","))

    import torch

    mod = load_ref_hrnet()
    ns = argparse.Namespace(
        syn_type="inter", mode="xs2xs", highres_large=args.highres_large,
        num_pred_once=1, fix_init_frames=False, inpaint=False,
        inpaint_mask=False,
    )
    model = mod.HRNet(ns).eval()

    # -- 1. exact FLOPs + activation bytes via hooks ----------------------
    stats = {"flops": 0, "bytes": 0}

    def hook(m, inp, out):
        cin = m.in_channels // m.groups
        kh, kw = m.kernel_size
        stats["flops"] += 2 * out.numel() * cin * kh * kw
        stats["bytes"] += (inp[0].numel() + out.numel()) * 4  # fp32

    handles = [m.register_forward_hook(hook)
               for m in model.modules() if isinstance(m, torch.nn.Conv2d)]
    x = torch.randn(1, 46, h, w)
    with torch.no_grad():
        model(x)
    for hd in handles:
        hd.remove()
    gflops_frame = stats["flops"] / 1e9
    gbytes_frame = stats["bytes"] / 1e9

    # -- 2. measured torch-CPU forward fps + host GEMM peak ---------------
    with torch.no_grad():
        model(x)  # warmup (oneDNN JIT/layout caches)
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            model(x)
            times.append(time.perf_counter() - t0)
    cpu_s_frame = min(times)
    cpu_fps = 1.0 / cpu_s_frame
    cpu_conv_gflops = gflops_frame / cpu_s_frame

    n = 2048
    a = torch.randn(n, n)
    b = torch.randn(n, n)
    torch.mm(a, b)  # warmup
    tms = []
    for _ in range(5):
        t0 = time.perf_counter()
        torch.mm(a, b)
        tms.append(time.perf_counter() - t0)
    cpu_gemm_gflops = 2 * n**3 / min(tms) / 1e9
    conv_eff = cpu_conv_gflops / cpu_gemm_gflops  # torch conv vs GEMM peak

    # -- 3. roofline-bounded reference-GPU estimate ------------------------
    t_bw = gbytes_frame / GPU_BW_GBPS                         # bandwidth wall
    t_fl_best = gflops_frame / (GPU_PEAK_TFLOPS * 1e3 * GPU_CONV_EFF_BEST)
    gpu_fps_upper = 1.0 / max(t_bw, t_fl_best)                # speed of light
    eff_central = min(max(conv_eff, 0.10), GPU_CONV_EFF_BEST)
    t_fl_central = gflops_frame / (GPU_PEAK_TFLOPS * 1e3 * eff_central)
    gpu_fps_central = 1.0 / max(t_bw, t_fl_central)
    # lower bound: half the central efficiency (launch overhead, layout
    # transforms, the unfused 46-ch stem) — documented spread, not a claim
    t_fl_low = gflops_frame / (GPU_PEAK_TFLOPS * 1e3 * eff_central * 0.5)
    gpu_fps_lower = 1.0 / max(t_bw, t_fl_low)

    result = {
        "metric": "reference_torch_hrnet_forward",
        "config": f"bs1_{h}x{w}_fp32" + ("_hl4" if args.highres_large else ""),
        "gflops_per_frame": round(gflops_frame, 1),
        "activation_gbytes_per_frame": round(gbytes_frame, 2),
        "cpu_fps_measured": round(cpu_fps, 3),
        "cpu_conv_gflops_per_s": round(cpu_conv_gflops, 1),
        "cpu_gemm_gflops_per_s": round(cpu_gemm_gflops, 1),
        "torch_conv_efficiency_vs_gemm": round(conv_eff, 3),
        "gpu_1080ti_fps_estimate": {
            "lower": round(gpu_fps_lower, 2),
            "central": round(gpu_fps_central, 2),
            "upper_speed_of_light": round(gpu_fps_upper, 2),
            "model": "max(flops/(11.34TF*eff), act_bytes/484GB/s); "
                     "eff central = measured torch conv/GEMM fraction "
                     f"clamped to [0.10, {GPU_CONV_EFF_BEST}]",
        },
        "torch_threads": torch.get_num_threads(),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    existing = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            existing = json.load(f)
    existing[result["config"]] = result
    with open(args.out, "w") as f:
        json.dump(existing, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
