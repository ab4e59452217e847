"""Padded-FLOP roofline for the flagship InterNet/HRNet bench config.

Answers "is ~36 fps/chip the ceiling, or is there a next lever?" with
numbers instead of vibes (round-2 VERDICT item 6).  Method:

1. Enumerate every conv in the reference HRNet (the architecture is
   parity-pinned, so layer shapes are identical) with a hook forward at
   128x128, scaling spatial M by pixels (FLOPs are scale-invariant,
   verified in tools_refbench.py).
2. Apply THIS framework's measured routing to each layer (the region ->
   packing-factor/taps table the traces validated: stem+layer1+branch-0
   chains width-packed f2, SegEncoder f4, tiny-cout heads taps-in-N,
   everything else dense NHWC) and compute its MXU-padded FLOPs:
   bf16 lane tiling pads the contraction (cin_eff) and output (cout_eff)
   channel dims to multiples of 128, so
       padded = logical * pad128(cin_eff)/cin_eff * pad128(cout_eff)/cout_eff.
   Width-packing by f multiplies both effective channel widths by f
   (exact math, ops/packed_conv.py); taps-in-N moves the 3x3's 9 taps
   into the output dim (cout_eff = 9*cout, kernel leaves K=cin).
3. Report logical + padded GFLOPs/frame and the padded speed-of-light
   fps at the chip's bf16 peak, next to the measured fps.

Prints one JSON line; pure host arithmetic after one tiny torch forward.
"""

from __future__ import annotations

import argparse
import json

V5E_BF16_TFLOPS = 197.0  # published v5e peak (bf16)


def pad128(c: int) -> int:
    return -(-c // 128) * 128


def gather_layers(hw=(128, 128), highres_large=False):
    """(name, cin, cout, kh, kw, out_pixels) for every conv, via the same
    standalone reference oracle the parity tests use."""
    import torch

    from tools_refbench import load_ref_hrnet

    mod = load_ref_hrnet()
    ns = argparse.Namespace(
        syn_type="inter", mode="xs2xs", highres_large=highres_large,
        num_pred_once=1, fix_init_frames=False, inpaint=False,
        inpaint_mask=False)
    model = mod.HRNet(ns).eval()
    layers = []

    def make_hook(name):
        def hook(m, inp, out):
            layers.append((name, m.in_channels // m.groups, m.out_channels,
                           m.kernel_size[0], m.kernel_size[1],
                           out.shape[-2] * out.shape[-1]))
        return hook

    handles = []
    for name, m in model.named_modules():
        if isinstance(m, torch.nn.Conv2d):
            handles.append(m.register_forward_hook(make_hook(name)))
    with torch.no_grad():
        model(torch.randn(1, 46, *hw))
    for h in handles:
        h.remove()
    return layers


def route(name: str):
    """(packing_factor, taps) for a layer under this framework's measured
    routing (models/hrnet.py gates; README perf notes)."""
    if name.startswith("seg_encoder"):
        return 4, False
    if name in ("conv1", "conv2") or name.startswith("layer1"):
        return 2, False
    # branch-0 chains of stage2/3 run packed (branches.0); transition1.0
    # feeds them packed
    if (".branches.0." in name) or name.startswith("transition1.0"):
        return 2, False
    if name.startswith(("rgb_layer.2", "seg_layer.2")):
        return 1, True   # tiny-cout 3x3 -> taps-in-N
    return 1, False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=str, default="512,1024")
    ap.add_argument("--measured-fps", type=float, default=None,
                    help="measured bench fps to compare against")
    ap.add_argument("--highres-large", action="store_true",
                    help="the 4-branch HIGH4 config (nets/HRNet.py:313-334)")
    args = ap.parse_args()
    h, w = (int(v) for v in args.hw.split(","))

    base = gather_layers(highres_large=args.highres_large)
    scale = (h * w) / (128 * 128)
    logical = padded = 0.0
    by_region: dict = {}
    for name, cin, cout, kh, kw, pix in base:
        m = pix * scale
        lf = 2.0 * m * cin * kh * kw * cout
        f, taps = route(name)
        if taps:
            cin_eff, cout_eff = cin, 9 * cout
            pf = lf * (pad128(cin_eff) / cin_eff) * (pad128(cout_eff) / cout_eff)
        else:
            cin_eff, cout_eff = cin * f, cout * f
            pf = lf * (pad128(cin_eff) / cin_eff) * (pad128(cout_eff) / cout_eff)
        logical += lf
        padded += pf
        region = name.split(".")[0]
        r = by_region.setdefault(region, [0.0, 0.0])
        r[0] += lf
        r[1] += pf
    # 2 seg_encoder calls per forward (two frames)
    se_l, se_p = by_region.get("seg_encoder", (0.0, 0.0))
    logical += se_l
    padded += se_p
    by_region["seg_encoder"] = [2 * se_l, 2 * se_p]

    sol_fps = V5E_BF16_TFLOPS * 1e12 / padded
    out = {
        "metric": "padded_flop_roofline",
        "config": f"{h}x{w}_bf16"
                  + ("_hl4" if args.highres_large else ""),
        "gflops_logical": round(logical / 1e9, 1),
        "gflops_padded": round(padded / 1e9, 1),
        "padding_expansion": round(padded / logical, 3),
        "padded_speed_of_light_fps": round(sol_fps, 2),
        "regions": {k: {"logical_g": round(v[0] / 1e9, 1),
                        "padded_g": round(v[1] / 1e9, 1)}
                    for k, v in sorted(by_region.items(),
                                       key=lambda kv: -kv[1][1])},
    }
    if args.measured_fps:
        out["measured_fps"] = args.measured_fps
        out["pct_of_padded_sol"] = round(
            100 * args.measured_fps / sol_fps, 1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
