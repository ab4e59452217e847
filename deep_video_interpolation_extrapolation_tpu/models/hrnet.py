"""HRNet-family coarse generators (Flax, NHWC).

TPU-native re-design of the reference coarse models:
- ``HRNet`` (nets/HRNet.py:339-601): seg-encoder + stem + Bottleneck layer1 +
  2-branch then 3-branch (optionally 4-branch with ``highres_large``)
  high-resolution modules with fuse layers, upsample-concat, rgb/seg heads.
  BatchNorm is deliberately absent, matching the reference (commented out
  throughout nets/HRNet.py).
- ``VAEHRNet`` (nets/HRNet.py:702-1061): HRNet conditioned on a conv-VAE
  latent decoded to a 32-ch feature plane.
- ``InpaintUnet`` (nets/HRNet.py:618-699): dilated-bottleneck U-Net that
  inpaints masked regions and composites with the coarse rgb.

Differences from the reference (intentional, documented):
- NHWC + channels-last heads (TPU conv layout).
- VAE latent dims generalize to input sizes other than 128x128: the
  reference hard-codes 1024 = 16*8*8 (nets/HRNet.py:762-763,974-981); we use
  16*(H/16)*(W/16) so the same module works at 128x256 and 1024x512.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from deep_video_interpolation_extrapolation_tpu.models.blocks import (
    BasicBlock,
    Bottleneck,
    Conv,
    ConvT,
    ResnetBlock,
    SegEncoder,
    lrelu,
)
from deep_video_interpolation_extrapolation_tpu.ops.resize import (
    interpolate_bilinear,
)

Dtype = Any

# stage configs (nets/HRNet.py:239-330)
STAGE2_CFG = dict(num_branches=2, num_blocks=(4, 4), num_channels=(64, 128))
STAGE3_CFG = dict(num_branches=3, num_blocks=(4, 4, 4), num_channels=(64, 128, 256))
STAGE4_CFG = dict(num_branches=4, num_blocks=(4, 4, 4, 4), num_channels=(64, 128, 256, 512))


def _fuse_upsample(t: jnp.ndarray, size) -> jnp.ndarray:
    """Fuse-layer bilinear upsample (nets/HRNet.py:219-222).

    On TPU/bf16 the default is the depthwise-convT 2x/4x form: the
    jax.image.resize lowering costs ~10.5 ms/step of layout copies around
    its transposed dot_generals (profiled at 8x512x1024; in-model A/B
    294.7 -> 286.7 ms/step).  DVIE_FUSE_UPS selects "resize" or "lane"
    (elementwise phase-major lane packing; A/B'd at 317.6 — the
    interleave reshapes relayout-copy every output) — all three are the
    same math to bf16 rounding.
    """
    import os

    from deep_video_interpolation_extrapolation_tpu.ops.resize import (
        upsample2x_convt,
        upsample2x_lane,
        upsample4x_convt,
        upsample4x_lane,
    )
    sh, sw = size
    h, w = t.shape[1:3]
    mode = os.environ.get("DVIE_FUSE_UPS", "convt")
    if (jax.default_backend() == "tpu" and t.dtype == jnp.bfloat16
            and mode in ("convt", "lane")):
        two, four = ((upsample2x_convt, upsample4x_convt) if mode == "convt"
                     else (upsample2x_lane, upsample4x_lane))
        if (sh, sw) == (2 * h, 2 * w):
            return two(t)
        if (sh, sw) == (4 * h, 4 * w):
            return four(t)
    return interpolate_bilinear(t, size=size, align_corners=False)


class HighResolutionModule(nn.Module):
    """Parallel multi-resolution branches + full fuse (nets/HRNet.py:88-227)."""
    num_branches: int
    num_blocks: Tuple[int, ...]
    num_channels: Tuple[int, ...]
    multi_scale_output: bool = True
    dtype: Optional[Dtype] = None
    # branch 0's input already arrives width-packed at factor 2 (from a
    # packed _Transition or the previous stage's packed out-0).
    branch0_packed: bool = False
    # emit out-0 in the packed layout too: the fuse sum runs packed (the
    # 2x up-contribution via the elementwise packed upsampler, 4x via one
    # pack relayout) so branch-0 never unpacks between stages — the
    # unpack/re-pack retile copies cost ~3.1 ms each per stage at
    # 8x512x1024 bf16 (trace-verified) and drag the fuse lrelu into
    # mixed-layout select fusions.
    keep_packed_out0: bool = False
    # the fused out-0 Pallas kernel (ops/pallas_fuse0.py) computes
    # lrelu(y0 + up2(t1) [+ up4(t2)]) in one VMEM pass; this field selects
    # its output layout (packed feeds the next stage's packed chain)
    fuse0_packed_out: bool = False
    # bypass Pallas fast paths when activations are spatially sharded
    spatial_sharded: bool = False

    def _fuse0_gate(self, y0_packed, t1_like) -> bool:
        """Single source of truth for "will the fused out-0 kernel run".

        Consulted twice per module: early (with a branch-1 shape proxy) to
        decide whether branch 0 may honor the cross-stage packing
        contract by staying packed, and late to route the actual out-0
        fuse.  Both sites MUST agree — a one-sided edit here once broke
        the packed contract and tripped the consumer BasicBlock's channel
        assert at trace time.
        """
        import os

        from deep_video_interpolation_extrapolation_tpu.core.hw import (
            pallas_enabled,
        )
        from deep_video_interpolation_extrapolation_tpu.ops import pallas_fuse0

        return (self.num_branches in (2, 3) and self.multi_scale_output
                and not self.spatial_sharded and pallas_enabled()
                and os.environ.get("DVIE_FUSE0", "1") != "0"
                and pallas_fuse0.fits(y0_packed, t1_like))

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray]):
        import jax as _jax

        from deep_video_interpolation_extrapolation_tpu.ops.packed_conv import (
            pack_w,
            unpack_w,
        )
        ys = []
        y0_packed = False
        y0_packed_t = None   # packed branch-0 output kept for the down-fuses
        for i in range(self.num_branches):
            h = xs[i]
            pre_packed = self.branch0_packed and i == 0
            # full-resolution 64-ch branch: run the whole block chain in the
            # width-packed layout (one relayout in, one out) so each conv
            # sees 128 MXU lanes (ops/packed_conv.py; exact math).
            packable = pre_packed or (
                self.num_channels[i] == 64 and h.shape[2] % 2 == 0
                and h.shape[2] >= 128 and h.shape[-1] == 64
                and _jax.default_backend() == "tpu")
            if packable and not pre_packed:
                h = pack_w(h, 2)
            # fused fwd+bwd branch-chain kernels (ops/pallas_trainchain):
            # the whole N-block chain in one kernel per pass — block
            # interiors never touch HBM; the backward recomputes them in
            # VMEM from the saved chain input.  Small-res (train-recipe)
            # shapes only (bb_fits); the 512x1024 inference path keeps
            # its proven per-conv A+E kernels.
            import os as _os

            from deep_video_interpolation_extrapolation_tpu.core.hw import (
                pallas_enabled as _pe_hrm,
            )
            use_bbchain = False
            # DVIE_BBCHAIN: all | b0 (packed branch 0 only) | rest | 0.
            # Default b0 (261.6 vs 249.8 samples/s at the 128x128 bs32
            # recipe; rest-only 237.0 and all 243.9 are measured
            # refutations, docs/TRAINBENCH_r5.md).  HISTORY: the first
            # b0 build used revisited-constant weight-grad accumulator
            # blocks and CORRUPTED an unrelated buffer (inf in
            # coarse_ce_loss at bs32 in-step while finite standalone and
            # at bs8) — every chain bwd kernel now emits per-program
            # grad partials summed by XLA outside, which fixed the
            # corruption AND measured faster; the accumulator pattern is
            # banned from these kernels (pallas_trainchain notes).
            _bbmode = _os.environ.get("DVIE_BBCHAIN", "b0")
            _bb_allowed = (_bbmode == "all"
                           or (_bbmode == "b0" and packable)
                           or (_bbmode == "rest" and not packable))
            if (_bb_allowed and not self.spatial_sharded and _pe_hrm()
                    and _os.environ.get("DVIE_TRAINCHAIN", "1") != "0"
                    and (packable or self.num_channels[i] == h.shape[-1])):
                from deep_video_interpolation_extrapolation_tpu.ops import (
                    pallas_trainchain as _tcn,
                )
                use_bbchain = _tcn.bb_fits(
                    h, self.num_blocks[i], dtype=self.dtype or h.dtype)
            if use_bbchain:
                from deep_video_interpolation_extrapolation_tpu.ops import (
                    pallas_trainchain as _tcn,
                )
                pairs = [BasicBlock(self.num_channels[i], dtype=self.dtype,
                                    spatial_sharded=self.spatial_sharded)(
                             None, return_params=True)
                         for _ in range(self.num_blocks[i])]
                h = h.astype(self.dtype or h.dtype)
                _interp = _jax.default_backend() != "tpu"
                if packable:
                    h = _tcn.bb_chain_packed(h, pairs, interpret=_interp)
                else:
                    h = _tcn.bb_chain_nhwc(h, pairs, f=1,
                                           interpret=_interp)
            else:
                for _ in range(self.num_blocks[i]):
                    h = BasicBlock(self.num_channels[i], dtype=self.dtype,
                                   packed_io=2 if packable else 0,
                                   spatial_sharded=self.spatial_sharded)(h)
            if i == 0:
                y0_packed = packable
                if packable and not self.keep_packed_out0:
                    keep_for_contract = False
                    if self.fuse0_packed_out:
                        # the NEXT stage was built to consume a PACKED
                        # out-0 (branch0_packed); if the fused out-0
                        # kernel cannot run at this shape, the generic
                        # path must still emit packed (keep_packed_out0
                        # semantics) — an unpacked emission here would
                        # break the cross-stage packing contract and trip
                        # the consumer BasicBlock's channel assert.
                        # Branch 1 isn't computed yet, so gate on a shape
                        # proxy via the SHARED predicate (_fuse0_gate).
                        t1_proxy = _jax.ShapeDtypeStruct(
                            (h.shape[0], xs[1].shape[1], xs[1].shape[2],
                             self.num_channels[0]), h.dtype)
                        keep_for_contract = not self._fuse0_gate(h, t1_proxy)
                    if not keep_for_contract:
                        # keep the packed tensor too: the j<i stride-2
                        # fuse convs consume it directly (packed_io), so
                        # the unpacked copy has exactly ONE conv consumer
                        # (the out-0 fuse sum) — with two consumers XLA
                        # materializes a second full-res relayout copy
                        # (~3.1 ms/stage at 8x512x1024 bf16,
                        # trace-verified)
                        y0_packed_t = h
                        h = unpack_w(h, 2)
                        y0_packed = False
            ys.append(h)
        if self.num_branches == 1:
            return ys

        full_size = ((ys[0].shape[1], ys[0].shape[2] * 2) if y0_packed
                     else ys[0].shape[1:3])
        use_fuse0 = (y0_packed_t is not None
                     and self._fuse0_gate(y0_packed_t, ys[1]))
        if use_fuse0:
            import os as _os

            from deep_video_interpolation_extrapolation_tpu.ops import (
                pallas_fuse0,
            )
        outs = []
        n_out = self.num_branches if self.multi_scale_output else 1
        for i in range(n_out):
            if i == 0 and use_fuse0:
                # fused out-0: the 1x1 fuse convs stay on XLA (tiny), the
                # upsample+sum+lrelu runs in one Pallas pass; param names
                # match the unfused path (fuse_0_1 / fuse_0_2)
                t1 = Conv(self.num_channels[0], 1, padding=0, use_bias=False,
                          dtype=self.dtype, name="fuse_0_1")(ys[1])
                t2 = None
                if self.num_branches >= 3:
                    t2 = Conv(self.num_channels[0], 1, padding=0,
                              use_bias=False, dtype=self.dtype,
                              name="fuse_0_2")(ys[2])
                if (self.fuse0_packed_out
                        and _os.environ.get("DVIE_FUSE0_HWNC", "1") != "0"):
                    # packed-out stage boundary: the HWNC f2 kernel keeps
                    # branch-0 in the chain's {3,0,2,1} physical layout end
                    # to end — the NHWC/f4 form pays ~5 ms of retile copies
                    # here at 8x512x1024 bf16 (ops/pallas_fuse0.py)
                    hw = lambda a: jnp.transpose(a, (1, 2, 0, 3))
                    y0h = hw(y0_packed_t)
                    if pallas_fuse0.fits_hwnc(y0h, hw(t1)):
                        out_h = pallas_fuse0.fused_out0_hwnc(
                            y0h, hw(t1), None if t2 is None else hw(t2))
                        outs.append(jnp.transpose(out_h, (2, 0, 1, 3)))
                        continue
                outs.append(pallas_fuse0.fused_out0(
                    y0_packed_t, t1, t2, self.fuse0_packed_out))
                continue
            y = None
            packed_sum = i == 0 and y0_packed
            for j in range(self.num_branches):
                if j == i:
                    t = ys[j]
                elif j > i:
                    t = Conv(
                        self.num_channels[i], 1, padding=0, use_bias=False,
                        dtype=self.dtype, name=f"fuse_{i}_{j}",
                    )(ys[j])
                    size = full_size if i == 0 else ys[i].shape[1:3]
                    if packed_sum and size == (2 * t.shape[1], 2 * t.shape[2]):
                        from deep_video_interpolation_extrapolation_tpu.ops.resize import (
                            upsample2x_to_packed,
                        )
                        t = upsample2x_to_packed(t)
                    else:
                        t = _fuse_upsample(t, size)
                        if packed_sum:
                            t = pack_w(t, 2)
                else:  # j < i: chain of stride-2 3x3 convs
                    t = ys[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        out_ch = self.num_channels[i] if last else self.num_channels[j]
                        packed_src = (j == 0 and k == 0
                                      and (y0_packed or y0_packed_t is not None))
                        if packed_src and y0_packed_t is not None:
                            t = y0_packed_t
                        t = Conv(
                            out_ch, 3, stride=2, use_bias=False,
                            dtype=self.dtype,
                            packed_io=2 if packed_src else 0,
                            name=f"fuse_{i}_{j}_{k}",
                        )(t)
                        if not last:
                            t = lrelu(t)
                y = t if y is None else y + t
            outs.append(lrelu(y))
        return outs


class _Transition(nn.Module):
    """Branch-count/channel transition (nets/HRNet.py:444-477).

    ``packed_in=f``: every entry of ``xs`` arrives in the width-packed
    (B,H,W/f,f*C) layout.  Same-resolution 3x3 convs then run packed (their
    outputs STAY packed); the first conv of each new stride-2 branch
    consumes the packed layout directly and emits ordinary unpacked output
    (ops/packed_conv.py pack_kernel_3x3_stride2_in).  Params unchanged.
    """
    pre_channels: Tuple[int, ...]
    cur_channels: Tuple[int, ...]
    dtype: Optional[Dtype] = None
    packed_in: int = 0
    spatial_sharded: bool = False

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray]):
        f = int(self.packed_in)
        outs = []
        for i, c in enumerate(self.cur_channels):
            if i < len(self.pre_channels):
                if self.pre_channels[i] != c:
                    if f:
                        from deep_video_interpolation_extrapolation_tpu.models.blocks import (
                            _ae_or_conv,
                        )
                        outs.append(_ae_or_conv(
                            xs[i], c, f, self.dtype, self.spatial_sharded,
                            name=f"trans_{i}"))
                    else:
                        outs.append(
                            lrelu(Conv(c, 3, use_bias=False, dtype=self.dtype,
                                       name=f"trans_{i}")(xs[i]))
                        )
                else:
                    h = xs[i]
                    if f:
                        from deep_video_interpolation_extrapolation_tpu.ops.packed_conv import (
                            unpack_w,
                        )
                        h = unpack_w(h, f)
                    outs.append(h)
            else:
                t = xs[-1]
                for j in range(i + 1 - len(self.pre_channels)):
                    out_ch = c if j == i - len(self.pre_channels) else self.pre_channels[-1]
                    t = lrelu(Conv(out_ch, 3, stride=2, use_bias=False,
                                   dtype=self.dtype,
                                   packed_io=f if j == 0 else 0,
                                   name=f"trans_{i}_{j}")(t))
                outs.append(t)
        return outs


def _layer1_boundary_chain(x: jnp.ndarray, f: int, dtype,
                           hwnc: bool = False,
                           interpret: bool = False) -> jnp.ndarray:
    """layer1 with fused block boundaries (must be called from the owning
    module's compact ``__call__``; Bottleneck param names are unchanged).

    Per block: conv2's packed 3x3 stays on XLA (padded-FLOP-wall bound);
    the boundary — conv3 + residual + lrelu + next block's conv1+lrelu —
    is one Pallas pass (ops/pallas_chain.py).  Math identical to the
    unfused blocks (f32-acc dots cast to the compute dtype, as the XLA
    packed convs emit).

    ``hwnc=True``: ``x`` is logically (H, W/f, B, f*C) — the HWNC chain
    form whose row-major layout is bit-identical to the {3,0,2,1}
    physical layout XLA gives the NHWC packed convs, so the Pallas
    boundary kernels drop in with zero relayout copies (the losing NHWC
    A/B — 28.66 -> 27.78 fps — paid two full-size copies per call).
    ``fused_boundary`` flattens all leading dims to rows, so it is
    layout-agnostic; only the conv dimension numbers change.
    """
    import functools

    from deep_video_interpolation_extrapolation_tpu.ops import pallas_chain
    from deep_video_interpolation_extrapolation_tpu.ops.packed_conv import (
        pack_kernel_1x1,
        pack_kernel_3x3,
    )

    cin0 = x.shape[-1] // f
    blocks = []
    for i in range(4):
        blk = Bottleneck(64, dtype=dtype, packed_io=f,
                         in_features=cin0 if i == 0 else 256,
                         name=f"layer1_{i}")
        blocks.append(blk(None, return_params=True))

    dt = dtype or x.dtype
    dn = ("HWNC", "HWIO", "HWNC") if hwnc else ("NHWC", "HWIO", "NHWC")
    conv = functools.partial(
        jax.lax.conv_general_dilated, window_strides=(1, 1),
        dimension_numbers=dn,
        preferred_element_type=dt)
    x = x.astype(dt)
    # whole-tail fusion (conv2 + conv3 + residual + lrelu + next conv1 in
    # one kernel) is the HWNC default: XLA fuses conv2 into the boundary
    # fusion on its own, so the boundary-only kernel under-delivers
    # (see ops/pallas_chain.fused_block).  DVIE_HWNC_V1BOUNDARY=1 selects
    # the boundary-only form for A/B.
    import os as _os
    whole = (hwnc and pallas_chain.block_fits(x)
             and _os.environ.get("DVIE_HWNC_V1BOUNDARY", "0") != "1")
    # conv2 A+E split inside the fused block: exact only because every k2
    # here comes from pack_kernel_3x3 (structured zeros), so the env gate
    # lives at THIS call site, not inside the kernel (33.93 -> 34.07 fps).
    block_ae = _os.environ.get("DVIE_BLOCK_AE", "1") != "0"
    h1 = lrelu(conv(x, pack_kernel_1x1(blocks[0][0], f).astype(dt),
                    padding="VALID"))
    for i, (_k1, k2, k3, kres) in enumerate(blocks):
        k3p = pack_kernel_1x1(k3, f)[0, 0].astype(dt)
        kresp = (pack_kernel_1x1(kres, f)[0, 0].astype(dt)
                 if kres is not None else None)
        k1n = blocks[i + 1][0] if i < len(blocks) - 1 else None
        k1np = (pack_kernel_1x1(k1n, f)[0, 0].astype(dt)
                if k1n is not None else None)
        if whole:
            x, h1 = pallas_chain.fused_block(
                h1, x, pack_kernel_3x3(k2, f).astype(dt), k3p, kresp, k1np,
                interpret, block_ae)
        else:
            h2 = lrelu(conv(h1, pack_kernel_3x3(k2, f).astype(dt),
                            padding="SAME"))
            x, h1 = pallas_chain.fused_boundary(h2, x, k3p, kresp, k1np,
                                                interpret)
    return x


def _pack_factor(x: jnp.ndarray) -> int:
    """Width-pack factor for the full-res stem/layer1 chain (0 = unpacked).

    The 64-ch convs are lane-starved at <128 channels on the MXU; packing
    doubles every operand's lane width for exact math (ops/packed_conv.py).
    Deterministic in the input shape so ``__call__`` and the rematted
    ``_stem_layer1`` segment can both derive it independently."""
    return 2 if (jax.default_backend() == "tpu" and x.shape[2] % 2 == 0
                 and x.shape[2] >= 256) else 0


class _HRBackbone(nn.Module):
    """Stem + layer1 + stage2/3(/4) + upsample-concat (shared by HRNet/VAEHRNet).

    ``return_parts=True`` skips the upsample-concat and returns the raw
    multi-resolution pyramid (for the fused upsample+head kernel,
    ops/pallas_upshead.py).
    """
    highres_large: bool = False
    dtype: Optional[Dtype] = None
    return_parts: bool = False
    # activations are sharded over a spatial mesh axis: Pallas fast paths
    # assume full (unsharded) spatial extents, so they must be bypassed
    # (the XLA compositions partition correctly under SPMD)
    spatial_sharded: bool = False
    # --remat: checkpoint at STAGE granularity (stem+layer1, each
    # transition, each stage module).  The backward then holds one
    # segment's interior plus the segment-boundary tensors, instead of
    # every full-res activation at once — a whole-forward jax.checkpoint
    # (the runners' old behavior) recomputes the forward but still peaks
    # at the same live set while differentiating it, which saved nothing
    # at 512x1024 (37.3G -> 37.5G peak; docs/TRAINBENCH_r3.md).
    remat: bool = False

    def _stem_layer1(self, x: jnp.ndarray) -> jnp.ndarray:
        """Stem conv1/conv2 + layer1 Bottlenecks (nets/HRNet.py:367-375).

        Factored out of ``__call__`` so ``remat=True`` can checkpoint the
        full-resolution chain — the single largest activation region — as
        its own segment.  Must be called from the compact ``__call__``
        (submodules attach to the ambient scope); param names unchanged.
        """
        # The full-resolution stem + layer1 chain runs width-packed on TPU
        # (one relayout in, one out).  Measured ~1.5x on this chain.
        f = _pack_factor(x)
        import os
        from deep_video_interpolation_extrapolation_tpu.core.hw import (
            pallas_enabled as _pe,
        )
        if f:
            from deep_video_interpolation_extrapolation_tpu.ops.packed_conv import (
                pack_w,
            )
            x = pack_w(x, f)
        # layer1 boundary fusion (conv3 1x1 + residual + lrelu + next
        # conv1 1x1 in one Pallas pass, ops/pallas_chain.py) runs in the
        # HWNC chain form by default: stem + layer1 operate on logical
        # (H, W/f, B, f*C) tensors whose row-major layout is bit-identical
        # to the {3,0,2,1} physical layout XLA assigns the NHWC packed
        # convs (measured identical conv speed), so the kernel's required
        # row-major IO costs ZERO relayout copies.  The old NHWC insertion
        # (DVIE_CHAIN_BOUNDARY=1) lost 28.66 -> 27.78 fps paying two
        # full-size copies per call; entry/exit transposes of the HWNC
        # region lower to bitcasts.  DVIE_HWNC_L1=0 disables.  Parity
        # pinned by test_pallas_chain (both forms).
        use_hwnc = False
        use_chain = False
        if f == 2 and _pe() and not self.spatial_sharded:
            from deep_video_interpolation_extrapolation_tpu.ops import (
                pallas_chain,
            )
            if pallas_chain.boundary_fits_rows(x):
                if os.environ.get("DVIE_HWNC_L1", "1") != "0":
                    use_hwnc = True
                elif os.environ.get("DVIE_CHAIN_BOUNDARY", "0") == "1":
                    use_chain = True
        if use_hwnc:
            x = jnp.transpose(x, (1, 2, 0, 3))  # (H, W/f, B, f*C)
            x = lrelu(Conv(64, 3, dtype=self.dtype, packed_io=f, hwnc=True,
                           name="conv1")(x))
            # stem conv2 (64->64, bias=True, nets/HRNet.py:370) is a
            # dense-packed 2x-FLOP wall; the A+E kernel runs it at 1.33x
            # with the bias+lrelu fused.  conv1 stays dense: its K =
            # f*14 pads to 128 either way and A+E would pay that pad in
            # TWO dots.  DEFAULT ON since the r2 TPU A/B: 35.85/35.83 fps
            # vs 35.64/35.67 base at 8x512x1024 bf16 (docs/ABLOG_r2.md);
            # DVIE_AE_STEM=0 disables.
            stem_ae = os.environ.get("DVIE_AE_STEM", "1") != "0"
            if stem_ae:
                from deep_video_interpolation_extrapolation_tpu.ops.pallas_ae_conv import (
                    conv3x3_packed_ae_hwnc,
                    hwnc_fits,
                )
                stem_ae = hwnc_fits(x, f)
            if stem_ae:
                k2s, b2s = Conv(64, 3, dtype=self.dtype, in_features=64,
                                name="conv2")(None, return_params=True)
                x = conv3x3_packed_ae_hwnc(
                    x.astype(self.dtype or x.dtype), k2s, None, True, f,
                    False, b2s)
            else:
                x = lrelu(Conv(64, 3, dtype=self.dtype, packed_io=f,
                               hwnc=True, name="conv2")(x))
            x = _layer1_boundary_chain(x, f, self.dtype, hwnc=True)
            x = jnp.transpose(x, (2, 0, 1, 3))  # back to (B, H, W/f, f*C)
        elif (not f and _pe() and not self.spatial_sharded
                and os.environ.get("DVIE_TRAINCHAIN", "1") != "0"
                and self._trainchain_fits(x)):
            # small-resolution (train-recipe) path: the whole stem+layer1
            # chain through the fused fwd+bwd packed kernels — h1/h2 stay
            # in VMEM in BOTH passes; the backward recomputes them from
            # the saved block inputs instead of re-streaming HBM
            # (ops/pallas_trainchain.py; TRAINBENCH_r4's open lever)
            x = self._trainchain(x)
        else:
            # stem (nets/HRNet.py:367-373)
            x = lrelu(Conv(64, 3, dtype=self.dtype, packed_io=f,
                           name="conv1")(x))
            x = lrelu(Conv(64, 3, dtype=self.dtype, packed_io=f,
                           name="conv2")(x))
            # layer1: 4 Bottlenecks 64->256 (nets/HRNet.py:375)
            if use_chain:
                x = _layer1_boundary_chain(x, f, self.dtype)
            else:
                for i in range(4):
                    x = Bottleneck(64, dtype=self.dtype, packed_io=f,
                                   spatial_sharded=self.spatial_sharded,
                                   name=f"layer1_{i}")(x)
        return x

    def _trainchain_fits(self, x) -> bool:
        from deep_video_interpolation_extrapolation_tpu.ops import (
            pallas_trainchain,
        )
        return pallas_trainchain.fits(x, dtype=self.dtype or x.dtype)

    def _trainchain(self, x: jnp.ndarray) -> jnp.ndarray:
        """stem + layer1 via the fused fwd+bwd packed chain kernels.

        Param names/shapes identical to the unfused path (Conv/Bottleneck
        return_params pattern, as in _layer1_boundary_chain)."""
        from deep_video_interpolation_extrapolation_tpu.ops import (
            pallas_trainchain,
        )
        dt = self.dtype or x.dtype
        cin = x.shape[-1]
        k1s, b1s = Conv(64, 3, dtype=self.dtype, in_features=cin,
                        name="conv1")(None, return_params=True)
        k2s, b2s = Conv(64, 3, dtype=self.dtype, in_features=64,
                        name="conv2")(None, return_params=True)
        blocks = []
        for i in range(4):
            blocks.append(Bottleneck(
                64, dtype=self.dtype, in_features=64 if i == 0 else 256,
                name=f"layer1_{i}")(None, return_params=True))
        return pallas_trainchain.stem_layer1_chain(
            x.astype(dt), (k1s, b1s, k2s, b2s), blocks,
            interpret=jax.default_backend() != "tpu")

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f = _pack_factor(x)
        import os
        from deep_video_interpolation_extrapolation_tpu.core.hw import (
            pallas_enabled as _pe,
        )
        if self.remat:
            # prevent_cse=False: everything here runs under jit (never raw
            # pmap), where CSE across the checkpoint boundary is safe and
            # the flag only costs optimization barriers
            x = nn.remat(_HRBackbone._stem_layer1,
                         prevent_cse=False)(self, x)
            HRM = nn.remat(HighResolutionModule, prevent_cse=False)
            TR = nn.remat(_Transition, prevent_cse=False)
        else:
            x = self._stem_layer1(x)
            HRM, TR = HighResolutionModule, _Transition

        # transition1 consumes the packed layer1 output directly: trans_0's
        # 3x3 stays packed (feeding stage2's branch-0 chain with no
        # relayout); trans_1_0's stride-2 conv consumes packed, emits
        # unpacked — the packed region ends per-branch, never via a bulk
        # unpack of the 256-ch full-res tensor.
        xs = TR((256,), STAGE2_CFG["num_channels"], dtype=self.dtype,
                packed_in=f, spatial_sharded=self.spatial_sharded,
                name="transition1")([x])
        # keep_packed_out0 (branch-0 packed through the fuse sums and
        # across stage boundaries) was A/B'd at 312 vs 287 ms/step at
        # 8x512x1024 bf16 and stays OFF: the ~3.1 ms/stage unpack retiles
        # it removes are cheaper than the elementwise packed upsampler +
        # packed-sum relayouts it adds (DVIE_PACKED_STAGES=1 re-enables;
        # parity pinned by test_packed_conv.test_keep_packed_out0_*).
        kp = bool(f) and os.environ.get("DVIE_PACKED_STAGES", "0") == "1"
        # the fused out-0 kernel emits stage2's out-0 PACKED (feeding
        # stage3's packed branch chain with zero relayouts); stage3's own
        # out-0 comes out unpacked for the head stage
        f0 = (bool(f) and _pe() and not self.spatial_sharded and not kp
              and os.environ.get("DVIE_FUSE0", "1") != "0")
        xs = HRM(
            dtype=self.dtype, name="stage2", branch0_packed=bool(f),
            keep_packed_out0=kp, fuse0_packed_out=f0,
            spatial_sharded=self.spatial_sharded, **STAGE2_CFG)(xs)

        xs = TR(STAGE2_CFG["num_channels"], STAGE3_CFG["num_channels"],
                dtype=self.dtype, name="transition2")(xs)
        # --highres_large: keep branch0 packed THROUGH stage4 (the same
        # 1.5x packing + A+E machinery the 3-branch chain runs by
        # default); stage3's fuse-out0 then emits packed, transition3's
        # same-channel branch-0 passthrough carries it, stage4's branch
        # chain consumes it, and the final out0 unpacks for the heads.
        # Stays opt-in (DVIE_HL4_PACK=1): the r2 TPU A/B measured 18.57
        # fps vs 19.21 with the fused heads alone (docs/ABLOG_r2.md).
        hl4 = (self.highres_large and f0
               and os.environ.get("DVIE_HL4_PACK", "0") == "1")
        xs = HRM(
            dtype=self.dtype, name="stage3", branch0_packed=kp or f0,
            keep_packed_out0=kp, fuse0_packed_out=hl4,
            spatial_sharded=self.spatial_sharded, **STAGE3_CFG)(xs)

        if self.highres_large:
            xs = TR(STAGE3_CFG["num_channels"], STAGE4_CFG["num_channels"],
                    dtype=self.dtype, name="transition3")(xs)
            xs = HRM(
                dtype=self.dtype, name="stage4", branch0_packed=kp or hl4,
                keep_packed_out0=kp or hl4,
                spatial_sharded=self.spatial_sharded, **STAGE4_CFG)(xs)

        if kp or hl4:
            from deep_video_interpolation_extrapolation_tpu.ops.packed_conv import (
                unpack_w,
            )
            xs = [unpack_w(xs[0], 2)] + list(xs[1:])

        if self.return_parts:
            return xs
        # upsample-concat (nets/HRNet.py:575-582).  Measured note: feeding
        # the heads the parts list (K-distributed 1x1s, blocks.Conv list
        # input) avoids materializing this concat but is ~33 ms/step SLOWER
        # in-loop at 1024x512 bs8 — XLA materializes each partial-sum tensor
        # at full 448 channels, tripling the traffic the concat costs once.
        return _concat_pyramid(xs)


class _Head(nn.Module):
    """1x1 conv + lrelu + 3x3 conv head (nets/HRNet.py:410-442).

    Accepts either the channel-concat feature map or the list of pyramid
    parts (the 1x1 then K-distributes; same params, same math).  With
    ``h1`` given, the 1x1+lrelu was computed externally (by the fused
    upsample+dual-head kernel, ops/pallas_upshead.py) and only the 3x3
    runs here; ``fc1_params()`` exposes the 1x1 weights to that kernel.
    Param names match the historical compact auto-naming
    (Conv_0 = 1x1, Conv_1 = 3x3) — checkpoint-compatible.
    """
    out_dim: int
    cin: int
    dtype: Optional[Dtype] = None

    def setup(self):
        self.fc1 = Conv(self.cin, 1, padding=0, dtype=self.dtype,
                        in_features=self.cin, name="Conv_0")
        # tiny-Cout 3x3 runs taps-in-N (ops/tapped_conv.py): measured 84 ms
        # -> 47 ms for the dual-head region at 8x512x1024 bf16 on v5e
        self.conv2 = Conv(self.out_dim, 3, dtype=self.dtype,
                          tapped=self.out_dim * 9 <= 256,
                          in_features=self.cin, name="Conv_1")

    def __call__(self, x, h1=None):
        if h1 is None:
            h1 = lrelu(self.fc1(x))
        return self.conv2(h1)

    def fc1_params(self):
        return self.fc1(None, return_params=True)

    def conv2_params(self):
        return self.conv2(None, return_params=True)


def _finish_taps(yt: jnp.ndarray, co: int, b2: jnp.ndarray) -> jnp.ndarray:
    """Shifted-add + bias tail shared by every taps-producing head path.

    The standalone Pallas kernel (ops/pallas_shiftadd.py) reads the taps
    tensor in the producer's own row-major form to skip the XLA 5-D
    view's 6.0 ms retile (copy.357, r4 trace) — but MEASURED LOSES:
    35.21 vs 36.34 fps at the bench config (its 8 non-power-of-2 lane
    rolls out-cost the copies; third losing alternative after the
    flat-lane slices, ~10 ms, and the in-kernel fold, -2.7 fps).  Stays
    opt-in via DVIE_SHIFTADD=1; the XLA composition is the default
    (bf16 tap accumulation vs the kernel's f32; both within bf16
    rounding of each other)."""
    import os

    from deep_video_interpolation_extrapolation_tpu.core.hw import (
        pallas_enabled,
    )
    dt = yt.dtype
    if (pallas_enabled()
            and os.environ.get("DVIE_SHIFTADD", "0") == "1"):
        from deep_video_interpolation_extrapolation_tpu.ops import (
            pallas_shiftadd,
        )
        if pallas_shiftadd.fits(yt, co):
            return pallas_shiftadd.shifted_add_bias(yt, b2)
    from deep_video_interpolation_extrapolation_tpu.ops.tapped_conv import (
        taps_shifted_add,
    )
    return taps_shifted_add(yt, co) + b2.astype(dt)


def _apply_heads(run_backbone, rgb_dim: int, seg_dim: int,
                 highres_large: bool, dtype,
                 spatial_sharded: bool = False,
                 explicit_head_bwd: bool = True,
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Backbone tail + both heads, fused on TPU when shapes allow.

    Must be called from within the owning module's compact ``__call__``
    (submodules attach to the ambient context).  ``run_backbone(
    return_parts)`` builds + applies the backbone.  The fused path
    (ops/pallas_upshead.py) computes upsample-concat and both heads'
    1x1+lrelu in one Pallas pass over the stage pyramid.  Falls back to
    the XLA composition off-TPU, for highres_large (4 parts), for
    unsuitable shapes, or with DVIE_FUSED_HEAD=0.  NOTE: the pallas path
    assumes activations are not sharded over a spatial mesh axis.
    """
    import os

    n_ch = STAGE4_CFG["num_channels"] if highres_large else STAGE3_CFG["num_channels"]
    cin = sum(n_ch)
    rgb_head = _Head(rgb_dim, cin, dtype=dtype, name="rgb_layer")
    seg_head = _Head(seg_dim, cin, dtype=dtype, name="seg_layer")

    from deep_video_interpolation_extrapolation_tpu.core.hw import (
        pallas_enabled,
    )
    # 4-part (--highres_large) fused heads: DEFAULT ON (DVIE_FUSED_HEAD4=0
    # disables; ops/pallas_upshead.ups_head_taps4).  This is a correctness
    # gate, not just perf: the unfused tail materializes the 960-ch concat
    # + the 960-ch head h1 + a remat copy (3 x ~8 GB at 8x512x1024 bf16)
    # and hard-OOMs the 16 GB v5e HBM (round-3 repro: "Used 23.63G of
    # 15.75G hbm", copy.359/fusion.1888); the fused kernel streams the
    # pyramid through VMEM and only the 9*(Cr+Cs)-lane tap tensor lands
    # in HBM.  Measured 19.21 fps at that config (r2 AB12).
    use_fused4 = (pallas_enabled() and highres_large
                  and not spatial_sharded
                  and rgb_head.out_dim * 9 <= 128
                  and seg_head.out_dim * 9 <= 256
                  and os.environ.get("DVIE_FUSED_HEAD4", "1") != "0")
    if use_fused4:
        parts = run_backbone(True)
        from deep_video_interpolation_extrapolation_tpu.ops import pallas_upshead
        if pallas_upshead.fits4(*parts):
            from deep_video_interpolation_extrapolation_tpu.ops.tapped_conv import (
                build_dual_tap_kernel,
                taps_shifted_add,
            )
            (wr, br) = rgb_head.fc1_params()
            (ws, bs) = seg_head.fc1_params()
            w1 = jnp.concatenate([wr[0, 0], ws[0, 0]], axis=1)
            b1 = jnp.concatenate([br, bs]).astype(jnp.float32)
            (w2r, b2r) = rgb_head.conv2_params()
            (w2s, b2s) = seg_head.conv2_params()
            dt = parts[0].dtype
            w2t = build_dual_tap_kernel(w2r, w2s, dt)
            yt = pallas_upshead.ups_head_taps4(*parts, w1, b1, w2t)
            co = rgb_head.out_dim + seg_head.out_dim
            out = _finish_taps(yt, co, jnp.concatenate([b2r, b2s]))
            return out[..., :rgb_head.out_dim], out[..., rgb_head.out_dim:]
        # fits4 miss: fall through to the shared unfused tail below
        feat = _concat_pyramid(parts)
        return rgb_head(feat), seg_head(feat)
    use_fused = (pallas_enabled() and not highres_large
                 and not spatial_sharded
                 and os.environ.get("DVIE_FUSED_HEAD", "1") != "0")
    if use_fused:
        from deep_video_interpolation_extrapolation_tpu.ops import pallas_upshead
        taps_ok = (rgb_head.out_dim * 9 <= 128
                   and seg_head.out_dim * 9 <= 256)
        parts = list(run_backbone(True))
        # f4-x0: re-view stage-3's out-0 in the fuse0 producer's own f4
        # block form — the consumer-side reshape cancels the producer's
        # host view, so the kernel reads the buffer with zero retile
        # copies (kills copy.361; ops/pallas_upshead.ups_head_taps_x0f4).
        # The hidden width 2*cin must be a 128-multiple (the in-kernel
        # unpack-reshape target).
        x0f4 = None
        if (taps_ok and (2 * cin) % 128 == 0
                and parts[0].shape[-1] == n_ch[0]
                and parts[0].shape[2] % 4 == 0
                and os.environ.get("DVIE_HEAD_X0F4", "1") != "0"
                and os.environ.get("DVIE_UPSHEAD_FOLD", "0") != "1"):
            b0, h0, w0, c00 = parts[0].shape
            cand = parts[0].reshape(b0, h0, w0 // 4, 4 * c00)
            if pallas_upshead.fits_x0f4(cand, parts[1], parts[2], 2 * cin):
                x0f4 = cand
        if x0f4 is not None:
            from deep_video_interpolation_extrapolation_tpu.ops.tapped_conv import (
                build_dual_tap_kernel,
                taps_shifted_add,
            )
            (wr, br) = rgb_head.fc1_params()
            (ws, bs) = seg_head.fc1_params()
            w1 = jnp.concatenate([wr[0, 0], ws[0, 0]], axis=1)
            b1 = jnp.concatenate([br, bs]).astype(jnp.float32)
            (w2r, b2r) = rgb_head.conv2_params()
            (w2s, b2s) = seg_head.conv2_params()
            dt = parts[1].dtype
            w2t = build_dual_tap_kernel(w2r, w2s, dt)
            co = rgb_head.out_dim + seg_head.out_dim
            yt = pallas_upshead.ups_head_taps_x0f4(
                x0f4, parts[1], parts[2], w1, b1, w2t, explicit_head_bwd)
            out = _finish_taps(yt, co, jnp.concatenate([b2r, b2s]))
            return out[..., :rgb_head.out_dim], out[..., rgb_head.out_dim:]
        if pallas_upshead.fits(*parts):
            (wr, br) = rgb_head.fc1_params()
            (ws, bs) = seg_head.fc1_params()
            w1 = jnp.concatenate([wr[0, 0], ws[0, 0]], axis=1)
            b1 = jnp.concatenate([br, bs]).astype(jnp.float32)
            if rgb_head.out_dim * 9 <= 128 and seg_head.out_dim * 9 <= 256:
                # both heads' 3x3s fold into the kernel as one taps-in-N
                # matmul: only the 9*(Cr+Cs)-lane tap tensor leaves VMEM
                # (lane-slicing h before separate convs would materialize
                # two full-size copies); finish with the 9-way shifted add
                from deep_video_interpolation_extrapolation_tpu.ops.tapped_conv import (
                    build_dual_tap_kernel,
                    taps_shifted_add,
                )
                (w2r, b2r) = rgb_head.conv2_params()
                (w2s, b2s) = seg_head.conv2_params()
                dt = parts[0].dtype
                w2t = build_dual_tap_kernel(w2r, w2s, dt)
                co = rgb_head.out_dim + seg_head.out_dim
                b2 = jnp.concatenate([b2r, b2s])
                # folded variant: shifted-add + bias in-kernel, the
                # 9*co-lane tap tensor never leaves VMEM (opt-in pending
                # the TPU lane-roll probe + A/B; ops/pallas_upshead.py)
                if (os.environ.get("DVIE_UPSHEAD_FOLD", "0") == "1"
                        and pallas_upshead.fits_fold(*parts)):
                    out = pallas_upshead.ups_head_taps_fold(
                        *parts, w1, b1, w2t, b2)
                    return (out[..., :rgb_head.out_dim],
                            out[..., rgb_head.out_dim:])
                yt = pallas_upshead.ups_head_taps(*parts, w1, b1, w2t,
                                                  explicit_head_bwd)
                out = _finish_taps(yt, co, b2)
                return out[..., :rgb_head.out_dim], out[..., rgb_head.out_dim:]
            h = pallas_upshead.ups_head_1x1(*parts, w1, b1)
            return rgb_head(None, h1=h[..., :cin]), seg_head(None, h1=h[..., cin:])
        feat = _concat_pyramid(parts)
    else:
        feat = run_backbone(False)
    return rgb_head(feat), seg_head(feat)


def _concat_pyramid(parts) -> jnp.ndarray:
    """Unfused tail shared by every fits-miss fallback: bilinear-upsample
    the pyramid to branch-0 resolution and channel-concat."""
    size = parts[0].shape[1:3]
    ups = [parts[0]] + [
        interpolate_bilinear(t, size=size, align_corners=False)
        for t in parts[1:]
    ]
    return jnp.concatenate(ups, axis=-1)


def _encode_inputs(
    rgb: jnp.ndarray, seg: jnp.ndarray, seg_encoder: nn.Module, n_classes: int = 20
) -> jnp.ndarray:
    """Per-frame seg encoding + concat with rgb (nets/HRNet.py:524-539)."""
    n_frames = seg.shape[-1] // n_classes
    encoded = [
        seg_encoder(seg[..., i * n_classes:(i + 1) * n_classes])
        for i in range(n_frames)
    ]
    return jnp.concatenate([rgb] + encoded, axis=-1)


def _extra_mask_from_seg(
    rgb_out: jnp.ndarray, seg_out: jnp.ndarray, last_input_seg: jnp.ndarray,
    num_pred_once: int, fg_threshold: int = 11,
) -> jnp.ndarray:
    """Occlusion mask derived from segmentation (nets/HRNet.py:590-596):
    mask=0 (to inpaint) where the input's foreground becomes predicted
    background; 1 elsewhere.

    Implemented as table gathers rather than >=/< comparisons: the mask
    feeds InpaintUnet convs, and cmp->select lowerings upstream of conv
    inputs abort the current libtpu's SpaceToBatchConverter during
    backprop-filter propagation (see train/extra.py note)."""
    fg_table = (jnp.arange(20) >= fg_threshold).astype(rgb_out.dtype)
    bg_table = 1.0 - fg_table
    seg_input_ids = jnp.argmax(last_input_seg, axis=-1)
    fg_input = jnp.take(fg_table, seg_input_ids)
    masks = []
    for i in range(num_pred_once):
        ids = jnp.argmax(
            jax.lax.stop_gradient(seg_out[..., 20 * i:20 * i + 20]), axis=-1
        )
        bg_pred = jnp.take(bg_table, ids)
        masks.append(1.0 - fg_input * bg_pred)
    return jnp.stack(masks, axis=-1)


class HRNet(nn.Module):
    """Coarse generator (nets/HRNet.py:339-601).

    Call: ``(rgb, seg)`` with rgb (B,H,W,3*n_frames), seg one-hot
    (B,H,W,20*n_frames).  Returns (rgb_out, seg_out) or
    (rgb_out, seg_out, mask_out) in extra+inpaint mode.
    """
    syn_type: str = "inter"
    num_pred_once: int = 1
    inpaint: bool = False
    inpaint_mask: bool = False
    highres_large: bool = False
    dtype: Optional[Dtype] = None
    # set when activations are sharded over a spatial mesh axis — bypasses
    # the Pallas fast paths, whose halo/tile logic assumes full extents
    spatial_sharded: bool = False
    # stage-granular activation rematerialization (--remat; see _HRBackbone)
    remat: bool = False

    def setup(self):
        # setup-defined so composites can reuse it directly
        # (nets/InterRefineNet.py:20-23 calls coarse_model.seg_encoder)
        self.seg_encoder = SegEncoder(dtype=self.dtype)

    @nn.compact
    def __call__(self, rgb, seg, train: bool = True):
        x = _encode_inputs(rgb, seg, self.seg_encoder)

        if self.syn_type == "extra":
            rgb_dim = (4 if self.inpaint_mask else 3) * self.num_pred_once
            seg_dim = 20 * self.num_pred_once
        else:
            rgb_dim = 3
            seg_dim = 20
        rgb_out, seg_out = _apply_heads(
            lambda parts: _HRBackbone(self.highres_large, dtype=self.dtype,
                                      return_parts=parts,
                                      spatial_sharded=self.spatial_sharded,
                                      remat=self.remat,
                                      name="backbone")(x),
            rgb_dim, seg_dim, self.highres_large, self.dtype,
            spatial_sharded=self.spatial_sharded)

        mask_out = None
        if self.syn_type == "extra" and self.inpaint and self.inpaint_mask:
            mask_out = nn.sigmoid(rgb_out[..., 3 * self.num_pred_once:])
        if self.syn_type == "extra":
            rgb_out = rgb_out[..., :3 * self.num_pred_once]
        if self.syn_type == "extra" and self.inpaint and not self.inpaint_mask:
            mask_out = _extra_mask_from_seg(
                rgb_out, seg_out, seg[..., -20:], self.num_pred_once
            )
        if self.syn_type == "extra" and self.inpaint:
            return rgb_out, seg_out, mask_out
        return rgb_out, seg_out


class InpaintUnet(nn.Module):
    """Mask-region inpainting U-Net + composite (nets/HRNet.py:618-699).

    Call: ``(rgb, mask, seg)`` — rgb (B,H,W,3*P), mask (B,H,W,P) with 1 =
    keep coarse, 0 = inpaint; seg (B,H,W,20*P).
    """
    num_pred_once: int = 1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, rgb, mask, seg, train: bool = True):
        p = self.num_pred_once
        x = jnp.concatenate([rgb, mask, seg], axis=-1)
        h0 = lrelu(Conv(128, 5, dtype=self.dtype)(x))
        h0 = lrelu(Conv(64, 5, dtype=self.dtype)(h0))

        e1 = lrelu(Conv(128, 3, stride=2, dtype=self.dtype)(h0))
        e1 = ResnetBlock(128, dtype=self.dtype)(e1)
        e2 = lrelu(Conv(256, 3, stride=2, dtype=self.dtype)(e1))
        e2 = ResnetBlock(256, dtype=self.dtype)(e2)

        d = e2
        for rate in (1, 2, 4, 8):
            d = Conv(256, 3, dilation=rate, dtype=self.dtype)(d)
            if rate != 8:
                d = lrelu(d)

        d2 = ResnetBlock(256, dtype=self.dtype)(e2 + d)
        d2 = interpolate_bilinear(d2, scale_factor=2.0, align_corners=True)
        d2 = Conv(128, 3, dtype=self.dtype)(lrelu(d2))

        d1 = ResnetBlock(128, dtype=self.dtype)(d2 + e1)
        d1 = interpolate_bilinear(d1, scale_factor=2.0, align_corners=True)
        d1 = Conv(64, 3, dtype=self.dtype)(lrelu(d1))

        out = lrelu(d1 + h0)
        out = lrelu(Conv(64, 3, dtype=self.dtype)(out))
        out = Conv(3 * p, 3, dtype=self.dtype)(out)

        # composite: inpainted where mask==0, coarse rgb where mask==1
        # (nets/HRNet.py:690-699)
        finals = []
        for j in range(p):
            m = mask[..., j:j + 1]
            finals.append(out[..., 3 * j:3 * j + 3] * (1 - m) + rgb[..., 3 * j:3 * j + 3] * m)
        return jnp.concatenate(finals, axis=-1)


class VAEHRNet(nn.Module):
    """HRNet + conditional VAE latent (nets/HRNet.py:702-1061).

    Train: encodes (input rgb+seg, gt rgb, gt seg) to (mu, logvar), samples z
    with the 'noise' rng.  Eval: z ~ N(0, I).  Returns
    (rgb_out, seg_out, mu, logvar) (mu/logvar None at eval).
    """
    syn_type: str = "inter"
    num_pred_once: int = 1
    inpaint: bool = False
    inpaint_mask: bool = False
    highres_large: bool = False
    dtype: Optional[Dtype] = None
    spatial_sharded: bool = False
    # stage-granular activation rematerialization (--remat; see _HRBackbone)
    remat: bool = False

    def setup(self):
        self.seg_encoder = SegEncoder(dtype=self.dtype)

    @nn.compact
    def __call__(self, rgb, seg, gt_rgb=None, gt_seg=None, train: bool = True):
        b, h, w, _ = rgb.shape
        zh, zw = h // 16, w // 16
        latent_dim = 16 * zh * zw
        # The reference's flat latent (nets/HRNet.py:762-763: one Dense per
        # moment over the flattened encoder map) hard-codes 128x128 inputs,
        # where mu_fc is 1024x1024.  The fc param count scales with the
        # SQUARE of the pixel count: at 512x1024 each moment head would be
        # a 32768x32768 matrix (2 GiB bf16, +8 GiB Adamax state apiece) —
        # architecturally meaningless and unfittable.  Above the cap the
        # latent goes SPATIAL: per-position 1x1 conv heads on the encoder
        # map, z keeps the same (zh, zw, 16) shape the decoder consumes.
        # At the reference's own resolutions (latent <= 4096, i.e. up to
        # 256x256) the Dense path is used and matches the reference
        # exactly (test_vaehrnet_parity).
        conv_latent = latent_dim > 4096

        mu = logvar = None
        if train:
            assert gt_rgb is not None and gt_seg is not None
            vae_in = jnp.concatenate([rgb, seg, gt_rgb, gt_seg], axis=-1)
            e = _VAEEncoder(dtype=self.dtype, name="vae_encoder")(vae_in, train=train)
            if conv_latent:
                mu = Conv(16, 1, padding=0, dtype=self.dtype,
                          name="mu_conv")(e)
                logvar = Conv(16, 1, padding=0, dtype=self.dtype,
                              name="logvar_conv")(e)
            else:
                e = e.reshape(b, -1)
                mu = nn.Dense(latent_dim, dtype=self.dtype, name="mu_fc")(e)
                logvar = nn.Dense(latent_dim, dtype=self.dtype,
                                  name="logvar_fc")(e)
            eps = jax.random.normal(self.make_rng("noise"), mu.shape, dtype=mu.dtype)
            z = mu + eps * jnp.exp(0.5 * logvar)
        else:
            z_shape = (b, zh, zw, 16) if conv_latent else (b, latent_dim)
            z = jax.random.normal(self.make_rng("noise"), z_shape, dtype=rgb.dtype)

        z = z.reshape(b, zh, zw, 16)
        vae_feature = _VAEDecoder(dtype=self.dtype, name="vae_decoder")(z, train=train)

        x = _encode_inputs(rgb, seg, self.seg_encoder)
        x = jnp.concatenate([vae_feature, x], axis=-1)

        if self.syn_type == "extra":
            rgb_dim = (4 if self.inpaint_mask else 3) * self.num_pred_once
            seg_dim = 20 * self.num_pred_once
        else:
            rgb_dim = 3
            seg_dim = 20
        rgb_out, seg_out = _apply_heads(
            lambda parts: _HRBackbone(self.highres_large, dtype=self.dtype,
                                      return_parts=parts,
                                      spatial_sharded=self.spatial_sharded,
                                      remat=self.remat,
                                      name="backbone")(x),
            rgb_dim, seg_dim, self.highres_large, self.dtype,
            spatial_sharded=self.spatial_sharded,
            # VAE coarse under --remat keeps the autodiff head backward:
            # the explicit path's h-recompute lifts the full-res GAN
            # recipe's compiler peak 15.624 -> 15.776 GiB (over budget)
            # while plain HRNet+remat DROPS 15.742 -> 13.94 with it
            # (measured r4, docs/TRAINBENCH_r4.md)
            explicit_head_bwd=not self.remat)
        if self.syn_type == "extra":
            rgb_out = rgb_out[..., :3 * self.num_pred_once]
        return rgb_out, seg_out, mu, logvar


class _VAEEncoder(nn.Module):
    """Strided conv encoder w/ BatchNorm (nets/HRNet.py:722-761)."""
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        def bn(h):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(h)

        x = lrelu(Conv(32, 3, dtype=self.dtype)(x))
        x = lrelu(bn(Conv(32, 3, dtype=self.dtype)(x)))
        # 3 downsamples, each stride-2 conv + 3x3 conv (nets/HRNet.py:729-749)
        for ch in (32, 64, 128):
            x = lrelu(bn(Conv(ch, 3, stride=2, dtype=self.dtype)(x)))
            x = lrelu(bn(Conv(ch, 3, dtype=self.dtype)(x)))
        # final downsample + channel squeeze to 16 (nets/HRNet.py:750-760)
        x = lrelu(bn(Conv(128, 3, stride=2, dtype=self.dtype)(x)))
        x = lrelu(bn(Conv(64, 3, dtype=self.dtype)(x)))
        x = lrelu(bn(Conv(32, 3, dtype=self.dtype)(x)))
        return Conv(16, 3, dtype=self.dtype)(x)


class _VAEDecoder(nn.Module):
    """ConvTranspose decoder w/ BatchNorm (nets/HRNet.py:764-791)."""
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, z, train: bool = True):
        def bn(h):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9, dtype=self.dtype)(h)

        x = z
        for i in range(4):
            x = lrelu(bn(ConvT(32, dtype=self.dtype)(x)))
            x = Conv(32, 3, dtype=self.dtype)(x)
            if i != 3:  # final conv has no BN/activation (nets/HRNet.py:790)
                x = lrelu(bn(x))
        return x
