"""Shared Flax building blocks for the model zoo.

Functional equivalents of the reference's conv blocks (nets/HRNet.py:15-85
BasicBlock/Bottleneck, nets/refine_nets.py:14-24 ResnetBlock,
nets/SubNets.py:14-30 SegEncoder) designed for TPU:

- NHWC layout (XLA's native TPU conv layout; no transposes anywhere).
- Explicit symmetric padding to match torch Conv2d ``padding=k//2``.
- Optional ``dtype`` (bfloat16 by default in train configs) keeps MXU
  throughput high while params stay fp32.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


def lrelu(x: jnp.ndarray, slope: float = 0.2) -> jnp.ndarray:
    return nn.leaky_relu(x, negative_slope=slope)


def _ae_or_conv(x, features, f, dtype, spatial_sharded, name=None):
    """Packed 3x3 conv followed by leaky-ReLU, for use inside a compact
    ``__call__``: routes through the A+E Pallas kernel with the lrelu
    fused in (ops/pallas_ae_conv.py) when eligible, otherwise the XLA
    packed conv + lrelu.  Exactly one Conv child is created either way
    (identical param names/shapes — checkpoint-compatible)."""
    import os

    import jax as _jax
    from deep_video_interpolation_extrapolation_tpu.core.hw import (
        pallas_enabled,
    )
    if (f == 2 and pallas_enabled() and not spatial_sharded
            and os.environ.get("DVIE_AE_HWNC", "1") != "0"):
        # HWNC A+E kernel: logical (H, Wp, B, fC) row-major matches the
        # {3,0,2,1} physical layout of the surrounding packed convs, so
        # the transposes lower to bitcasts and the kernel pays zero
        # relayouts (the NHWC insert below lost 7 fps to exactly those)
        from deep_video_interpolation_extrapolation_tpu.ops.pallas_ae_conv import (
            conv3x3_packed_ae_hwnc,
            hwnc_fits,
        )
        xh = jnp.transpose(x, (1, 2, 0, 3))
        if hwnc_fits(xh, f):
            k, _ = Conv(features, 3, use_bias=False, dtype=dtype,
                        in_features=x.shape[-1] // f, name=name
                        )(None, return_params=True)
            dt = dtype or x.dtype
            out = conv3x3_packed_ae_hwnc(xh.astype(dt), k, None, True, f)
            return jnp.transpose(out, (2, 0, 1, 3))
    if (f == 2 and pallas_enabled() and not spatial_sharded
            and os.environ.get("DVIE_AE_CONV", "0") == "1"):
        from deep_video_interpolation_extrapolation_tpu.ops.pallas_ae_conv import (
            conv3x3_packed_ae,
            fits,
        )
        if fits(x, f):
            k, _ = Conv(features, 3, use_bias=False, dtype=dtype,
                        in_features=x.shape[-1] // f, name=name
                        )(None, return_params=True)
            dt = dtype or x.dtype
            return conv3x3_packed_ae(x.astype(dt), k, None, True, f)
    out = Conv(features, 3, 1, use_bias=False, dtype=dtype, packed_io=f,
               name=name)(x)
    return lrelu(out)


class Conv(nn.Module):
    """torch-style Conv2d: symmetric int padding, optional dilation.

    Owns its params directly (fp32 masters, cast to ``dtype`` for compute,
    flax nn.Conv semantics).  Stride-1 3x3 convs with <=64 channels on
    large-width inputs automatically route through the width-packed
    formulation (ops/packed_conv.py) on TPU — bit-identical math that packs
    width-parity into channels so the MXU sees 128-wide lanes (~1.4-2x at
    HRNet's full-resolution shapes).
    """
    features: int
    kernel: int = 3
    stride: int = 1
    padding: Optional[int] = None
    dilation: int = 1
    use_bias: bool = True
    dtype: Optional[Dtype] = None
    # input/output tensors already carry the width-packed (B,H,W/f,f*C)
    # layout with this factor — requires kernel=3, stride=1, dilation=1.
    # Parameters stay in the logical (3,3,C,O) layout either way
    # (checkpoint-compatible).  0 = normal layout.
    packed_io: int = 0
    # Small-Cout 3x3 convs (the HRNet heads) route through the taps-in-N
    # decomposition (ops/tapped_conv.py) — exact math, ~4.7x fewer
    # MXU-padded FLOPs when 9*features <= 256 << 9*128.  Requires
    # kernel=3, stride=1, dilation=1, pad=1, unpacked.
    tapped: bool = False
    # Static input channel count — only needed for ``return_params`` calls
    # where no input tensor is available to derive it from.
    in_features: Optional[int] = None
    # activations sharded over a spatial mesh axis: Pallas fast paths off
    spatial_sharded: bool = False
    # input/output tensors are logically (H, W, B, C) instead of
    # (B, H, W, C).  Row-major (H, W, B, C) is bit-identical to the
    # {3,0,2,1} physical layout XLA assigns NHWC conv IO on TPU (measured
    # identical conv speed), so an HWNC chain gives Pallas kernels
    # (which require default row-major operand layouts) free boundaries —
    # the transposes into/out of the chain lower to layout bitcasts.
    hwnc: bool = False

    @nn.compact
    def __call__(self, x, *, return_params: bool = False):
        import jax
        import jax.lax

        if return_params:
            # create/fetch the params without computing (used by fused
            # multi-module kernels that consume the raw weights, e.g.
            # ops/pallas_upshead.py); identical names/shapes/init to the
            # compute path, so checkpoints interchange freely.
            assert self.in_features is not None
            kernel = self.param(
                "kernel", nn.initializers.lecun_normal(),
                (self.kernel, self.kernel, self.in_features, self.features),
                jnp.float32)
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            ) if self.use_bias else None
            return kernel, bias

        pad = self.padding if self.padding is not None else (self.kernel // 2) * self.dilation
        f = int(self.packed_io)
        dn = (("HWNC", "HWIO", "HWNC") if self.hwnc
              else ("NHWC", "HWIO", "NHWC"))

        # K-distributed 1x1: a list input means "conv over the channel-concat
        # of these tensors" computed as a sum of per-part 1x1 convs — exactly
        # W @ concat(parts) without ever materializing the concat (the HRNet
        # head path reads the upsample pyramid directly).  Param shape is
        # identical to the concat form.
        if isinstance(x, (list, tuple)):
            assert self.kernel == 1 and self.stride == 1 and not f
            assert not self.hwnc
            cin = sum(t.shape[-1] for t in x)
            kernel = self.param(
                "kernel", nn.initializers.lecun_normal(),
                (1, 1, cin, self.features), jnp.float32)
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            ) if self.use_bias else None
            dt = self.dtype or x[0].dtype
            out = None
            lo = 0
            for t in x:
                kp = kernel[:, :, lo:lo + t.shape[-1], :].astype(dt)
                y = jax.lax.conv_general_dilated(
                    t.astype(dt), kp, (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=dt)
                out = y if out is None else out + y
                lo += t.shape[-1]
            if bias is not None:
                out = out + bias.astype(dt)
            return out

        cin = x.shape[-1] // (f if f else 1)
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, cin, self.features), jnp.float32)
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        ) if self.use_bias else None

        dt = self.dtype or x.dtype
        xd = x.astype(dt)
        kd = kernel.astype(dt)
        bd = bias.astype(dt) if bias is not None else None

        if f:
            from deep_video_interpolation_extrapolation_tpu.ops.packed_conv import (
                pack_kernel_1x1,
                pack_kernel_3x3,
                pack_kernel_3x3_stride2_in,
            )
            assert self.dilation == 1
            if self.stride == 2:
                # consume the packed layout, emit the ordinary unpacked
                # stride-2 output (boundary out of a packed region)
                assert self.kernel == 3 and f == 2
                out = jax.lax.conv_general_dilated(
                    xd, pack_kernel_3x3_stride2_in(kd), (2, 1),
                    ((1, 1), (1, 0)),
                    dimension_numbers=dn,
                    preferred_element_type=dt)
                return out + bd if bd is not None else out
            assert self.kernel in (1, 3) and self.stride == 1
            if self.kernel == 3:
                import os
                if os.environ.get("DVIE_PACKED_AE", "0") != "0":
                    # A+E decomposition: ~33% (f=2) / ~58% (f=4) fewer
                    # padded MXU FLOPs on paper, but measured SLOWER
                    # composed in XLA (layer1 45->69 ms, stage3 69->110 ms
                    # at 8x512x1024 bf16 on v5e): the (3,1)-kernel convs
                    # and the E-input materialization lower poorly.
                    # Kept opt-in for kernel-internal reuse
                    # (ops/packed_conv.py ae_kernels_3x3).
                    from deep_video_interpolation_extrapolation_tpu.ops.packed_conv import (
                        conv3x3_packed_ae_xla,
                    )
                    out = conv3x3_packed_ae_xla(xd, kd, f, preferred_dtype=dt)
                    if bd is not None:
                        out = out + jnp.tile(bd, f)
                    return out
                kp = pack_kernel_3x3(kd, f)
            else:
                kp = pack_kernel_1x1(kd, f)
            out = jax.lax.conv_general_dilated(
                xd, kp, (1, 1), "SAME",
                dimension_numbers=dn,
                preferred_element_type=dt)
            if bd is not None:
                out = out + jnp.tile(bd, f)
            return out

        if self.tapped:
            assert (self.kernel == 3 and self.stride == 1
                    and self.dilation == 1 and pad == 1 and not self.hwnc)
            from deep_video_interpolation_extrapolation_tpu.ops.tapped_conv import (
                conv3x3_tapped,
            )
            return conv3x3_tapped(xd, kd, bd)

        out = jax.lax.conv_general_dilated(
            xd, kd, (self.stride, self.stride),
            ((pad, pad), (pad, pad)),
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=dn,
            preferred_element_type=dt)
        if bd is not None:
            out = out + bd
        return out


class ConvT(nn.Module):
    """torch ConvTranspose2d(k=4, s=2, p=1) equivalent: exact 2x upsample."""
    features: int
    kernel: int = 4
    stride: int = 2
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        # conv_transpose output with 'SAME' = in * stride, matching torch's
        # (in-1)*2 - 2*1 + 4 = 2*in for k=4,s=2,p=1.
        return nn.ConvTranspose(
            self.features,
            kernel_size=(self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)


class BasicBlock(nn.Module):
    """2x conv3x3 residual block, LeakyReLU(0.2), no BN (nets/HRNet.py:15-44).

    ``packed_io=f`` runs the whole block in the width-packed layout at
    factor f (caller packs once per chain; see ops/packed_conv.py) — only
    valid when stride==1 and channels already match.
    """
    features: int
    stride: int = 1
    downsample: bool = False
    dtype: Optional[Dtype] = None
    expansion: int = 1
    packed_io: int = 0
    # activations sharded over a spatial mesh axis: Pallas fast paths off
    spatial_sharded: bool = False

    @nn.compact
    def __call__(self, x, *, return_params: bool = False):
        if return_params:
            # raw kernels for fused chain kernels (pallas_trainchain
            # bb_chain); Conv auto-names (Conv_0/Conv_1) match the
            # compute path so checkpoints interchange
            assert self.stride == 1
            k1, _ = Conv(self.features, 3, use_bias=False, dtype=self.dtype,
                         in_features=self.features)(None, return_params=True)
            k2, _ = Conv(self.features, 3, use_bias=False, dtype=self.dtype,
                         in_features=self.features)(None, return_params=True)
            return k1, k2
        if self.packed_io:
            import os

            import jax as _jax
            f = int(self.packed_io)
            assert self.stride == 1 and x.shape[-1] == f * self.features
            from deep_video_interpolation_extrapolation_tpu.core.hw import (
                pallas_enabled,
            )
            if (pallas_enabled() and f == 2
                    and os.environ.get("DVIE_FUSED_BLOCK", "0") == "1"):
                from deep_video_interpolation_extrapolation_tpu.ops.pallas_resblock import (
                    fused_basicblock,
                    fused_basicblock_fits,
                )
                if fused_basicblock_fits(x, f):
                    # whole block in one VMEM pass (A+E 3x3s, one read +
                    # one write of the packed tile; ops/pallas_resblock.py)
                    c = self.features
                    k1, _ = Conv(c, 3, use_bias=False, dtype=self.dtype,
                                 in_features=c)(None, return_params=True)
                    k2, _ = Conv(c, 3, use_bias=False, dtype=self.dtype,
                                 in_features=c)(None, return_params=True)
                    dt = self.dtype or x.dtype
                    return fused_basicblock(x.astype(dt), k1, k2, f)
            if (pallas_enabled() and f == 2
                    and not self.spatial_sharded
                    and os.environ.get("DVIE_BB_FUSED", "0") == "1"):
                from deep_video_interpolation_extrapolation_tpu.ops.pallas_bb import (
                    bb_fits,
                    fused_basicblock_hwnc,
                )
                xh = jnp.transpose(x, (1, 2, 0, 3))
                if bb_fits(xh, f):
                    # whole block in one HWNC VMEM pass: h1 never touches
                    # HBM (conv1 recomputes a 1-row halo), both convs A+E
                    # (ops/pallas_bb.py); default-off pending TPU A/B
                    c = self.features
                    k1, _ = Conv(c, 3, use_bias=False, dtype=self.dtype,
                                 in_features=c)(None, return_params=True)
                    k2, _ = Conv(c, 3, use_bias=False, dtype=self.dtype,
                                 in_features=c)(None, return_params=True)
                    dt = self.dtype or x.dtype
                    y = fused_basicblock_hwnc(xh.astype(dt), k1, k2, f)
                    return jnp.transpose(y, (2, 0, 1, 3))
            if (pallas_enabled() and f == 2
                    and not self.spatial_sharded
                    and os.environ.get("DVIE_AE_HWNC", "1") != "0"):
                from deep_video_interpolation_extrapolation_tpu.ops.pallas_ae_conv import (
                    conv3x3_packed_ae_hwnc,
                    hwnc_fits,
                )
                xh = jnp.transpose(x, (1, 2, 0, 3))  # free bitcast, see Conv.hwnc
                if hwnc_fits(xh, f):
                    # per-conv HWNC A+E kernels (1.33x nominal MXU FLOPs vs
                    # the dense-packed 2x wall) with residual/lrelu fused;
                    # zero boundary relayouts in the {3,0,2,1} chain
                    c = self.features
                    k1, _ = Conv(c, 3, use_bias=False, dtype=self.dtype,
                                 in_features=c)(None, return_params=True)
                    k2, _ = Conv(c, 3, use_bias=False, dtype=self.dtype,
                                 in_features=c)(None, return_params=True)
                    dt = self.dtype or x.dtype
                    xh = xh.astype(dt)
                    h = conv3x3_packed_ae_hwnc(xh, k1, None, True, f)
                    y = conv3x3_packed_ae_hwnc(h, k2, xh, True, f)
                    return jnp.transpose(y, (2, 0, 1, 3))
            if (pallas_enabled() and f == 2
                    and not self.spatial_sharded
                    and os.environ.get("DVIE_AE_CONV", "0") == "1"):
                from deep_video_interpolation_extrapolation_tpu.ops.pallas_ae_conv import (
                    conv3x3_packed_ae,
                    fits as ae_fits,
                )
                if ae_fits(x, f):
                    # per-conv A+E kernels (1.33x nominal MXU FLOPs vs the
                    # dense-packed 2x wall; lrelu/residual fused in) —
                    # ops/pallas_ae_conv.py
                    c = self.features
                    k1, _ = Conv(c, 3, use_bias=False, dtype=self.dtype,
                                 in_features=c)(None, return_params=True)
                    k2, _ = Conv(c, 3, use_bias=False, dtype=self.dtype,
                                 in_features=c)(None, return_params=True)
                    dt = self.dtype or x.dtype
                    xd = x.astype(dt)
                    h = conv3x3_packed_ae(xd, k1, None, True, f)
                    return conv3x3_packed_ae(h, k2, xd, True, f)
            out = Conv(self.features, 3, 1, use_bias=False, dtype=self.dtype,
                       packed_io=f)(x)
            out = lrelu(out)
            out = Conv(self.features, 3, 1, use_bias=False, dtype=self.dtype,
                       packed_io=f)(out)
            return lrelu(out + x)
        residual = x
        out = Conv(self.features, 3, self.stride, use_bias=False, dtype=self.dtype)(x)
        out = lrelu(out)
        out = Conv(self.features, 3, 1, use_bias=False, dtype=self.dtype)(out)
        if self.downsample or self.stride != 1 or x.shape[-1] != self.features:
            residual = Conv(
                self.features, 1, self.stride, padding=0, use_bias=False, dtype=self.dtype
            )(x)
        return lrelu(out + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 (x4) residual block (nets/HRNet.py:47-85).

    ``packed_io=f`` runs the whole block in the width-packed layout at
    factor f (1x1 convs via block-diagonal packed kernels, the 3x3 via the
    structured tap mapping; exact math, ops/packed_conv.py).  Only valid
    when stride==1.  Parameter names/shapes are identical either way.
    """
    features: int
    stride: int = 1
    dtype: Optional[Dtype] = None
    expansion: int = 4
    packed_io: int = 0
    # static input channel count, required only for return_params calls
    in_features: Optional[int] = None
    # activations sharded over a spatial mesh axis: Pallas fast paths off
    spatial_sharded: bool = False

    @nn.compact
    def __call__(self, x, *, return_params: bool = False):
        planes = self.features
        out_ch = planes * self.expansion
        f = int(self.packed_io)
        if f:
            assert self.stride == 1
        if return_params:
            # raw kernels for fused multi-block kernels (the layer1
            # boundary chain, ops/pallas_chain.py); Conv auto-names match
            # the compute path (Conv_0..Conv_3) so checkpoints interchange
            cin = self.in_features
            assert cin is not None
            k1, _ = Conv(planes, 1, padding=0, use_bias=False,
                         dtype=self.dtype, in_features=cin
                         )(None, return_params=True)
            k2, _ = Conv(planes, 3, use_bias=False, dtype=self.dtype,
                         in_features=planes)(None, return_params=True)
            k3, _ = Conv(out_ch, 1, padding=0, use_bias=False,
                         dtype=self.dtype, in_features=planes
                         )(None, return_params=True)
            kres = None
            if self.stride != 1 or cin != out_ch:
                kres, _ = Conv(out_ch, 1, self.stride, padding=0,
                               use_bias=False, dtype=self.dtype,
                               in_features=cin)(None, return_params=True)
            return k1, k2, k3, kres
        logical_in = x.shape[-1] // (f if f else 1)
        if f == 2:
            import os

            import jax as _jax
            from deep_video_interpolation_extrapolation_tpu.core.hw import (
                pallas_enabled as _pe_bn,
            )
            if (_pe_bn()
                    and os.environ.get("DVIE_FUSED_BLOCK", "0") == "1"):
                from deep_video_interpolation_extrapolation_tpu.ops.pallas_resblock import (
                    fused_bottleneck,
                    fused_bottleneck_fits,
                )
                if fused_bottleneck_fits(x, f):
                    # whole block in one VMEM pass (ops/pallas_resblock.py)
                    k1, _ = Conv(planes, 1, padding=0, use_bias=False,
                                 dtype=self.dtype, in_features=logical_in
                                 )(None, return_params=True)
                    k2, _ = Conv(planes, 3, use_bias=False, dtype=self.dtype,
                                 in_features=planes)(None, return_params=True)
                    k3, _ = Conv(out_ch, 1, padding=0, use_bias=False,
                                 dtype=self.dtype, in_features=planes
                                 )(None, return_params=True)
                    kres = None
                    if logical_in != out_ch:
                        kres, _ = Conv(out_ch, 1, padding=0, use_bias=False,
                                       dtype=self.dtype, in_features=logical_in
                                       )(None, return_params=True)
                    dt = self.dtype or x.dtype
                    return fused_bottleneck(x.astype(dt), k1, k2, k3, kres, f)
        residual = x
        out = Conv(planes, 1, 1, padding=0, use_bias=False, dtype=self.dtype,
                   packed_io=f)(x)
        out = lrelu(out)
        out = _ae_or_conv(out, planes, f, self.dtype, self.spatial_sharded)
        out = Conv(out_ch, 1, 1, padding=0, use_bias=False, dtype=self.dtype,
                   packed_io=f)(out)
        if self.stride != 1 or logical_in != out_ch:
            residual = Conv(
                out_ch, 1, self.stride, padding=0, use_bias=False,
                dtype=self.dtype, packed_io=f,
            )(x)
        return lrelu(out + residual)


class ResnetBlock(nn.Module):
    """conv-lrelu-conv + input (nets/refine_nets.py:14-24)."""
    features: int
    kernel: int = 3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        out = Conv(self.features, self.kernel, dtype=self.dtype)(x)
        out = lrelu(out)
        out = Conv(self.features, self.kernel, dtype=self.dtype)(out)
        return out + x


class SegEncoder(nn.Module):
    """20-class one-hot -> 4-ch embedding (nets/HRNet.py:358-364).

    The 20/32/4-channel convs waste >75% of the MXU lanes at full
    resolution; on TPU with wide inputs the whole chain runs width-packed
    at factor 4 (80/128/16 channels, ~4x fewer padded-lane FLOPs,
    bit-identical — see ops/packed_conv.py).  Param layout is unchanged.
    """
    encode_dim: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, seg):
        import jax as _jax
        f = 4
        packed = (seg.ndim == 4 and seg.shape[2] % f == 0
                  and seg.shape[2] >= 256
                  and _jax.default_backend() == "tpu")
        pf = f if packed else 0
        x = seg
        if packed:
            from deep_video_interpolation_extrapolation_tpu.ops.packed_conv import (
                pack_w,
                unpack_w,
            )
            x = pack_w(x, f)
        x = Conv(32, 3, dtype=self.dtype, packed_io=pf)(x)
        x = nn.elu(x)
        x = Conv(32, 3, dtype=self.dtype, packed_io=pf)(x)
        x = nn.elu(x)
        x = Conv(self.encode_dim, 3, dtype=self.dtype, packed_io=pf)(x)
        if packed:
            x = unpack_w(x, f)
        return x


class ConvLReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        return lrelu(
            Conv(
                self.features, self.kernel, self.stride,
                dilation=self.dilation, use_bias=self.use_bias, dtype=self.dtype,
            )(x)
        )
