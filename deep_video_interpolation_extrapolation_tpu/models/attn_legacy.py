"""Legacy SRN-era attention refiners V2..V4 (reference nets/SRN.py:581-1242).

Dead code in the reference (the SRN registry import is commented out,
nets/__init__.py:9-10) but part of the component inventory: the iteration
chain AttnRefineV2 -> V3/V4 is the direct ancestor of the active
refine_nets.MSResAttnRefine* family (our models/attn_refine.py).  Each
class here is individually instantiable with the reference's exact layer
plan; forward parity vs the torch originals is pinned by
tests/test_attn_legacy_parity.py.

Variant map (all forward(x, neighbors) -> (rgb, flow_map|None)):
- ``AttnRefineV2``  (SRN.py:581-707): frozen resnet101 layer2 features
  (1/8 res, 512 ch; nets/resnet101.py:5-21) drive an L2-DISTANCE window
  correlation (5h x 9w, pad value -100), per-neighbor softmax of
  1/(dist+1e-6); aggregated enc4 features feed a 4-level UNet decoder
  with skip adds.
- ``AttnRefineV2O`` (SRN.py:709-812): same, but the correlation runs on
  the model's OWN enc4 features (128 ch) — no resnet.
- ``AttnRefineV2Base`` (SRN.py:814-881): no-attention ablation (plain
  concat of neighbor enc4s).
- ``AttnRefineV3``  (SRN.py:884-1006): separate attn encoder (3 levels
  to 1/4 res, 64 ch), COSINE window correlation (9h x 17w), dual
  encoder streams, 3-level decoder without skip adds.
- ``AttnRefineV3Base`` (SRN.py:1008-1062): its no-attention ablation
  (img encoder widened to 128 at enc3).
- ``AttnRefineV4``  (SRN.py:1066-1184): V3 with a shallower, wider attn
  encoder (64 ch + one resblock, then 128).  REFERENCE BUG, fixed +
  documented: its forward uses ``self.attn_encoder_3`` which __init__
  never defines (instantiating-then-calling the torch class raises
  AttributeError), so the class was dead even before the registry
  comment-out.  We complete the evident intent with
  ``encoder_layer3(128, 64)`` — the same 1/4-res 64-ch correlation
  geometry as V3, which the rest of V4's forward (64*3 mid, V3 window
  sizes) is built for.
- ``AttnRefineV4Base`` (SRN.py:1186-1242): layer-for-layer identical to
  V3Base (the reference duplicated the class); kept as its own module
  class so checkpoints carry the intended name.

TPU-first: the window correlations use the shift-accumulate formulation
of ops/corr.py (no unfold materialization); the L2 variant decomposes
||t - x||^2 = ||t||^2 - 2 t.x + ||x||^2 into shifted scalar maps plus
the existing dot correlation, reproducing the reference's -100 spatial
pad EXACTLY via the shifted pad mask (see _l2_window_distance).
Flow-map decode deviation (shared with ops/corr.py, documented there):
the reference decodes argmin/argmax indices as (k//win_h, k%win_h),
which mis-decodes rectangular windows; we decode correctly.  The flow
map is visualization-only.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from deep_video_interpolation_extrapolation_tpu.models.blocks import (
    Conv,
    ConvT,
    ResnetBlock,
    lrelu,
)
from deep_video_interpolation_extrapolation_tpu.models.features import (
    ResNet101Features,
)
from deep_video_interpolation_extrapolation_tpu.ops.corr import (
    _offsets,
    _shift2d,
    argmax_flow,
    window_aggregate_per_neighbor,
    window_correlation,
)

Dtype = Any

PAD_VAL = -100.0  # reference's distance-enlarging pad (SRN.py:616 etc.)


class _EncHead(nn.Module):
    """3x3 conv + lrelu + N resblocks (the encoder_1 stems, SRN.py:589)."""
    features: int = 32
    blocks: int = 3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        x = lrelu(Conv(self.features, 3, dtype=self.dtype)(x))
        for _ in range(self.blocks):
            x = ResnetBlock(self.features, 3, dtype=self.dtype)(x)
        return x


class _EncL3(nn.Module):
    """encoder_layer3 (SRN.py:42-54): stride-2 3x3 + 3 resblocks k3."""
    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        x = lrelu(Conv(self.features, 3, stride=2, dtype=self.dtype)(x))
        for _ in range(3):
            x = ResnetBlock(self.features, 3, dtype=self.dtype)(x)
        return x


class _DecL5(nn.Module):
    """decoder_layer5 (SRN.py:82-95): 3 resblocks k3 + 2x convT + lrelu."""
    features: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        for _ in range(3):
            x = ResnetBlock(x.shape[-1], 3, dtype=self.dtype)(x)
        return lrelu(ConvT(self.features, dtype=self.dtype)(x))


class _DecOut3(nn.Module):
    """decoder_layer_out(.., ks=3) (SRN.py:98-117): 3 resblocks k5 +
    3x3 output conv."""
    out_dim: int = 3
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        for _ in range(3):
            x = ResnetBlock(x.shape[-1], 5, dtype=self.dtype)(x)
        return Conv(self.out_dim, 3, dtype=self.dtype)(x)


class _Mid(nn.Module):
    """mid fuse: conv(+optional second conv) + 2 resblocks (SRN.py:600,907)."""
    features: int
    second_conv: Optional[int] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        x = lrelu(Conv(self.features, 3, dtype=self.dtype)(x))
        c = self.features
        if self.second_conv is not None:
            c = self.second_conv
            x = lrelu(Conv(c, 3, dtype=self.dtype)(x))
        for _ in range(2):
            x = ResnetBlock(c, 3, dtype=self.dtype)(x)
        return x


def _l2_window_distance(x, neighbors, win_h, win_w):
    """Per-offset L2 distances sum_c (t_shift - x)^2 with the reference's
    -100 spatial pad on t, via shifted scalar maps (no unfold):

    dist_k = shift(||t||^2, k) + padmask_k*(C*PAD^2) - 2*(corr0_k +
             padmask_k*PAD*sum_x) + ||x||^2

    where corr0_k is the zero-filled shifted dot (ops/corr shift
    semantics) and padmask_k marks out-of-range window positions.
    Returns (B, H, W, len(neighbors)*win_h*win_w), reference unfold
    order (k = wy*win_w + wx, neighbor-major)."""
    c = x.shape[-1]
    x32 = x.astype(jnp.float32)
    sum_x = jnp.sum(x32, axis=-1, keepdims=True)
    x_sq = jnp.sum(jnp.square(x32), axis=-1, keepdims=True)
    corr = window_correlation(x, neighbors, win_h, win_w, normalize=False)
    ones = jnp.ones(x.shape[:3] + (1,), jnp.float32)
    cols = []
    for t in neighbors:
        t32 = t.astype(jnp.float32)
        t_sq = jnp.sum(jnp.square(t32), axis=-1, keepdims=True)
        for dy, dx in _offsets(win_h, win_w):
            padmask = 1.0 - _shift2d(ones, dy, dx)
            t_sq_s = _shift2d(t_sq, dy, dx) + padmask * (c * PAD_VAL ** 2)
            cols.append(t_sq_s + 2.0 * PAD_VAL * padmask * sum_x + x_sq)
    dist = jnp.concatenate(cols, axis=-1) - 2.0 * corr.astype(jnp.float32)
    return dist


def _per_neighbor_softmax(logits, n_neighbors):
    """softmax over each neighbor's window block separately (the legacy
    F.softmax(dim=4) on (bs, 2, H, W, h*w); the modern family softmaxes
    jointly)."""
    b, h, w, nk = logits.shape
    k = nk // n_neighbors
    blocks = [nn.softmax(logits[..., i * k:(i + 1) * k], axis=-1)
              for i in range(n_neighbors)]
    return jnp.concatenate(blocks, axis=-1)


def _corr_l2(x, t1, t2, win_h, win_w):
    dist = _l2_window_distance(x, [t1, t2], win_h, win_w)
    sim = 1.0 / (dist + 1e-6)
    flow = argmax_flow(-dist, 2, win_h, win_w)
    return _per_neighbor_softmax(sim, 2), flow


def _corr_cos(x, t1, t2, win_h, win_w):
    """Cosine sim with the reference's -100 pad on the NORMALIZED t
    (SRN.py:934-957): sim_pad_k = corr0_k + padmask_k*PAD*sum(x_hat)."""
    from deep_video_interpolation_extrapolation_tpu.ops.corr import (
        _l2_normalize,
    )
    xn = _l2_normalize(x.astype(jnp.float32))
    t1n = _l2_normalize(t1.astype(jnp.float32))
    t2n = _l2_normalize(t2.astype(jnp.float32))
    corr = window_correlation(xn, [t1n, t2n], win_h, win_w,
                              normalize=False)
    sum_x = jnp.sum(xn, axis=-1, keepdims=True)
    ones = jnp.ones(x.shape[:3] + (1,), jnp.float32)
    pad_cols = []
    for _ in range(2):
        for dy, dx in _offsets(win_h, win_w):
            pad_cols.append((1.0 - _shift2d(ones, dy, dx)) * PAD_VAL * sum_x)
    sim = corr.astype(jnp.float32) + jnp.concatenate(pad_cols, axis=-1)
    flow = argmax_flow(sim, 2, win_h, win_w)
    return _per_neighbor_softmax(sim, 2), flow


class _AttnV2Core(nn.Module):
    """Shared V2/V2O/V2Base body: 4-level encoder, attn fuse at enc4,
    UNet decoder with skip adds (SRN.py:581-881)."""
    corr_src: str  # "resnet" (V2) | "enc4" (V2O) | "none" (V2Base)
    dtype: Optional[Dtype] = None
    win_h: int = 5
    win_w: int = 9

    @nn.compact
    def __call__(self, x, neighbors, train: bool = False):
        img1 = neighbors[..., :3]
        img2 = neighbors[..., 3:6]

        enc1 = _EncHead(32, dtype=self.dtype, name="encoder_1")
        enc2 = _EncL3(64, dtype=self.dtype, name="encoder_2")
        enc3 = _EncL3(128, dtype=self.dtype, name="encoder_3")
        enc4 = _EncL3(128, dtype=self.dtype, name="encoder_4")

        def encode(im):
            e1 = enc1(im)
            e2 = enc2(e1)
            e3 = enc3(e2)
            return e1, e2, e3, enc4(e3)

        x_e1, x_e2, x_e3, x_e4 = encode(x)
        _, _, _, i1_e4 = encode(img1)
        _, _, _, i2_e4 = encode(img2)

        flow = None
        if self.corr_src == "none":
            f1w, f2w = i1_e4, i2_e4
        else:
            if self.corr_src == "resnet":
                rn = ResNet101Features(dtype=self.dtype, name="resnet101")
                # layer2 features (nets/resnet101.py returns layer2/3/4;
                # V2 concatenates only the first, SRN.py:656-676)
                xf = rn(x, train=train)[0]
                t1f = rn(img1, train=train)[0]
                t2f = rn(img2, train=train)[0]
            else:  # "enc4"
                xf, t1f, t2f = x_e4, i1_e4, i2_e4
            prob, flow = _corr_l2(xf, t1f, t2f, self.win_h, self.win_w)
            f1w, f2w = window_aggregate_per_neighbor(
                [i1_e4, i2_e4], prob, self.win_h, self.win_w)

        mid_in = jnp.concatenate([x_e4, f1w, f2w], axis=-1)
        d4_in = _Mid(128, dtype=self.dtype, name="mid")(mid_in)
        d4 = _DecL5(128, dtype=self.dtype, name="decoder_4")(d4_in)
        d3 = _DecL5(64, dtype=self.dtype, name="decoder_3")(d4 + x_e3)
        d2 = _DecL5(32, dtype=self.dtype, name="decoder_2")(d3 + x_e2)
        out = _DecOut3(3, dtype=self.dtype, name="decoder_1")(d2 + x_e1)
        return out, flow


def AttnRefineV2(dtype=None, **kw):
    return _AttnV2Core(corr_src="resnet", dtype=dtype, **kw)


def AttnRefineV2O(dtype=None, **kw):
    return _AttnV2Core(corr_src="enc4", dtype=dtype, **kw)


def AttnRefineV2Base(dtype=None, **kw):
    return _AttnV2Core(corr_src="none", dtype=dtype, **kw)


class _AttnV3Core(nn.Module):
    """Shared V3/V3Base/V4/V4Base body: dual encoder streams to 1/4 res,
    cosine attn fuse, 3-level decoder WITHOUT skips (SRN.py:884-1242)."""
    variant: str  # "v3" | "v3base" | "v4" | "v4base"
    dtype: Optional[Dtype] = None
    win_h: int = 9
    win_w: int = 17

    @nn.compact
    def __call__(self, x, neighbors, train: bool = False):
        img1 = neighbors[..., :3]
        img2 = neighbors[..., 3:6]
        has_attn = self.variant in ("v3", "v4")
        img_c3 = 64 if has_attn else 128

        img1_ = _EncHead(32, dtype=self.dtype, name="img_encoder_1")
        img2_ = _EncL3(64, dtype=self.dtype, name="img_encoder_2")
        img3_ = _EncL3(img_c3, dtype=self.dtype, name="img_encoder_3")

        def img_encode(im):
            return img3_(img2_(img1_(im)))

        x_e3 = img_encode(x)
        i1_e3 = img_encode(img1)
        i2_e3 = img_encode(img2)

        flow = None
        if has_attn:
            if self.variant == "v3":
                a1 = _EncHead(32, dtype=self.dtype, name="attn_encoder_1")
                a2 = _EncL3(64, dtype=self.dtype, name="attn_encoder_2")
                a3 = _EncL3(64, dtype=self.dtype, name="attn_encoder_3")
            else:  # v4: wider/shallower stem; enc3 completes the ref's
                   # missing attn_encoder_3 (module docstring)
                a1 = _EncHead(64, blocks=1, dtype=self.dtype,
                              name="attn_encoder_1")
                a2 = _EncL3(128, dtype=self.dtype, name="attn_encoder_2")
                a3 = _EncL3(64, dtype=self.dtype, name="attn_encoder_3")

            def attn_encode(im):
                return a3(a2(a1(im)))

            prob, flow = _corr_cos(attn_encode(x), attn_encode(img1),
                                   attn_encode(img2), self.win_h,
                                   self.win_w)
            f1w, f2w = window_aggregate_per_neighbor(
                [i1_e3, i2_e3], prob, self.win_h, self.win_w)
        else:
            f1w, f2w = i1_e3, i2_e3

        mid_in = jnp.concatenate([x_e3, f1w, f2w], axis=-1)
        mid = _Mid(128, second_conv=64 if has_attn else 128,
                   dtype=self.dtype, name="mid")(mid_in)
        d3 = _DecL5(64, dtype=self.dtype, name="decoder_3")(mid)
        d2 = _DecL5(32, dtype=self.dtype, name="decoder_2")(d3)
        out = _DecOut3(3, dtype=self.dtype, name="decoder_1")(d2)
        return out, flow


def AttnRefineV3(dtype=None, **kw):
    return _AttnV3Core(variant="v3", dtype=dtype, **kw)


def AttnRefineV3Base(dtype=None, **kw):
    return _AttnV3Core(variant="v3base", dtype=dtype, **kw)


def AttnRefineV4(dtype=None, **kw):
    return _AttnV3Core(variant="v4", dtype=dtype, **kw)


def AttnRefineV4Base(dtype=None, **kw):
    return _AttnV3Core(variant="v4base", dtype=dtype, **kw)
