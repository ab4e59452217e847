"""Windowed patch-correlation attention (the stage-3 attention core).

Reference semantics (nets/refine_nets.py:253-323 ``MSResAttnRefine.corrmap`` /
``weight_neighbors_by_probmap``): for every feature-map position, cosine
similarity between the coarse feature and a (win_h x win_w) neighborhood of
each of the two input-frame features, softmaxed jointly over both neighbors'
windows, then used to re-aggregate neighbor features.

TPU-first design: instead of materializing the unfolded
(B, 2, C, H, W, win_h*win_w) tensor (the reference's ``unfold`` path, which
is HBM-bandwidth hostile), both ops are expressed as a *static loop over
window offsets* of pad-shift-multiply steps.  XLA fuses each offset's
shift+FMA into one VPU pass over the feature map, so peak memory stays at
O(B*H*W*max(C, K)) and everything streams through VMEM.  A fused Pallas
kernel is a further option for full-res; this formulation is already
compiler-friendly.

Layout: NHWC.  Window offset k flattens as k = wy * win_w + wx, matching the
reference's unfold order (H window outermost); similarity index order is
[neighbor0 windows..., neighbor1 windows...].

Deviation from reference (documented): reference ``corrmap`` decodes the
argmax flow index as ``(k // win_h, k % win_h)`` (nets/refine_nets.py:274),
which mis-decodes for win_h != win_w; we decode correctly as
``(k % win_w - win_w//2, k // win_w - win_h//2)`` = (dx, dy).  The decoded
flow map is visualization-only, so training behavior is unaffected.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp


def _shift2d(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """out[i, j] = x[i+dy, j+dx], zero-filled out of range. x is (B,H,W,C)."""
    b, h, w, c = x.shape
    pad_top = max(-dy, 0)
    pad_bot = max(dy, 0)
    pad_left = max(-dx, 0)
    pad_right = max(dx, 0)
    xp = jnp.pad(x, ((0, 0), (pad_top, pad_bot), (pad_left, pad_right), (0, 0)))
    return jax.lax.dynamic_slice(
        xp, (0, pad_top + dy, pad_left + dx, 0), (b, h, w, c)
    )


def _offsets(win_h: int, win_w: int) -> List[Tuple[int, int]]:
    return [
        (wy - win_h // 2, wx - win_w // 2)
        for wy in range(win_h)
        for wx in range(win_w)
    ]


def _l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    # reference uses x / x.norm(dim=1, keepdim=True) with no eps; zero-padded
    # borders divide 0/0 in torch yielding nan*0 semantics — we use a tiny eps.
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / jnp.maximum(norm, eps)


def window_correlation(
    x: jnp.ndarray,
    neighbors: Sequence[jnp.ndarray],
    win_h: int = 5,
    win_w: int = 9,
    normalize: bool = True,
) -> jnp.ndarray:
    """Cosine similarity of ``x`` vs shifted neighbors.

    Args:
      x: (B, H, W, C) query features.
      neighbors: list of (B, H, W, C) neighbor features.
    Returns:
      (B, H, W, len(neighbors) * win_h * win_w) similarity logits, neighbor-
      major then k = wy*win_w + wx (reference order, refine_nets.py:281).
    """
    xq = _l2_normalize(x) if normalize else x
    sims = []
    for t in neighbors:
        tn = _l2_normalize(t) if normalize else t
        for dy, dx in _offsets(win_h, win_w):
            shifted = _shift2d(tn, dy, dx)
            sims.append(jnp.sum(xq * shifted, axis=-1))
    return jnp.stack(sims, axis=-1)


def window_aggregate(
    neighbors: Sequence[jnp.ndarray],
    prob: jnp.ndarray,
    win_h: int = 5,
    win_w: int = 9,
) -> jnp.ndarray:
    """Probability-weighted aggregation over neighbor windows.

    out = sum_{n,k} prob[..., n*K + k] * shift(neighbors[n], offset_k)
    (reference weight_neighbors_by_probmap, refine_nets.py:313-323).
    """
    k = win_h * win_w
    out = None
    for n, t in enumerate(neighbors):
        for ki, (dy, dx) in enumerate(_offsets(win_h, win_w)):
            w = prob[..., n * k + ki][..., None]
            term = _shift2d(t, dy, dx) * w
            out = term if out is None else out + term
    return out


def window_aggregate_per_neighbor(
    neighbors: Sequence[jnp.ndarray],
    prob: jnp.ndarray,
    win_h: int = 5,
    win_w: int = 9,
    eps: float = 1e-12,
) -> List[jnp.ndarray]:
    """Per-neighbor aggregation renormalized by that neighbor's prob mass.

    Reference weight_neighbors_by_low_probmap (refine_nets.py:289-311): each
    neighbor's weighted sum is divided by the sum of its own window probs.
    """
    k = win_h * win_w
    outs = []
    for n, t in enumerate(neighbors):
        num = None
        for ki, (dy, dx) in enumerate(_offsets(win_h, win_w)):
            w = prob[..., n * k + ki][..., None]
            term = _shift2d(t, dy, dx) * w
            num = term if num is None else num + term
        denom = jnp.sum(
            prob[..., n * k:(n + 1) * k], axis=-1, keepdims=True
        )
        outs.append(num / jnp.maximum(denom, eps))
    return outs


def argmax_flow(
    sim: jnp.ndarray, num_neighbors: int, win_h: int = 5, win_w: int = 9
) -> jnp.ndarray:
    """Decode per-neighbor argmax window offset to (dx, dy) flow.

    Returns (B, num_neighbors, H, W, 2) with channel order (dx, dy) to match
    the reference's (w-offset, h-offset) stacking intent
    (refine_nets.py:273-279; see module docstring for the decode fix).
    """
    b, h, w, _ = sim.shape
    k = win_h * win_w
    flows = []
    for n in range(num_neighbors):
        idx = jnp.argmax(sim[..., n * k:(n + 1) * k], axis=-1)
        dx = (idx % win_w - win_w // 2).astype(jnp.float32)
        dy = (idx // win_w - win_h // 2).astype(jnp.float32)
        flows.append(jnp.stack([dx, dy], axis=-1))
    return jnp.stack(flows, axis=1)
