"""Fixed-shape ROI ops: batched crop-resize and paste-back.

The reference crops/pastes per-track object patches with Python loops of
variable-size slices (nets/TrackGen.py:128-179, nets/DetDisc.py:95-106,
losses.py:383-401) — data-dependent shapes that cannot compile under XLA.
Here both directions are reformulated as *fixed-shape bilinear gathers*
vectorized over a static number of tracks, so the whole GAN/track path jits:

- ``crop_resize``: every (y1, x1, y2, x2) box (pixel coords, inclusive like
  the reference's ``img[y1:y2+1, x1:x2+1]`` slicing) is sampled on a fixed
  (ph, pw) grid with align_corners=True bilinear — equivalent to the
  reference's crop + ``F.interpolate(..., align_corners=True)``.
- ``paste_patches``: the inverse map — each canvas pixel inside a box
  bilinearly samples the patch; later tracks overwrite earlier ones,
  matching the reference's sequential paste loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _sample_patch_grid(
    img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray
) -> jnp.ndarray:
    """Bilinear sample (H, W, C) image at pixel coords ys (Ph,), xs (Pw,)."""
    h, w, c = img.shape

    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ty = (ys - y0)[:, None, None]
    tx = (xs - x0)[None, :, None]
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)

    def gather(yi, xi):
        rows = jnp.take(img, yi, axis=0)       # (Ph, W, C)
        return jnp.take(rows, xi, axis=1)      # (Ph, Pw, C)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)
    ty = ty.astype(img.dtype)
    tx = tx.astype(img.dtype)
    return (v00 * (1 - ty) * (1 - tx) + v01 * (1 - ty) * tx
            + v10 * ty * (1 - tx) + v11 * ty * tx)


def crop_resize(
    img: jnp.ndarray, boxes: jnp.ndarray, out_size=(64, 64)
) -> jnp.ndarray:
    """Crop+resize boxes to a fixed patch size.

    Args:
      img: (B, H, W, C).
      boxes: (B, N, 4) float (y1, x1, y2, x2) pixel coords, inclusive.
      out_size: (ph, pw).
    Returns:
      (B, N, ph, pw, C) patches.
    """
    ph, pw = out_size

    def one(img_b, box):
        y1, x1, y2, x2 = box[0], box[1], box[2], box[3]
        ty = jnp.linspace(0.0, 1.0, ph)
        tx = jnp.linspace(0.0, 1.0, pw)
        ys = y1 + ty * (y2 - y1)
        xs = x1 + tx * (x2 - x1)
        return _sample_patch_grid(img_b, ys, xs)

    per_box = jax.vmap(one, in_axes=(None, 0))
    return jax.vmap(per_box)(img, boxes.astype(jnp.float32))


def paste_patches(
    canvas: jnp.ndarray, patches: jnp.ndarray, boxes: jnp.ndarray
) -> jnp.ndarray:
    """Paste fixed-size patches back into the canvas at box locations.

    Args:
      canvas: (B, H, W, C).
      patches: (B, N, ph, pw, C).
      boxes: (B, N, 4) float (y1, x1, y2, x2) inclusive pixel coords.
    Returns:
      (B, H, W, C) with each box region replaced by its bilinearly resized
      patch; later boxes overwrite earlier ones (reference paste order).
    """
    b, h, w, c = canvas.shape
    n = patches.shape[1]
    ph, pw = patches.shape[2], patches.shape[3]
    ii = jnp.arange(h, dtype=jnp.float32)[:, None]     # (H, 1)
    jj = jnp.arange(w, dtype=jnp.float32)[None, :]     # (1, W)

    def paste_one(cv, patch, box):
        y1, x1, y2, x2 = box[0], box[1], box[2], box[3]
        hh = jnp.maximum(y2 - y1, 1e-6)
        ww = jnp.maximum(x2 - x1, 1e-6)
        u = (ii - y1) / hh * (ph - 1)                  # (H, 1)
        v = (jj - x1) / ww * (pw - 1)                  # (1, W)
        inside = ((ii >= y1) & (ii <= y2) & (jj >= x1) & (jj <= x2))
        u = jnp.clip(jnp.broadcast_to(u, (h, w)), 0, ph - 1)
        v = jnp.clip(jnp.broadcast_to(v, (h, w)), 0, pw - 1)
        u0 = jnp.floor(u)
        v0 = jnp.floor(v)
        tu = (u - u0)[..., None].astype(patch.dtype)
        tv = (v - v0)[..., None].astype(patch.dtype)
        u0i = jnp.clip(u0.astype(jnp.int32), 0, ph - 1)
        u1i = jnp.clip(u0i + 1, 0, ph - 1)
        v0i = jnp.clip(v0.astype(jnp.int32), 0, pw - 1)
        v1i = jnp.clip(v0i + 1, 0, pw - 1)
        flat = patch.reshape(ph * pw, -1)
        def g(ui, vi):
            return jnp.take(flat, ui * pw + vi, axis=0)
        val = (g(u0i, v0i) * (1 - tu) * (1 - tv) + g(u0i, v1i) * (1 - tu) * tv
               + g(u1i, v0i) * tu * (1 - tv) + g(u1i, v1i) * tu * tv)
        return jnp.where(inside[..., None], val, cv)

    out = canvas
    for k in range(n):
        out = jax.vmap(paste_one)(out, patches[:, k], boxes[:, k].astype(jnp.float32))
    return out
