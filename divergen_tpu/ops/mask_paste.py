"""Paste predicted ROI masks into image-sized bitmasks.

TPU-native replacement for detectron2 ``paste_masks_in_image``
(``detectron2/layers/mask_ops.py:74``), which chunks boxes to bound GPU
memory and grid-samples each 28x28 mask into its box. Here it is one vmapped
inverse bilinear warp — for each output pixel, sample the ROI mask at the
corresponding normalized coordinate — which XLA turns into a fused gather;
no chunking needed because shapes are static and batched.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def paste_masks(
    masks: Array, boxes: Array, image_size: tuple[int, int], threshold: float = 0.5
) -> Array:
    """Paste (N, M, M) roi masks into (N, H, W) image masks.

    Matches mask_ops.py ``_do_paste_mask`` semantics: grid-sample with
    align_corners=False over the box extent, then threshold at 0.5 (a
    threshold < 0 returns the soft float mask).
    """
    h, w = image_size
    n, mh, mw = masks.shape

    ys_img = jnp.arange(h, dtype=jnp.float32) + 0.5
    xs_img = jnp.arange(w, dtype=jnp.float32) + 0.5

    def one(mask: Array, box: Array) -> Array:
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        bw = jnp.maximum(x2 - x1, 1e-6)
        bh = jnp.maximum(y2 - y1, 1e-6)
        # normalized [0,1] position inside the box → mask pixel coords
        my = (ys_img - y1) / bh * mh - 0.5
        mx = (xs_img - x1) / bw * mw - 0.5
        return _bilinear(mask, my, mx)

    out = jax.vmap(one)(masks.astype(jnp.float32), boxes)
    if threshold >= 0:
        return (out >= threshold).astype(jnp.float32)
    return out


def _bilinear(img: Array, ys: Array, xs: Array) -> Array:
    """Sample (H, W) at outer grid with zero padding outside."""
    h, w = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly = ys - y0
    lx = xs - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def take(yi, xi):
        valid = ((yi >= 0) & (yi < h))[:, None] & ((xi >= 0) & (xi < w))[None, :]
        v = img[jnp.clip(yi, 0, h - 1)[:, None], jnp.clip(xi, 0, w - 1)[None, :]]
        return jnp.where(valid, v, 0.0)

    v00 = take(y0i, x0i)
    v01 = take(y0i, x0i + 1)
    v10 = take(y0i + 1, x0i)
    v11 = take(y0i + 1, x0i + 1)
    top = v00 * (1 - lx)[None, :] + v01 * lx[None, :]
    bot = v10 * (1 - lx)[None, :] + v11 * lx[None, :]
    return top * (1 - ly)[:, None] + bot * ly[:, None]
