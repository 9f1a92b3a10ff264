"""Mask utilities on dense ``(N, H, W)`` float/bool arrays.

Counterpart of detectron2 ``structures/masks.py`` (``BitMasks`` :88,
``PolygonMasks`` :259, ``ROIMasks`` :464). The TPU build standardizes on
dense bitmasks with static shapes: polygons are rasterized host-side at load
time; ROI-cropped 28x28 mask targets are produced on-device by
``crop_and_resize`` (the reference calls the ROIAlign CUDA op for this,
masks.py:213 — here it is the same bilinear gather as ops/roi_align).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def masks_to_boxes(masks: Array) -> Array:
    """Tight XYXY boxes around nonzero mask regions; zeros for empty masks.

    Reference: ``BitMasks.get_bounding_boxes`` (structures/masks.py:240) and
    the paste kernel's ``get_bboxes`` (DiverGen/divergen/data/
    custom_build_copypaste_mapper.py:79-92). Static-shape version: min/max of
    masked iota, with empty masks producing a (0,0,0,0) box.
    """
    n, h, w = masks.shape
    on = masks > 0.5
    ys = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 1)
    xs = jax.lax.broadcasted_iota(jnp.int32, (n, h, w), 2)
    big = jnp.iinfo(jnp.int32).max
    x1 = jnp.min(jnp.where(on, xs, big), axis=(1, 2))
    y1 = jnp.min(jnp.where(on, ys, big), axis=(1, 2))
    x2 = jnp.max(jnp.where(on, xs, -1), axis=(1, 2)) + 1
    y2 = jnp.max(jnp.where(on, ys, -1), axis=(1, 2)) + 1
    any_on = jnp.any(on, axis=(1, 2))
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1).astype(jnp.float32)
    return jnp.where(any_on[:, None], boxes, 0.0)


def mask_areas(masks: Array) -> Array:
    """Pixel count per mask (BitMasks.area, structures/masks.py:251)."""
    return jnp.sum((masks > 0.5).astype(jnp.float32), axis=(1, 2))


def crop_and_resize(masks: Array, boxes: Array, size: int) -> Array:
    """Crop each mask to its box and resize to ``(size, size)`` bilinearly.

    Reference: ``BitMasks.crop_and_resize`` (structures/masks.py:208-230),
    which routes through the ROIAlign CUDA kernel. Here: vmapped bilinear
    sampling on a regular grid inside each box — pure XLA gather, which the
    compiler fuses; output in [0,1].
    """

    def one(mask: Array, box: Array) -> Array:
        x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
        # ROIAlign-style: sample at pixel centers of `size` bins
        ys = y1 + (jnp.arange(size, dtype=jnp.float32) + 0.5) * (y2 - y1) / size - 0.5
        xs = x1 + (jnp.arange(size, dtype=jnp.float32) + 0.5) * (x2 - x1) / size - 0.5
        return _bilinear_sample_2d(mask, ys, xs)

    return jax.vmap(one)(masks.astype(jnp.float32), boxes)


def mask_target_in_box(
    mask_crop: Array, src_box: Array, dst_box: Array, size: int
) -> Array:
    """Resample a box-frame mask crop onto another box's frame.

    ``mask_crop`` (S, S) is a GT mask stored normalized to ``src_box`` (the
    TPU-friendly replacement for full-image per-instance bitmasks — the
    reference rasterizes full-size masks and calls ROIAlign-crop per
    proposal, masks.py:208-230; storing (N, S, S) box-frame crops instead
    bounds memory at any image size). Returns the (size, size) mask target
    for ``dst_box`` (a proposal): each output point maps image-coords →
    src-box-normalized coords → bilinear sample, zero outside the GT box.
    """
    s = mask_crop.shape[0]
    sx1, sy1, sx2, sy2 = src_box[0], src_box[1], src_box[2], src_box[3]
    dx1, dy1, dx2, dy2 = dst_box[0], dst_box[1], dst_box[2], dst_box[3]
    sw = jnp.maximum(sx2 - sx1, 1e-6)
    sh = jnp.maximum(sy2 - sy1, 1e-6)
    # centers of the size x size bins of dst_box, in image coords
    ys_img = dy1 + (jnp.arange(size, dtype=jnp.float32) + 0.5) * (dy2 - dy1) / size
    xs_img = dx1 + (jnp.arange(size, dtype=jnp.float32) + 0.5) * (dx2 - dx1) / size
    # map into mask_crop pixel coords
    my = (ys_img - sy1) / sh * s - 0.5
    mx = (xs_img - sx1) / sw * s - 0.5
    return _bilinear_sample_2d(mask_crop.astype(jnp.float32), my, mx)


def _bilinear_sample_2d(img: Array, ys: Array, xs: Array) -> Array:
    """Sample ``img[H, W]`` on the outer grid ``ys x xs`` with zero padding."""
    h, w = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy1 = ys - y0
    wx1 = xs - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def at(yi, xi):
        valid = ((yi >= 0) & (yi < h))[:, None] & ((xi >= 0) & (xi < w))[None, :]
        v = img[jnp.clip(yi, 0, h - 1)[:, None], jnp.clip(xi, 0, w - 1)[None, :]]
        return jnp.where(valid, v, 0.0)

    v00 = at(y0i, x0i)
    v01 = at(y0i, x0i + 1)
    v10 = at(y0i + 1, x0i)
    v11 = at(y0i + 1, x0i + 1)
    top = v00 * (1 - wx1)[None, :] + v01 * wx1[None, :]
    bot = v10 * (1 - wx1)[None, :] + v11 * wx1[None, :]
    return top * (1 - wy1)[:, None] + bot * wy1[:, None]
