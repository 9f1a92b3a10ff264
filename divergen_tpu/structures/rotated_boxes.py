"""Rotated boxes — (N, 5) arrays of (cx, cy, w, h, angle_deg CCW).

Counterpart of detectron2 ``structures/rotated_boxes.py`` (RotatedBoxes):
functional helpers over plain arrays instead of a mutable class, matching
this package's padded-pytree style (see structures/boxes.py). The heavy ops
(pairwise IoU, NMS, ROIAlign) live in ops/rotated.py.
"""
from __future__ import annotations

import math

import jax.numpy as jnp
from jax import Array

from ..ops.rotated import nms_rotated, pairwise_iou_rotated  # re-export  # noqa: F401


def area(boxes: Array) -> Array:
    """(N, 5) → (N,)."""
    return boxes[:, 2] * boxes[:, 3]


def normalize_angles(boxes: Array) -> Array:
    """Wrap angles into [-180, 180) (RotatedBoxes.normalize_angles)."""
    a = jnp.remainder(boxes[:, 4] + 180.0, 360.0) - 180.0
    return boxes.at[:, 4].set(a)


def clip(boxes: Array, image_size, clip_angle_threshold: float = 1.0) -> Array:
    """Clip near-horizontal boxes to the image (RotatedBoxes.clip: only
    boxes with |angle| <= threshold are clipped, since clipping a rotated
    box to an axis-aligned frame is ill-defined)."""
    h, w = image_size[0], image_size[1]
    near = jnp.abs(normalize_angles(boxes)[:, 4]) <= clip_angle_threshold
    x1 = boxes[:, 0] - boxes[:, 2] / 2
    y1 = boxes[:, 1] - boxes[:, 3] / 2
    x2 = boxes[:, 0] + boxes[:, 2] / 2
    y2 = boxes[:, 1] + boxes[:, 3] / 2
    x1c = jnp.clip(x1, 0, w)
    y1c = jnp.clip(y1, 0, h)
    x2c = jnp.clip(x2, 0, w)
    y2c = jnp.clip(y2, 0, h)
    clipped = jnp.stack(
        [(x1c + x2c) / 2, (y1c + y2c) / 2, x2c - x1c, y2c - y1c, boxes[:, 4]], axis=-1
    )
    return jnp.where(near[:, None], clipped, boxes)


def nonempty(boxes: Array, threshold: float = 0.0) -> Array:
    return (boxes[:, 2] > threshold) & (boxes[:, 3] > threshold)


def inside_box(boxes: Array, image_size, boundary_threshold: float = 0.0) -> Array:
    """Centers-inside test (RotatedBoxes.inside_box uses centers)."""
    h, w = image_size[0], image_size[1]
    return (
        (boxes[:, 0] >= -boundary_threshold)
        & (boxes[:, 1] >= -boundary_threshold)
        & (boxes[:, 0] < w + boundary_threshold)
        & (boxes[:, 1] < h + boundary_threshold)
    )


def xyxy_to_rotated(xyxy: Array) -> Array:
    """(N, 4) xyxy → (N, 5) angle-0 rotated boxes."""
    cx = (xyxy[:, 0] + xyxy[:, 2]) / 2
    cy = (xyxy[:, 1] + xyxy[:, 3]) / 2
    return jnp.stack(
        [cx, cy, xyxy[:, 2] - xyxy[:, 0], xyxy[:, 3] - xyxy[:, 1],
         jnp.zeros_like(cx)], axis=-1
    )
