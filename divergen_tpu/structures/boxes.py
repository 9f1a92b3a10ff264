"""Box operations on ``(..., 4)`` XYXY arrays.

TPU-native counterpart of detectron2 ``structures/boxes.py`` (reference:
``BSGAL/third_party/CenterNet2/detectron2/structures/boxes.py:130``). Instead
of a ``Boxes`` wrapper class mutating torch tensors, boxes are plain jnp
arrays ``(..., 4)`` in absolute XYXY, and every op is a pure function that
broadcasts/vmaps — the natural JAX idiom. Padded (invalid) rows are handled by
callers via validity masks; degenerate boxes produce zero area/IoU and fall
out of matching naturally.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def area(boxes: Array) -> Array:
    """Area of XYXY boxes, clamped at 0 for degenerate rows.

    Reference semantics: detectron2 ``Boxes.area`` (structures/boxes.py:156).
    """
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def clip(boxes: Array, image_size: tuple[int, int] | Array) -> Array:
    """Clip boxes to ``(h, w)`` image bounds (structures/boxes.py:165)."""
    h, w = image_size[0], image_size[1]
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def nonempty(boxes: Array, threshold: float = 0.0) -> Array:
    """Bool mask of boxes with both sides > threshold (structures/boxes.py:183)."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return (w > threshold) & (h > threshold)


def centers(boxes: Array) -> Array:
    """(cx, cy) centers (structures/boxes.py:221)."""
    return (boxes[..., :2] + boxes[..., 2:]) / 2.0


def _pairwise_intersection(boxes1: Array, boxes2: Array) -> Array:
    """(N, M) intersection areas between two box sets."""
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(boxes1: Array, boxes2: Array) -> Array:
    """(N, M) IoU matrix (structures/boxes.py:230 ``pairwise_iou``).

    Degenerate/padded boxes get IoU 0 (the reference's torch.where on
    ``inter > 0`` has the same effect), so padding never matches.
    """
    a1 = area(boxes1)
    a2 = area(boxes2)
    inter = _pairwise_intersection(boxes1, boxes2)
    union = a1[:, None] + a2[None, :] - inter
    return jnp.where(inter > 0, inter / jnp.maximum(union, 1e-9), 0.0)


def pairwise_ioa(boxes1: Array, boxes2: Array) -> Array:
    """(N, M) intersection-over-area-of-boxes2 (structures/boxes.py:259)."""
    a2 = area(boxes2)
    inter = _pairwise_intersection(boxes1, boxes2)
    return jnp.where(inter > 0, inter / jnp.maximum(a2[None, :], 1e-9), 0.0)


def matched_pairwise_iou(boxes1: Array, boxes2: Array) -> Array:
    """Elementwise IoU of aligned box lists (structures/boxes.py:280)."""
    a1 = area(boxes1)
    a2 = area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = a1 + a2 - inter
    return jnp.where(inter > 0, inter / jnp.maximum(union, 1e-9), 0.0)


def xywh_to_xyxy(boxes: Array) -> Array:
    """COCO XYWH → XYXY (BoxMode.convert, structures/boxes.py:69)."""
    xy = boxes[..., :2]
    wh = boxes[..., 2:]
    return jnp.concatenate([xy, xy + wh], axis=-1)


def xyxy_to_xywh(boxes: Array) -> Array:
    """XYXY → COCO XYWH."""
    xy = boxes[..., :2]
    wh = boxes[..., 2:] - xy
    return jnp.concatenate([xy, wh], axis=-1)


def scale(boxes: Array, scale_x: Array, scale_y: Array) -> Array:
    """Scale box coordinates (structures/boxes.py:202)."""
    return jnp.stack(
        [
            boxes[..., 0] * scale_x,
            boxes[..., 1] * scale_y,
            boxes[..., 2] * scale_x,
            boxes[..., 3] * scale_y,
        ],
        axis=-1,
    )
