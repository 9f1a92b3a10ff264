"""Rotated-box ops: ROIAlignRotated, rotated IoU, rotated NMS.

TPU-native answers to the reference's CUDA/C++ kernels (SURVEY.md §2.4):
  * ``detectron2/layers/csrc/ROIAlignRotated/*`` → ``roi_align_rotated``
    (vmapped bilinear gather over a rotated sampling grid)
  * ``csrc/box_iou_rotated/*`` → ``pairwise_iou_rotated`` (vectorized
    Sutherland–Hodgman convex clipping with fixed-capacity vertex buffers)
  * ``csrc/nms_rotated/*`` → ``nms_rotated`` (greedy NMS over the rotated
    IoU matrix, same fixpoint scheme as ops/nms.py)

Box format follows detectron2 ``RotatedBoxes``: (cx, cy, w, h, angle) with
the angle in degrees, counter-clockwise.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array


# ---------------------------------------------------------------------------
# ROIAlignRotated
# ---------------------------------------------------------------------------


def _bilinear(fmap: Array, y: Array, x: Array) -> Array:
    """fmap (H, W, C); y/x (...,) continuous coords → (..., C).
    Out-of-bounds samples contribute 0 (ROIAlign empty-bin semantics)."""
    h, w, _ = fmap.shape
    inb = (y > -1.0) & (y < h) & (x > -1.0) & (x < w)
    y = jnp.clip(y, 0.0, h - 1.0)
    x = jnp.clip(x, 0.0, w - 1.0)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = (y - y0)[..., None]
    lx = (x - x0)[..., None]
    v00 = fmap[y0, x0]
    v01 = fmap[y0, x1]
    v10 = fmap[y1, x0]
    v11 = fmap[y1, x1]
    out = (
        v00 * (1 - ly) * (1 - lx)
        + v01 * (1 - ly) * lx
        + v10 * ly * (1 - lx)
        + v11 * ly * lx
    )
    return out * inb[..., None]


def roi_align_rotated(
    fmap: Array,  # (H, W, C)
    rois: Array,  # (N, 5) cx, cy, w, h, angle_deg (CCW), image coords
    resolution: int,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
) -> Array:
    """ROIAlignRotated forward (ROIAlignRotated_cpu.cpp semantics, aligned
    continuous coordinates: offset -0.5). Returns (N, res, res, C)."""
    cx = rois[:, 0] * spatial_scale - 0.5
    cy = rois[:, 1] * spatial_scale - 0.5
    rw = jnp.maximum(rois[:, 2] * spatial_scale, 1e-6)
    rh = jnp.maximum(rois[:, 3] * spatial_scale, 1e-6)
    theta = rois[:, 4] * math.pi / 180.0  # CCW

    s = sampling_ratio
    bin_h = rh / resolution
    bin_w = rw / resolution
    # sample-point offsets in the roi's local frame, centered at roi center
    iy = (jnp.arange(resolution * s) + 0.5) / s  # in bin units
    ix = (jnp.arange(resolution * s) + 0.5) / s
    # local coords before rotation: (P,) each, P = res*s
    def one_roi(cxi, cyi, bh, bw, th):
        yy = iy * bh - (bh * resolution) / 2.0  # (P,)
        xx = ix * bw - (bw * resolution) / 2.0
        gy, gx = jnp.meshgrid(yy, xx, indexing="ij")  # (P, P)
        cos_t, sin_t = jnp.cos(th), jnp.sin(th)
        # detectron2 ROIAlignRotated_cpu.cpp:62-63 (y-down image coords, CCW
        # angle): x = cx + xx*cos + yy*sin ; y = cy - xx*sin + yy*cos
        rx = cxi + gx * cos_t + gy * sin_t
        ry = cyi - gx * sin_t + gy * cos_t
        vals = _bilinear(fmap, ry, rx)  # (P, P, C)
        p = resolution
        vals = vals.reshape(p, s, p, s, -1)
        return vals.mean(axis=(1, 3))  # average the s*s samples per bin

    return jax.vmap(one_roi)(cx, cy, bin_h, bin_w, theta)


# ---------------------------------------------------------------------------
# Rotated IoU (convex polygon clipping)
# ---------------------------------------------------------------------------

_CAP = 8  # |quad ∩ quad| has at most 8 vertices


def _rect_corners(box: Array) -> Array:
    """(5,) → (4, 2) corners, CCW order."""
    cx, cy, w, h, a = box[0], box[1], box[2], box[3], box[4]
    th = a * math.pi / 180.0
    cos_t, sin_t = jnp.cos(th), jnp.sin(th)
    dx = jnp.asarray([-0.5, 0.5, 0.5, -0.5]) * w
    dy = jnp.asarray([-0.5, -0.5, 0.5, 0.5]) * h
    # box_iou_rotated_utils.h:64-74 (y-down, CCW angle):
    # x = cx + dx*cos + dy*sin ; y = cy - dx*sin + dy*cos
    x = cx + dx * cos_t + dy * sin_t
    y = cy - dx * sin_t + dy * cos_t
    return jnp.stack([x, y], axis=-1)


def _clip_by_edge(poly: Array, n: Array, a: Array, b: Array) -> Tuple[Array, Array]:
    """Sutherland–Hodgman step: clip ``poly`` ((CAP*2, 2) buffer holding n
    valid CCW vertices) by the half-plane left of edge a→b. Returns a new
    fixed-size buffer + count."""
    cap = poly.shape[0]
    idx = jnp.arange(cap)
    valid = idx < n
    nxt = jnp.where(idx + 1 < n, idx + 1, 0)
    p1 = poly
    p2 = poly[nxt]
    e = b - a

    def side(p):
        return e[0] * (p[..., 1] - a[1]) - e[1] * (p[..., 0] - a[0])

    s1 = side(p1)
    s2 = side(p2)
    in1 = s1 >= 0
    in2 = s2 >= 0
    denom = s1 - s2
    t = jnp.where(jnp.abs(denom) > 1e-12, s1 / jnp.where(denom == 0, 1.0, denom), 0.0)
    inter = p1 + t[:, None] * (p2 - p1)

    # per input edge, emit up to 2 points: p2 if in2; intersection if crossing
    emit_inter = (in1 != in2) & valid
    emit_p2 = in2 & valid
    # order per edge: intersection first (exit/entry), then p2
    pts = jnp.stack([inter, p2], axis=1)  # (cap, 2, 2)
    emits = jnp.stack([emit_inter, emit_p2], axis=1)  # (cap, 2)
    flat_pts = pts.reshape(-1, 2)
    flat_emit = emits.reshape(-1)
    pos = jnp.cumsum(flat_emit) - 1
    # compact emitted points into the front of a fresh buffer; non-emitted
    # rows target index ``cap`` and are dropped by the scatter
    out = jnp.zeros((cap, 2), poly.dtype).at[
        jnp.where(flat_emit, pos, cap)
    ].set(flat_pts, mode="drop")
    return out, jnp.sum(flat_emit)


def _poly_area(poly: Array, n: Array) -> Array:
    cap = poly.shape[0]
    idx = jnp.arange(cap)
    valid = idx < n
    nxt = jnp.where(idx + 1 < n, idx + 1, 0)
    x1, y1 = poly[:, 0], poly[:, 1]
    x2, y2 = poly[nxt, 0], poly[nxt, 1]
    cross = x1 * y2 - x2 * y1
    return 0.5 * jnp.abs(jnp.sum(jnp.where(valid, cross, 0.0)))


def _iou_rotated_single(box1: Array, box2: Array) -> Array:
    c1 = _rect_corners(box1)
    c2 = _rect_corners(box2)
    cap = _CAP
    poly = jnp.zeros((cap, 2)).at[:4].set(c1)
    n = jnp.asarray(4)
    for k in range(4):
        poly, n = _clip_by_edge(poly, n, c2[k], c2[(k + 1) % 4])
    inter = jnp.where(n >= 3, _poly_area(poly, n), 0.0)
    a1 = box1[2] * box1[3]
    a2 = box2[2] * box2[3]
    return inter / jnp.maximum(a1 + a2 - inter, 1e-9)


def pairwise_iou_rotated(boxes1: Array, boxes2: Array) -> Array:
    """(N, 5) x (M, 5) → (N, M) IoU (csrc/box_iou_rotated semantics)."""
    return jax.vmap(lambda b1: jax.vmap(lambda b2: _iou_rotated_single(b1, b2))(boxes2))(
        boxes1
    )


# ---------------------------------------------------------------------------
# Rotated NMS
# ---------------------------------------------------------------------------


def nms_rotated(
    boxes: Array,  # (N, 5)
    scores: Array,  # (N,)
    iou_threshold: float,
    valid: Array | None = None,
) -> Array:
    """Exact greedy NMS over rotated IoU. Returns a keep mask (N,). Same
    score-ordered suppression fixpoint as ops/nms.py batched_nms_mask."""
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    iou = pairwise_iou_rotated(boxes, boxes)
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    iou_s = iou[order][:, order]
    valid_s = valid[order]
    sup = (iou_s > iou_threshold) & (~jnp.eye(n, dtype=bool))
    upper = jnp.triu(jnp.ones((n, n), bool), 1)  # j suppresses i only if j<i

    def body(keep):
        # keep_i = valid_i and no kept higher-scoring j suppresses i
        suppressed = jnp.any(sup & upper.T & keep[None, :], axis=1)
        return valid_s & ~suppressed

    keep = valid_s
    # n iterations upper-bound; converges much faster — fixed 8 rounds then
    # one verification round is exact for typical box counts; use while_loop
    def cond(state):
        keep, prev, it = state
        return jnp.any(keep != prev) & (it < n)

    def step(state):
        keep, _, it = state
        return body(keep), keep, it + 1

    keep, _, _ = jax.lax.while_loop(cond, step, (keep, ~keep, 0))
    inv = jnp.argsort(order)
    return keep[inv]
