"""ROIAlign (v2, aligned) and the multi-level FPN pooler.

TPU-native replacement for the torchvision CUDA ``roi_align`` used by
detectron2 (``detectron2/layers/roi_align.py:3``) and its ``ROIPooler``
(``detectron2/modeling/poolers.py``). The CUDA kernel walks boxes with
dynamic bin sampling; here it is a vmapped bilinear gather on a static
``(out, out, 2x2 samples)`` grid — XLA lowers the gathers to efficient
dynamic-slices and fuses the bilinear arithmetic onto the VPU.

Semantics match ROIAlignV2 (``aligned=True``): half-pixel offset, 2x2
sampling grid per bin (sampling_ratio fixed at 2, the effective value the
reference uses for its 7/14-px outputs), average-pooled.
"""
from __future__ import annotations

import math

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
from jax import Array


def roi_align(
    features: Array,
    boxes: Array,
    output_size: int,
    spatial_scale: float,
    sampling_ratio: int = 2,
) -> Array:
    """ROIAlign on one feature map.

    Args:
      features: (H, W, C) feature map.
      boxes: (N, 4) XYXY in *image* coordinates.
      output_size: output resolution (e.g. 7 or 14).
      spatial_scale: feature stride reciprocal (e.g. 1/16).
    Returns:
      (N, output_size, output_size, C)
    """
    h, w, _ = features.shape
    s = sampling_ratio
    # Sample points: output_size*s per side, at bin-interior offsets.
    n_pts = output_size * s
    # offsets within [0, 1) of the roi, at centers of s sub-bins per bin
    rel = (jnp.arange(n_pts, dtype=jnp.float32) + 0.5) / n_pts

    def one_box(box: Array) -> Array:
        # aligned=True: shift by half a pixel in feature coords
        x1 = box[0] * spatial_scale - 0.5
        y1 = box[1] * spatial_scale - 0.5
        x2 = box[2] * spatial_scale - 0.5
        y2 = box[3] * spatial_scale - 0.5
        roi_w = jnp.maximum(x2 - x1, 1e-6)
        roi_h = jnp.maximum(y2 - y1, 1e-6)
        ys = y1 + rel * roi_h  # (n_pts,)
        xs = x1 + rel * roi_w
        sampled = _bilinear_gather(features, ys, xs)  # (n_pts, n_pts, C)
        # average the s x s sub-samples of each bin
        sampled = sampled.reshape(output_size, s, output_size, s, -1)
        return sampled.mean(axis=(1, 3))

    return jax.vmap(one_box)(boxes)


def _bilinear_gather(features: Array, ys: Array, xs: Array) -> Array:
    """Sample (H, W, C) at the outer product grid ys x xs, zero outside."""
    h, w, _ = features.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly = ys - y0
    lx = xs - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def take(yi, xi):
        yv = (yi >= 0) & (yi < h)
        xv = (xi >= 0) & (xi < w)
        vals = features[jnp.clip(yi, 0, h - 1)][:, jnp.clip(xi, 0, w - 1)]
        return vals * (yv[:, None] & xv[None, :])[..., None]

    v00 = take(y0i, x0i)
    v01 = take(y0i, x0i + 1)
    v10 = take(y0i + 1, x0i)
    v11 = take(y0i + 1, x0i + 1)
    top = v00 * (1 - lx)[None, :, None] + v01 * lx[None, :, None]
    bot = v10 * (1 - lx)[None, :, None] + v11 * lx[None, :, None]
    return top * (1 - ly)[:, None, None] + bot * ly[:, None, None]


def assign_boxes_to_levels(
    boxes: Array,
    min_level: int,
    max_level: int,
    canonical_box_size: float = 224.0,
    canonical_level: int = 4,
) -> Array:
    """FPN level assignment (detectron2 poolers.py ``assign_boxes_to_levels``)."""
    areas = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    sqrt_area = jnp.sqrt(jnp.maximum(areas, 1e-9))
    lvl = jnp.floor(canonical_level + jnp.log2(sqrt_area / canonical_box_size + 1e-8))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32) - min_level


def multilevel_roi_align(
    feature_maps: Sequence[Array],
    strides: Sequence[int],
    boxes: Array,
    output_size: int,
) -> Array:
    """ROIPooler: align each box on its assigned FPN level.

    The CUDA pooler gathers each level's boxes with dynamic indexing; under
    XLA we compute the (cheap) align on *every* level and select by the level
    assignment — trading a small constant-factor gather cost for fully static
    shapes and no data-dependent reshuffling. The heads that follow dominate
    the FLOPs, so this is noise on the profile.
    """
    # strides are static Python ints; use host math so the level index stays
    # static under jit (jnp.log2 would stage a tracer post-omnistaging)
    min_level = int(math.log2(strides[0]))
    levels = assign_boxes_to_levels(boxes, min_level, min_level + len(strides) - 1)
    per_level = jnp.stack(
        [
            roi_align(fm, boxes, output_size, 1.0 / st)
            for fm, st in zip(feature_maps, strides)
        ]
    )  # (L, N, out, out, C)
    return jnp.take_along_axis(
        per_level, levels[None, :, None, None, None], axis=0
    )[0]
