"""Box2BoxTransform — delta encode/decode (detectron2 modeling/box_regression.py)."""
from __future__ import annotations

import math
from typing import Tuple

import jax.numpy as jnp
from jax import Array

_SCALE_CLAMP = math.log(1000.0 / 16)


def get_deltas(src: Array, target: Array, weights: Tuple[float, ...]) -> Array:
    """Encode target boxes relative to src boxes (both (..., 4) XYXY)."""
    wx, wy, ww, wh = weights
    sw = src[..., 2] - src[..., 0]
    sh = src[..., 3] - src[..., 1]
    scx = src[..., 0] + 0.5 * sw
    scy = src[..., 1] + 0.5 * sh
    tw = target[..., 2] - target[..., 0]
    th = target[..., 3] - target[..., 1]
    tcx = target[..., 0] + 0.5 * tw
    tcy = target[..., 1] + 0.5 * th
    sw = jnp.maximum(sw, 1e-6)
    sh = jnp.maximum(sh, 1e-6)
    dx = wx * (tcx - scx) / sw
    dy = wy * (tcy - scy) / sh
    dw = ww * jnp.log(jnp.maximum(tw, 1e-6) / sw)
    dh = wh * jnp.log(jnp.maximum(th, 1e-6) / sh)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def apply_deltas(deltas: Array, boxes: Array, weights: Tuple[float, ...]) -> Array:
    """Decode deltas on boxes; dw/dh clamped at log(1000/16)."""
    wx, wy, ww, wh = weights
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, _SCALE_CLAMP)
    dh = jnp.minimum(deltas[..., 3] / wh, _SCALE_CLAMP)
    pcx = dx * w + cx
    pcy = dy * h + cy
    pw = jnp.exp(dw) * w
    ph = jnp.exp(dh) * h
    return jnp.stack(
        [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph], axis=-1
    )
