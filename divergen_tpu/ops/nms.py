"""Fixed-size, XLA-friendly NMS.

TPU-native replacement for torchvision ``batched_nms`` as used by
detectron2 (``detectron2/layers/nms.py:5-13``) and CenterNet2's ``ml_nms``
(``centernet/modeling/layers/ml_nms.py:4``). The CUDA kernel returns a
ragged keep-index list; on TPU we keep shapes static: inputs are padded
``(N,)`` score / ``(N, 4)`` box arrays with a validity mask, and the output
is an ``(N,)`` boolean keep mask (same order), so downstream top-k stays
shape-stable.

Algorithm: exact greedy NMS via *tiled self-suppression fixpoint* — the
canonical TPU formulation (same family as tf.image.non_max_suppression_
padded). Boxes are sorted by score and processed in tiles of 256: within a
tile, the triangular greedy recurrence ``keep[i] = alive[i] & !any_{j<i}
(keep[j] & iou[j,i] > t)`` is solved by iterating it to a fixpoint (unique
by induction on the triangular order, so the result is *exactly* greedy
NMS); across tiles, kept boxes mask all later tiles in one matrix op. This
replaces an O(N)-step sequential scan with ~N/256 unrolled tile steps of
MXU/VPU-friendly (256 x N) IoU blocks plus a short data-dependent while
loop (suppression chains are almost always < 4 deep).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from ..structures import boxes as box_ops

_TILE = 256


def nms_mask(boxes: Array, scores: Array, iou_threshold: float, valid: Array | None = None) -> Array:
    """Exact greedy NMS. Returns a bool keep mask aligned with input order.

    Invalid rows are never kept and never suppress others.
    """
    n = boxes.shape[0]
    if n == 0:
        return jnp.zeros((0,), bool)
    if valid is None:
        valid = jnp.ones((n,), bool)
    tile = min(_TILE, n)
    n_pad = -(-n // tile) * tile
    pad = n_pad - n
    boxes_p = jnp.pad(boxes, ((0, pad), (0, 0)))
    scores_p = jnp.pad(scores, (0, pad))
    valid_p = jnp.pad(valid, (0, pad))

    # Sort by score descending; invalid rows sink to the end.
    order = jnp.argsort(jnp.where(valid_p, -scores_p, jnp.inf))
    sboxes = boxes_p[order]
    svalid = valid_p[order]

    alive = svalid
    kept = jnp.zeros((n_pad,), bool)
    tri = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0) < jax.lax.broadcasted_iota(
        jnp.int32, (tile, tile), 1
    )  # [j, i]: j strictly above i in score order

    for t in range(n_pad // tile):
        sl = slice(t * tile, (t + 1) * tile)
        tb = sboxes[sl]
        ta = alive[sl]
        over = (box_ops.pairwise_iou(tb, tb) > iou_threshold) & tri

        def fix_body(state):
            k, _ = state
            k_new = ta & ~jnp.any(over & k[:, None], axis=0)
            return k_new, jnp.any(k_new != k)

        def fix_cond(state):
            return state[1]

        k0 = ta & ~jnp.any(over & ta[:, None], axis=0)
        k_tile, _ = jax.lax.while_loop(fix_cond, fix_body, (k0, jnp.any(k0 != ta)))
        kept = kept.at[sl].set(k_tile)
        if (t + 1) * tile < n_pad:
            rest = sboxes[(t + 1) * tile :]
            cross = box_ops.pairwise_iou(tb, rest) > iou_threshold  # (tile, rest)
            suppressed = jnp.any(cross & k_tile[:, None], axis=0)
            alive = alive.at[(t + 1) * tile :].set(alive[(t + 1) * tile :] & ~suppressed)

    # Scatter back to original order and drop padding.
    keep = jnp.zeros((n_pad,), bool).at[order].set(kept)
    return keep[:n]


def batched_nms_mask(
    boxes: Array,
    scores: Array,
    classes: Array,
    iou_threshold: float,
    valid: Array | None = None,
) -> Array:
    """Class-aware NMS via the coordinate-offset trick (nms.py:16-45).

    Boxes of different classes are translated to disjoint regions so they
    never overlap, then plain NMS runs once — the same trick the reference's
    ``batched_nms`` uses, fully vectorized.
    """
    if boxes.shape[0] == 0:
        return jnp.zeros((0,), bool)
    max_coord = jnp.max(jnp.where((valid if valid is not None else True), jnp.max(boxes, axis=-1), 0.0)) + 1.0
    offsets = classes.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    return nms_mask(shifted, scores, iou_threshold, valid)


def top_scoring(
    boxes: Array,
    scores: Array,
    keep: Array,
    k: int,
    extras: tuple[Array, ...] = (),
):
    """Select the top-k kept rows, returning padded arrays + validity.

    Replaces the reference's ragged ``keep = nms(...); boxes[keep][:topk]``
    pattern (centernet.py:727-739) with a static-shape top-k.
    """
    masked_scores = jnp.where(keep, scores, -jnp.inf)
    n = masked_scores.shape[-1]
    if n < k:
        # fewer candidates than requested: pad the candidate set so the
        # output keeps its static (k,) shape (small images / few levels)
        pad = k - n
        masked_scores = jnp.pad(masked_scores, (0, pad), constant_values=-jnp.inf)
        boxes = jnp.pad(boxes, ((0, pad), (0, 0)))
        extras = tuple(jnp.pad(e, ((0, pad),) + ((0, 0),) * (e.ndim - 1)) for e in extras)
    topv, topi = jax.lax.top_k(masked_scores, k)
    valid = topv > -jnp.inf
    out_boxes = boxes[topi]
    out_scores = jnp.where(valid, topv, 0.0)
    out_extras = tuple(e[topi] for e in extras)
    return out_boxes, out_scores, valid, topi, out_extras
