"""Detection losses: heatmap focal, IoU-family box regression, federated CE.

TPU-native counterparts of:
  * penalty-reduced heatmap focal loss — CenterNet2
    ``centernet/modeling/layers/heatmap_focal_loss.py:5-51`` (the reference
    TorchScripts it; under jit XLA fuses the whole thing anyway)
  * IOULoss (iou / linear_iou / giou) —
    ``centernet/modeling/layers/iou_loss.py:5-66``
  * sigmoid CE + federated loss —
    ``DiverGen/divergen/modeling/roi_heads/detic_fast_rcnn.py`` and
    ``divergen/modeling/utils.py:7-29`` (``load_class_freq`` /
    ``get_fed_loss_inds``)

All take explicit weight/mask arrays so padded rows contribute zero.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def heatmap_focal_loss(
    logits: Array,
    targets: Array,
    pos_count: Array,
    alpha: float = 0.25,
    beta: float = 4.0,
    gamma: float = 2.0,
    sigmoid_clamp: float = 1e-4,
    ignore_high_fp: float = -1.0,
) -> tuple[Array, Array]:
    """Binary penalty-reduced focal loss on a gaussian-rendered heatmap.

    Exact semantics of ``binary_heatmap_focal_loss`` (heatmap_focal_loss.py:
    52-88): the negative term runs over *every* location (peaks are damped by
    the ``(1 - target)^beta`` penalty, which is 0 at exact peaks), and the
    positive term indexes positive locations *with multiplicity* — two GT
    centers sharing a cell contribute twice. ``pos_count`` carries that
    multiplicity (0 at non-positive locations).

    Args:
      logits: (...,) raw heatmap logits.
      targets: (...,) gaussian targets in [0, 1]; exactly 1.0 at peaks.
      pos_count: (...,) int — number of GT centers assigned to the location.
    Returns:
      (pos_loss_sum, neg_loss_sum) — unnormalized; the caller divides by the
      cross-replica positive count (centernet.py:255-261).
    """
    pred = jnp.clip(jax.nn.sigmoid(logits), sigmoid_clamp, 1 - sigmoid_clamp)
    neg_weights = jnp.power(1.0 - targets, beta)
    pos_loss = jnp.log(pred) * jnp.power(1.0 - pred, gamma)
    neg_loss = jnp.log(1.0 - pred) * jnp.power(pred, gamma) * neg_weights
    if ignore_high_fp > 0:
        not_high_fp = (pred < ignore_high_fp).astype(pred.dtype)
        neg_loss = not_high_fp * neg_loss
    if alpha >= 0:
        pos_loss = alpha * pos_loss
        neg_loss = (1.0 - alpha) * neg_loss
    pos_loss_sum = -jnp.sum(pos_count.astype(pred.dtype) * pos_loss)
    neg_loss_sum = -jnp.sum(neg_loss)
    return pos_loss_sum, neg_loss_sum


def iou_loss(
    pred: Array,
    target: Array,
    weight: Array | None = None,
    loss_type: str = "giou",
    reduction: str = "sum",
) -> Array:
    """IoU-family loss on LTRB distance encodings (iou_loss.py:5-66).

    ``pred``/``target`` are (N, 4) nonneg distances (left, top, right,
    bottom) from a center point — CenterNet's regression parameterization.
    """
    pl_, pt, pr, pb = pred[:, 0], pred[:, 1], pred[:, 2], pred[:, 3]
    tl, tt, tr, tb = target[:, 0], target[:, 1], target[:, 2], target[:, 3]

    target_area = (tl + tr) * (tt + tb)
    pred_area = (pl_ + pr) * (pt + pb)

    w_inter = jnp.minimum(pl_, tl) + jnp.minimum(pr, tr)
    h_inter = jnp.minimum(pb, tb) + jnp.minimum(pt, tt)
    g_w = jnp.maximum(pl_, tl) + jnp.maximum(pr, tr)
    g_h = jnp.maximum(pb, tb) + jnp.maximum(pt, tt)

    # exact reference arithmetic (iou_loss.py:36-48): +1 smoothing on both
    # numerator and denominator, no clamping of the intersection terms
    inter = w_inter * h_inter
    union = target_area + pred_area - inter
    ious = (inter + 1.0) / (union + 1.0)

    if loss_type == "iou":
        losses = -jnp.log(ious)
    elif loss_type == "linear_iou":
        losses = 1.0 - ious
    elif loss_type == "giou":
        ac_uion = g_w * g_h
        gious = ious - (ac_uion - union) / jnp.where(ac_uion == 0, 1.0, ac_uion)
        losses = 1.0 - gious
    else:
        raise ValueError(loss_type)

    if weight is not None:
        losses = losses * weight
    if reduction == "sum":
        return jnp.sum(losses)
    if reduction == "mean":
        return jnp.mean(losses)
    return losses


def giou_loss_xyxy(pred: Array, target: Array) -> Array:
    """Elementwise GIoU loss on XYXY boxes (fvcore giou_loss used by the
    cascade box head when BBOX_REG_LOSS_TYPE='giou')."""
    px1, py1, px2, py2 = (pred[..., i] for i in range(4))
    tx1, ty1, tx2, ty2 = (target[..., i] for i in range(4))
    pa = (px2 - px1) * (py2 - py1)
    ta = (tx2 - tx1) * (ty2 - ty1)
    ix1 = jnp.maximum(px1, tx1)
    iy1 = jnp.maximum(py1, ty1)
    ix2 = jnp.minimum(px2, tx2)
    iy2 = jnp.minimum(py2, ty2)
    inter = jnp.clip(ix2 - ix1, 0) * jnp.clip(iy2 - iy1, 0)
    union = pa + ta - inter
    iou = inter / jnp.maximum(union, 1e-7)
    cx1 = jnp.minimum(px1, tx1)
    cy1 = jnp.minimum(py1, ty1)
    cx2 = jnp.maximum(px2, tx2)
    cy2 = jnp.maximum(py2, ty2)
    carea = jnp.maximum((cx2 - cx1) * (cy2 - cy1), 1e-7)
    giou = iou - (carea - union) / carea
    return 1.0 - giou


def smooth_l1_loss(pred: Array, target: Array, beta: float) -> Array:
    """Elementwise smooth-L1 (fvcore semantics; beta=0 → pure L1)."""
    diff = jnp.abs(pred - target)
    if beta <= 1e-8:
        return diff
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)


def get_fed_loss_classes(
    key: Array,
    gt_classes: Array,
    gt_valid: Array,
    num_classes: int,
    num_sample_cats: int,
    freq_weight: Array,
) -> Array:
    """Federated-loss class mask (divergen/modeling/utils.py:16-29).

    Returns a (num_classes + 1,) float mask: 1 for classes included in this
    step's loss (all GT classes + frequency-weighted negatives sampled
    without replacement via Gumbel top-k), 0 otherwise. Background column
    (index num_classes) is always included by the caller's weighting.
    """
    appeared = jnp.zeros((num_classes + 1,), bool)
    appeared = appeared.at[jnp.where(gt_valid, gt_classes, num_classes)].set(True)
    prob = jnp.concatenate([freq_weight, jnp.zeros((1,), freq_weight.dtype)])
    prob = jnp.where(appeared, 0.0, prob)  # appeared classes get weight 0
    # the NUM_SAMPLE_CATS budget INCLUDES the appeared classes: only the
    # deficit is sampled as negatives, and none when appeared >= budget
    # (get_fed_loss_inds: ``num_sample_cats - len(appeared)`` draws)
    n_appeared = jnp.sum(appeared.astype(jnp.int32))
    need = jnp.maximum(num_sample_cats - n_appeared, 0)
    # Gumbel top-k == sampling w/o replacement proportional to prob
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(key, prob.shape) + 1e-20) + 1e-20)
    scores = jnp.where(prob > 0, jnp.log(prob + 1e-20) + gumbel, -jnp.inf)
    _, top_idx = jax.lax.top_k(scores, num_sample_cats)
    keep = jnp.arange(num_sample_cats) < need  # scores sorted descending
    sampled = jnp.zeros((num_classes + 1,), bool).at[top_idx].set(keep)
    # classes with zero prob can leak in when fewer than `need` have prob>0
    sampled = sampled & (prob > 0)
    mask = appeared | sampled
    return mask.astype(jnp.float32)


def sample_dynamic_classifier_inds(
    key: Array,
    gt_classes: Array,  # flat (N,) int32 — gt classes or image labels
    gt_valid: Array,  # (N,) bool
    num_classes: int,
    num_sample_cats: int,
    freq_weight: Array | None = None,
) -> tuple:
    """Dynamic classifier sampling (_sample_cls_inds,
    custom_rcnn.py:226-247): pick ``num_sample_cats`` classifier columns —
    every class appearing in the batch, then frequency-weighted random
    negatives — and return (inds (K,), cls_id_map (C+1,)) where cls_id_map
    sends original ids to compact ids and everything else (incl. background
    C) to K. Static-size deviation from the reference: if more than K
    distinct classes appear, the overflow maps to background."""
    import jax

    appeared = jnp.zeros((num_classes + 1,), bool)
    appeared = appeared.at[jnp.where(gt_valid, gt_classes, num_classes)].set(True)
    appeared = appeared[:num_classes]
    w = freq_weight if freq_weight is not None else jnp.ones((num_classes,))
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(key, (num_classes,)) + 1e-20) + 1e-20)
    score = jnp.where(w > 0, jnp.log(w + 1e-20) + gumbel, -1e30)
    score = jnp.where(appeared, jnp.inf, score)  # appeared classes first
    _, inds = jax.lax.top_k(score, num_sample_cats)
    cls_id_map = jnp.full((num_classes + 1,), num_sample_cats, jnp.int32)
    cls_id_map = cls_id_map.at[inds].set(jnp.arange(num_sample_cats, dtype=jnp.int32))
    cls_id_map = cls_id_map.at[num_classes].set(num_sample_cats)  # bg → K
    return inds, cls_id_map


def sigmoid_cross_entropy_with_fed_loss(
    scores: Array,
    gt_classes: Array,
    gt_valid: Array,
    num_classes: int,
    fed_mask: Array | None = None,
) -> Array:
    """Detic's sigmoid CE classification loss with optional federated mask.

    Reference: ``detic_fast_rcnn.py`` ``sigmoid_cross_entropy_loss`` —
    one-vs-all BCE over C (no explicit background logit; background rows get
    an all-zero target), normalized by the number of valid rows, with the
    federated class mask zeroing non-sampled classes.
    """
    n = scores.shape[0]
    target = jax.nn.one_hot(
        jnp.where(gt_valid, gt_classes, num_classes), num_classes + 1
    )[:, :num_classes]
    bce = optax_sigmoid_bce(scores, target)
    if fed_mask is not None:
        bce = bce * fed_mask[None, :num_classes]
    bce = bce * gt_valid[:, None]
    return jnp.sum(bce) / jnp.maximum(jnp.sum(gt_valid), 1.0)


def optax_sigmoid_bce(logits: Array, labels: Array) -> Array:
    """Numerically-stable elementwise sigmoid BCE."""
    return jnp.clip(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
