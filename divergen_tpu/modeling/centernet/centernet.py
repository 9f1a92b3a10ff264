"""CenterNet2 proposal generator — TPU-native.

Counterpart of ``centernet/modeling/dense_heads/centernet.py:31-869`` and
``centernet_head.py``. The torch version loops images and levels with ragged
tensors; here ground-truth assignment, losses and proposal decoding are pure
batched functions over a *flattened level axis* M = Σ_l H_l·W_l with static
shapes, vmapped over the batch. The head is a flax module with weights
shared across levels (per-level Scale scalars), exactly like the reference.

Default config is the LVIS one: ``ONLY_PROPOSAL=True, WITH_AGN_HM=True`` —
class-agnostic heatmap + box regression feeding the cascade heads.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from ...ops.losses import heatmap_focal_loss, iou_loss
from ...ops.nms import nms_mask, top_scoring
from ..layers import ConvNorm, Scale

INF = 100000000.0


@dataclasses.dataclass(frozen=True)
class CenterNetConfig:
    in_features: Tuple[str, ...] = ("p3", "p4", "p5", "p6", "p7")
    strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    sizes_of_interest: Tuple[Tuple[float, float], ...] = (
        (0, 80),
        (64, 160),
        (128, 320),
        (256, 640),
        (512, 10000000),
    )
    hm_min_overlap: float = 0.8
    min_radius: float = 4.0
    score_thresh: float = 0.05
    hm_focal_alpha: float = 0.25
    hm_focal_beta: float = 4.0
    loss_gamma: float = 2.0
    pos_weight: float = 0.5
    neg_weight: float = 0.5
    reg_weight: float = 1.0
    not_norm_reg: bool = True
    sigmoid_clamp: float = 1e-4
    ignore_high_fp: float = 0.85
    loc_loss_type: str = "giou"
    pre_nms_topk_train: int = 1000
    post_nms_topk_train: int = 100
    pre_nms_topk_test: int = 1000
    post_nms_topk_test: int = 100
    nms_thresh_train: float = 0.6
    nms_thresh_test: float = 0.6
    # TPU-specific: total candidates kept (by score) across levels before the
    # single cross-level NMS. The reference carries every per-level survivor
    # (up to L*pre_nms_topk); capping at pre_nms_total keeps the NMS matrix
    # small with no observable AP effect since NMS keeps <= post_nms_topk.
    pre_nms_total: int = 4000
    num_cls_convs: int = 4
    num_box_convs: int = 4
    num_share_convs: int = 0
    norm: str = "GN"
    prior_prob: float = 0.01
    only_proposal: bool = True
    with_agn_hm: bool = True
    num_classes: int = 80  # classwise head when not only_proposal

    @property
    def delta(self) -> float:
        return (1 - self.hm_min_overlap) / (1 + self.hm_min_overlap)

    @staticmethod
    def from_cfg(cfg) -> "CenterNetConfig":
        cn = cfg.MODEL.CENTERNET
        return CenterNetConfig(
            in_features=tuple(cn.IN_FEATURES),
            strides=tuple(cn.FPN_STRIDES),
            sizes_of_interest=tuple(tuple(s) for s in cn.SOI),
            hm_min_overlap=cn.HM_MIN_OVERLAP,
            min_radius=cn.MIN_RADIUS,
            score_thresh=cn.INFERENCE_TH,
            hm_focal_alpha=cn.HM_FOCAL_ALPHA,
            hm_focal_beta=cn.HM_FOCAL_BETA,
            loss_gamma=cn.LOSS_GAMMA,
            pos_weight=cn.POS_WEIGHT,
            neg_weight=cn.NEG_WEIGHT,
            reg_weight=cn.REG_WEIGHT,
            not_norm_reg=cn.NOT_NORM_REG,
            sigmoid_clamp=cn.SIGMOID_CLAMP,
            ignore_high_fp=cn.IGNORE_HIGH_FP,
            loc_loss_type=cn.LOC_LOSS_TYPE,
            pre_nms_topk_train=cn.PRE_NMS_TOPK_TRAIN,
            post_nms_topk_train=cn.POST_NMS_TOPK_TRAIN,
            pre_nms_topk_test=cn.PRE_NMS_TOPK_TEST,
            post_nms_topk_test=cn.POST_NMS_TOPK_TEST,
            nms_thresh_train=cn.NMS_TH_TRAIN,
            nms_thresh_test=cn.NMS_TH_TEST,
            num_cls_convs=cn.NUM_CLS_CONVS,
            num_box_convs=cn.NUM_BOX_CONVS,
            num_share_convs=cn.NUM_SHARE_CONVS,
            norm=cn.NORM,
            prior_prob=cn.PRIOR_PROB,
            only_proposal=cn.ONLY_PROPOSAL,
            with_agn_hm=cn.WITH_AGN_HM,
            num_classes=cn.NUM_CLASSES,
        )


class CenterNetHead(nn.Module):
    """Conv towers + (agn_hm, bbox) outputs, shared over levels.

    Reference: ``centernet_head.py:22-161``. Weight init matches: conv
    std=0.01 bias=0, bbox_pred bias=8.0, heatmap bias=-log((1-p)/p).
    """

    cfg: CenterNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: List[Array]):
        c = self.cfg
        bias_value = -math.log((1 - c.prior_prob) / c.prior_prob)
        share_tower = [
            ConvNorm(features[0].shape[-1], 3, 1, c.norm, nn.relu, kernel_std=0.01, dtype=self.dtype, name=f"share_{i}")
            for i in range(c.num_share_convs)
        ]
        bbox_tower = [
            ConvNorm(features[0].shape[-1], 3, 1, c.norm, nn.relu, kernel_std=0.01, dtype=self.dtype, name=f"bbox_{i}")
            for i in range(c.num_box_convs)
        ]
        # classwise head (standalone CenterNet, only_proposal=False): its own
        # conv tower + a num_classes heatmap output (centernet_head.py:42-46,
        # 110-121 cls_logits)
        cls_tower = [
            ConvNorm(features[0].shape[-1], 3, 1, c.norm, nn.relu, kernel_std=0.01, dtype=self.dtype, name=f"cls_{i}")
            for i in range(0 if c.only_proposal else c.num_cls_convs)
        ]
        cls_logits = None
        if not c.only_proposal:
            cls_logits = ConvNorm(
                c.num_classes, 3, 1, "", None, use_bias=True,
                bias_init=bias_value, kernel_std=0.01, dtype=self.dtype,
                name="cls_logits",
            )
        agn_hm = None
        if c.with_agn_hm:
            agn_hm = ConvNorm(1, 3, 1, "", None, use_bias=True, bias_init=bias_value, kernel_std=0.01, dtype=self.dtype, name="agn_hm")
        bbox_pred = ConvNorm(4, 3, 1, "", None, use_bias=True, bias_init=8.0, kernel_std=0.01, dtype=self.dtype, name="bbox_pred")
        scales = [Scale(name=f"scale_{l}") for l in range(len(features))]

        agn_hms, bbox_regs, clss = [], [], []
        for l, feat in enumerate(features):
            x = feat
            for m in share_tower:
                x = m(x)
            bx = x
            for m in bbox_tower:
                bx = m(bx)
            if cls_logits is not None:
                cx = x
                for m in cls_tower:
                    cx = m(cx)
                clss.append(cls_logits(cx))  # (B, H, W, C)
            else:
                clss.append(None)
            agn_hms.append(agn_hm(bx)[..., 0] if agn_hm is not None else None)
            reg = scales[l](bbox_pred(bx))
            bbox_regs.append(nn.relu(reg))  # (B, H, W, 4)
        return agn_hms, bbox_regs, clss


# ---------------------------------------------------------------------------
# Static level geometry
# ---------------------------------------------------------------------------


def level_geometry(cfg: CenterNetConfig, feature_shapes: Sequence[Tuple[int, int]]):
    """Precompute flattened grids/strides/size-ranges (compute_grids :317).

    Returns dict of (M, ...) arrays + per-level shapes; all static.
    """
    grids, strides, ranges, level_ids = [], [], [], []
    for l, (h, w) in enumerate(feature_shapes):
        s = cfg.strides[l]
        ys = (jnp.arange(h, dtype=jnp.float32) * s) + s // 2
        xs = (jnp.arange(w, dtype=jnp.float32) * s) + s // 2
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        grids.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1))
        strides.append(jnp.full((h * w,), float(s)))
        ranges.append(jnp.tile(jnp.asarray(cfg.sizes_of_interest[l], jnp.float32)[None], (h * w, 1)))
        level_ids.append(jnp.full((h * w,), l, jnp.int32))
    return dict(
        grids=jnp.concatenate(grids),  # (M, 2)
        strides=jnp.concatenate(strides),  # (M,)
        size_ranges=jnp.concatenate(ranges),  # (M, 2)
        level_ids=jnp.concatenate(level_ids),  # (M,)
        shapes=tuple(feature_shapes),
    )


# ---------------------------------------------------------------------------
# Ground truth (batched, static-shape)  — reference _get_ground_truth :338
# ---------------------------------------------------------------------------


def centernet_ground_truth(
    cfg: CenterNetConfig,
    geom: Dict,
    gt_boxes: Array,  # (B, N, 4)
    gt_valid: Array,  # (B, N) bool
):
    """Returns reg_targets (B, M, 4) in stride units, agn heatmap (B, M),
    pos_count (B, M) int32 — center-cell positives with multiplicity."""
    grids = geom["grids"]
    strides = geom["strides"]
    size_ranges = geom["size_ranges"]
    m = grids.shape[0]

    def per_image(boxes, valid):
        n = boxes.shape[0]
        gx = grids[:, 0:1]  # (M, 1)
        gy = grids[:, 1:2]
        l_ = gx - boxes[None, :, 0]  # (M, N)
        t_ = gy - boxes[None, :, 1]
        r_ = boxes[None, :, 2] - gx
        b_ = boxes[None, :, 3] - gy
        reg_target = jnp.stack([l_, t_, r_, b_], axis=-1)  # (M, N, 4)

        centers = (boxes[:, :2] + boxes[:, 2:]) / 2.0  # (N, 2)
        st = strides[:, None]  # (M, 1)
        cdx = (centers[None, :, 0] / st).astype(jnp.int32).astype(jnp.float32) * st + st / 2
        cdy = (centers[None, :, 1] / st).astype(jnp.int32).astype(jnp.float32) * st + st / 2

        is_peak = (gx == cdx) & (gy == cdy)  # (M, N)
        is_in_boxes = jnp.min(reg_target, axis=-1) > 0
        is_center3x3 = (jnp.abs(gx - cdx) <= st) & (jnp.abs(gy - cdy) <= st) & is_in_boxes
        crit = jnp.sqrt((l_ + r_) ** 2 + (t_ + b_) ** 2) / 2.0
        is_cared = (crit >= size_ranges[:, 0:1]) & (crit <= size_ranges[:, 1:2])
        reg_mask = is_center3x3 & is_cared & valid[None, :]

        dist2 = (gx - centers[None, :, 0]) ** 2 + (gy - centers[None, :, 1]) ** 2
        dist2 = jnp.where(is_peak, 0.0, dist2)
        area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(boxes[:, 3] - boxes[:, 1], 0)
        radius2 = jnp.maximum(cfg.delta**2 * 2.0 * area, cfg.min_radius**2)
        wd2 = dist2 / radius2[None, :]  # (M, N)

        # regression target: nearest (weighted) masked gt per location
        masked = jnp.where(reg_mask, wd2, INF)
        min_dist = jnp.min(masked, axis=1)
        min_idx = jnp.argmin(masked, axis=1)
        reg_targets = jnp.take_along_axis(reg_target, min_idx[:, None, None], axis=1)[:, 0]
        reg_targets = jnp.where(min_dist[:, None] >= INF, -INF, reg_targets)
        reg_targets = reg_targets / strides[:, None]  # stride-normalized (:432)

        # agnostic heatmap (:546-562)
        hm = jnp.exp(-jnp.min(jnp.where(valid[None, :], wd2, INF), axis=1))
        hm = jnp.where(hm < 1e-4, 0.0, hm)

        # positives: discretized center cell at each cared level (:439-484)
        box_crit = jnp.sqrt(jnp.sum((boxes[:, 2:] - boxes[:, :2]) ** 2, axis=1)) / 2.0
        pos_count = jnp.zeros((m,), jnp.int32)
        # flat index of the center cell of gt n at level l
        level_bases = []
        base = 0
        for h, w in geom["shapes"]:
            level_bases.append(base)
            base += h * w
        for lvl, (h, w) in enumerate(geom["shapes"]):
            s = float(cfg.strides[lvl])
            lo, hi = cfg.sizes_of_interest[lvl]
            cared = (box_crit >= lo) & (box_crit <= hi) & valid
            cx = (centers[:, 0] / s).astype(jnp.int32)
            cy = (centers[:, 1] / s).astype(jnp.int32)
            cx = jnp.clip(cx, 0, w - 1)
            cy = jnp.clip(cy, 0, h - 1)
            idx = level_bases[lvl] + cy * w + cx
            pos_count = pos_count.at[idx].add(cared.astype(jnp.int32))
        return reg_targets, hm, pos_count

    return jax.vmap(per_image)(gt_boxes, gt_valid)


def centernet_ground_truth_classwise(
    cfg: CenterNetConfig,
    geom: Dict,
    gt_boxes: Array,  # (B, N, 4)
    gt_classes: Array,  # (B, N) int32
    gt_valid: Array,  # (B, N) bool
):
    """Classwise targets for the standalone detector (reference
    _get_ground_truth heatmap channels :546-562 + _get_label_inds :439-484
    with labels): per-class heatmaps (B, M, C) and per-(loc, class) positive
    counts (B, M, C), plus the shared reg targets."""
    c = cfg.num_classes
    reg_targets, hm_agn, _ = centernet_ground_truth(cfg, geom, gt_boxes, gt_valid)
    grids = geom["grids"]
    strides = geom["strides"]
    m = grids.shape[0]

    def per_image(boxes, classes, valid):
        gx, gy = grids[:, 0:1], grids[:, 1:2]
        l_ = gx - boxes[None, :, 0]
        t_ = gy - boxes[None, :, 1]
        r_ = boxes[None, :, 2] - gx
        b_ = boxes[None, :, 3] - gy
        centers = (boxes[:, :2] + boxes[:, 2:]) / 2.0
        st = strides[:, None]
        cdx = (centers[None, :, 0] / st).astype(jnp.int32).astype(jnp.float32) * st + st / 2
        cdy = (centers[None, :, 1] / st).astype(jnp.int32).astype(jnp.float32) * st + st / 2
        is_peak = (gx == cdx) & (gy == cdy)
        dist2 = (gx - centers[None, :, 0]) ** 2 + (gy - centers[None, :, 1]) ** 2
        dist2 = jnp.where(is_peak, 0.0, dist2)
        area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(boxes[:, 3] - boxes[:, 1], 0)
        radius2 = jnp.maximum(cfg.delta**2 * 2.0 * area, cfg.min_radius**2)
        wd2 = dist2 / radius2[None, :]  # (M, N)
        hm_per_gt = jnp.exp(-jnp.where(valid[None, :], wd2, INF))  # (M, N)
        # per-class max over gts of that class (invalid gts → segment C,
        # dropped by num_segments)
        seg = jnp.where(valid, classes, c)
        hm_cls = jax.ops.segment_max(hm_per_gt.T, seg, num_segments=c).T  # (M, C)
        hm_cls = jnp.where(hm_cls < 1e-4, 0.0, jnp.maximum(hm_cls, 0.0))

        # per-(loc, class) positives (reference pos_inds + labels)
        box_crit = jnp.sqrt(jnp.sum((boxes[:, 2:] - boxes[:, :2]) ** 2, axis=1)) / 2.0
        pos = jnp.zeros((m, c), jnp.int32)
        level_bases = []
        base = 0
        for h, w in geom["shapes"]:
            level_bases.append(base)
            base += h * w
        for lvl, (h, w) in enumerate(geom["shapes"]):
            s = float(cfg.strides[lvl])
            lo, hi = cfg.sizes_of_interest[lvl]
            cared = (box_crit >= lo) & (box_crit <= hi) & valid
            cx = jnp.clip((centers[:, 0] / s).astype(jnp.int32), 0, w - 1)
            cy = jnp.clip((centers[:, 1] / s).astype(jnp.int32), 0, h - 1)
            idx = level_bases[lvl] + cy * w + cx
            pos = pos.at[idx, jnp.clip(classes, 0, c - 1)].add(cared.astype(jnp.int32))
        return hm_cls, pos

    hm_cls, pos_cls = jax.vmap(per_image)(gt_boxes, gt_classes, gt_valid)
    return reg_targets, hm_agn, hm_cls, pos_cls


# ---------------------------------------------------------------------------
# Losses — reference losses() :237-316 (only_proposal path)
# ---------------------------------------------------------------------------


def centernet_losses(
    cfg: CenterNetConfig,
    agn_hm_pred: Array,  # (B, M) logits
    reg_pred: Array,  # (B, M, 4) in stride units
    reg_targets: Array,  # (B, M, 4)
    heatmaps: Array,  # (B, M)
    pos_count: Array,  # (B, M)
    axis_name: Optional[str] = None,
) -> Dict[str, Array]:
    num_pos_local = jnp.sum(pos_count).astype(jnp.float32)
    if axis_name is not None:
        # reduce_sum(total)/num_gpus == pmean (centernet.py:255-261)
        num_pos_avg = jnp.maximum(jax.lax.pmean(num_pos_local, axis_name), 1.0)
    else:
        num_pos_avg = jnp.maximum(num_pos_local, 1.0)

    reg_valid = jnp.max(reg_targets, axis=-1) >= 0  # (B, M)
    reg_weight_map = jnp.where(reg_valid, 1.0, 0.0)
    if not cfg.not_norm_reg:
        reg_weight_map = jnp.where(reg_valid, jnp.max(heatmaps, axis=-1), 0.0)
    reg_norm_local = jnp.sum(reg_weight_map)
    if axis_name is not None:
        reg_norm = jnp.maximum(jax.lax.pmean(reg_norm_local, axis_name), 1.0)
    else:
        reg_norm = jnp.maximum(reg_norm_local, 1.0)

    flat_pred = reg_pred.reshape(-1, 4)
    flat_tgt = jnp.where(reg_valid.reshape(-1, 1), reg_targets.reshape(-1, 4), 0.0)
    reg_loss = iou_loss(
        flat_pred,
        flat_tgt,
        weight=reg_weight_map.reshape(-1),
        loss_type=cfg.loc_loss_type,
        reduction="sum",
    )
    losses = {"loss_centernet_loc": cfg.reg_weight * reg_loss / reg_norm}

    pos_loss, neg_loss = heatmap_focal_loss(
        agn_hm_pred,
        heatmaps,
        pos_count,
        alpha=cfg.hm_focal_alpha,
        beta=cfg.hm_focal_beta,
        gamma=cfg.loss_gamma,
        sigmoid_clamp=cfg.sigmoid_clamp,
        ignore_high_fp=cfg.ignore_high_fp,
    )
    losses["loss_centernet_agn_pos"] = cfg.pos_weight * pos_loss / num_pos_avg
    losses["loss_centernet_agn_neg"] = cfg.neg_weight * neg_loss / num_pos_avg
    return losses


def centernet_losses_classwise(
    cfg: CenterNetConfig,
    cls_logits: Array,  # (B, M, C)
    agn_hm_pred: Optional[Array],  # (B, M) logits or None
    reg_pred: Array,  # (B, M, 4) stride units
    reg_targets: Array,  # (B, M, 4)
    hm_agn: Array,  # (B, M) (= max over classwise hms)
    hm_cls: Array,  # (B, M, C)
    pos_cls: Array,  # (B, M, C) int32
    axis_name: Optional[str] = None,
) -> Dict[str, Array]:
    """Standalone-detector losses (reference losses() :237-316 with
    only_proposal=False): classwise focal (loss_centernet_pos/neg) + the
    shared loc loss + the optional agnostic focal."""
    pos_count_agn = jnp.sum(pos_cls, axis=-1)  # same positive locations
    losses = centernet_losses(
        cfg, agn_hm_pred if agn_hm_pred is not None else jnp.zeros_like(hm_agn),
        reg_pred, reg_targets, hm_agn, pos_count_agn, axis_name=axis_name,
    )
    if agn_hm_pred is None:
        losses.pop("loss_centernet_agn_pos")
        losses.pop("loss_centernet_agn_neg")
    num_pos_local = jnp.sum(pos_cls).astype(jnp.float32)
    num_pos_avg = (
        jnp.maximum(jax.lax.pmean(num_pos_local, axis_name), 1.0)
        if axis_name is not None
        else jnp.maximum(num_pos_local, 1.0)
    )
    pos_loss, neg_loss = heatmap_focal_loss(
        cls_logits.astype(jnp.float32),
        hm_cls,
        pos_cls,
        alpha=cfg.hm_focal_alpha,
        beta=cfg.hm_focal_beta,
        gamma=cfg.loss_gamma,
        sigmoid_clamp=cfg.sigmoid_clamp,
        ignore_high_fp=cfg.ignore_high_fp,
    )
    losses["loss_centernet_pos"] = cfg.pos_weight * pos_loss / num_pos_avg
    losses["loss_centernet_neg"] = cfg.neg_weight * neg_loss / num_pos_avg
    return losses


# ---------------------------------------------------------------------------
# Proposal decoding — reference predict_instances/predict_single_level :596-739
# ---------------------------------------------------------------------------


def centernet_proposals(
    cfg: CenterNetConfig,
    geom: Dict,
    agn_hm_pred: Array,  # (B, M) logits
    reg_pred: Array,  # (B, M, 4) stride units
    image_sizes: Array,  # (B, 2)
    training: bool,
):
    """Decode top-scoring NMS'd proposals with static shapes.

    Returns dict: boxes (B, K, 4), scores (B, K), valid (B, K) where
    K = post_nms_topk.
    """
    grids = geom["grids"]
    strides = geom["strides"]
    hm = jax.nn.sigmoid(agn_hm_pred.astype(jnp.float32))
    scores_all = jnp.sqrt(hm)  # with_agn_hm → sqrt (centernet.py:705)
    reg = reg_pred.astype(jnp.float32) * strides[None, :, None]
    x1 = grids[None, :, 0] - reg[..., 0]
    y1 = grids[None, :, 1] - reg[..., 1]
    x2 = grids[None, :, 0] + reg[..., 2]
    y2 = grids[None, :, 1] + reg[..., 3]
    x2 = jnp.maximum(x2, x1 + 0.01)
    y2 = jnp.maximum(y2, y1 + 0.01)
    boxes_all = jnp.stack([x1, y1, x2, y2], axis=-1)  # (B, M, 4)

    pre_topk = cfg.pre_nms_topk_train if training else cfg.pre_nms_topk_test
    post_topk = cfg.post_nms_topk_train if training else cfg.post_nms_topk_test
    nms_th = cfg.nms_thresh_train if training else cfg.nms_thresh_test
    level_ids = geom["level_ids"]
    num_levels = len(geom["shapes"])

    level_slices = []
    base = 0
    for h, w in geom["shapes"]:
        level_slices.append((base, h * w))
        base += h * w

    def per_image(scores, boxes):
        # per-level pre-NMS topk with score threshold (predict_single_level).
        # levels are contiguous in M, so slice statically per level. The
        # threshold applies to the raw heatmap (0.05); scores are sqrt(hm).
        cand_scores, cand_boxes, cand_valid = [], [], []
        for start, size in level_slices:
            s_l = jax.lax.dynamic_slice_in_dim(scores, start, size)
            b_l = jax.lax.dynamic_slice_in_dim(boxes, start, size)
            s_l = jnp.where(s_l > math.sqrt(cfg.score_thresh), s_l, -jnp.inf)
            topv, topi = jax.lax.top_k(s_l, min(pre_topk, size))
            cand_scores.append(topv)
            cand_boxes.append(b_l[topi])
            cand_valid.append(topv > -jnp.inf)
        s = jnp.concatenate(cand_scores)
        b = jnp.concatenate(cand_boxes)
        v = jnp.concatenate(cand_valid)
        # cap total candidates before the cross-level NMS
        total = min(cfg.pre_nms_total, s.shape[0])
        topv, topi = jax.lax.top_k(jnp.where(v, s, -jnp.inf), total)
        b = b[topi]
        v = topv > -jnp.inf
        s = jnp.where(v, topv, 0.0)
        keep = nms_mask(b, s, nms_th, valid=v)
        out_boxes, out_scores, out_valid, _, _ = top_scoring(b, s, keep, post_topk)
        return out_boxes, out_scores, out_valid

    boxes, scores, valid = jax.vmap(per_image)(scores_all, boxes_all)
    return {"boxes": boxes, "scores": scores, "valid": valid}


def centernet_detections(
    cfg: CenterNetConfig,
    geom: Dict,
    cls_logits: Array,  # (B, M, C)
    agn_hm_pred: Optional[Array],  # (B, M) logits or None
    reg_pred: Array,  # (B, M, 4) stride units
    image_sizes: Array,
    training: bool,
):
    """Classwise decode for the standalone detector (predict_instances with
    logits + agn multiply, predict_single_level :596-708 + ml_nms): static
    per-level (M_l·C) top-k, class = idx mod C, class-aware NMS.

    Returns boxes (B, K, 4), scores (B, K), classes (B, K), valid (B, K).
    """
    from ...ops.nms import batched_nms_mask, top_scoring

    grids = geom["grids"]
    strides = geom["strides"]
    c = cfg.num_classes
    hm = jax.nn.sigmoid(cls_logits.astype(jnp.float32))  # (B, M, C)
    cand = hm > cfg.score_thresh  # threshold on the raw classwise heatmap
    if agn_hm_pred is not None:
        hm = hm * jax.nn.sigmoid(agn_hm_pred.astype(jnp.float32))[..., None]
    scores_all = jnp.sqrt(hm) if cfg.with_agn_hm else hm
    reg = reg_pred.astype(jnp.float32) * strides[None, :, None]
    x1 = grids[None, :, 0] - reg[..., 0]
    y1 = grids[None, :, 1] - reg[..., 1]
    x2 = jnp.maximum(grids[None, :, 0] + reg[..., 2], x1 + 0.01)
    y2 = jnp.maximum(grids[None, :, 1] + reg[..., 3], y1 + 0.01)
    boxes_all = jnp.stack([x1, y1, x2, y2], axis=-1)  # (B, M, 4)

    pre_topk = cfg.pre_nms_topk_train if training else cfg.pre_nms_topk_test
    post_topk = cfg.post_nms_topk_train if training else cfg.post_nms_topk_test
    nms_th = cfg.nms_thresh_train if training else cfg.nms_thresh_test

    level_slices = []
    base = 0
    for h, w in geom["shapes"]:
        level_slices.append((base, h * w))
        base += h * w

    def per_image(scores, ok, boxes):
        cs, cb, cc, cv = [], [], [], []
        for start, size in level_slices:
            s_l = jax.lax.dynamic_slice_in_dim(scores, start, size)  # (m, C)
            o_l = jax.lax.dynamic_slice_in_dim(ok, start, size)
            b_l = jax.lax.dynamic_slice_in_dim(boxes, start, size)  # (m, 4)
            flat = jnp.where(o_l, s_l, -jnp.inf).reshape(-1)  # (m*C,)
            k = min(pre_topk, flat.shape[0])
            topv, topi = jax.lax.top_k(flat, k)
            loc = topi // c
            cls = topi % c
            cs.append(topv)
            cb.append(b_l[loc])
            cc.append(cls)
            cv.append(topv > -jnp.inf)
        s = jnp.concatenate(cs)
        b = jnp.concatenate(cb)
        cl = jnp.concatenate(cc)
        v = jnp.concatenate(cv)
        total = min(cfg.pre_nms_total, s.shape[0])
        topv, topi = jax.lax.top_k(jnp.where(v, s, -jnp.inf), total)
        b, cl = b[topi], cl[topi]
        v = topv > -jnp.inf
        s = jnp.where(v, topv, 0.0)
        keep = batched_nms_mask(b, s, cl, nms_th, valid=v)
        ob, os_, ov, _, (ocls,) = top_scoring(b, s, keep, post_topk, extras=(cl,))
        return ob, os_, ocls, ov

    boxes, scores, classes, valid = jax.vmap(per_image)(scores_all, cand, boxes_all)
    return {"boxes": boxes, "scores": scores, "classes": classes, "valid": valid}
