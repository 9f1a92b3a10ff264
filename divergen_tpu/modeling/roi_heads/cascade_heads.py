"""Detic cascade ROI heads — TPU-native static-shape implementation.

Counterpart of:
  * ``DiverGen/divergen/modeling/roi_heads/detic_roi_heads.py:29-414``
    (DeticCascadeROIHeads: 3-stage cascade at IoU 0.6/0.7/0.8,
    ``instance_source`` propagation, ``mult_proposal_score`` fusion,
    ``_ScaleGradient`` 1/num_stages)
  * ``detic_fast_rcnn.py:29-603`` (DeticFastRCNNOutputLayers: sigmoid CE
    + federated loss, class-agnostic box regression)
  * detectron2 ``roi_heads.py`` label_and_sample_proposals / subsample and
    ``mask_head.py`` MaskRCNNConvUpsampleHead.

Every per-image ragged op becomes a fixed-capacity batched op: proposals are
(B, P, 4) with validity; sampling keeps a static 512 rows; matching is an
argmax over a (N_gt, P) IoU matrix; losses mask invalid rows.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from ...ops.losses import giou_loss_xyxy, smooth_l1_loss, optax_sigmoid_bce
from ...ops.nms import batched_nms_mask, top_scoring
from ...ops.roi_align import multilevel_roi_align
from ...structures import boxes as box_ops
from ...structures.masks import mask_target_in_box
from . import box_regression


@dataclasses.dataclass(frozen=True)
class ROIHeadsConfig:
    num_classes: int = 1203
    in_features: Tuple[str, ...] = ("p3", "p4", "p5")
    strides: Tuple[int, ...] = (8, 16, 32)
    cascade_ious: Tuple[float, ...] = (0.6, 0.7, 0.8)
    cascade_reg_weights: Tuple[Tuple[float, ...], ...] = (
        (10.0, 10.0, 5.0, 5.0),
        (20.0, 20.0, 10.0, 10.0),
        (30.0, 30.0, 15.0, 15.0),
    )
    batch_size_per_image: int = 512
    positive_fraction: float = 0.25
    pooler_resolution: int = 7
    mask_pooler_resolution: int = 14
    fc_dim: int = 1024
    num_fc: int = 2
    mask_num_conv: int = 4
    mask_conv_dim: int = 256
    mask_on: bool = True
    mask_weight: float = 1.0
    mask_fg_capacity: int = 128  # static cap on fg rows fed to the mask head
    cls_agnostic_bbox_reg: bool = True
    smooth_l1_beta: float = 0.0
    box_reg_loss_type: str = "smooth_l1"
    use_sigmoid_ce: bool = True
    use_fed_loss: bool = True
    fed_loss_num_cat: int = 50
    prior_prob: float = 0.01
    score_thresh_test: float = 0.02
    nms_thresh_test: float = 0.5
    detections_per_image: int = 300
    # static pre-NMS candidate cap (0 → detections_per_image * 4): the
    # reference NMS-es EVERY (proposal, class) above the score threshold;
    # raise this when exact tail parity matters more than NMS cost
    nms_candidates: int = 0
    mult_proposal_score: bool = True
    one_class_per_proposal: bool = False
    add_gt_to_proposals: bool = True
    divergen_box_loss: bool = True  # True → no instance_source box-loss mask
    divergen_mask_loss: bool = True  # True → mask head also trains on pastes
    norm_temp: float = 50.0
    use_zeroshot_cls: bool = False
    split_paste_loss: bool = False  # BSGAL per-source CE keys
    # BSGAL ACTIVE_ONLY_GT_TRAIN per-paste-instance loss columns
    # (detic_fast_rcnn.py:393-429 loss_cls_per_paste): emit per-row no-fed
    # CE for pasted proposals as aux_* arrays (not scalars)
    per_paste_loss: bool = False
    mask_head_name: str = "MaskRCNNConvUpsampleHead"  # or RefineMaskHead
    sem_seg_weight: float = 0.25
    # RefineMask (refine_mask_head.py:315-455): supervision sizes per stage
    # and class-agnostic prediction (ref cls_agn=True clamps labels to 0)
    stage_sup_size: Tuple[int, ...] = (14, 28, 56, 112)
    cls_agnostic_mask: bool = True
    # weak supervision on image-labeled data (detic_fast_rcnn.py:340-583,
    # detic_roi_heads.py:341-365)
    with_image_labels: bool = False
    image_label_loss: str = "max_size"  # max_size|max_score|first|image|min_loss|wsddn|wsod
    image_loss_weight: float = 0.1
    add_image_box: bool = False
    image_box_size: float = 1.0
    ws_num_props: int = 128
    with_softmax_prop: bool = False
    softmax_weak_loss: bool = False
    caption_weight: float = 1.0
    neg_cap_weight: float = 0.125
    sync_caption_batch: bool = False

    @staticmethod
    def from_cfg(cfg) -> "ROIHeadsConfig":
        r = cfg.MODEL.ROI_HEADS
        b = cfg.MODEL.ROI_BOX_HEAD
        mk = cfg.MODEL.ROI_MASK_HEAD
        cas = cfg.MODEL.ROI_BOX_CASCADE_HEAD
        return ROIHeadsConfig(
            num_classes=r.NUM_CLASSES,
            in_features=tuple(r.IN_FEATURES),
            strides=tuple(2 ** int(f[-1]) for f in r.IN_FEATURES),
            cascade_ious=tuple(cas.IOUS),
            cascade_reg_weights=tuple(tuple(w) for w in cas.BBOX_REG_WEIGHTS),
            batch_size_per_image=r.BATCH_SIZE_PER_IMAGE,
            positive_fraction=r.POSITIVE_FRACTION,
            pooler_resolution=b.POOLER_RESOLUTION,
            mask_pooler_resolution=mk.POOLER_RESOLUTION,
            fc_dim=b.FC_DIM,
            num_fc=b.NUM_FC,
            mask_num_conv=mk.NUM_CONV,
            mask_conv_dim=mk.CONV_DIM,
            mask_on=cfg.MODEL.MASK_ON,
            mask_weight=r.MASK_WEIGHT,
            cls_agnostic_bbox_reg=b.CLS_AGNOSTIC_BBOX_REG,
            smooth_l1_beta=b.SMOOTH_L1_BETA,
            box_reg_loss_type=b.BBOX_REG_LOSS_TYPE,
            split_paste_loss=cfg.MODEL.ACTIVE.ENABLED,
            per_paste_loss=cfg.MODEL.ACTIVE.ENABLED
            and (cfg.MODEL.ACTIVE.ONLY_GT_TRAIN or cfg.MODEL.ACTIVE.PER_INSTANCE),
            mask_head_name=mk.NAME,
            sem_seg_weight=mk.SEM_SEG_WEIGHT,
            stage_sup_size=tuple(mk.STAGE_SUP_SIZE),
            cls_agnostic_mask=mk.CLS_AGNOSTIC_MASK,
            use_sigmoid_ce=b.USE_SIGMOID_CE,
            use_fed_loss=b.USE_FED_LOSS,
            fed_loss_num_cat=b.FED_LOSS_NUM_CAT,
            prior_prob=b.PRIOR_PROB,
            score_thresh_test=r.SCORE_THRESH_TEST,
            nms_thresh_test=r.NMS_THRESH_TEST,
            detections_per_image=cfg.TEST.DETECTIONS_PER_IMAGE,
            nms_candidates=cfg.TEST.NMS_CANDIDATES,
            mult_proposal_score=b.MULT_PROPOSAL_SCORE,
            one_class_per_proposal=r.ONE_CLASS_PER_PROPOSAL,
            add_gt_to_proposals=r.PROPOSAL_APPEND_GT,
            divergen_box_loss=cfg.MODEL.get("USE_DIVERGEN_BOX_LOSS", True)
            and cfg.MODEL.get("USE_XPASTE_BOX_LOSS", True),
            divergen_mask_loss=cfg.MODEL.get("USE_DIVERGEN_MASK_LOSS", True)
            and cfg.MODEL.get("USE_XPASTE_MASK_LOSS", True),
            norm_temp=b.NORM_TEMP,
            use_zeroshot_cls=b.USE_ZEROSHOT_CLS,
            with_image_labels=cfg.WITH_IMAGE_LABELS,
            image_label_loss=b.IMAGE_LABEL_LOSS,
            image_loss_weight=b.IMAGE_LOSS_WEIGHT,
            add_image_box=b.ADD_IMAGE_BOX,
            image_box_size=b.IMAGE_BOX_SIZE,
            ws_num_props=b.WS_NUM_PROPS,
            with_softmax_prop=b.WITH_SOFTMAX_PROP,
            softmax_weak_loss=b.SOFTMAX_WEAK_LOSS,
            caption_weight=b.CAPTION_WEIGHT,
            neg_cap_weight=b.NEG_CAP_WEIGHT,
            sync_caption_batch=cfg.MODEL.SYNC_CAPTION_BATCH,
        )


class FastRCNNConvFCHead(nn.Module):
    """Box feature head: flatten → 2x(FC+ReLU) (detectron2 box_head.py)."""

    fc_dim: int = 1024
    num_fc: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = x.reshape(x.shape[0], -1)
        for i in range(self.num_fc):
            x = nn.Dense(
                self.fc_dim,
                dtype=self.dtype,
                kernel_init=nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
                name=f"fc{i + 1}",
            )(x)
            x = nn.relu(x)
        return x


class DeticOutputLayers(nn.Module):
    """cls_score + bbox_pred (detic_fast_rcnn.py:29-130).

    With ``use_sigmoid_ce`` the classifier bias starts at -log((1-p)/p).
    Box regression is class-agnostic (4 outputs). The zero-shot variant
    normalizes features and weights and scales by ``norm_temp``
    (zero_shot_classifier.py:9-86).
    """

    num_classes: int
    prior_prob: float = 0.01
    cls_agnostic: bool = True
    use_sigmoid_ce: bool = True
    use_zeroshot_cls: bool = False
    zs_dim: int = 512
    norm_temp: float = 50.0
    with_softmax_prop: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: Array,
        cap_classifier: Optional[Array] = None,
        cls_inds: Optional[Array] = None,
    ) -> Tuple[Array, Array, Optional[Array]]:
        """Returns (scores, deltas, prop_score|None).

        ``cap_classifier`` (zs_dim, N_cap) appends caption-score columns
        computed against the same normalized embedding — the caption branch
        of detic_fast_rcnn.py:455-460 (requires the zero-shot classifier,
        as in the reference). ``cls_inds`` (K,) restricts the zero-shot
        classifier to a sampled vocabulary (dynamic classifier,
        custom_rcnn.py:159-163: ``zs_weight[:, ind_with_bg]``)."""
        bias_value = -math.log((1 - self.prior_prob) / self.prior_prob) if self.use_sigmoid_ce else 0.0
        if self.use_zeroshot_cls:
            emb = nn.Dense(self.zs_dim, dtype=self.dtype, name="linear")(x)
            emb = emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-6)
            zs_weight = self.param(
                "zs_weight",
                nn.initializers.normal(0.01),
                (self.zs_dim, self.num_classes),
            )
            zs_weight = zs_weight / jnp.maximum(
                jnp.linalg.norm(zs_weight, axis=0, keepdims=True), 1e-6
            )
            if cls_inds is not None:
                zs_weight = zs_weight[:, cls_inds]
            cls_logits = self.norm_temp * (emb @ zs_weight)
            bg = self.param("bg_bias", nn.initializers.constant(bias_value), (1,))
            scores = jnp.concatenate(
                [cls_logits, jnp.broadcast_to(bg, (x.shape[0], 1))], axis=-1
            )
            if cap_classifier is not None:
                capw = cap_classifier / jnp.maximum(
                    jnp.linalg.norm(cap_classifier, axis=0, keepdims=True), 1e-6
                )
                cap_scores = self.norm_temp * (emb @ capw.astype(emb.dtype))
                scores = jnp.concatenate([scores, cap_scores], axis=-1)
        else:
            assert cap_classifier is None, "caption loss needs USE_ZEROSHOT_CLS"
            scores = nn.Dense(
                self.num_classes + 1,
                kernel_init=nn.initializers.normal(0.01),
                bias_init=nn.initializers.constant(bias_value),
                dtype=self.dtype,
                name="cls_score",
            )(x)
        num_reg = 4 if self.cls_agnostic else 4 * self.num_classes
        deltas = nn.Dense(
            num_reg,
            kernel_init=nn.initializers.normal(0.001),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype,
            name="bbox_pred",
        )(x)
        prop_score = None
        if self.with_softmax_prop:
            # WSDDN proposal-score branch (detic_fast_rcnn.py:92-100)
            h = nn.Dense(x.shape[-1], dtype=self.dtype, name="prop_score_fc")(x)
            prop_score = nn.Dense(
                self.num_classes + 1,
                kernel_init=nn.initializers.normal(0.001),
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                name="prop_score_out",
            )(nn.relu(h))
        return scores, deltas, prop_score


class MaskRCNNConvUpsampleHead(nn.Module):
    """4x conv + deconv2x + 1x1 predictor (detectron2 mask_head.py), class-agnostic."""

    num_conv: int = 4
    conv_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(self.num_conv):
            x = nn.Conv(
                self.conv_dim,
                (3, 3),
                padding="SAME",
                kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
                dtype=self.dtype,
                name=f"mask_fcn{i + 1}",
            )(x)
            x = nn.relu(x)
        x = nn.ConvTranspose(
            self.conv_dim,
            (2, 2),
            strides=(2, 2),
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            dtype=self.dtype,
            name="deconv",
        )(x)
        x = nn.relu(x)
        x = nn.Conv(
            1,
            (1, 1),
            kernel_init=nn.initializers.normal(0.001),
            dtype=self.dtype,
            name="predictor",
        )(x)
        return x[..., 0]  # (N, 2*res, 2*res)


# ---------------------------------------------------------------------------
# Matching & sampling (static shapes)
# ---------------------------------------------------------------------------


def match_proposals(
    proposal_boxes: Array,  # (P, 4)
    gt_boxes: Array,  # (N, 4)
    gt_valid: Array,  # (N,)
    iou_thresh: float,
):
    """detectron2 Matcher with a single threshold [t], labels [0, 1].

    Returns (matched_idx (P,), fg (P,) bool). Invalid gt rows never match.
    """
    iou = box_ops.pairwise_iou(gt_boxes, proposal_boxes)  # (N, P)
    iou = jnp.where(gt_valid[:, None], iou, -1.0)
    matched_idx = jnp.argmax(iou, axis=0)
    matched_iou = jnp.max(iou, axis=0)
    fg = matched_iou >= iou_thresh
    return matched_idx, fg


def subsample_proposals(
    key: Array,
    fg: Array,  # (P,) bool
    valid: Array,  # (P,) bool
    num_samples: int,
    positive_fraction: float,
):
    """detectron2 ``subsample_labels``: up to f*N positives, fill with negatives.

    Returns indices (num_samples,) + validity. Static-shape via randomized
    priorities: the top ``num_pos`` positives (by random rank) get priority
    above every negative; excess positives are excluded (the reference drops
    them, it does not recycle them as negatives).
    """
    p = fg.shape[0]
    num_samples = min(num_samples, p)  # fewer candidates than the budget
    max_pos = int(num_samples * positive_fraction)
    r = jax.random.uniform(key, (p,))
    pos_rank = jnp.argsort(jnp.argsort(jnp.where(fg & valid, r, jnp.inf)))
    keep_pos = fg & valid & (pos_rank < max_pos)
    priority = jnp.where(keep_pos, 2.0 + r, jnp.where(valid & ~fg, r, -jnp.inf))
    topv, topi = jax.lax.top_k(priority, num_samples)
    return topi, topv > -jnp.inf


# ---------------------------------------------------------------------------
# The cascade module
# ---------------------------------------------------------------------------


class CascadeROIHeads(nn.Module):
    """3-stage cascade + mask head. All inputs/outputs batched static shapes.

    train __call__ returns a loss dict (keys ``loss_cls_stage{k}``,
    ``loss_box_reg_stage{k}``, ``loss_mask`` — matching the reference's
    naming detic_roi_heads.py:241); inference returns padded detections.
    """

    cfg: ROIHeadsConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.box_heads = [
            FastRCNNConvFCHead(c.fc_dim, c.num_fc, dtype=self.dtype, name=f"box_head{k}")
            for k in range(len(c.cascade_ious))
        ]
        self.box_predictors = [
            DeticOutputLayers(
                num_classes=c.num_classes,
                prior_prob=c.prior_prob,
                cls_agnostic=c.cls_agnostic_bbox_reg,
                use_sigmoid_ce=c.use_sigmoid_ce,
                use_zeroshot_cls=c.use_zeroshot_cls,
                norm_temp=c.norm_temp,
                dtype=self.dtype,
                name=f"box_predictor{k}",
            )
            for k in range(len(c.cascade_ious))
        ]
        if c.mask_on:
            if c.mask_head_name == "RefineMaskHead":
                from .refine_mask_head import RefineMaskHead, SemanticBranch

                n_sup = len(c.stage_sup_size)
                stage_ncls = tuple(
                    1 if c.cls_agnostic_mask else c.num_classes
                    for _ in range(n_sup - 1)
                ) + (1,)  # ref stage_num_classes=[...,1]: final stage agnostic
                self.mask_head = RefineMaskHead(
                    conv_dim=c.mask_conv_dim,
                    stage_sup_size=c.stage_sup_size,
                    stage_num_classes=stage_ncls,
                    dtype=self.dtype,
                    name="mask_head",
                )
                self.semantic_branch = SemanticBranch(
                    conv_dim=c.mask_conv_dim, dtype=self.dtype, name="semantic_branch"
                )
            else:
                self.mask_head = MaskRCNNConvUpsampleHead(
                    c.mask_num_conv, c.mask_conv_dim, dtype=self.dtype, name="mask_head"
                )


    def _apply_mask_head(self, features, pooled_flat, boxes_flat):
        """pooled_flat (N, r, r, C), boxes_flat (N, 4) → (final (N,S,S)
        logits, per-stage logits tuple). Dispatches MaskRCNN vs RefineMask
        (semantic fusion crops per stage)."""
        c = self.cfg
        if c.mask_head_name != "RefineMaskHead":
            out = self.mask_head(pooled_flat)
            return out, (out,)
        from ...ops.roi_align import roi_align
        from .refine_mask_head import compose_stage_preds

        sem_feat, sem_pred = self.semantic_branch(features[c.in_features[0]])
        stride = c.strides[0]
        # boxes_flat rows map to images via their leading batch grouping;
        # callers pass per-image flattened rows in order, so rebuild (B, K)
        b = sem_feat.shape[0]
        k = pooled_flat.shape[0] // b
        bx = boxes_flat.reshape(b, k, 4)

        def crop(full_map, res):
            # SFMStage's ROIPooler (refine_mask_head.py:232-237): ROIAlignV2
            # at the semantic feature stride
            out = jax.vmap(lambda sf, bxi: roi_align(sf, bxi, res, 1.0 / stride))(
                full_map, bx
            )
            return out.reshape(b * k, res, res, -1)

        outs = self.mask_head(pooled_flat, sem_feat, sem_pred, crop)
        # boundary-composed final prediction (ref :442-454); for training the
        # per-stage logits carry the loss and this composition is unused/DCE'd
        return compose_stage_preds(outs), outs

    # -- shared stage runner -------------------------------------------
    def _run_stage(self, features, boxes_flat: Array, stage: int,
                   cap_classifier: Optional[Array] = None,
                   cls_inds: Optional[Array] = None):
        """ROIAlign + box head + predictor for one stage (detic_roi_heads
        :396-414). ``_ScaleGradient`` 1/num_stages is applied to the pooled
        features exactly like the reference."""
        c = self.cfg
        feats = [features[f] for f in c.in_features]

        def pool_one(fmaps, boxes):
            return multilevel_roi_align(fmaps, list(c.strides), boxes, c.pooler_resolution)

        # boxes_flat: (B, P, 4); pool per image then flatten rows
        pooled = jax.vmap(lambda *fm_and_boxes: pool_one(fm_and_boxes[:-1], fm_and_boxes[-1]))(
            *feats, boxes_flat
        )  # (B, P, r, r, C)
        b, p = pooled.shape[:2]
        pooled = pooled.reshape(b * p, *pooled.shape[2:])
        n_stages = len(c.cascade_ious)
        pooled = _scale_gradient(pooled, 1.0 / n_stages)
        box_feat = self.box_heads[stage](pooled)
        scores, deltas, prop_score = self.box_predictors[stage](
            box_feat, cap_classifier, cls_inds
        )
        return (
            scores.reshape(b, p, -1),
            deltas.reshape(b, p, -1),
            None if prop_score is None else prop_score.reshape(b, p, -1),
        )

    # -- training ------------------------------------------------------
    def losses(
        self,
        rng: Array,
        features: Dict[str, Array],
        proposals: Dict[str, Array],  # boxes (B,P,4), scores (B,P), valid (B,P)
        gt: Dict[str, Array],  # boxes (B,N,4), classes (B,N), valid (B,N),
        #                         masks (B,N,Hm,Wm), instance_source (B,N)
        fed_weight: Optional[Array] = None,  # (C,) freq^0.5 weights
        axis_name: Optional[str] = None,
        cls_inds: Optional[Array] = None,  # (K,) dynamic-classifier columns
        image_sizes: Optional[Array] = None,  # (B, 2) for inter-stage clip
    ) -> Dict[str, Array]:
        c = self.cfg
        b = proposals["boxes"].shape[0]
        # append GT boxes to proposals (add_ground_truth_to_proposals)
        if c.add_gt_to_proposals:
            pb = jnp.concatenate([proposals["boxes"], gt["boxes"]], axis=1)
            pv = jnp.concatenate([proposals["valid"], gt["valid"]], axis=1)
        else:
            pb, pv = proposals["boxes"], proposals["valid"]

        # stage 0: match + subsample to batch_size_per_image
        k_match, k_fed = jax.random.split(jax.random.fold_in(rng, 0))
        losses: Dict[str, Array] = {}
        boxes = None
        sample_valid = None
        matched_idx = None
        fg = None
        for stage, iou_t in enumerate(c.cascade_ious):
            if stage == 0:
                def match_sample(key, pb_i, pv_i, gtb, gtv):
                    midx, fg_i = match_proposals(pb_i, gtb, gtv, iou_t)
                    fg_i = fg_i & pv_i
                    idx, ok = subsample_proposals(
                        key, fg_i, pv_i, c.batch_size_per_image, c.positive_fraction
                    )
                    return pb_i[idx], midx[idx], fg_i[idx] & ok, ok

                keys = jax.random.split(k_match, b)
                boxes, matched_idx, fg, sample_valid = jax.vmap(match_sample)(
                    keys, pb, pv, gt["boxes"], gt["valid"]
                )
            else:
                def rematch(bx, gtb, gtv):
                    return match_proposals(bx, gtb, gtv, iou_t)

                matched_idx, fg = jax.vmap(rematch, in_axes=(0, 0, 0))(
                    boxes, gt["boxes"], gt["valid"]
                )
                fg = fg & sample_valid

            gt_classes = jnp.take_along_axis(gt["classes"], matched_idx, axis=1)
            gt_classes = jnp.where(fg, gt_classes, c.num_classes)
            gt_boxes_m = jnp.take_along_axis(
                gt["boxes"], matched_idx[..., None], axis=1
            )
            inst_src = None
            if "instance_source" in gt:
                inst_src = jnp.take_along_axis(gt["instance_source"], matched_idx, axis=1)
                inst_src = jnp.where(fg, inst_src, 0)

            scores, deltas, _ = self._run_stage(features, boxes, stage, cls_inds=cls_inds)
            stage_losses = _fast_rcnn_losses(
                c,
                jax.random.fold_in(k_fed, stage),
                scores,
                deltas,
                boxes,
                gt_classes,
                gt_boxes_m,
                sample_valid,
                inst_src,
                c.cascade_reg_weights[stage],
                fed_weight,
            )
            losses.update({f"{k}_stage{stage}": v for k, v in stage_losses.items()})

            # refine boxes for the next stage (predict_boxes, no grad);
            # clipped to the image and empties dropped like
            # _create_proposals_from_boxes (training filters nonempty() —
            # statically: marked invalid so they leave the loss)
            refined = box_regression.apply_deltas(
                jax.lax.stop_gradient(deltas), boxes, c.cascade_reg_weights[stage]
            )
            if image_sizes is not None:
                from ...structures import boxes as box_ops

                refined = jax.vmap(box_ops.clip)(refined, image_sizes)
                nonempty = (refined[..., 2] > refined[..., 0]) & (
                    refined[..., 3] > refined[..., 1]
                )
                sample_valid = sample_valid & nonempty
            boxes = refined

        if c.mask_on:
            losses["loss_mask"] = c.mask_weight * self._mask_loss(
                jax.random.fold_in(rng, 17), features, gt, proposals
            )
            if c.mask_head_name == "RefineMaskHead" and "sem_seg" in gt:
                # auxiliary semantic loss (refine_mask_head.py semantic
                # branch; targets from DatasetMapperWithSemSeg parity)
                _, sem_logits = self.semantic_branch(features[c.in_features[0]])
                tgt = gt["sem_seg"]
                if tgt.shape[1:] != sem_logits.shape[1:]:
                    tgt = jax.image.resize(tgt, sem_logits.shape, "nearest")
                losses["loss_semantic"] = c.sem_seg_weight * jnp.mean(
                    optax_sigmoid_bce(sem_logits, tgt)
                )
        return losses

    # -- weak supervision (image-labeled / caption data) ----------------
    def image_label_losses(
        self,
        features: Dict[str, Array],
        proposals: Dict[str, Array],
        image_sizes: Array,  # (B, 2) h, w
        labels: Array,  # (B, L) int32 category ids (padded)
        labels_valid: Array,  # (B, L) bool
        ann_type: str = "image",
        cap_emb: Optional[Array] = None,  # (N_cap, zs_dim) caption embeddings
        cap_idx: Optional[Array] = None,  # (B,) own-caption column per image
        cls_inds: Optional[Array] = None,  # (K,) dynamic-classifier columns
    ) -> Dict[str, Array]:
        """Detic weak losses for image-labeled batches.

        Mirrors detic_roi_heads.py:341-365 (get_top_proposals + per-stage
        image_label_losses) and detic_fast_rcnn.py:340-583. Proposals are
        the top ``ws_num_props`` (already score-sorted), clipped, with an
        optional whole-image box appended; each cascade stage scores them
        and one proposal per label is supervised with BCE according to
        ``image_label_loss``. No box-reg, no matching, no mask loss
        (_get_empty_mask_loss parity)."""
        c = self.cfg
        b = proposals["boxes"].shape[0]
        n = min(c.ws_num_props, proposals["boxes"].shape[1])
        boxes = jax.lax.stop_gradient(proposals["boxes"][:, :n])
        boxes = jax.vmap(box_ops.clip)(boxes, image_sizes)
        pvalid = proposals["valid"][:, :n]
        if c.add_image_box:
            f = c.image_box_size
            h = image_sizes[:, 0].astype(jnp.float32)
            w = image_sizes[:, 1].astype(jnp.float32)
            ib = jnp.stack(
                [w * (1 - f) / 2, h * (1 - f) / 2,
                 w * (1 - (1 - f) / 2), h * (1 - (1 - f) / 2)], axis=-1
            )
            boxes = jnp.concatenate([boxes, ib[:, None, :]], axis=1)
            pvalid = jnp.concatenate([pvalid, jnp.ones((b, 1), bool)], axis=1)

        cap_classifier = None
        if cap_emb is not None:
            cap_classifier = cap_emb.T  # (zs_dim, N_cap)

        losses: Dict[str, Array] = {}
        zero = jnp.zeros((), jnp.float32)
        for stage in range(len(c.cascade_ious)):
            scores, deltas, prop_score = self._run_stage(
                features, boxes, stage, cap_classifier=cap_classifier,
                cls_inds=cls_inds,
            )
            scores = scores.astype(jnp.float32)
            img_loss = zero
            if cap_emb is not None:
                n_cap = cap_emb.shape[0]
                cls_scores, cap_scores = scores[..., :-n_cap], scores[..., -n_cap:]
                # caption loss on the image-level (last) box
                # (detic_fast_rcnn.py:466-506)
                cap_last = cap_scores[:, -1, :]  # (B, N_cap)
                tgt = jax.nn.one_hot(cap_idx, n_cap)
                bce = optax_sigmoid_bce(cap_last, tgt)
                if c.sync_caption_batch:
                    pos = jnp.sum(bce * tgt, axis=1)
                    neg = jnp.sum(bce * (1.0 - tgt), axis=1)
                    per_img = pos + c.neg_cap_weight * neg
                else:
                    per_img = jnp.sum(bce, axis=1)
                img_loss = img_loss + c.caption_weight * jnp.mean(per_img)
            else:
                cls_scores = scores
            if ann_type != "caption":
                img_loss = img_loss + _weak_image_loss(
                    c, cls_scores, prop_score, boxes, pvalid, labels, labels_valid
                )
            losses[f"image_loss_stage{stage}"] = img_loss * c.image_loss_weight
            losses[f"loss_cls_stage{stage}"] = zero
            losses[f"loss_box_reg_stage{stage}"] = zero
            boxes = jax.lax.stop_gradient(
                box_regression.apply_deltas(deltas, boxes, c.cascade_reg_weights[stage])
            )
            boxes = jax.vmap(box_ops.clip)(boxes, image_sizes)
        if c.mask_on:
            losses["loss_mask"] = zero  # _get_empty_mask_loss parity
        return losses

    def _mask_loss(self, rng, features, gt, proposals) -> Array:
        """Mask head trains on fg rows of the stage-0 sampled proposals; the
        reference (StandardROIHeads.forward → _forward_mask) does the same.
        Static capacity ``mask_fg_capacity`` fg rows per image."""
        c = self.cfg
        b = proposals["boxes"].shape[0]
        pb = jnp.concatenate([proposals["boxes"], gt["boxes"]], axis=1)
        pv = jnp.concatenate([proposals["valid"], gt["valid"]], axis=1)

        cap = min(c.mask_fg_capacity, pb.shape[1])

        def select_fg(key, pb_i, pv_i, gtb, gtv, gt_src):
            midx, fg_i = match_proposals(pb_i, gtb, gtv, c.cascade_ious[0])
            fg_i = fg_i & pv_i
            if not c.divergen_mask_loss and gt_src is not None:
                # ablation: only real (non-pasted) instances train the mask
                fg_i = fg_i & (jnp.take_along_axis(gt_src, midx, axis=0) == 0)
            r = jax.random.uniform(key, fg_i.shape)
            pri = jnp.where(fg_i, r, -jnp.inf)
            topv, topi = jax.lax.top_k(pri, cap)
            return pb_i[topi], midx[topi], topv > -jnp.inf

        keys = jax.random.split(rng, b)
        src = gt.get("instance_source")
        boxes, midx, ok = jax.vmap(select_fg)(
            keys, pb, pv, gt["boxes"], gt["valid"], src if src is not None else gt["valid"].astype(jnp.int32)
        )
        feats = [features[f] for f in c.in_features]

        def pool_one(fmaps, bx):
            return multilevel_roi_align(fmaps, list(c.strides), bx, c.mask_pooler_resolution)

        pooled = jax.vmap(lambda *a: pool_one(a[:-1], a[-1]))(*feats, boxes)
        bp = pooled.reshape(b * cap, *pooled.shape[2:])
        flat_logits, stage_logits_raw = self._apply_mask_head(
            features, bp, boxes.reshape(b * cap, 4)
        )
        out_res = flat_logits.shape[-1]
        logits = flat_logits.reshape(b, cap, out_res, out_res)

        # GT mask targets: gt masks are stored as (N, S, S) crops in their
        # own box frame (see structures.masks.mask_target_in_box); resample
        # each matched crop onto the proposal box at the head's resolution.
        def targets_one(gtm, gtb, bx, mi, res):
            m = gtm[mi]  # (K, S, S)
            src = gtb[mi]  # (K, 4)
            return jax.vmap(mask_target_in_box, in_axes=(0, 0, 0, None))(
                m, src, bx, res
            )

        tgt = jax.vmap(lambda *a: targets_one(*a, out_res))(
            gt["masks"], gt["boxes"], boxes, midx
        )
        tgt = (tgt >= 0.5).astype(jnp.float32)
        if c.mask_head_name == "RefineMaskHead":
            from .refine_mask_head import refine_cross_entropy

            # per-stage targets at each supervision size (ref get_gt_mask
            # :458-466 crops the gt at every stage's prediction size)
            stage_logits, stage_targets = [], []
            for lg in stage_logits_raw:
                s = lg.shape[-1]
                stage_logits.append(lg.reshape(b * cap, s, s))
                st = jax.vmap(lambda *a, _s=s: targets_one(*a, _s))(
                    gt["masks"], gt["boxes"], boxes, midx
                )
                stage_targets.append(
                    (st >= 0.5).astype(jnp.float32).reshape(b * cap, s, s)
                )
            n_st = len(stage_logits)
            # ref loss_cfg stage_instance_loss_weight=[0.25,0.5,0.75,1.0]
            weights = tuple((i + 1) / n_st for i in range(n_st))
            return refine_cross_entropy(
                stage_logits, stage_targets, ok.reshape(-1),
                stage_weights=weights,
            )
        bce = optax_sigmoid_bce(logits, tgt)
        per_roi = jnp.mean(bce, axis=(2, 3))
        total = jnp.sum(jnp.where(ok, per_roi, 0.0))
        return total / jnp.maximum(jnp.sum(ok), 1.0)

    # -- inference ------------------------------------------------------
    def inference(
        self,
        features: Dict[str, Array],
        proposals: Dict[str, Array],
        image_sizes: Array,
        return_logits: bool = False,
    ):
        c = self.cfg
        boxes = proposals["boxes"]
        prop_scores = proposals["scores"]
        prop_valid = proposals["valid"]
        b, p = boxes.shape[:2]
        scores_sum = jnp.zeros((b, p, c.num_classes + 1), jnp.float32)
        for stage in range(len(c.cascade_ious)):
            scores, deltas, _ = self._run_stage(features, boxes, stage)
            if c.use_sigmoid_ce:
                probs = jax.nn.sigmoid(scores.astype(jnp.float32))
            else:
                probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
            scores_sum = scores_sum + probs
            boxes = box_regression.apply_deltas(deltas, boxes, c.cascade_reg_weights[stage])
            if stage + 1 < len(c.cascade_ious):
                # refined boxes are clipped to the image before feeding the
                # next stage (detic_roi_heads.py _create_proposals_from_boxes
                # → Boxes.clip) — unclipped stage-1/2 pooling measurably
                # shifts scores (tests/parity/test_full_graph_parity.py)
                from ...structures import boxes as box_ops

                boxes = jax.vmap(box_ops.clip)(boxes, image_sizes)
        scores_avg = scores_sum / len(c.cascade_ious)
        if c.mult_proposal_score:
            scores_avg = jnp.sqrt(scores_avg * jnp.maximum(prop_scores, 0.0)[..., None])
        if c.one_class_per_proposal:
            best = jnp.max(scores_avg[..., :-1], axis=-1, keepdims=True)
            scores_avg = scores_avg * (scores_avg >= best)
        cls_scores = scores_avg[..., :-1]  # drop background

        def per_image(bx, sc, pv, im_size):
            return _fast_rcnn_inference_single(c, bx, sc, pv, im_size)

        dets = jax.vmap(per_image)(boxes, cls_scores, prop_valid, image_sizes)
        if return_logits:
            # per-kept-box full class-score vector (detic_roi_heads_with_
            # logits.py variant, Δ-DiverGen): gather the averaged cascade
            # scores at each detection's source proposal
            dets["logits"] = jnp.take_along_axis(
                cls_scores, dets["prop_idx"][..., None], axis=1
            )
        if c.mask_on:
            feats = [features[f] for f in c.in_features]

            def pool_one(fmaps, bx):
                return multilevel_roi_align(fmaps, list(c.strides), bx, c.mask_pooler_resolution)

            pooled = jax.vmap(lambda *a: pool_one(a[:-1], a[-1]))(*feats, dets["boxes"])
            k = dets["boxes"].shape[1]
            bp = pooled.reshape(b * k, *pooled.shape[2:])
            mask_logits, _ = self._apply_mask_head(
                features, bp, dets["boxes"].reshape(b * k, 4)
            )
            mres = mask_logits.shape[-1]
            dets["mask_logits"] = mask_logits.reshape(b, k, mres, mres)
        return dets


def _weak_image_loss(
    c: ROIHeadsConfig,
    scores: Array,  # (B, P, C+1) f32 logits
    prop_score: Optional[Array],  # (B, P, C+1) or None (WSDDN branch)
    boxes: Array,  # (B, P, 4)
    prop_valid: Array,  # (B, P) bool
    labels: Array,  # (B, L) int32
    labels_valid: Array,  # (B, L) bool
) -> Array:
    """One stage's image-label loss, vectorized over (B, L).

    Strategy semantics follow detic_fast_rcnn.py:508-583:
      max_size : BCE at the largest proposal (image box excluded)
      max_score: BCE at the proposal with the highest score for the label
      first    : BCE at proposal 0
      image    : BCE at the image-level (last) box
      min_loss : BCE at the proposal with the smallest per-row BCE
      wsddn/wsod: sigmoid(score)·softmax_props(prop_score) summed over
                  proposals → probability-space BCE (mean over classes)
    """
    _, p, c1 = scores.shape

    def per_image(sc, ps, bx, pv, lab, lv):
        def one_label(l):
            tgt = jax.nn.one_hot(l, c1)
            if c.image_label_loss in ("wsddn", "wsod"):
                logits_p = jnp.where(pv[:, None], ps, -1e30)
                w = jax.nn.softmax(logits_p, axis=0)  # over proposals
                final = jax.nn.sigmoid(sc) * w
                img = jnp.clip(jnp.sum(final, axis=0), 1e-10, 1.0 - 1e-10)
                return -jnp.mean(tgt * jnp.log(img) + (1 - tgt) * jnp.log(1 - img))
            if c.image_label_loss == "max_size":
                area = (bx[:, 2] - bx[:, 0]) * (bx[:, 3] - bx[:, 1])
                area = jnp.where(pv, area, -jnp.inf)
                area = area.at[-1].set(-jnp.inf)  # sizes[:-1] in the reference
                ind = jnp.argmax(area)
            elif c.image_label_loss == "max_score":
                ind = jnp.argmax(jnp.where(pv, sc[:, l], -jnp.inf))
            elif c.image_label_loss == "first":
                ind = 0
            elif c.image_label_loss == "image":
                ind = p - 1
            elif c.image_label_loss == "min_loss":
                per_row = jnp.sum(optax_sigmoid_bce(sc, jnp.broadcast_to(tgt, sc.shape)), axis=-1)
                per_row = jnp.where(pv, per_row, jnp.inf)
                ind = jnp.argmin(jax.lax.stop_gradient(per_row))
            else:
                raise ValueError(f"unknown image_label_loss {c.image_label_loss}")
            row = sc[ind]
            if c.softmax_weak_loss:
                return -jax.nn.log_softmax(row)[l]
            return jnp.sum(optax_sigmoid_bce(row, tgt))

        ll = jax.vmap(one_label)(lab)
        denom = jnp.maximum(jnp.sum(labels_valid_f := lv.astype(jnp.float32)), 1.0)
        return jnp.sum(jnp.where(lv, ll, 0.0)) / denom

    ps_in = prop_score if prop_score is not None else scores
    return jnp.mean(
        jax.vmap(per_image)(scores, ps_in, boxes, prop_valid, labels, labels_valid)
    )


def _fast_rcnn_inference_single(c: ROIHeadsConfig, boxes, scores, valid, image_size):
    """fast_rcnn_inference_single_image with static shapes: per-class
    threshold → class-aware NMS → top ``detections_per_image``.

    The reference expands each proposal into all classes above threshold;
    statically we keep the top ``detections_per_image * 4`` (class, box)
    candidates by score before NMS, which is lossless in practice because
    NMS keeps at most ``detections_per_image``.
    """
    p, num_c = scores.shape
    boxes = box_ops.clip(boxes, image_size)
    flat = jnp.where(valid[:, None], scores, 0.0).reshape(-1)  # (P*C,)
    flat = jnp.where(flat > c.score_thresh_test, flat, -jnp.inf)
    cand = min(c.nms_candidates or c.detections_per_image * 4, flat.shape[0])
    topv, topi = jax.lax.top_k(flat, cand)
    prop_idx = topi // num_c
    cls_idx = topi % num_c
    cboxes = boxes[prop_idx]
    cvalid = topv > -jnp.inf
    cscores = jnp.where(cvalid, topv, 0.0)
    keep = batched_nms_mask(cboxes, cscores, cls_idx, c.nms_thresh_test, cvalid)
    out_boxes, out_scores, out_valid, keep_idx, (out_classes, out_prop) = top_scoring(
        cboxes, cscores, keep, c.detections_per_image, extras=(cls_idx, prop_idx)
    )
    return {
        "prop_idx": out_prop,
        "boxes": out_boxes,
        "scores": out_scores,
        "classes": out_classes,
        "valid": out_valid,
    }


def _fast_rcnn_losses(
    c: ROIHeadsConfig,
    key: Array,
    scores: Array,  # (B, P, C+1)
    deltas: Array,  # (B, P, 4)
    proposal_boxes: Array,  # (B, P, 4)
    gt_classes: Array,  # (B, P) with bg = C
    gt_boxes: Array,  # (B, P, 4)
    valid: Array,  # (B, P)
    instance_source: Optional[Array],  # (B, P) or None
    reg_weights: Tuple[float, ...],
    fed_weight: Optional[Array],
) -> Dict[str, Array]:
    b, p, cp1 = scores.shape
    num_classes = cp1 - 1
    flat_scores = scores.reshape(-1, cp1).astype(jnp.float32)
    flat_classes = gt_classes.reshape(-1)
    flat_valid = valid.reshape(-1)
    n_valid = jnp.maximum(jnp.sum(flat_valid), 1.0)

    # classification: sigmoid CE over C columns, target one-hot, /B
    # (detic_fast_rcnn.py:203-236)
    target = jax.nn.one_hot(flat_classes, cp1)[:, :num_classes]
    bce = optax_sigmoid_bce(flat_scores[:, :num_classes], target)
    if c.use_fed_loss and fed_weight is not None:
        from ...ops.losses import get_fed_loss_classes

        fed_mask = get_fed_loss_classes(
            key,
            jnp.where(flat_valid, flat_classes, num_classes),
            flat_valid,
            num_classes,
            c.fed_loss_num_cat,
            fed_weight,
        )
        bce = bce * fed_mask[None, :num_classes]
    bce = bce * flat_valid[:, None]
    loss_cls = jnp.sum(bce) / n_valid

    extra: Dict[str, Array] = {}
    if c.split_paste_loss and instance_source is not None:
        # BSGAL per-source CE split (bsgal detic_fast_rcnn.py:431-469):
        # same per-row CE, partitioned by whether the row matched a pasted
        # instance; shared normalizer so the parts sum to loss_cls on fg.
        is_paste = (instance_source.reshape(-1) > 0) & flat_valid
        row_ce = jnp.sum(bce, axis=-1)
        extra["loss_paste_ins"] = jnp.sum(jnp.where(is_paste, row_ce, 0.0)) / n_valid
        extra["loss_nopaste_ins"] = jnp.sum(jnp.where(~is_paste, row_ce, 0.0)) / n_valid
    if c.per_paste_loss and instance_source is not None:
        # ACTIVE_ONLY_GT_TRAIN per-paste loss columns (loss_cls_per_paste,
        # bsgal detic_fast_rcnn.py:393-429 + custom_rcnn.py:385-387): raw
        # (no-fed) per-row CE for pasted proposals. Static shapes: (B, P)
        # arrays masked by is_paste, keyed aux_* so every loss-summing call
        # site skips them. With unique paste ids in ``instance_source``
        # (active.bsgal.unique_paste_ids) each pasted GT row is identified.
        bce_nofed = optax_sigmoid_bce(flat_scores[:, :num_classes], target)
        is_paste_r = (instance_source.reshape(-1) > 0) & flat_valid
        row_nofed = jnp.where(is_paste_r, jnp.sum(bce_nofed, axis=-1), 0.0)
        # reference argmax/max run over the raw per-class CE columns
        # (custom_rcnn.py:386-387), gt column included
        extra["aux_paste_row_loss"] = row_nofed.reshape(b, p)
        extra["aux_paste_row_max_class"] = jnp.where(
            is_paste_r, jnp.argmax(bce_nofed, axis=-1), -1
        ).reshape(b, p)
        extra["aux_paste_row_max_loss"] = jnp.where(
            is_paste_r, jnp.max(bce_nofed, axis=-1), 0.0
        ).reshape(b, p)
        extra["aux_paste_row_id"] = jnp.where(
            is_paste_r, instance_source.reshape(-1), 0
        ).reshape(b, p)

    # box regression on fg rows, class-agnostic (box_reg_loss :271-305)
    fg = (flat_classes >= 0) & (flat_classes < num_classes) & flat_valid
    if instance_source is not None and not c.divergen_box_loss:
        fg = fg & (instance_source.reshape(-1) == 0)
    flat_pb = proposal_boxes.reshape(-1, 4)
    flat_gb = gt_boxes.reshape(-1, 4)
    flat_deltas = deltas.reshape(-1, 4).astype(jnp.float32)
    # the reference normalizes by loss.numel(): 4*n_fg for smooth_l1 (the
    # (n_fg, 4) elementwise tensor), n_fg for giou (detic_fast_rcnn.py:305)
    if c.box_reg_loss_type == "smooth_l1":
        gt_deltas = box_regression.get_deltas(flat_pb, flat_gb, reg_weights)
        reg = jnp.sum(smooth_l1_loss(flat_deltas, gt_deltas, c.smooth_l1_beta), axis=-1)
        denom = jnp.maximum(jnp.sum(fg) * 4.0, 1.0)
    else:
        pred_boxes = box_regression.apply_deltas(flat_deltas, flat_pb, reg_weights)
        reg = giou_loss_xyxy(pred_boxes, flat_gb)
        denom = jnp.maximum(jnp.sum(fg) * 1.0, 1.0)
    loss_box = jnp.sum(jnp.where(fg, reg, 0.0)) / denom
    return {"loss_cls": loss_cls, "loss_box_reg": loss_box, **extra}


@jax.custom_vjp
def _scale_gradient(x, scale):
    return x


def _scale_gradient_fwd(x, scale):
    return x, scale


def _scale_gradient_bwd(scale, g):
    return g * scale, None


_scale_gradient.defvjp(_scale_gradient_fwd, _scale_gradient_bwd)
