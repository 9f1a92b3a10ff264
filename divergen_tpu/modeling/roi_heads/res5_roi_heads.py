"""C4/Res5-style ROI heads: pool res4, run a res5 tower, single-stage heads.

Counterpart of ``DiverGen/divergen/modeling/roi_heads/res5_roi_heads.py:26-172``
(CustomRes5ROIHeads with image-box support). Reuses the cascade module's
matching/sampling/loss helpers; the cascade tower is replaced by bottleneck
blocks on 14² pooled features + mean-pool.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from ...ops.roi_align import roi_align
from ..backbone.resnet import Bottleneck
from .cascade_heads import (
    DeticOutputLayers,
    MaskRCNNConvUpsampleHead,
    ROIHeadsConfig,
    _fast_rcnn_inference_single,
    _fast_rcnn_losses,
    match_proposals,
    subsample_proposals,
)
from . import box_regression


class Res5ROIHeads(nn.Module):
    """Single-stage heads over one feature level (default res4/p4)."""

    cfg: ROIHeadsConfig
    res5_channels: int = 2048
    num_blocks: int = 3
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.res5 = [
            Bottleneck(
                self.res5_channels,
                self.res5_channels // 4,
                stride=2 if i == 0 else 1,
                dtype=self.dtype,
                name=f"res5_block{i}",
            )
            for i in range(self.num_blocks)
        ]
        self.predictor = DeticOutputLayers(
            num_classes=c.num_classes,
            prior_prob=c.prior_prob,
            cls_agnostic=c.cls_agnostic_bbox_reg,
            use_sigmoid_ce=c.use_sigmoid_ce,
            with_softmax_prop=c.with_softmax_prop,
            dtype=self.dtype,
            name="box_predictor",
        )
        if c.mask_on:
            self.mask_head = MaskRCNNConvUpsampleHead(
                c.mask_num_conv, c.mask_conv_dim, dtype=self.dtype, name="mask_head"
            )

    def _res5_features(self, features: Dict[str, Array], boxes: Array) -> Array:
        """(B, P, 4) boxes → (B*P, 7, 7, C) res5 outputs."""
        c = self.cfg
        fmap = features[c.in_features[0]]
        stride = c.strides[0]
        pooled = jax.vmap(
            # sampling_ratio=0: d2's adaptive default (POOLER_SAMPLING_RATIO)
            lambda fm, bx: roi_align(
                fm, bx, 2 * c.pooler_resolution, 1.0 / stride, sampling_ratio=0
            )
        )(fmap, boxes)
        b, p = pooled.shape[:2]
        x = pooled.reshape(b * p, *pooled.shape[2:])
        for blk in self.res5:
            x = blk(x)
        return x

    def losses(self, rng, features, proposals, gt, fed_weight=None, axis_name=None,
               cls_inds=None, image_sizes=None):
        # image_sizes unused: single stage, no inter-stage box refinement
        c = self.cfg
        b = proposals["boxes"].shape[0]
        pb = jnp.concatenate([proposals["boxes"], gt["boxes"]], axis=1)
        pv = jnp.concatenate([proposals["valid"], gt["valid"]], axis=1)
        k_match, k_fed = jax.random.split(jax.random.fold_in(rng, 0))

        def match_sample(key, pb_i, pv_i, gtb, gtv):
            midx, fg_i = match_proposals(pb_i, gtb, gtv, c.cascade_ious[0])
            fg_i = fg_i & pv_i
            idx, ok = subsample_proposals(
                key, fg_i, pv_i, c.batch_size_per_image, c.positive_fraction
            )
            return pb_i[idx], midx[idx], fg_i[idx] & ok, ok

        keys = jax.random.split(k_match, b)
        boxes, matched_idx, fg, ok = jax.vmap(match_sample)(keys, pb, pv, gt["boxes"], gt["valid"])
        gt_classes = jnp.take_along_axis(gt["classes"], matched_idx, axis=1)
        gt_classes = jnp.where(fg, gt_classes, c.num_classes)
        gt_boxes_m = jnp.take_along_axis(gt["boxes"], matched_idx[..., None], axis=1)

        x = self._res5_features(features, boxes)
        feat = jnp.mean(x, axis=(1, 2))  # global average pool (C4 head)
        scores, deltas, _ = self.predictor(feat, None, cls_inds)
        p = boxes.shape[1]
        stage_losses = _fast_rcnn_losses(
            c, k_fed, scores.reshape(b, p, -1), deltas.reshape(b, p, -1), boxes,
            gt_classes, gt_boxes_m, ok, None, c.cascade_reg_weights[0], fed_weight,
        )
        losses = dict(stage_losses)
        if c.mask_on:
            from ...structures.masks import mask_target_in_box
            from ...ops.losses import optax_sigmoid_bce

            logits = self.mask_head(x)
            res = logits.shape[-1]
            tgt = jax.vmap(
                lambda gtm, gtb, bx, mi: jax.vmap(
                    mask_target_in_box, in_axes=(0, 0, 0, None)
                )(gtm[mi], gtb[mi], bx, res)
            )(gt["masks"], gt["boxes"], boxes, matched_idx)
            tgt = (tgt >= 0.5).astype(jnp.float32)
            bce = optax_sigmoid_bce(logits.reshape(b, p, res, res), tgt)
            per_roi = jnp.mean(bce, axis=(2, 3))
            w = fg.astype(jnp.float32)
            losses["loss_mask"] = jnp.sum(per_roi * w) / jnp.maximum(jnp.sum(w), 1.0)
        return losses

    def image_label_losses(
        self,
        features,
        proposals,
        image_sizes,
        labels,
        labels_valid,
        ann_type: str = "image",
        cap_emb=None,
        cap_idx=None,
        cls_inds=None,
    ):
        """Weak image-box path of CustomRes5ROIHeads
        (res5_roi_heads.py:70-98 reference): top ws_num_props proposals +
        optional image box through the shared res5 transform, one stage of
        Detic image-label losses. Caption columns need the zero-shot head,
        which the Res5 variant does not build — parity with the reference,
        which routes captions through the cascade heads."""
        from ...structures import boxes as box_ops
        from .cascade_heads import _weak_image_loss

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
        x = self._res5_features(features, boxes)
        feat = jnp.mean(x, axis=(1, 2))
        scores, _, prop_score = self.predictor(feat)
        p = boxes.shape[1]
        scores = scores.reshape(b, p, -1).astype(jnp.float32)
        if prop_score is not None:
            prop_score = prop_score.reshape(b, p, -1).astype(jnp.float32)
        img_loss = _weak_image_loss(c, scores, prop_score, boxes, pvalid, labels, labels_valid)
        zero = jnp.zeros((), jnp.float32)
        out = {
            "image_loss": img_loss * c.image_loss_weight,
            "loss_cls": zero,
            "loss_box_reg": zero,
        }
        if c.mask_on:
            out["loss_mask"] = zero
        return out

    def inference(self, features, proposals, image_sizes, return_logits: bool = False):
        c = self.cfg
        boxes = proposals["boxes"]
        b, p = boxes.shape[:2]
        x = self._res5_features(features, boxes)
        feat = jnp.mean(x, axis=(1, 2))
        scores, deltas, _ = self.predictor(feat)
        scores = scores.reshape(b, p, -1).astype(jnp.float32)
        probs = jax.nn.sigmoid(scores) if c.use_sigmoid_ce else jax.nn.softmax(scores, -1)
        if c.mult_proposal_score:
            probs = jnp.sqrt(probs * jnp.maximum(proposals["scores"], 0.0)[..., None])
        boxes = box_regression.apply_deltas(
            deltas.reshape(b, p, -1), boxes, c.cascade_reg_weights[0]
        )
        dets = jax.vmap(
            lambda bx, sc, pv, sz: _fast_rcnn_inference_single(c, bx, sc, pv, sz)
        )(boxes, probs[..., :-1], proposals["valid"], image_sizes)
        if c.mask_on:
            k = dets["boxes"].shape[1]
            xm = self._res5_features(features, dets["boxes"])
            ml = self.mask_head(xm)
            dets["mask_logits"] = ml.reshape(b, k, ml.shape[-2], ml.shape[-1])
        return dets
