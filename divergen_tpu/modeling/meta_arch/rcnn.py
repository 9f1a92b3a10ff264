"""CustomRCNN meta-architecture — backbone + FPN + CenterNet + cascade heads.

Counterpart of ``DiverGen/divergen/modeling/meta_arch/custom_rcnn.py:24-332``
(a GeneralizedRCNN subclass). The torch version dispatches through three
registries and mutates ragged ``Instances``; here the meta-arch is one flax
module whose ``__call__`` takes a batched, padded sample dict and returns
either a loss dict (train) or padded detections (inference). bf16 mixed
precision replaces the reference's fp16 autocast on the backbone
(custom_rcnn.py:141-146) — on TPU, bf16 needs no GradScaler.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from ..backbone.fpn import FPN
from ..backbone.resnet import ResNet
from ..centernet.centernet import (
    CenterNetConfig,
    CenterNetHead,
    centernet_ground_truth,
    centernet_losses,
    centernet_proposals,
    level_geometry,
)
from ..roi_heads.cascade_heads import CascadeROIHeads, ROIHeadsConfig


class CustomRCNN(nn.Module):
    """End-to-end detector. ``backbone_name`` selects resnet/swin/etc."""

    centernet_cfg: CenterNetConfig
    roi_cfg: ROIHeadsConfig
    backbone_name: str = "resnet50"
    fpn_in_features: Tuple[str, ...] = ("res3", "res4", "res5")
    fpn_out_channels: int = 256
    pixel_mean: Tuple[float, ...] = (123.675, 116.28, 103.53)
    pixel_std: Tuple[float, ...] = (58.395, 57.12, 57.375)
    backbone_norm: str = "FrozenBN"
    compute_dtype: Any = jnp.bfloat16
    swin_size: str = "T"
    roi_head_name: str = "DeticCascadeROIHeads"
    remat_backbone: bool = False
    dynamic_classifier: bool = False
    num_sample_cats: int = 50
    fused_swin_attn: bool = False
    with_image_labels: bool = False
    dataset_loss_weight: Tuple[float, ...] = ()
    fpn_kind: str = "fpn"  # fpn | bifpn (CenterNet2 real-time configs)
    num_bifpn: int = 3

    def setup(self):
        if self.backbone_name.startswith("res2net"):
            from ..backbone.resnet import Res2Net

            depth = int(self.backbone_name.replace("res2net", "") or 50)
            body = Res2Net(
                depth=depth,
                norm=self.backbone_norm,
                out_features=self.fpn_in_features,
                dtype=self.compute_dtype,
                name="bottom_up",
            )
        elif self.backbone_name.startswith("resnet"):
            depth = int(self.backbone_name.replace("resnet", "") or 50)
            body = ResNet(
                depth=depth,
                norm=self.backbone_norm,
                out_features=self.fpn_in_features,
                dtype=self.compute_dtype,
                name="bottom_up",
            )
        elif self.backbone_name == "swin":
            from ..backbone.swin import SwinTransformer

            body = SwinTransformer.from_size(
                self.swin_size, dtype=self.compute_dtype,
                remat=self.remat_backbone, fused_attn=self.fused_swin_attn,
                name="bottom_up",
            )
        elif self.backbone_name == "dla34":
            from ..backbone.dla import DLA34

            body = DLA34(
                out_features=self.fpn_in_features, dtype=self.compute_dtype,
                name="bottom_up",
            )
        elif self.backbone_name == "convnext":
            from ..backbone.convnext import ConvNeXt

            body = ConvNeXt.from_size(self.swin_size.lower() if self.swin_size else "tiny",
                                      dtype=self.compute_dtype, name="bottom_up")
        elif self.backbone_name == "vitdet":
            from ..backbone.vit import ViT, ViTDet

            vit_sizes = {
                "B": dict(dim=768, layers=12, heads=12, global_layers=(2, 5, 8, 11)),
                "L": dict(dim=1024, layers=24, heads=16, global_layers=(5, 11, 17, 23)),
                "T": dict(dim=192, layers=4, heads=3, global_layers=(1, 3), window=4),
            }
            body = ViTDet(
                vit=ViT(dtype=self.compute_dtype, **vit_sizes[self.swin_size or "B"]),
                out_channels=self.fpn_out_channels,
                name="bottom_up",
            )
        else:
            raise ValueError(f"unknown backbone {self.backbone_name}")
        self.body = body
        # ViTDet's SimpleFeaturePyramid already emits p2..p7 — no lateral FPN
        if self.backbone_name == "vitdet":
            self.fpn = None
        elif self.fpn_kind == "bifpn":
            from ..backbone.bifpn import BiFPN

            self.fpn = BiFPN(
                in_features=self.fpn_in_features,
                out_channels=self.fpn_out_channels,
                num_layers=self.num_bifpn,
                dtype=self.compute_dtype,
                name="fpn",
            )
        else:
            self.fpn = FPN(
                in_features=self.fpn_in_features,
                out_channels=self.fpn_out_channels,
                dtype=self.compute_dtype,
                name="fpn",
            )
        self.centernet_head = CenterNetHead(
            self.centernet_cfg, dtype=self.compute_dtype, name="centernet_head"
        )
        if self.roi_head_name == "CustomRes5ROIHeads":
            from ..roi_heads.res5_roi_heads import Res5ROIHeads

            self.roi_heads = Res5ROIHeads(self.roi_cfg, dtype=self.compute_dtype, name="roi_heads")
        else:
            self.roi_heads = CascadeROIHeads(self.roi_cfg, dtype=self.compute_dtype, name="roi_heads")

    def _features(self, images: Array) -> Dict[str, Array]:
        mean = jnp.asarray(self.pixel_mean, jnp.float32)
        std = jnp.asarray(self.pixel_std, jnp.float32)
        x = (images - mean) / std
        x = x.astype(self.compute_dtype)
        feats = self.body(x)
        if self.fpn is None:  # vitdet path: body already emits the pyramid
            return feats
        return self.fpn(feats)

    def __call__(
        self,
        images: Array,  # (B, H, W, 3) float RGB 0-255
        image_sizes: Array,  # (B, 2)
        gt: Optional[Dict[str, Array]] = None,
        rng: Optional[Array] = None,
        fed_weight: Optional[Array] = None,
        training: bool = True,
        axis_name: Optional[str] = None,
        gt_as_proposals: bool = False,
        return_logits: bool = False,
        ann_type: str = "box",
        cap_emb: Optional[Array] = None,  # (B, zs_dim) caption CLIP embeddings
        dataset_source: Optional[Array] = None,  # scalar dataset index
    ):
        features = self._features(images)
        if gt_as_proposals:
            # BSGAL probe path: GT boxes as the only proposals
            # (only_gt_proposals, BSGAL detic_roi_heads.py:292-362) — skips
            # the proposal generator entirely; ROI losses only.
            assert training and gt is not None and rng is not None
            proposals = {
                "boxes": gt["boxes"],
                "scores": jnp.ones(gt["boxes"].shape[:2], jnp.float32),
                "valid": gt["valid"],
            }
            return self.roi_heads.losses(
                rng, features, proposals, gt, fed_weight=fed_weight,
                axis_name=axis_name, image_sizes=image_sizes,
            )
        cn_feats = [features[f] for f in self.centernet_cfg.in_features]
        agn_hms, bbox_regs, _ = self.centernet_head(cn_feats)
        feature_shapes = tuple((f.shape[1], f.shape[2]) for f in cn_feats)
        geom = level_geometry(self.centernet_cfg, feature_shapes)
        # flatten levels → (B, M)
        agn_flat = jnp.concatenate(
            [a.reshape(a.shape[0], -1) for a in agn_hms], axis=1
        ).astype(jnp.float32)
        reg_flat = jnp.concatenate(
            [r.reshape(r.shape[0], -1, 4) for r in bbox_regs], axis=1
        ).astype(jnp.float32)

        cls_inds = None
        if self.dynamic_classifier and training and ann_type != "caption":
            # _sample_cls_inds (custom_rcnn.py:159-163, 226-247): restrict
            # the zero-shot classifier to K sampled columns this step and
            # remap targets into the compact vocabulary.
            from ...ops.losses import sample_dynamic_classifier_inds

            assert gt is not None and rng is not None
            k_dyn = jax.random.fold_in(rng, 777)
            if ann_type == "box":
                flat_cls = gt["classes"].reshape(-1)
                flat_ok = gt["valid"].reshape(-1)
                dyn_weight = fed_weight
            else:
                flat_cls = gt["image_labels"].reshape(-1)
                flat_ok = gt["image_labels_valid"].reshape(-1)
                dyn_weight = None
            cls_inds, cls_id_map = sample_dynamic_classifier_inds(
                k_dyn, flat_cls, flat_ok, self.roi_cfg.num_classes,
                self.num_sample_cats, dyn_weight,
            )
            gt = dict(gt)
            if ann_type == "box":
                gt["classes"] = cls_id_map[gt["classes"]]
            else:
                gt["image_labels"] = cls_id_map[gt["image_labels"]]
            if fed_weight is not None:
                fed_weight = fed_weight[cls_inds]

        if training:
            assert gt is not None and rng is not None
            reg_targets, heatmaps, pos_count = centernet_ground_truth(
                self.centernet_cfg, geom, gt["boxes"], gt["valid"]
            )
            losses = centernet_losses(
                self.centernet_cfg,
                agn_flat,
                reg_flat,
                reg_targets,
                heatmaps,
                pos_count,
                axis_name=axis_name,
            )
            proposals = centernet_proposals(
                self.centernet_cfg,
                geom,
                jax.lax.stop_gradient(agn_flat),
                jax.lax.stop_gradient(reg_flat),
                image_sizes,
                training=True,
            )
            if ann_type not in ("box", "prop", "proptag"):
                # weak supervision (custom_rcnn.py:165-247 ann_type branch):
                # image-labeled / caption batches skip matching entirely.
                cap_idx = None
                cap_bank = None
                if cap_emb is not None:
                    b = cap_emb.shape[0]
                    if self.roi_cfg.sync_caption_batch and axis_name is not None:
                        # _sync_caption_features (custom_rcnn.py:210-223):
                        # the caption "classifier" columns grow to the
                        # global batch via an ICI all_gather
                        cap_bank = jax.lax.all_gather(cap_emb, axis_name)
                        cap_bank = cap_bank.reshape(-1, cap_emb.shape[-1])
                        cap_idx = jax.lax.axis_index(axis_name) * b + jnp.arange(b)
                    else:
                        cap_bank = cap_emb
                        cap_idx = jnp.arange(b)
                weak = self.roi_heads.image_label_losses(
                    features,
                    proposals,
                    image_sizes,
                    gt["image_labels"],
                    gt["image_labels_valid"],
                    ann_type=ann_type,
                    cap_emb=cap_bank,
                    cap_idx=cap_idx,
                    cls_inds=cls_inds,
                )
                losses = {k: v * 0.0 for k, v in losses.items()}  # :190-194
                losses.update(weak)
                return _apply_dataset_loss_weight(
                    losses, self.dataset_loss_weight, dataset_source
                )
            roi_losses = self.roi_heads.losses(
                rng,
                features,
                proposals,
                gt,
                fed_weight=fed_weight,
                axis_name=axis_name,
                cls_inds=cls_inds,
                image_sizes=image_sizes,
            )
            losses.update(roi_losses)
            return _apply_dataset_loss_weight(
                losses, self.dataset_loss_weight, dataset_source
            )
        else:
            proposals = centernet_proposals(
                self.centernet_cfg, geom, agn_flat, reg_flat, image_sizes, training=False
            )
            return self.roi_heads.inference(
                features, proposals, image_sizes, return_logits=return_logits
            )


def _apply_dataset_loss_weight(losses, weights, dataset_source):
    """Per-dataset loss scaling (custom_rcnn.py:197-202): every batch comes
    from one dataset (MDAspectRatioGroupedDataset grouping), so the scale is
    a scalar pick from the static weight table."""
    if not weights or dataset_source is None:
        return losses
    w = jnp.asarray(weights)[dataset_source]
    return {k: v * w for k, v in losses.items()}


class CenterNetDetector(CustomRCNN):
    """Standalone CenterNet (no ROI heads): backbone → FPN → classwise
    CenterNet head; losses in training, class-aware NMS'd detections at
    inference. Counterpart of ``centernet/modeling/meta_arch/
    centernet_detector.py:12-78`` with ``only_proposal=False``."""

    def setup(self):  # noqa: D102 — same backbone assembly, no ROI heads
        # build the shared backbone/FPN/head exactly like CustomRCNN…
        super().setup()
        # …but the ROI heads built by the parent are simply never called, so
        # flax never materializes their params (init traces __call__ only)

    def __call__(
        self,
        images: Array,
        image_sizes: Array,
        gt=None,
        rng=None,
        training: bool = False,
        axis_name=None,
        **_,
    ):
        from ..centernet.centernet import (
            centernet_detections,
            centernet_ground_truth_classwise,
            centernet_losses_classwise,
        )

        c = self.centernet_cfg
        features = self._features(images)
        cn_feats = [features[f] for f in c.in_features]
        agn_hms, bbox_regs, clss = self.centernet_head(cn_feats)
        feature_shapes = tuple((f.shape[1], f.shape[2]) for f in cn_feats)
        geom = level_geometry(c, feature_shapes)
        cls_flat = jnp.concatenate(
            [x.reshape(x.shape[0], -1, c.num_classes) for x in clss], axis=1
        ).astype(jnp.float32)
        agn_flat = (
            jnp.concatenate([a.reshape(a.shape[0], -1) for a in agn_hms], axis=1).astype(jnp.float32)
            if c.with_agn_hm
            else None
        )
        reg_flat = jnp.concatenate(
            [r.reshape(r.shape[0], -1, 4) for r in bbox_regs], axis=1
        ).astype(jnp.float32)
        if training:
            assert gt is not None
            reg_targets, hm_agn, hm_cls, pos_cls = centernet_ground_truth_classwise(
                c, geom, gt["boxes"], gt["classes"], gt["valid"]
            )
            return centernet_losses_classwise(
                c, cls_flat, agn_flat, reg_flat, reg_targets, hm_agn,
                hm_cls, pos_cls, axis_name=axis_name,
            )
        return centernet_detections(
            c, geom, cls_flat, agn_flat, reg_flat, image_sizes, training=False
        )


def build_model(cfg) -> CustomRCNN:
    """Assemble CustomRCNN from a ConfigNode (mirrors build_model +
    META_ARCH/BACKBONE registries, train_net.py:353)."""
    cn_cfg = CenterNetConfig.from_cfg(cfg)
    roi_cfg = ROIHeadsConfig.from_cfg(cfg)
    name = cfg.MODEL.BACKBONE.NAME
    if "swin" in name.lower():
        backbone = "swin"
        fpn_in = ("s3", "s4", "s5")
        swin_size = cfg.MODEL.SWIN.SIZE
    elif "convnext" in name.lower():
        backbone = "convnext"
        fpn_in = ("c3", "c4", "c5")
        swin_size = cfg.MODEL.get("CONVNEXT_SIZE", "tiny")
    elif "vit" in name.lower():
        backbone = "vitdet"
        fpn_in = ("p3", "p4", "p5")
        swin_size = cfg.MODEL.get("VIT_SIZE", "B")
    elif "res2net" in name.lower():
        backbone = f"res2net{cfg.MODEL.RESNETS.DEPTH}"
        fpn_in = ("res3", "res4", "res5")
        swin_size = "T"
    elif "dla" in name.lower():
        # CenterNet2 real-time configs (build_dla_backbone +
        # build_p37_dla_bifpn_backbone, centernet/modeling/backbone/)
        backbone = "dla34"
        fpn_in = ("dla3", "dla4", "dla5")
        swin_size = "T"
    else:
        backbone = f"resnet{cfg.MODEL.RESNETS.DEPTH}"
        fpn_in = ("res3", "res4", "res5")
        swin_size = "T"
    # META_ARCHITECTURE dispatch (registry with two live entries here):
    # CustomRCNN (DiverGen/BSGAL/GeneralizedRCNN) | CenterNetDetector
    # (standalone CenterNet, centernet_detector.py:12)
    arch = cfg.MODEL.META_ARCHITECTURE
    cls = CenterNetDetector if arch == "CenterNetDetector" else CustomRCNN
    if arch == "CenterNetDetector":
        cn_cfg = dataclasses.replace(cn_cfg, only_proposal=False)
    use_bifpn = "bifpn" in name.lower()
    return cls(
        centernet_cfg=cn_cfg,
        roi_cfg=roi_cfg,
        backbone_name=backbone,
        fpn_in_features=fpn_in,
        fpn_kind="bifpn" if use_bifpn else "fpn",
        num_bifpn=cfg.MODEL.BIFPN.NUM_BIFPN,
        fpn_out_channels=(
            cfg.MODEL.BIFPN.OUT_CHANNELS if use_bifpn else cfg.MODEL.FPN.OUT_CHANNELS
        ),
        roi_head_name=cfg.MODEL.ROI_HEADS.NAME,
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
        backbone_norm=cfg.MODEL.RESNETS.NORM,
        compute_dtype=jnp.bfloat16 if cfg.FP16 else jnp.float32,
        swin_size=swin_size,
        dynamic_classifier=cfg.MODEL.DYNAMIC_CLASSIFIER,
        num_sample_cats=cfg.MODEL.NUM_SAMPLE_CATS,
        with_image_labels=cfg.WITH_IMAGE_LABELS,
        dataset_loss_weight=tuple(cfg.MODEL.get("DATASET_LOSS_WEIGHT", [])),
        remat_backbone=cfg.MODEL.SWIN.USE_CHECKPOINT,
        fused_swin_attn=cfg.MODEL.SWIN.get("FUSED_ATTN", False),
    )


def load_zs_weight(path, zs_dim=None):
    """Load a zero-shot classifier .npy and return it (zs_dim, C).

    Reference-published metadata files are stored (C, zs_dim) and the
    reference transposes on load (zero_shot_classifier.py:38-41 /
    modeling/utils.py:40-43 ``permute(1, 0)``); files written by
    tools/build_zs_weights.py follow the same on-disk layout. When
    ``zs_dim`` is given, a file already stored (zs_dim, C) is detected and
    passed through; the ambiguous square case follows the reference
    (transpose)."""
    import numpy as np

    w = np.asarray(np.load(path), np.float32)
    assert w.ndim == 2, f"zs classifier {path}: expected 2-D, got {w.shape}"
    if zs_dim is not None and w.shape[0] == zs_dim and w.shape[1] != zs_dim:
        return w  # already (zs_dim, C)
    return w.T


def reset_cls_test(params, zs_weight, stages=3):
    """Swap the zero-shot classifier vocabulary at test time
    (divergen/modeling/utils.py:32 reset_cls_test; used per test set at
    train_net.py:89-93). zs_weight: (zs_dim, num_classes) normalized CLIP
    text embeddings. Returns updated params (pure — no module mutation)."""
    import numpy as np

    host = jax.device_get(params)

    def visit(tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                if "zs_weight" in v:
                    # zs_dim must match; the class count may differ (the
                    # reference swaps vocabularies of different sizes per
                    # test set, train_net.py:89-93 + TEST_NUM_CLASSES)
                    assert np.shape(v["zs_weight"])[0] == np.shape(zs_weight)[0], (
                        np.shape(v["zs_weight"]), np.shape(zs_weight),
                    )
                    v["zs_weight"] = np.asarray(zs_weight, np.asarray(v["zs_weight"]).dtype)
                else:
                    visit(v)

    visit(host)
    return jax.tree.map(jnp.asarray, host)
