"""RefineMask head: multi-stage boundary-refined mask prediction.

Counterpart of ``DiverGen/divergen/modeling/roi_heads/refine_mask_head.py``
at reference depth:

- ``generate_block_target`` (ref :45-76): Laplacian box-filter boundary
  extraction → {0 bg, 1 boundary, 2 interior} block target;
- ``MultiBranchFusion`` (ref :187-206): three dilated 3x3 convs (d=1,3,5)
  summed + 1x1 merge;
- ``SFMStage`` (ref :209-312): per-stage semantic fusion — instance feats
  + ROI-cropped transformed semantic feats + instance mask logits +
  ROI-cropped semantic pred, fused (1x1 → MultiBranchFusion → 1x1) and
  2x-bilinear upsampled, with the mask channels re-concatenated;
- ``RefineMaskHead`` (ref :315-455): 2 instance convs, SFM stages over
  ``stage_sup_size`` (default 14 → 28 → 56 → 112, channels halving
  256 → 128 → 64 → 32), final 1x1 logits at 112²;
- ``RefineCrossEntropyLoss`` (ref :79-143): stages ≤ ``start_stage`` get
  plain BCE; later stages get BCE restricted to the union of the previous
  prediction's and previous target's boundary regions (align_corners=True
  upsampling, exactly as the reference), with the running ``pre_pred``
  composed boundary-wise;
- inference composition (ref :442-454): each finer stage keeps the coarser
  prediction outside the width-1 boundary band.

TPU-first differences: rows are padded/static (``valid`` masks replace the
reference's dynamic instance lists) and the per-stage ROIAlign runs through
``ops.roi_align`` via a caller-supplied crop closure; semantics are
otherwise matched (parity test: tests/parity/test_refine_mask_parity.py).

Note: stage targets are resampled from the box-frame gt crops
(``INPUT``/``MODEL.ROI_MASK_HEAD.GT_SIDE``, default 28). With the default
112² final supervision, raise ``GT_SIDE`` to ≥112 to supervise at full
detail (the reference crops polygons at each stage size directly).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from ...ops.losses import optax_sigmoid_bce


# -- resampling helpers ---------------------------------------------------


def resize_align_corners(x: Array, oh: int, ow: int) -> Array:
    """Bilinear resize with align_corners=True on the LAST TWO axes of a
    (..., H, W) array (torch ``F.interpolate(mode='bilinear',
    align_corners=True)`` semantics; jax.image.resize only implements
    half-pixel centers). Separable: one (OH, H) and one (OW, W) weight
    matrix — two small matmuls, MXU-friendly."""

    def weights(out_n: int, in_n: int) -> Array:
        if in_n == 1 or out_n == 1:
            return jnp.ones((out_n, in_n), jnp.float32) / in_n
        src = jnp.arange(out_n, dtype=jnp.float32) * (in_n - 1) / (out_n - 1)
        lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_n - 2)
        frac = src - lo.astype(jnp.float32)
        w = jnp.zeros((out_n, in_n), jnp.float32)
        w = w.at[jnp.arange(out_n), lo].add(1.0 - frac)
        w = w.at[jnp.arange(out_n), lo + 1].add(frac)
        return w

    h, w = x.shape[-2], x.shape[-1]
    wy = weights(oh, h)
    wx = weights(ow, w)
    # precision="highest": TPU default matmul precision is bf16 — a ~1%
    # weight error here flips pixels right at the boundary-band thresholds
    y = jnp.einsum("...hw,oh->...ow", x.astype(jnp.float32), wy,
                   precision="highest")  # rows → OH
    return jnp.einsum("...hw,ow->...ho", y, wx,
                      precision="highest")  # cols → OW; result (..., OH, OW)


def generate_block_target(mask: Array, boundary_width: int = 3) -> Array:
    """(..., S, S) binary mask → int32 block target (ref :45-76): 1 on the
    boundary band (inside or outside), 2 on the interior, 0 elsewhere.

    The reference's conv with an all-(-1) kernel whose centre is k²-1
    equals ``k²·x - boxsum(x)``; thresholding ``clamp(min=0)/k² > 0.1``
    marks positive pixels with ≥0.1·k² zero neighbours (and symmetrically
    for the complement)."""
    m = mask.astype(jnp.float32)
    k = 2 * boundary_width + 1
    lead = m.shape[:-2]
    x = m.reshape((-1,) + m.shape[-2:])[..., None]  # (N, S, S, 1)
    box = nn.avg_pool(x, (k, k), strides=(1, 1), padding="SAME",
                      count_include_pad=True) * float(k * k)
    box = box[..., 0].reshape(lead + m.shape[-2:])
    pos = jnp.clip(k * k * m - box, 0.0) / float(k * k) > 0.1
    neg = jnp.clip(k * k * (1.0 - m) - (k * k - box), 0.0) / float(k * k) > 0.1
    block = jnp.zeros(m.shape, jnp.int32)
    block = jnp.where(pos | neg, 1, block)
    block = jnp.where((m - pos.astype(jnp.float32)) > 0, 2, block)
    return block


# -- semantic branch (ref semantic_convs + semantic_logits) ---------------


class SemanticBranch(nn.Module):
    """4 convs + 1x1 logits over the stride-8 pyramid level (ref
    ``_build_conv_layer('semantic')`` :396-406 + ``semantic_logits``)."""

    conv_dim: int = 256
    num_convs: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Tuple[Array, Array]:
        for i in range(self.num_convs):
            x = nn.Conv(self.conv_dim, (3, 3), padding=1, dtype=self.dtype, name=f"conv{i}")(x)
            x = nn.relu(x)
        logits = nn.Conv(1, (1, 1), dtype=jnp.float32, name="sem_logits")(x)
        return x, logits[..., 0]


class MultiBranchFusion(nn.Module):
    """Three dilated 3x3 convs (d = 1, 3, 5) summed, then a 1x1 merge
    (ref :187-206; every conv ReLU-activated like ConvModule)."""

    feat_dim: int
    dilations: Tuple[int, ...] = (1, 3, 5)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        acc = None
        for i, d in enumerate(self.dilations):
            y = nn.Conv(self.feat_dim, (3, 3), padding=d, kernel_dilation=(d, d),
                        dtype=self.dtype, name=f"dilation_conv_{i + 1}")(x)
            y = nn.relu(y)
            acc = y if acc is None else acc + y
        return nn.Conv(self.feat_dim, (1, 1), dtype=self.dtype, name="merge_conv")(acc)


class SFMStage(nn.Module):
    """Semantic fusion stage (ref :209-312).

    ``crop`` is a caller closure ``(full_map (B,H,W,C'), res) → (N,res,
    res,C')`` wrapping ops.roi_align at the semantic feature stride (the
    reference builds an ROIPooler inside the stage; the crop geometry is
    identical, the extractor just lives with the caller where the box/image
    mapping is known)."""

    instance_in_channel: int
    instance_out_channel: int
    out_size: int
    num_classes: int = 1
    mask_use_sigmoid: bool = True
    dilations: Tuple[int, ...] = (1, 3, 5)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        instance_feats: Array,  # (N, s, s, Cin)
        semantic_feat: Array,  # (B, H, W, Csem)
        semantic_pred: Array,  # (B, H, W) logits
        crop: Callable[[Array, int], Array],
        roi_labels: Optional[Array] = None,  # (N,) int32
    ) -> Tuple[Array, Array]:
        cin = self.instance_in_channel
        s = self.out_size
        n = instance_feats.shape[0]

        # instance-wise semantic feats (ref :274-278)
        sem_t = nn.relu(
            nn.Conv(cin, (1, 1), dtype=self.dtype, name="semantic_transform_in")(semantic_feat)
        )
        ins_sem_feats = nn.relu(
            nn.Conv(cin, (1, 1), dtype=self.dtype, name="semantic_transform_out")(
                crop(sem_t, s)
            )
        )

        # instance mask logits at this stage (ref :281-284)
        inst_logits = nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32,
                              name="instance_logits")(instance_feats)
        if self.num_classes == 1:
            instance_preds = inst_logits[..., 0]
        else:
            lbl = jnp.zeros((n,), jnp.int32) if roi_labels is None else roi_labels
            instance_preds = jnp.take_along_axis(
                inst_logits, lbl[:, None, None, None], axis=-1
            )[..., 0]
        _ip = jax.nn.sigmoid(instance_preds) if self.mask_use_sigmoid else instance_preds
        inst_masks = resize_align_corners(_ip, s, s)[..., None].astype(self.dtype)

        # instance-wise semantic masks (ref :287-295)
        sp = jax.nn.sigmoid(semantic_pred) if self.mask_use_sigmoid else semantic_pred
        ins_sem_masks = crop(sp[..., None], s)
        ins_sem_masks = resize_align_corners(ins_sem_masks[..., 0], s, s)[..., None].astype(self.dtype)

        # fuse (ref :297-305)
        fused = jnp.concatenate(
            [instance_feats.astype(self.dtype), ins_sem_feats, inst_masks, ins_sem_masks],
            axis=-1,
        )
        fused = nn.relu(nn.Conv(cin, (1, 1), dtype=self.dtype, name="fuse_conv_in")(fused))
        fused = nn.relu(
            MultiBranchFusion(cin, self.dilations, dtype=self.dtype, name="fuse_mbf")(fused)
        )
        fused = nn.relu(
            nn.Conv(self.instance_out_channel - 2, (1, 1), dtype=self.dtype,
                    name="fuse_transform_out")(fused)
        )
        # 2x bilinear upsample (torch nn.Upsample default align_corners=False
        # = jax.image.resize 'bilinear' half-pixel centres), then ReLU
        fused = nn.relu(
            jax.image.resize(fused, (n, 2 * s, 2 * s, fused.shape[-1]), "bilinear")
        )
        # re-concat the mask channels at the upsampled size (ref :307-310)
        im2 = resize_align_corners(_ip, 2 * s, 2 * s)[..., None].astype(self.dtype)
        sm2 = resize_align_corners(ins_sem_masks[..., 0], 2 * s, 2 * s)[..., None].astype(self.dtype)
        fused = jnp.concatenate([fused, im2, sm2], axis=-1)
        return instance_preds, fused


class RefineMaskHead(nn.Module):
    """Instance tower + SFM stage stack + final logits (ref :315-455).

    Returns one logits map per supervision size ``stage_sup_size``
    (default (14, 28, 56, 112)); channels halve per stage from
    ``conv_dim``. The SemanticBranch lives with the caller (it also feeds
    the auxiliary semantic loss) and its outputs are passed in."""

    conv_dim: int = 256
    num_convs_instance: int = 2
    stage_sup_size: Tuple[int, ...] = (14, 28, 56, 112)
    stage_num_classes: Tuple[int, ...] = (1, 1, 1, 1)  # cls_agn (ref :355-356)
    mask_use_sigmoid: bool = True
    dilations: Tuple[int, ...] = (1, 3, 5)
    dtype: Any = jnp.float32

    @property
    def num_stages(self) -> int:
        return len(self.stage_sup_size) - 1

    @nn.compact
    def __call__(
        self,
        inst_feats: Array,  # (N, s0, s0, C) pooled ROI features
        semantic_feat: Array,  # (B, H, W, C) SemanticBranch features
        semantic_pred: Array,  # (B, H, W) SemanticBranch logits
        crop: Callable[[Array, int], Array],
        roi_labels: Optional[Array] = None,
    ) -> Tuple[Array, ...]:
        x = inst_feats
        for i in range(self.num_convs_instance):
            x = nn.Conv(self.conv_dim, (3, 3), padding=1, dtype=self.dtype,
                        name=f"instance_conv{i}")(x)
            x = nn.relu(x)

        outs = []
        ch = self.conv_dim
        for idx, s in enumerate(self.stage_sup_size[:-1]):
            preds, x = SFMStage(
                instance_in_channel=ch,
                instance_out_channel=ch // 2,
                out_size=s,
                num_classes=self.stage_num_classes[idx],
                mask_use_sigmoid=self.mask_use_sigmoid,
                dilations=self.dilations,
                dtype=self.dtype,
                name=f"stage{idx}",
            )(x, semantic_feat, semantic_pred, crop, roi_labels)
            outs.append(preds)
            ch //= 2
        final = nn.Conv(self.stage_num_classes[-1], (1, 1), dtype=jnp.float32,
                        name="final_instance_logits")(x)
        if self.stage_num_classes[-1] == 1:
            outs.append(final[..., 0])
        else:
            lbl = (jnp.zeros((x.shape[0],), jnp.int32) if roi_labels is None
                   else roi_labels)
            outs.append(jnp.take_along_axis(final, lbl[:, None, None, None], axis=-1)[..., 0])
        return tuple(outs)


# -- loss (ref RefineCrossEntropyLoss :79-143) -----------------------------


def _masked_mean(x: Array, m: Array) -> Array:
    return jnp.sum(jnp.where(m, x, 0.0)) / jnp.maximum(jnp.sum(m), 1.0)


def refine_cross_entropy(
    stage_logits: Sequence[Array],  # each (N, s_i, s_i)
    stage_targets: Sequence[Array],  # each (N, s_i, s_i) binary
    valid: Array,  # (N,) bool — padded-row mask (ref rows are all real)
    stage_weights: Sequence[float] = (0.25, 0.5, 0.75, 1.0),
    boundary_width: int = 2,
    start_stage: int = 1,
) -> Array:
    """Boundary-gated multi-stage BCE. Stages ≤ ``start_stage`` use plain
    mean BCE; later stages restrict the loss to the union of the previous
    composed prediction's and the previous target's boundary bands,
    upsampled with align_corners=True — exactly ref :93-139 (the weighted
    stage losses are SUMMED, not averaged)."""
    total = jnp.zeros((), jnp.float32)
    v1 = valid[:, None, None]
    pre_pred = None
    for idx, (lg, w) in enumerate(zip(stage_logits, stage_weights)):
        tgt = stage_targets[idx].astype(jnp.float32)
        s = lg.shape[-1]
        bce = optax_sigmoid_bce(lg.astype(jnp.float32), tgt)
        if idx <= start_stage:
            total = total + w * _masked_mean(bce, jnp.broadcast_to(v1, bce.shape))
            pre_pred = jax.nn.sigmoid(lg) >= 0.5
        else:
            pre = jax.lax.stop_gradient(pre_pred).astype(jnp.float32)
            pre_b = generate_block_target(pre, boundary_width) == 1
            tgt_b = generate_block_target(stage_targets[idx - 1].astype(jnp.float32),
                                          boundary_width) == 1
            region = (pre_b | tgt_b).astype(jnp.float32)
            region = resize_align_corners(region, s, s) >= 0.5
            region = region & jnp.broadcast_to(v1, region.shape)
            total = total + w * _masked_mean(bce, region)
            # compose the running prediction exactly like inference would
            # (ref :124-136): outside the width-1 boundary keep the coarser
            # stage's upsampled logits
            pre_b1 = generate_block_target(pre, 1) == 1
            pre_b1 = resize_align_corners(pre_b1.astype(jnp.float32), s, s) >= 0.5
            prev_up = resize_align_corners(
                jax.lax.stop_gradient(stage_logits[idx - 1]).astype(jnp.float32), s, s
            )
            cur = jax.lax.stop_gradient(lg).astype(jnp.float32)
            pre_pred = jax.nn.sigmoid(jnp.where(pre_b1, cur, prev_up)) >= 0.5
    return total


def compose_stage_preds(stage_logits: Sequence[Array]) -> Array:
    """Inference composition (ref :442-454): starting from the 28² stage,
    each finer stage keeps the coarser prediction's upsampled logits outside
    the coarser prediction's width-1 boundary band. Returns the final-size
    logits map."""
    preds = [lg.astype(jnp.float32) for lg in stage_logits[1:]]
    cur = preds[0]
    for nxt in preds[1:]:
        s = nxt.shape[-1]
        non_boundary = generate_block_target(
            (jax.nn.sigmoid(cur) >= 0.5).astype(jnp.float32), 1
        ) != 1
        non_boundary = resize_align_corners(non_boundary.astype(jnp.float32), s, s) >= 0.5
        cur_up = resize_align_corners(cur, s, s)
        cur = jnp.where(non_boundary, cur_up, nxt)
    return cur


def boundary_weight_map(target: Array, width: int = 1, weight: float = 2.0) -> Array:
    """(…, S, S) binary target → per-pixel weights with boundary pixels
    upweighted (kept for callers outside the staged loss)."""
    t = target[..., None]
    k = 2 * width + 1
    dil = nn.max_pool(t, (k, k), strides=(1, 1), padding="SAME")
    ero = -nn.max_pool(-t, (k, k), strides=(1, 1), padding="SAME")
    boundary = (dil - ero)[..., 0] > 0.5
    return jnp.where(boundary, weight, 1.0)
