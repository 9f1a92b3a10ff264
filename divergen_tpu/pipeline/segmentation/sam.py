"""SAM (Segment Anything) in flax: image encoder + prompt encoder + mask
decoder, one jitted predict graph.

Counterpart of the external ``segment-anything`` models the reference
drives (``DiverGen/segmentation/get_background_sam_mask.py:9,67-69,163-167``:
``build_sam`` ViT-H, ``SamPredictor.set_image/predict``). Architecture facts
follow the public SAM definition: ViTDet-style plain ViT (windowed attention
size 14 with 4 global layers, decomposed relative position embeddings),
256-channel neck; prompt encoder with random-fourier positional encoding and
learned point-type embeddings; two-way transformer decoder emitting 3
ranked masks + IoU scores. TPU redesign: ``set_image``+``predict`` fuse
into a single jitted call on a batch of images; 64x64x256 embeddings stay
on device between prompts.
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

# ---------------- image encoder (ViTDet) ----------------
# attention/window blocks are shared with the detection ViT backbone
from ...modeling.backbone.vit import (  # noqa: E402
    ViTAttention,
    ViTBlock,
    window_partition,
    window_unpartition,
)


class SAMImageEncoder(nn.Module):
    img_size: int = 1024
    patch: int = 16
    dim: int = 1280  # ViT-H
    layers: int = 32
    heads: int = 16
    window: int = 14
    global_layers: Tuple[int, ...] = (7, 15, 23, 31)
    out_channels: int = 256
    dtype: Any = jnp.float32
    ln_gemm: bool = False  # fold block LNs into consuming GEMMs (ViTBlock)
    flash_attn: bool = False  # rel-pos flash on global layers (inference)

    @nn.compact
    def __call__(self, x: Array) -> Array:  # (B, S, S, 3) normalized
        x = nn.Conv(self.dim, (self.patch, self.patch), strides=(self.patch, self.patch),
                    dtype=self.dtype, name="patch_embed")(x.astype(self.dtype))
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (self.img_size // self.patch, self.img_size // self.patch, self.dim),
        )
        x = x + pos[None, : x.shape[1], : x.shape[2]].astype(x.dtype)
        for i in range(self.layers):
            win = 0 if i in self.global_layers else self.window
            x = ViTBlock(self.dim, self.heads, win, self.dtype,
                         ln_gemm=self.ln_gemm, flash_attn=self.flash_attn,
                         name=f"block{i}")(x)
        # neck: 1x1 → LN → 3x3 → LN, 256 ch
        x = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype, name="neck_conv1")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="neck_ln1")(x)
        x = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False, dtype=self.dtype, name="neck_conv2")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="neck_ln2")(x)
        return x  # (B, S/16, S/16, 256)


# ---------------- prompt encoder ----------------
class PromptEncoder(nn.Module):
    embed_dim: int = 256
    img_size: int = 1024

    @nn.compact
    def __call__(self, points: Array, labels: Array) -> Tuple[Array, Array]:
        """points (B, P, 2) xy pixels; labels (B, P) 1=fg, 0=bg, -1=pad.
        Returns (sparse (B, P+1, C), pe_gaussian matrix param use)."""
        scale = 1.0
        pe = self.param(
            "pe_gaussian", nn.initializers.normal(scale), (2, self.embed_dim // 2)
        )
        coords = points / self.img_size  # 0..1
        proj = (2.0 * coords - 1.0) @ pe * (2.0 * math.pi)
        emb = jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
        fg = self.param("point_fg", nn.initializers.normal(1.0), (self.embed_dim,))
        bg = self.param("point_bg", nn.initializers.normal(1.0), (self.embed_dim,))
        pad = self.param("not_a_point", nn.initializers.normal(1.0), (self.embed_dim,))
        type_emb = jnp.where(
            (labels == 1)[..., None], fg,
            jnp.where((labels == 0)[..., None], bg, pad),
        )
        emb = jnp.where((labels < 0)[..., None], pad, emb + type_emb)
        # dense embedding used when no mask prompt is given (the reference
        # broadcasts ``no_mask_embed`` over the image grid,
        # prompt_encoder.py _get_dense_embeddings)
        no_mask = self.param(
            "no_mask_embed", nn.initializers.normal(1.0), (self.embed_dim,)
        )
        return emb, no_mask

    def dense_pe(self, hw: Tuple[int, int]) -> Array:
        """Positional encoding over the embedding grid (C, h, w → h,w,C)."""
        pe = self.get_variable("params", "pe_gaussian")
        h, w = hw
        ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
        xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        grid = jnp.stack(jnp.meshgrid(ys, xs, indexing="ij"), axis=-1)  # (h,w,2) [y,x]
        coords = grid[..., ::-1]  # xy
        proj = (2.0 * coords - 1.0) @ pe * (2.0 * math.pi)
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


# ---------------- mask decoder ----------------
class TwoWayAttention(nn.Module):
    dim: int
    heads: int
    downsample: int = 1

    @nn.compact
    def __call__(self, q: Array, k: Array, v: Array) -> Array:
        d_model = self.dim // self.downsample
        d = d_model // self.heads
        b, nq, _ = q.shape
        nk = k.shape[1]
        qq = nn.Dense(d_model, name="q")(q).reshape(b, nq, self.heads, d)
        kk = nn.Dense(d_model, name="k")(k).reshape(b, nk, self.heads, d)
        vv = nn.Dense(d_model, name="v")(v).reshape(b, nk, self.heads, d)
        attn = jnp.einsum("bnhd,bmhd->bhnm", qq * d**-0.5, kk, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, vv).reshape(b, nq, d_model)
        return nn.Dense(self.dim, name="out")(out)


class TwoWayBlock(nn.Module):
    dim: int = 256
    heads: int = 8

    @nn.compact
    def __call__(self, tokens: Array, image: Array, token_pe: Array, image_pe: Array,
                 first: bool = False):
        # first block skips the PE AND the residual on self-attention
        # (segment-anything TwoWayAttentionBlock.skip_first_layer_pe)
        if first:
            tokens = nn.LayerNorm(name="ln1")(
                TwoWayAttention(self.dim, self.heads, name="self_attn")(tokens, tokens, tokens)
            )
        else:
            q = tokens + token_pe
            tokens = nn.LayerNorm(name="ln1")(
                tokens + TwoWayAttention(self.dim, self.heads, name="self_attn")(q, q, tokens)
            )
        q = tokens + token_pe
        k = image + image_pe
        tokens = nn.LayerNorm(name="ln2")(
            tokens + TwoWayAttention(self.dim, self.heads, 2, name="t2i")(q, k, image)
        )
        y = nn.Dense(2048, name="mlp1")(tokens)
        tokens = nn.LayerNorm(name="ln3")(tokens + nn.Dense(self.dim, name="mlp2")(nn.relu(y)))
        q = tokens + token_pe
        image = nn.LayerNorm(name="ln4")(
            image + TwoWayAttention(self.dim, self.heads, 2, name="i2t")(k, q, tokens)
        )
        return tokens, image


class MaskDecoder(nn.Module):
    dim: int = 256
    num_masks: int = 3  # multimask outputs returned (token slots 1..3)
    num_mask_tokens: int = 4  # SAM: 1 single-mask + 3 multimask tokens
    depth: int = 2

    @nn.compact
    def __call__(self, image_emb: Array, image_pe: Array, sparse: Array,
                 dense: Optional[Array] = None):
        """image_emb (B,h,w,C); image_pe (h,w,C); sparse (B,P,C); dense
        optional (C,) or (B,h,w,C) prompt added to the image embedding
        (the reference adds no_mask_embed when no mask prompt is given).
        Returns the MULTIMASK outputs (masks (B,3,4h,4w), iou (B,3)) —
        SAM's mask-token slots 1..3 of [iou, mask0..mask3]."""
        b, h, w, c = image_emb.shape
        if dense is not None:
            image_emb = image_emb + dense.reshape((1,) * (4 - dense.ndim) + dense.shape)
        n_tok = 1 + self.num_mask_tokens  # iou + 4 mask tokens
        tok = self.param("output_tokens", nn.initializers.normal(1.0), (n_tok, self.dim))
        tokens = jnp.concatenate(
            [jnp.broadcast_to(tok, (b, n_tok, self.dim)), sparse], axis=1
        )
        token_pe = tokens  # SAM uses the original tokens as their own PE
        image = image_emb.reshape(b, h * w, c)
        pe = jnp.broadcast_to(image_pe.reshape(1, h * w, c), (b, h * w, c))
        for i in range(self.depth):
            tokens, image = TwoWayBlock(self.dim, name=f"block{i}")(
                tokens, image, token_pe, pe, first=(i == 0)
            )
        # final token→image attention
        q = tokens + token_pe
        tokens = nn.LayerNorm(name="ln_final")(
            tokens + TwoWayAttention(self.dim, 8, 2, name="final_t2i")(q, image + pe, image)
        )
        iou_token = tokens[:, 0]
        # multimask output = mask-token slots 1..3 (segment-anything
        # mask_decoder.py predict_masks + multimask_output slicing)
        first_slot = 1 if self.num_mask_tokens > self.num_masks else 0
        mask_tokens = tokens[:, 1 + first_slot : 1 + first_slot + self.num_masks]
        img = image.reshape(b, h, w, c)
        img = nn.ConvTranspose(self.dim // 4, (2, 2), strides=(2, 2), name="up1")(img)
        img = nn.gelu(nn.LayerNorm(name="up_ln")(img), approximate=False)
        img = nn.ConvTranspose(self.dim // 8, (2, 2), strides=(2, 2), name="up2")(img)
        img = nn.gelu(img, approximate=False)  # (B, 4h, 4w, C/8)
        hyper = []
        for m in range(self.num_masks):
            y = mask_tokens[:, m]
            # hypernetwork index = absolute token slot, so converted
            # checkpoints map output_hypernetworks_mlps.<slot> directly
            slot = first_slot + m
            for j in range(3):
                y = nn.Dense(
                    self.dim // 8 if j == 2 else self.dim, name=f"hyper{slot}_fc{j}"
                )(y if j == 0 else nn.relu(y))
            hyper.append(y)
        hyper = jnp.stack(hyper, axis=1)  # (B, 3, C/8)
        masks = jnp.einsum("bmc,bhwc->bmhw", hyper, img)
        iou = iou_token
        for j in range(3):
            iou = nn.Dense(
                self.num_mask_tokens if j == 2 else self.dim, name=f"iou_fc{j}"
            )(iou if j == 0 else nn.relu(iou))
        return masks, iou[:, first_slot : first_slot + self.num_masks]


class SAM(nn.Module):
    """Full promptable segmentation model; one call = set_image + predict."""

    encoder: SAMImageEncoder
    pixel_mean: Tuple[float, ...] = (123.675, 116.28, 103.53)
    pixel_std: Tuple[float, ...] = (58.395, 57.12, 57.375)

    def setup(self):
        self.prompt = PromptEncoder(img_size=self.encoder.img_size, name="prompt")
        self.decoder = MaskDecoder(name="decoder")

    def __call__(self, images: Array, points: Array, labels: Array):
        """images (B,S,S,3) RGB 0..255; points (B,P,2) xy; labels (B,P).
        Returns (mask_logits (B,3,S/4,S/4), iou (B,3))."""
        mean = jnp.asarray(self.pixel_mean)
        std = jnp.asarray(self.pixel_std)
        emb = self.encoder((images - mean) / std)
        sparse, dense = self.prompt(points, labels)
        pe = self.prompt.dense_pe(emb.shape[1:3])
        return self.decoder(emb, pe, sparse, dense)

    @classmethod
    def vit_h(cls, dtype=jnp.float32, ln_gemm: bool = False,
              flash_attn: bool = False) -> "SAM":
        return cls(encoder=SAMImageEncoder(dtype=dtype, ln_gemm=ln_gemm,
                                           flash_attn=flash_attn))

    @classmethod
    def vit_b(cls, dtype=jnp.float32, ln_gemm: bool = False) -> "SAM":
        return cls(
            encoder=SAMImageEncoder(dim=768, layers=12, heads=12, global_layers=(2, 5, 8, 11),
                                    dtype=dtype, ln_gemm=ln_gemm)
        )

    @classmethod
    def tiny(cls, img_size: int = 64) -> "SAM":
        return cls(
            encoder=SAMImageEncoder(
                img_size=img_size, dim=32, layers=2, heads=2, window=4, global_layers=(1,)
            )
        )


def upscale_masks(mask_logits: Array, out_size: int) -> Array:
    """S/4 logits → image-size logits (SAM postprocess bilinear)."""
    b, m, h, w = mask_logits.shape
    x = mask_logits.transpose(0, 2, 3, 1)
    x = jax.image.resize(x, (b, out_size, out_size, m), "bilinear")
    return x.transpose(0, 3, 1, 2)
