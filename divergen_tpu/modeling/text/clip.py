"""CLIP text + vision towers, flax (single fused XLA graph each).

Counterpart of ``DiverGen/divergen/modeling/text/text_encoder.py:17-188``
(from-scratch CLIPTEXT transformer used for zero-shot classifier weights /
caption loss) and of the external ``clip.load("ViT-L/14")`` towers the
filtration stage drives (``filteration/get_image_feature.py:30-33``,
``get_clip_score.py:69-72``). Architecture facts (QuickGELU, pre-LN
residual blocks, causal text mask, argmax-EOT pooling, cls-token vision
pooling, patch-conv without bias) follow the public CLIP model definition;
weights load from torch checkpoints via utils/torch_weights.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


def quick_gelu(x: Array) -> Array:
    return x * jax.nn.sigmoid(1.702 * x)


class MultiHeadAttention(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None) -> Array:
        b, n, c = x.shape
        d = self.width // self.heads
        qkv = nn.Dense(3 * self.width, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, self.heads, d)
        k = k.reshape(b, n, self.heads, d)
        v = v.reshape(b, n, self.heads, d)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * (d**-0.5), k, preferred_element_type=jnp.float32)
        if mask is not None:
            attn = attn + mask.astype(attn.dtype)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
        return nn.Dense(self.width, dtype=self.dtype, name="out_proj")(out)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    dtype: Any = jnp.float32
    act: str = "quick_gelu"  # openai CLIP; "gelu" = OpenCLIP bigG (SDXL tower 2)

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None) -> Array:
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_1")(x)
        x = x + MultiHeadAttention(self.width, self.heads, self.dtype, name="attn")(y, mask)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_2")(x)
        y = nn.Dense(4 * self.width, dtype=self.dtype, name="mlp_c_fc")(y)
        y = quick_gelu(y) if self.act == "quick_gelu" else jax.nn.gelu(y, approximate=False)
        return x + nn.Dense(self.width, dtype=self.dtype, name="mlp_c_proj")(y)


class CLIPText(nn.Module):
    """Causal text transformer; returns the projected EOT embedding."""

    embed_dim: int = 768
    context_length: int = 77
    vocab_size: int = 49408
    width: int = 768
    heads: int = 12
    layers: int = 12
    dtype: Any = jnp.float32
    act: str = "quick_gelu"

    @nn.compact
    def __call__(self, tokens: Array, return_sequence: bool = False,
                 penultimate: bool = False):  # (B, L) int32
        """Default: projected EOT embedding (B, embed_dim). With
        ``return_sequence``: also the hidden-state sequence — final-LN output,
        or the penultimate layer's raw states (``penultimate=True``, the SDXL
        conditioning convention)."""
        b, l = tokens.shape
        emb = nn.Embed(self.vocab_size, self.width, dtype=self.dtype, name="token_embedding")(
            tokens
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = emb + pos[None, :l].astype(emb.dtype)
        mask = jnp.triu(jnp.full((l, l), -1e9, jnp.float32), k=1)[None, None]
        hidden = None
        for i in range(self.layers):
            if i == self.layers - 1:
                hidden = x  # penultimate hidden states
            x = ResidualAttentionBlock(
                self.width, self.heads, self.dtype, act=self.act, name=f"resblock{i}"
            )(x, mask)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_final")(x)
        proj = self.param(
            "text_projection", nn.initializers.normal(self.width**-0.5),
            (self.width, self.embed_dim),
        )
        # pool at the EOT token = argmax token id (CLIP convention)
        eot = jnp.argmax(tokens, axis=-1)
        pooled = x[jnp.arange(b), eot] @ proj.astype(x.dtype)
        if return_sequence:
            return pooled, (hidden if penultimate else x)
        return pooled


class CLIPVision(nn.Module):
    """ViT tower with cls-token pooling and output projection."""

    embed_dim: int = 768
    image_size: int = 224
    patch: int = 14
    width: int = 1024
    heads: int = 16
    layers: int = 24
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: Array) -> Array:  # (B,H,W,3) normalized
        b = images.shape[0]
        x = nn.Conv(
            self.width, (self.patch, self.patch), strides=(self.patch, self.patch),
            use_bias=False, dtype=self.dtype, name="conv1",
        )(images.astype(self.dtype))
        x = x.reshape(b, -1, self.width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02), (self.width,))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.width)).astype(x.dtype), x], 1)
        n_pos = (self.image_size // self.patch) ** 2 + 1
        pos = self.param("positional_embedding", nn.initializers.normal(0.02), (n_pos, self.width))
        x = x + pos[None, : x.shape[1]].astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")(x)
        for i in range(self.layers):
            x = ResidualAttentionBlock(self.width, self.heads, self.dtype, name=f"resblock{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(x[:, 0])
        proj = self.param(
            "proj", nn.initializers.normal(self.width**-0.5), (self.width, self.embed_dim)
        )
        return x @ proj.astype(x.dtype)


CLIP_CONFIGS = {
    # embed_dim, vision(width, layers, heads, patch), text(width, layers, heads)
    "ViT-B/32": (512, (768, 12, 12, 32), (512, 12, 8)),
    "ViT-B/16": (512, (768, 12, 12, 16), (512, 12, 8)),
    "ViT-L/14": (768, (1024, 24, 16, 14), (768, 12, 12)),
}

CLIP_PIXEL_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_PIXEL_STD = (0.26862954, 0.26130258, 0.27577711)


def build_clip(name: str = "ViT-L/14", image_size: int = 224, dtype=jnp.float32
               ) -> Tuple[CLIPVision, CLIPText]:
    embed, (vw, vl, vh, vp), (tw, tl, th) = CLIP_CONFIGS[name]
    vision = CLIPVision(
        embed_dim=embed, image_size=image_size, patch=vp, width=vw, heads=vh,
        layers=vl, dtype=dtype,
    )
    text = CLIPText(embed_dim=embed, width=tw, heads=th, layers=tl, dtype=dtype)
    return vision, text


def build_sdxl_text_towers(dtype=jnp.float32) -> Tuple[CLIPText, CLIPText]:
    """The two SDXL conditioning towers (reference generation stage:
    ``txt2img_diffusers_stages_from_txt.py:242`` ``encode_prompt``):
    CLIP ViT-L/14 text (768-wide, QuickGELU) and OpenCLIP ViT-bigG/14 text
    (1280-wide, exact GELU, 1280-d projection). SDXL conditions on the
    concatenated PENULTIMATE hidden states (768+1280=2048) and on bigG's
    projected EOT embedding (1280) for the pooled add-embedding."""
    clip_l = CLIPText(embed_dim=768, width=768, heads=12, layers=12, dtype=dtype)
    big_g = CLIPText(
        embed_dim=1280, width=1280, heads=20, layers=32, dtype=dtype, act="gelu"
    )
    return clip_l, big_g


def preprocess_images(images: Array) -> Array:
    """uint8/float RGB 0..255 (B,H,W,3) → CLIP-normalized float."""
    x = images.astype(jnp.float32) / 255.0
    mean = jnp.asarray(CLIP_PIXEL_MEAN)
    std = jnp.asarray(CLIP_PIXEL_STD)
    return (x - mean) / std


def normalize(v: Array, axis: int = -1) -> Array:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), 1e-8)
