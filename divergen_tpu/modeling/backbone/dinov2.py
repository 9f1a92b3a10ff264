"""DINOv2 vision transformer (flax) — optional filtration feature extractor.

Counterpart of the reference's ``torch.hub`` DINOv2 option in
``DiverGen/filteration/get_image_feature.py:34-53`` (dinov2_vitg14 embeddings
as an alternative to CLIP for instance similarity). Architecture facts follow
the public DINOv2 ViT definition: patch 14, cls token, learned pos-embed,
LayerScale residual branches, and (for the giant model) a fused-SwiGLU FFN.
The embedding is the final-norm cls token.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

_SIZES = {
    # dim, depth, heads, swiglu
    "vits14": (384, 12, 6, False),
    "vitb14": (768, 12, 12, False),
    "vitl14": (1024, 24, 16, False),
    "vitg14": (1536, 40, 24, True),
}


class _Attention(nn.Module):
    dim: int
    heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, n, c = x.shape
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(b, n, 3, self.heads, c // self.heads), 3, axis=2)
        q, k, v = (t[:, :, 0].transpose(0, 2, 1, 3) for t in (q, k, v))
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        s = s / jnp.sqrt(c // self.heads)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v).transpose(0, 2, 1, 3).reshape(b, n, c)
        return nn.Dense(c, dtype=self.dtype, name="proj")(o)


class _Block(nn.Module):
    dim: int
    heads: int
    swiglu: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        ls1 = self.param("ls1", nn.initializers.constant(1e-5), (self.dim,))
        ls2 = self.param("ls2", nn.initializers.constant(1e-5), (self.dim,))
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = x + ls1 * _Attention(self.dim, self.heads, self.dtype, name="attn")(y)
        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        if self.swiglu:
            # SwiGLUFFNFused: hidden = 2/3 * 4 * dim, rounded to 8
            hidden = (int(self.dim * 4 * 2 / 3) + 7) // 8 * 8
            w12 = nn.Dense(2 * hidden, dtype=self.dtype, name="w12")(y)
            a, b = jnp.split(w12, 2, axis=-1)
            h = nn.silu(a) * b
            mlp = nn.Dense(self.dim, dtype=self.dtype, name="w3")(h)
        else:
            h = nn.Dense(4 * self.dim, dtype=self.dtype, name="fc1")(y)
            mlp = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(nn.gelu(h, approximate=False))
        return x + ls2 * mlp


class DinoV2(nn.Module):
    """DINOv2 ViT; ``__call__`` returns the normalized cls-token embedding."""

    dim: int = 1536
    depth: int = 40
    heads: int = 24
    swiglu: bool = True
    patch: int = 14
    dtype: Any = jnp.float32

    @classmethod
    def from_name(cls, name: str = "vitg14", **kw) -> "DinoV2":
        dim, depth, heads, swiglu = _SIZES[name.replace("dinov2_", "")]
        return cls(dim=dim, depth=depth, heads=heads, swiglu=swiglu, **kw)

    @nn.compact
    def __call__(self, images: Array) -> Array:  # (B, H, W, 3) normalized
        b, h, w, _ = images.shape
        x = nn.Conv(
            self.dim, (self.patch, self.patch), strides=(self.patch, self.patch),
            dtype=self.dtype, name="patch_embed",
        )(images.astype(self.dtype))
        gh, gw = x.shape[1], x.shape[2]
        x = x.reshape(b, gh * gw, self.dim)
        cls = self.param("cls_token", nn.initializers.normal(0.02), (1, 1, self.dim))
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02), (1, gh * gw + 1, self.dim)
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)).astype(x.dtype), x], 1)
        x = x + pos.astype(x.dtype)
        for i in range(self.depth):
            x = _Block(self.dim, self.heads, self.swiglu, self.dtype, name=f"block{i}")(x)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return x[:, 0].astype(jnp.float32)  # cls token


def dinov2_preprocess(images: Array) -> Array:
    """ImageNet normalization on 0..255 RGB (the reference's torchvision
    Compose, get_image_feature.py:46-51; resize/crop happens host-side)."""
    mean = jnp.asarray([0.485, 0.456, 0.406]) * 255.0
    std = jnp.asarray([0.229, 0.224, 0.225]) * 255.0
    return (images - mean) / std
