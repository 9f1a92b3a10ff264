"""Plain-ViT detection backbone (ViTDet) + SimpleFeaturePyramid.

Counterpart of ``DiverGen/divergen/modeling/backbone/vit.py:236-486`` and
``backbone/utils.py`` (windowed + global attention blocks with decomposed
relative positions, single-scale ViT output fanned into a pyramid by
stride-2 convs/deconvs). The same blocks power the SAM image encoder
(pipeline/segmentation/sam.py imports from here).
"""
from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array


def _rel_pos_bias(q_hw: int, k_hw: int, rel_pos: Array) -> Array:
    """Decomposed 1D relative position table lookup, (q, k, C)."""
    coords_q = jnp.arange(q_hw)[:, None]
    coords_k = jnp.arange(k_hw)[None, :]
    rel = coords_q - coords_k + (k_hw - 1)
    return rel_pos[rel]


class _LNParams(nn.Module):
    """Param-holder matching nn.LayerNorm's tree (<name>/{scale,bias})."""

    @nn.compact
    def __call__(self, c: int):
        return (
            self.param("scale", nn.initializers.ones_init(), (c,)),
            self.param("bias", nn.initializers.zeros_init(), (c,)),
        )


class _DenseParams(nn.Module):
    """Param-holder matching nn.Dense's tree (<name>/{kernel,bias})."""

    features: int

    @nn.compact
    def __call__(self, cin: int):
        return (
            self.param("kernel", nn.initializers.lecun_normal(), (cin, self.features)),
            self.param("bias", nn.initializers.zeros_init(), (self.features,)),
        )


class ViTAttention(nn.Module):
    dim: int
    heads: int
    use_rel_pos: bool = True
    input_hw: Tuple[int, int] = (14, 14)
    dtype: Any = jnp.float32
    # fused flash path for GLOBAL layers (ops/pallas/flash_attention.py
    # flash_attention_relpos): the (BH, N, N) scores + decomposed-rel-pos
    # bias never hit HBM (~1 GB/layer at 64x64 tokens in the XLA path).
    # Forward-only — SAM inference; training backbones keep XLA.
    flash_relpos: bool = False

    @nn.compact
    def __call__(self, x: Array, pre_ln=None) -> Array:  # (B, H, W, C)
        b, h, w, c = x.shape
        d = self.dim // self.heads
        if pre_ln is not None:
            # x is the RAW block input; the preceding LayerNorm (params
            # owned by the caller's norm1 scope) folds into the qkv GEMM
            # (ops/pallas/ln_matmul.py) so the normalized activation never
            # hits HBM. Only used where no window padding sits between the
            # norm and the projection (global-attention layers).
            from ...ops.pallas.ln_matmul import fused_ln_matmul

            ln_scale, ln_bias = pre_ln
            kern, qbias = _DenseParams(3 * self.dim, name="qkv")(c)
            qkv = fused_ln_matmul(
                x.reshape(b * h * w, c), kern.astype(self.dtype),
                ln_scale, ln_bias, 1e-6, qbias,
            ).reshape(b, h, w, 3 * self.dim)
        else:
            qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(b, h * w, 3, self.heads, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        if self.use_rel_pos:
            rel_h = self.param("rel_pos_h", nn.initializers.zeros, (2 * h - 1, d))
            rel_w = self.param("rel_pos_w", nn.initializers.zeros, (2 * w - 1, d))
            rh = _rel_pos_bias(h, h, rel_h)
            rw = _rel_pos_bias(w, w, rel_w)
            qr = q.reshape(b, h, w, self.heads, d)
        if self.use_rel_pos and self.flash_relpos:
            from ...ops.pallas.flash_attention import flash_attention_relpos

            # (BH, u|v, N) bias factors — the only rel-pos tensors that ever
            # hit HBM; the (N, N) expansion happens per-tile in VMEM
            bh_t = jnp.einsum("byxhd,yud->bhuyx", qr, rh).reshape(
                b * self.heads, h, h * w).astype(jnp.float32)
            bw_t = jnp.einsum("byxhd,xvd->bhvyx", qr, rw).reshape(
                b * self.heads, w, h * w).astype(jnp.float32)
            perm = lambda t: t.transpose(0, 2, 1, 3).reshape(b * self.heads, h * w, d)
            out = flash_attention_relpos(
                perm(q), perm(k), perm(v), bh_t, bw_t, (h, w)
            )
            out = out.reshape(b, self.heads, h * w, d).transpose(0, 2, 1, 3)
            return nn.Dense(self.dim, dtype=self.dtype, name="proj")(
                out.reshape(b, h, w, c).astype(self.dtype))
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * d**-0.5, k, preferred_element_type=jnp.float32)
        if self.use_rel_pos:
            bias_h = jnp.einsum("byxhd,yud->bhyxu", qr, rh)
            bias_w = jnp.einsum("byxhd,xvd->bhyxv", qr, rw)
            bias = bias_h[..., :, None] + bias_w[..., None, :]
            attn = attn + bias.reshape(b, self.heads, h * w, h * w).astype(attn.dtype)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v.astype(self.dtype))
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out.reshape(b, h, w, c))


def window_partition(x: Array, ws: int):
    b, h, w, c = x.shape
    ph, pw = (ws - h % ws) % ws, (ws - w % ws) % ws
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hp, wp = h + ph, w + pw
    x = x.reshape(b, hp // ws, ws, wp // ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws, ws, c), (hp, wp)


def window_unpartition(x: Array, ws: int, hw_pad: Tuple[int, int], hw: Tuple[int, int]):
    hp, wp = hw_pad
    h, w = hw
    b = x.shape[0] // ((hp // ws) * (wp // ws))
    x = x.reshape(b, hp // ws, wp // ws, ws, ws, -1).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, hp, wp, -1)[:, :h, :w]


class ViTBlock(nn.Module):
    dim: int
    heads: int
    window: int = 0  # 0 = global attention
    dtype: Any = jnp.float32
    # fold LayerNorms into their consuming GEMMs (ops/pallas/ln_matmul.py):
    # norm2 -> mlp_fc1 (+ in-kernel exact GELU) on every layer; norm1 -> qkv
    # on GLOBAL layers only — window layers pad zeros AFTER norm1 (reference
    # semantics: segment-anything image_encoder Block.forward pads the
    # normalized tensor), so the norm can't move past the partition there.
    ln_gemm: bool = False
    flash_attn: bool = False  # fused rel-pos flash on global layers (fwd-only)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        if self.window > 0:
            y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
            yw, hw_pad = window_partition(y, self.window)
            yw = ViTAttention(
                self.dim, self.heads, input_hw=(self.window, self.window),
                dtype=self.dtype, name="attn",
            )(yw)
            y = window_unpartition(yw, self.window, hw_pad, (h, w))
        elif self.ln_gemm:
            ln1 = _LNParams(name="norm1")(c)
            y = ViTAttention(self.dim, self.heads, input_hw=(h, w),
                             dtype=self.dtype, flash_relpos=self.flash_attn,
                             name="attn")(x, pre_ln=ln1)
        else:
            y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
            y = ViTAttention(self.dim, self.heads, input_hw=(h, w), dtype=self.dtype,
                             flash_relpos=self.flash_attn, name="attn")(y)
        x = x + y
        if self.ln_gemm:
            from ...ops.pallas.ln_matmul import fused_ln_matmul

            s2, b2 = _LNParams(name="norm2")(c)
            k1, fb1 = _DenseParams(4 * self.dim, name="mlp_fc1")(c)
            y = fused_ln_matmul(
                x.reshape(b * h * w, c), k1.astype(self.dtype),
                s2, b2, 1e-6, fb1, act="gelu",
            ).reshape(b, h, w, 4 * self.dim)
        else:
            y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
            y = nn.Dense(4 * self.dim, dtype=self.dtype, name="mlp_fc1")(y)
            y = nn.gelu(y, approximate=False)
        return x + nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)


class ViT(nn.Module):
    """ViTDet trunk: stride-16 single-scale feature."""

    patch: int = 16
    dim: int = 768  # ViT-B
    layers: int = 12
    heads: int = 12
    window: int = 14
    global_layers: Tuple[int, ...] = (2, 5, 8, 11)
    dtype: Any = jnp.float32
    ln_gemm: bool = False  # fold LNs into consuming GEMMs (ViTBlock)
    flash_attn: bool = False  # fused rel-pos flash on global layers (fwd-only)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.Conv(self.dim, (self.patch, self.patch), strides=(self.patch, self.patch),
                    dtype=self.dtype, name="patch_embed")(x.astype(self.dtype))
        h, w = x.shape[1], x.shape[2]
        pos = self.param("pos_embed", nn.initializers.normal(0.02), (64, 64, self.dim))
        x = x + pos[None, :h, :w].astype(x.dtype)
        for i in range(self.layers):
            win = 0 if i in self.global_layers else self.window
            x = ViTBlock(self.dim, self.heads, win, self.dtype,
                         ln_gemm=self.ln_gemm, flash_attn=self.flash_attn,
                         name=f"block{i}")(x)
        return x  # (B, H/16, W/16, C)


class SimpleFeaturePyramid(nn.Module):
    """ViTDet SFP: one stride-16 map → strides 4/8/16/32 via deconv/conv."""

    out_channels: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        outs = {}

        def norm_convs(y, name):
            y = nn.Conv(self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"{name}_lateral")(y)
            y = nn.LayerNorm(dtype=self.dtype, name=f"{name}_ln1")(y)
            y = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False,
                        dtype=self.dtype, name=f"{name}_out")(y)
            return nn.LayerNorm(dtype=self.dtype, name=f"{name}_ln2")(y)

        c = x.shape[-1]
        up4 = nn.ConvTranspose(c // 2, (2, 2), strides=(2, 2), dtype=self.dtype, name="up4_1")(x)
        up4 = nn.gelu(nn.LayerNorm(dtype=self.dtype, name="up4_ln")(up4), approximate=False)
        up4 = nn.ConvTranspose(c // 4, (2, 2), strides=(2, 2), dtype=self.dtype, name="up4_2")(up4)
        outs["p2"] = norm_convs(up4, "p2")
        up8 = nn.ConvTranspose(c // 2, (2, 2), strides=(2, 2), dtype=self.dtype, name="up8")(x)
        outs["p3"] = norm_convs(up8, "p3")
        outs["p4"] = norm_convs(x, "p4")
        dn = nn.max_pool(x, (2, 2), strides=(2, 2))
        outs["p5"] = norm_convs(dn, "p5")
        outs["p6"] = nn.max_pool(outs["p5"], (1, 1), strides=(2, 2))
        outs["p7"] = nn.max_pool(outs["p6"], (1, 1), strides=(2, 2))
        return outs


class ViTDet(nn.Module):
    """ViT trunk + SFP, drop-in for the FPN-backbone interface (emits
    p2..p7 dict directly — bypasses the lateral FPN)."""

    vit: ViT
    out_channels: int = 256

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        feats = self.vit(x)
        return SimpleFeaturePyramid(self.out_channels, dtype=self.vit.dtype, name="sfp")(feats)
