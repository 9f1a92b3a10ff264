"""Swin Transformer backbone, NHWC flax, TPU-static shapes.

Counterpart of ``DiverGen/divergen/modeling/backbone/swintransformer.py:28-749``
(window attention w/ relative position bias, shifted windows, patch merging,
size2config map at :636-693). Differences by design:

- NHWC layout end to end; window partition is pure reshape/transpose so XLA
  keeps everything fused and MXU-shaped.
- The shifted-window attention mask and the relative-position index are
  computed at trace time from static shapes (numpy), so there is no dynamic
  control flow inside jit.
- cyclic shift uses ``jnp.roll`` (an XLA collective-free rotate) instead of
  the reference's ``torch.roll``.
- stochastic depth (DropPath) is gated by ``deterministic``; training threads
  a 'dropout' rng collection.

Stage outputs are named ``s2..s5`` (strides 4/8/16/32), mirroring the
reference's ``swin0..swin3`` / ``OUT_FEATURES`` indices.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

SIZE2CONFIG = {
    # embed_dim, depths, num_heads, window, drop_path_rate
    # (swintransformer.py:636-693)
    "T": (96, (2, 2, 6, 2), (3, 6, 12, 24), 7, 0.2),
    "S": (96, (2, 2, 18, 2), (3, 6, 12, 24), 7, 0.2),
    "B": (128, (2, 2, 18, 2), (4, 8, 16, 32), 7, 0.3),
    "B-22k": (128, (2, 2, 18, 2), (4, 8, 16, 32), 7, 0.3),
    "B-22k-384": (128, (2, 2, 18, 2), (4, 8, 16, 32), 12, 0.3),
    "L-22k": (192, (2, 2, 18, 2), (6, 12, 24, 48), 7, 0.3),
    "L-22k-384": (192, (2, 2, 18, 2), (6, 12, 24, 48), 12, 0.3),
}


@functools.lru_cache(maxsize=None)
def _relative_position_index(window: int) -> np.ndarray:
    """(W*W, W*W) int index into the (2W-1)^2 bias table
    (swintransformer.py:106-115 semantics)."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # 2, W*W, W*W
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return (rel[:, :, 0] * (2 * window - 1) + rel[:, :, 1]).astype(np.int32)


@functools.lru_cache(maxsize=None)
def _shift_attn_mask(hp: int, wp: int, window: int, shift: int) -> np.ndarray:
    """(num_windows, W*W, W*W) additive mask for shifted windows
    (swintransformer.py:201-214 semantics), built statically."""
    img = np.zeros((hp, wp), np.int32)
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(hp // window, window, wp // window, window)
    win = win.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = win[:, None, :] != win[:, :, None]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


def window_partition(x: Array, window: int) -> Array:
    """(B,H,W,C) → (B*nW, window*window, C). H,W multiples of window."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, c)


def window_reverse(x: Array, window: int, h: int, w: int) -> Array:
    b = x.shape[0] // ((h // window) * (w // window))
    x = x.reshape(b, h // window, w // window, window, window, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, -1)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath used at
    swintransformer.py:192)."""

    rate: float

    @nn.compact
    def __call__(self, x: Array, deterministic: bool) -> Array:
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x)).astype(x.dtype)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (swintransformer.py:80-158)."""

    dim: int
    window: int
    num_heads: int
    dtype: Any = jnp.float32
    fused: bool = False  # pallas fused kernel (scores stay in VMEM)

    @nn.compact
    def __call__(self, x: Array, mask: Array | None) -> Array:
        bn, n, c = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim**-0.5
        qkv_flat = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv_flat.reshape(bn, n, 3, self.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (bn, n, H, d)

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window - 1) ** 2, self.num_heads),
        )
        idx = jnp.asarray(_relative_position_index(self.window))
        bias = table[idx.reshape(-1)].reshape(n, n, self.num_heads)
        bias = bias.transpose(2, 0, 1)[None]  # (1, H, n, n)

        if self.fused and jax.default_backend() == "tpu":
            # packed fused fwd+bwd kernel (ops/pallas/window_attention.py):
            # scores never hit HBM (round-1: ~65% of a stage-1 block was
            # exactly that traffic), and the BlockSpec index maps slice
            # heads straight out of the fused-QKV GEMM output — the
            # (bn,n,H,d)->(bn,H,n,d) transposes this call used to make were
            # 58 ms of layout copies in the round-4 296 ms step trace
            # (falls back to the transposed kernel when H can't tile 128
            # lanes, e.g. Swin-L stage 1's H=6)
            from ...ops.pallas.window_attention import fused_window_attention_packed

            out = fused_window_attention_packed(
                qkv_flat,
                bias[0],
                None if mask is None else mask.astype(jnp.float32),
                self.num_heads,
            )  # (bn, n, C)
            return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out.astype(self.dtype))

        attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k, preferred_element_type=jnp.float32)
        attn = attn + bias.astype(attn.dtype)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bn // nw, nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(bn, self.num_heads, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v.astype(self.dtype))
        out = out.reshape(bn, n, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    """One (shifted-)window transformer block (swintransformer.py:161-253)."""

    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32
    fused_attn: bool = False

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        b, h, w, c = x.shape
        window = min(self.window, h, w)
        shift = self.shift if window == self.window else 0
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        pad_b = (window - h % window) % window
        pad_r = (window - w % window) % window
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(hp, wp, window, shift))
        else:
            mask = None
        xw = window_partition(x, window)
        xw = WindowAttention(c, window, self.num_heads, dtype=self.dtype,
                             fused=self.fused_attn, name="attn")(xw, mask)
        x = window_reverse(xw, window, hp, wp)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :h, :w]
        dp = DropPath(self.drop_path, name="drop_path")
        x = shortcut + dp(x, deterministic)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(y)
        return x + dp(y, deterministic)


class PatchMerging(nn.Module):
    """2x2 patch merge + channel double (swintransformer.py:256-290)."""

    dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
            h, w = h + h % 2, w + w % 2
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        # reference concat order (swintransformer.py:287-291) is
        # [x0, x1, x2, x3] = [(dh0,dw0), (dh1,dw0), (dh0,dw1), (dh1,dw1)]:
        # dw-major, dh-minor → put dw before dh when flattening channels
        # (verified by tests/parity/test_swin_parity.py)
        x = x.transpose(0, 1, 3, 4, 2, 5).reshape(b, h // 2, w // 2, 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype, name="reduction")(x)


class SwinTransformer(nn.Module):
    """4-stage Swin pyramid. Emits ``{"s2": stride4, ..., "s5": stride32}``."""

    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.2
    patch_size: int = 4
    out_features: Sequence[str] = ("s2", "s3", "s4", "s5")
    dtype: Any = jnp.float32
    remat: bool = False
    fused_attn: bool = False

    @classmethod
    def from_size(cls, size: str, dtype=jnp.float32, remat: bool = False, **kw) -> "SwinTransformer":
        embed, depths, heads, window, dpr = SIZE2CONFIG[size]
        return cls(
            embed_dim=embed,
            depths=depths,
            num_heads=heads,
            window=window,
            drop_path_rate=dpr,
            dtype=dtype,
            remat=remat,
            **kw,
        )

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Dict[str, Array]:
        p = self.patch_size
        b, h, w, _ = x.shape
        pad_b = (p - h % p) % p
        pad_r = (p - w % p) % p
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        x = nn.Conv(self.embed_dim, (p, p), strides=(p, p), dtype=self.dtype, name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="patch_norm")(x)

        total = sum(self.depths)
        dprs = [self.drop_path_rate * i / max(total - 1, 1) for i in range(total)]
        outputs: Dict[str, Array] = {}
        dim = self.embed_dim
        blk_idx = 0
        block_cls = nn.remat(SwinBlock, static_argnums=(2,)) if self.remat else SwinBlock
        for stage in range(len(self.depths)):
            for i in range(self.depths[stage]):
                x = block_cls(
                    dim=dim,
                    num_heads=self.num_heads[stage],
                    window=self.window,
                    shift=0 if i % 2 == 0 else self.window // 2,
                    mlp_ratio=self.mlp_ratio,
                    drop_path=dprs[blk_idx],
                    dtype=self.dtype,
                    fused_attn=self.fused_attn,
                    name=f"stage{stage}_block{i}",
                )(x, deterministic)
                blk_idx += 1
            name = f"s{stage + 2}"
            if name in self.out_features:
                outputs[name] = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"{name}_norm")(x)
            if stage < len(self.depths) - 1:
                x = PatchMerging(dim, dtype=self.dtype, name=f"merge{stage}")(x)
                dim *= 2
        return outputs
