"""Fused GroupNorm→SiLU→3x3-conv Pallas kernel (SDXL resblock hot path).

Why: the measured UNet denoise step spends 31 ms in the resblock conv path
at ~46% MFU plus extra HBM round trips for the norm (STATUS.md round-2
trace). XLA's lowering touches the activation ≥3 times (GN read+write,
conv read with halo re-reads); round-2 showed fine-grained Pallas kernels
lose to XLA fusion, so this is the COARSE fusion the round-2 lesson calls
for: one kernel reads x once, applies the (pre-folded) GroupNorm affine +
SiLU in VMEM, and runs the 9-tap conv GEMM on the MXU — the only HBM
traffic is one x read (plus the cheap XLA moments pass) and one y write.

Decomposition:
  - XLA side: per-(B, group) moments (one bandwidth-bound reduce), folded
    with the GN scale/bias into per-(B, C) ``a``/``b`` (y = silu(x·a + b)),
    and a one-pixel zero pre-pad of x (kills all halo boundary logic —
    padded positions are masked back to zero after the affine since conv
    zero-padding happens AFTER normalization in the reference semantics).
  - Pallas side: grid (B, H/th, Cout/co_blk); each step DMAs a
    (th+2, W+2, C) slab from HBM, normalizes + SiLUs in f32, masks the
    global-pad border, and accumulates 9 (th·W, C)@(C, co_blk) MXU dots.

Forward-only (generation serving); training keeps the standard path.
Reference counterpart: diffusers ResnetBlock2D norm1/act/conv1 — numerics
identical to GroupNorm32 + nn.silu + nn.Conv (see tests/test_fused_gn_conv).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(a_ref, b_ref, w_ref, bias_ref, xp_ref, o_ref, slab, sem, *,
            th: int, height: int, width: int, wp: int):
    bi = pl.program_id(0)
    hi = pl.program_id(1)

    dma = pltpu.make_async_copy(
        xp_ref.at[bi, pl.ds(hi * th, th + 2)], slab, sem
    )
    dma.start()
    dma.wait()

    xs = slab[:].astype(jnp.float32)
    # folded GroupNorm affine + SiLU (f32), per-(B, C) a/b
    xs = xs * a_ref[0, 0][None, None, :] + b_ref[0, 0][None, None, :]
    h = xs * jax.nn.sigmoid(xs)
    # conv zero-padding applies AFTER normalization: mask the global pad
    # ring (slab rows/cols that map to the pre-pad border) back to zero;
    # cols >= width+2 are 8-alignment padding (never read by the taps)
    g_row = hi * th + jax.lax.broadcasted_iota(jnp.int32, (th + 2, 1, 1), 0)
    g_col = jax.lax.broadcasted_iota(jnp.int32, (1, wp, 1), 1)
    valid = ((g_row > 0) & (g_row < height + 1)) & ((g_col > 0) & (g_col < width + 1))
    h = jnp.where(valid, h, 0.0).astype(w_ref.dtype)

    c = slab.shape[-1]
    co = o_ref.shape[-1]
    acc = jnp.zeros((th * width, co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            tap = h[dy:dy + th, dx:dx + width, :].reshape(th * width, c)
            acc = acc + jax.lax.dot_general(
                tap, w_ref[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    acc = acc + bias_ref[0][None, :]
    o_ref[0] = acc.reshape(th, width, co).astype(o_ref.dtype)


def _pick_th(h: int, w: int, c: int, budget_bytes: int = 4 << 20) -> int:
    row = (-(-(w + 2) // 8) * 8) * c * 2  # bf16 slab row at 8-aligned width (wp)
    th = max(1, budget_bytes // row - 2)
    for cand in (64, 32, 16, 8, 4, 2, 1):
        if cand <= th and h % cand == 0:
            return cand
    return 1


def fused_gn_silu_conv3x3(
    x: Array,  # (B, H, W, C)
    gn_scale: Array,  # (C,)
    gn_bias: Array,  # (C,)
    kernel: Array,  # (3, 3, C, Co) HWIO
    bias: Array,  # (Co,)
    groups: int = 32,
    eps: float = 1e-6,
    interpret: bool = False,
    use_pallas: Optional[bool] = None,
) -> Array:
    """silu(groupnorm(x)) ⊛ kernel + bias, one fused kernel. Exact
    (modulo f32-accumulation order) match of GroupNorm32 + nn.silu +
    nn.Conv(3x3, SAME). Non-TPU backends fall back to the equivalent XLA
    chain (same convention as the flash kernels)."""
    b, h, w, c = x.shape
    co = kernel.shape[-1]
    g = min(groups, c)
    while c % g:
        g -= 1

    xf = x.astype(jnp.float32)
    s1 = jnp.mean(xf, axis=(1, 2))  # (B, C)
    s2 = jnp.mean(xf * xf, axis=(1, 2))
    gm = jnp.mean(s1.reshape(b, g, c // g), axis=-1)
    g2 = jnp.mean(s2.reshape(b, g, c // g), axis=-1)
    inv = jax.lax.rsqrt(g2 - gm * gm + eps)
    mean_c = jnp.repeat(gm, c // g, axis=-1)  # (B, C)
    inv_c = jnp.repeat(inv, c // g, axis=-1)
    a = inv_c * gn_scale[None, :].astype(jnp.float32)  # (B, C)
    bb = gn_bias[None, :].astype(jnp.float32) - mean_c * a

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not (use_pallas or interpret):
        y = xf * a[:, None, None, :] + bb[:, None, None, :]
        y = (y * jax.nn.sigmoid(y)).astype(jnp.bfloat16)
        out = jax.lax.conv_general_dilated(
            y, kernel.astype(jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return (out + bias[None, None, None, :]).astype(x.dtype)

    # Mosaic DMA slices need the sublane (second-to-last) dim 8-aligned
    # and the lane (last) dim 128-aligned: pad width+2 up to a multiple of
    # 8 and C up to a multiple of 128 (SDXL's 320-ch level is 2.5×128 —
    # the HBM memref gets lane-padded to 384 and a 320-lane DMA slice
    # fails to lower). Padded channels carry a=0, b=0 ⇒ silu(0)=0 and
    # zero kernel taps, so they contribute nothing.
    wp = -(-(w + 2) // 8) * 8
    cp = -(-c // 128) * 128
    xp = jnp.pad(
        x, ((0, 0), (1, 1), (1, wp - w - 1), (0, cp - c))
    ).astype(jnp.bfloat16)
    if cp != c:
        a = jnp.pad(a, ((0, 0), (0, cp - c)))
        bb = jnp.pad(bb, ((0, 0), (0, cp - c)))
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, cp - c), (0, 0)))
    th = _pick_th(h, w, cp)
    co_blk = co
    if co > 256:  # bound the (3,3,C,co_blk) weight block + f32 accumulator
        # lane constraint: co_blk must be a multiple of 128 or equal co
        for cand in (256, 128):
            if co % cand == 0:
                co_blk = cand
                break
    grid = (b, h // th, co // co_blk)

    out = pl.pallas_call(
        functools.partial(_kernel, th=th, height=h, width=w, wp=wp),
        grid=grid,
        in_specs=[
            # (B, 1, C) so the blocked last-two dims (1, c) span the array
            # exactly — Mosaic requires last-two block dims divisible by
            # (8, 128) or equal to the array dims; a (1, C) block on a
            # (B, C) array fails that on hardware when B % 8 != 0.
            pl.BlockSpec((1, 1, cp), lambda bi, hi, ci: (bi, 0, 0)),  # a
            pl.BlockSpec((1, 1, cp), lambda bi, hi, ci: (bi, 0, 0)),  # b
            pl.BlockSpec((3, 3, cp, co_blk), lambda bi, hi, ci: (0, 0, 0, ci)),
            pl.BlockSpec((1, co_blk), lambda bi, hi, ci: (0, ci)),
            pl.BlockSpec(memory_space=pl.ANY),  # xp: manual halo DMA
        ],
        out_specs=pl.BlockSpec((1, th, w, co_blk), lambda bi, hi, ci: (bi, hi, 0, ci)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((th + 2, wp, cp), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "parallel"),
            # f32 normalize/accumulate intermediates exceed the 16M default
            # scoped-vmem stack at SDXL channel widths; v5e has 128M VMEM
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(a[:, None, :], bb[:, None, :], kernel.astype(jnp.bfloat16),
      bias.reshape(1, co).astype(jnp.float32), xp)
    return out
