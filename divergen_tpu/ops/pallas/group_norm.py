"""Fused Pallas GroupNorm(+SiLU) for NHWC activations (TPU).

Why: the round-4 xplane trace of the SDXL denoise step (B=4, CFG batch 8)
shows XLA's GroupNorm moment lowering at ~1.3 ms per call on (8,64,64,640)
— ~20x the HBM bandwidth bound — because the convert_reduce fusion also
re-materializes the activation in a batch-in-sublane layout ({3,0,2,1})
so the (B, C) stats broadcast tile-aligned in the apply step; the layout
round-trips dominate. Total: ~52 ms of a 420 ms step in GN moments alone
(see STATUS.md round-4 and SWEEP_r04.json).

Here the activation keeps its natural {3,2,1,0} NHWC layout and is read
in (1, th, W, C) row slabs:

  pass 1 (``_moments_kernel``): per-channel f32 sum / sum-of-squares
    accumulated in VMEM scratch across the sequential H-tile grid dim,
    written once per batch element as (B, C) s1/s2.
  host-side combine: group means/rstd from the tiny (B, C) stats — exactly
    ``_ChannelMomentGN``'s math (pipeline/generation/unet.py), eps=1e-6
    (diffusers convention).
  pass 2 (``_apply_kernel``): y = (x - m) * rstd * scale + bias, optional
    fused SiLU, same slab blocking.

HBM traffic: 2 reads + 1 write of x (the minimum for a two-pass norm) vs
XLA's read + transposed rewrite + re-read + write.

Backward recomputes through the XLA reference (custom_vjp) — the
generation path is forward-only; training UNets would need a bwd kernel.

Reference counterpart: torch.nn.GroupNorm's fused CUDA kernel inside the
diffusers ResnetBlock2D (reference generation stage,
DiverGen/generation/txt2img_diffusers_stages_from_txt.py:136-198).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _moments_kernel(x_ref, s1_ref, s2_ref, acc_scr, *, num_h):
    """Grid (B, H_tiles); accumulate per-channel f32 sum/sumsq in scratch.

    Stats land in (B, 8, C) sublane-padded form: Mosaic requires block
    sublane dims divisible by 8 (a (1, C) row block is rejected), so each
    batch element owns an (8, C) tile with the stats replicated down it."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    x = x_ref[0].astype(jnp.float32)  # (th, w, c)
    acc_scr[0] += jnp.sum(x, axis=(0, 1))
    acc_scr[1] += jnp.sum(x * x, axis=(0, 1))

    @pl.when(j == num_h - 1)
    def _():
        s1_ref[0] = jnp.broadcast_to(acc_scr[0], s1_ref.shape[1:])
        s2_ref[0] = jnp.broadcast_to(acc_scr[1], s2_ref.shape[1:])


def _apply_kernel(x_ref, m_ref, r_ref, g_ref, b_ref, o_ref, *, silu):
    """Grid (B, H_tiles); y = (x - m) * rstd * scale + bias [, * sigmoid(y)].

    m/r are (1, 8, C) sublane-padded per-batch group stats (repeated over
    channels); scale/bias are the (1, C) affine params."""
    x = x_ref[0].astype(jnp.float32)
    y = (x - m_ref[0, 0][None]) * r_ref[0, 0][None]
    y = y * g_ref[0][None].astype(jnp.float32) + b_ref[0][None].astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _pick_th(h: int, w: int, c: int, budget_bytes: int = 6 << 20) -> int:
    # slab rows: bf16 in + f32 working copy ≈ 6 bytes/elem, double-buffered
    row = w * c * 6 * 2
    th = max(1, budget_bytes // row)
    for cand in (128, 64, 32, 16, 8, 4, 2, 1):
        if cand <= th and h % cand == 0:
            return cand
    return 1


def _reference(x, scale, bias, groups, eps, silu):
    b, h, w, c = x.shape
    g = groups
    xf = x.astype(jnp.float32)
    s1 = jnp.mean(xf, axis=(1, 2))
    s2 = jnp.mean(xf * xf, axis=(1, 2))
    gm = jnp.mean(s1.reshape(b, g, c // g), axis=-1)
    g2 = jnp.mean(s2.reshape(b, g, c // g), axis=-1)
    gv = g2 - gm * gm
    mean_c = jnp.repeat(gm, c // g, axis=-1)
    inv_c = jnp.repeat(jax.lax.rsqrt(gv + eps), c // g, axis=-1)
    y = (xf - mean_c[:, None, None, :]) * inv_c[:, None, None, :]
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7)
)
def fused_group_norm(
    x: Array,  # (B, H, W, C) NHWC
    scale: Array,  # (C,)
    bias: Array,  # (C,)
    groups: int = 32,
    eps: float = 1e-6,
    silu: bool = False,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> Array:
    """GroupNorm over (H, W, C/groups), optional fused SiLU epilogue."""
    if use_pallas is None:
        use_pallas = jax.default_backend() in ("tpu", "axon")
    b, h, w, c = x.shape
    g = math.gcd(groups, c)
    # blocks span the whole (W, C) minor dims, so Mosaic lane-pads a
    # non-128-multiple C internally (SDXL level 0 is C=320); sublane dim W
    # must still tile by 8
    if not (use_pallas or interpret) or c % 8 or w % 8:
        return _reference(x, scale, bias, g, eps, silu)

    th = _pick_th(h, w, c)
    num_h = h // th
    slab = pl.BlockSpec((1, th, w, c), lambda i, j: (i, j, 0, 0),
                        memory_space=pltpu.VMEM)
    stat = pl.BlockSpec((1, 8, c), lambda i, j: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    s1, s2 = pl.pallas_call(
        functools.partial(_moments_kernel, num_h=num_h),
        grid=(b, num_h),
        in_specs=[slab],
        out_specs=[stat, stat],
        out_shape=[jax.ShapeDtypeStruct((b, 8, c), jnp.float32)] * 2,
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(x)
    # tiny (B, G) group combine on XLA (negligible; keeps the kernel simple)
    n = h * w * (c // g)
    gm = jnp.sum(s1[:, 0].reshape(b, g, c // g), axis=-1) / n
    g2 = jnp.sum(s2[:, 0].reshape(b, g, c // g), axis=-1) / n
    rstd = jax.lax.rsqrt(jnp.maximum(g2 - gm * gm, 0.0) + eps)
    mean_c = jnp.repeat(gm, c // g, axis=-1)  # (B, C)
    rstd_c = jnp.repeat(rstd, c // g, axis=-1)
    pad8 = lambda t: jnp.broadcast_to(t[:, None, :], (b, 8, c))
    aff = pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_apply_kernel, silu=silu),
        grid=(b, num_h),
        in_specs=[slab, stat, stat, aff, aff],
        out_specs=slab,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(x, pad8(mean_c), pad8(rstd_c), scale.reshape(1, c), bias.reshape(1, c))
    return out


def _fwd(x, scale, bias, groups, eps, silu, use_pallas, interpret):
    return (
        fused_group_norm(x, scale, bias, groups, eps, silu, use_pallas, interpret),
        (x, scale, bias),
    )


def _bwd(groups, eps, silu, use_pallas, interpret, res, gout):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda a, s, b_: _reference(a, s, b_, math.gcd(groups, x.shape[-1]), eps, silu),
        x, scale, bias,
    )
    return vjp(gout)


fused_group_norm.defvjp(_fwd, _bwd)
