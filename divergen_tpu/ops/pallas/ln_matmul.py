"""Fused LayerNorm + GEMM (+bias) Pallas kernel for TPU.

Why: the round-4 xplane trace of the SDXL denoise step (B=4, CFG batch 8,
420 ms) attributes ~94 ms to XLA's LayerNorm lowerings — 18x over the HBM
bandwidth bound — because the convert_reduce moment fusions also
re-materialize the activation in a stats-aligned layout for the consumer.
Swapping the LN op alone for a Pallas kernel LOSES end-to-end (fusion
barriers, SWEEP_r04.json norm_fusion_ab); the round-2 lesson is that only
COARSE kernels pay off. This is the coarse version: the LN is folded into
the GEMM that consumes it, so the normalized activation never exists in
HBM at all.

Every LayerNorm in the SDXL transformer block feeds exactly one GEMM
(pipeline/generation/unet.py TransformerBlock):

  norm1 -> fused QKV projection   (C, 3C)
  norm2 -> cross-attention Q      (C, C)
  norm3 -> GEGLU input projection (C, 8C)

Layout: grid (M/bm, N/bn), row-major so the column index j is innermost.
The x block (bm, K) holds FULL rows — exactly what the LN row moments
need — so at j == 0 the kernel computes mean/rstd + affine and caches the
normalized rows in a VMEM scratch; j > 0 reuses the scratch and only
streams the next weight block. HBM traffic: one read of x, one read of w,
one write of out — the GEMM's own minimum; the LN is free.

The optional GEGLU epilogue (`geglu=True`) splits the output block's
columns in half and applies h * gelu(g) in-kernel, halving the written
output and removing the separate gelu+mul HLO. Requires bn to span pairs:
the h/g halves live N/2 apart, so the kernel maps output block j to
weight columns [j*bn/2 : ...] and [N/2 + j*bn/2 : ...] via two w blocks.

Reference counterpart: torch.nn.LayerNorm + nn.Linear inside
BasicTransformerBlock (diffusers UNet used by the reference generation
stage, DiverGen/generation/txt2img_diffusers_stages_from_txt.py:136-198).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """Mosaic has no erf lowering; Abramowitz–Stegun 7.1.26 (|err| < 1.5e-7,
    well under the bf16 output rounding of the GEGLU epilogue)."""
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
           + t * (-1.453152027 + t * 1.061405429))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _kernel(x_ref, w_ref, g_ref, b_ref, bias_ref, o_ref, xn_scr, *, eps,
            has_bias, act):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        xf = x_ref[...].astype(jnp.float32)  # (bm, K) full rows
        mean = jnp.mean(xf, axis=1, keepdims=True)
        var = jnp.mean(xf * xf, axis=1, keepdims=True) - mean * mean
        y = (xf - mean) * jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
        y = y * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
        xn_scr[...] = y.astype(xn_scr.dtype)

    acc = jax.lax.dot_general(
        xn_scr[...], w_ref[...],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if has_bias:
        acc = acc + bias_ref[0].astype(jnp.float32)
    if act == "gelu":  # exact-form, matches nn.gelu(approximate=False)
        acc = 0.5 * acc * (1.0 + _erf(acc * 0.7071067811865476))
    o_ref[...] = acc.astype(o_ref.dtype)


def _kernel_geglu(x_ref, wh_ref, wg_ref, g_ref, b_ref, bh_ref, bg_ref,
                  o_ref, xn_scr, *, eps, has_bias):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        xf = x_ref[...].astype(jnp.float32)
        mean = jnp.mean(xf, axis=1, keepdims=True)
        var = jnp.mean(xf * xf, axis=1, keepdims=True) - mean * mean
        y = (xf - mean) * jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
        y = y * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
        xn_scr[...] = y.astype(xn_scr.dtype)

    xn = xn_scr[...]
    h = jax.lax.dot_general(xn, wh_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    gate = jax.lax.dot_general(xn, wg_ref[...], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    if has_bias:
        h = h + bh_ref[0].astype(jnp.float32)
        gate = gate + bg_ref[0].astype(jnp.float32)
    # exact-form (erf) GELU — diffusers GEGLU uses torch.nn.functional.gelu
    gate = 0.5 * gate * (1.0 + _erf(gate * 0.7071067811865476))
    o_ref[...] = (h * gate).astype(o_ref.dtype)


def _reference(x, w, gamma, beta, eps, bias, geglu, act="none"):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mean * mean
    y = (xf - mean) * jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    y = (y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)).astype(x.dtype)
    out = jnp.dot(y, w, preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    if geglu:
        h, gate = jnp.split(out, 2, axis=-1)
        out = h * jax.nn.gelu(gate, approximate=False)
    elif act == "gelu":
        out = jax.nn.gelu(out, approximate=False)
    return out.astype(x.dtype)


def fused_ln_matmul(
    x: Array,  # (M, K)
    w: Array,  # (K, N)
    gamma: Array,  # (K,) LN scale
    beta: Array,  # (K,) LN bias
    eps: float = 1e-5,
    bias: Array | None = None,  # (N,) matmul bias
    geglu: bool = False,  # epilogue: split N/2, h * gelu(g) -> (M, N/2)
    act: str = "none",  # 'gelu' epilogue on the plain path (ViT/SAM MLPs)
    bm: int = 512,  # large row blocks: the whole w streams once per row
    # block, so HBM w-traffic = (m/bm)·|w| — bm=256 cost the l2 qkv site
    # 0.38 ms of pure weight re-reads (measured, SWEEP_r04 ln_gemm_micro);
    # bm=1024 blows the 16 MB scoped-VMEM limit at the GEGLU sites
    bn: int = 512,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> Array:
    """LayerNorm(x) @ w (+ bias) [+ GEGLU epilogue] in one kernel pass."""
    if use_pallas is None:
        use_pallas = jax.default_backend() in ("tpu", "axon")
    m, k = x.shape
    while bm * k * 2 > (2 << 20):  # x block + normalized scratch in VMEM
        bm //= 2
    n = w.shape[1]
    half = n // 2
    # full-K rows must be resident and blocks tile-aligned
    ok = (
        (use_pallas or interpret)
        and k % 128 == 0
        and m % 8 == 0
        and (not geglu or (half % 128 == 0))
        and (n % 128 == 0)
    )
    if not ok:
        return _reference(x, w, gamma, beta, eps, bias, geglu, act)
    bm = min(bm, m)
    while m % bm:
        bm //= 2
    cols = half if geglu else n
    bn = min(bn, cols)
    while cols % bn:
        bn //= 2
    if bm < 8 or bn < 128:
        return _reference(x, w, gamma, beta, eps, bias, geglu, act)

    grid = (m // bm, cols // bn)
    xspec = pl.BlockSpec((bm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    aff = pl.BlockSpec((1, k), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    has_bias = bias is not None
    scratch = pltpu.VMEM((bm, k), x.dtype)
    params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary")  # scratch reuse over j
    )
    g2 = gamma.reshape(1, k)
    b2 = beta.reshape(1, k)
    if not geglu:
        wspec = pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM)
        bspec = pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM)
        zb = bias.reshape(1, n) if has_bias else jnp.zeros((1, n), x.dtype)
        return pl.pallas_call(
            functools.partial(_kernel, eps=eps, has_bias=has_bias, act=act),
            grid=grid,
            in_specs=[xspec, wspec, aff, aff, bspec],
            out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
            scratch_shapes=[scratch],
            compiler_params=params,
            interpret=interpret,
        )(x, w, g2, b2, zb)

    # GEGLU: two weight views (h columns, gate columns) walked in lockstep
    wh = w[:, :half]
    wg = w[:, half:]
    wspec = pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    if has_bias:
        bh, bg = bias[:half].reshape(1, half), bias[half:].reshape(1, half)
    else:
        bh = bg = jnp.zeros((1, half), x.dtype)
    return pl.pallas_call(
        functools.partial(_kernel_geglu, eps=eps, has_bias=has_bias),
        grid=grid,
        in_specs=[xspec, wspec, wspec, aff, aff, bspec, bspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((m, half), x.dtype),
        scratch_shapes=[scratch],
        compiler_params=params,
        interpret=interpret,
    )(x, wh, wg, g2, b2, bh, bg)
