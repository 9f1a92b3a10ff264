"""Pallas flash attention for TPU.

The hot attention op shared by every transformer in the stack: Swin window
attention (with relative-position bias), SAM/CLIP ViT global attention, and
the SDXL UNet cross/self attention. The reference runs cuDNN softmax
attention via torch; here it is a single fused Pallas kernel — online
softmax over K/V tiles so the (S, S) score matrix never hits HBM.

Layout: (batch*heads, seq, head_dim). Grid is (bh, q_tile, k_tile) with the
K dimension innermost and marked "arbitrary": VMEM scratch (running max /
normalizer / accumulator) persists across k steps, so only one
(block_q, d) + (block_k, d) tile pair is resident at a time — VMEM stays
bounded for any sequence length (the VAE's 16384-token single-head
attention included; an all-resident K/V layout OOMs scoped vmem there).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, scale, num_kv):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (bq, bk)
    m_prev = m_scr[:, 0]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1))
    p = jnp.exp(s - m_cur[:, None])
    alpha = jnp.exp(m_prev - m_cur)
    l_scr[:, 0] = l_scr[:, 0] * alpha + jnp.sum(p, axis=-1)
    acc_scr[:] = acc_scr[:] * alpha[:, None] + jnp.dot(
        p, v, preferred_element_type=jnp.float32
    )
    m_scr[:, 0] = m_cur

    @pl.when(j == num_kv - 1)
    def _():
        o_ref[0] = (
            acc_scr[:] / jnp.maximum(l_scr[:, 0], 1e-30)[:, None]
        ).astype(o_ref.dtype)


def _attn_bias_kernel(
    q_ref, k_ref, v_ref, b_ref, o_ref, m_scr, l_scr, acc_scr, *, scale, num_kv
):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) + b_ref[0].astype(jnp.float32)
    m_prev = m_scr[:, 0]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1))
    p = jnp.exp(s - m_cur[:, None])
    alpha = jnp.exp(m_prev - m_cur)
    l_scr[:, 0] = l_scr[:, 0] * alpha + jnp.sum(p, axis=-1)
    acc_scr[:] = acc_scr[:] * alpha[:, None] + jnp.dot(
        p, v, preferred_element_type=jnp.float32
    )
    m_scr[:, 0] = m_cur

    @pl.when(j == num_kv - 1)
    def _():
        o_ref[0] = (
            acc_scr[:] / jnp.maximum(l_scr[:, 0], 1e-30)[:, None]
        ).astype(o_ref.dtype)


def _pad_to(x: Array, axis: int, multiple: int, value: float = 0.0) -> Array:
    size = x.shape[axis]
    target = -(-size // multiple) * multiple
    if target == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - size)
    return jnp.pad(x, pad, constant_values=value)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "use_pallas"))
def flash_attention(
    q: Array,
    k: Array,
    v: Array,
    bias: Array | None = None,
    block_q: int = 256,
    block_k: int = 256,
    use_pallas: bool | None = None,
) -> Array:
    """Fused attention. q/k/v: (BH, S, D); bias: (BH, Sq, Sk) or None.

    Falls back to the XLA reference path off-TPU (CPU tests) — same math,
    so kernel tests compare pallas vs this reference on TPU.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:
        return reference_attention(q, k, v, bias)

    bh, s_q, d = q.shape
    s_k = k.shape[1]
    scale = 1.0 / math.sqrt(d)
    block_q = min(block_q, max(128, 1 << (s_q - 1).bit_length()))
    block_k = min(block_k, max(128, 1 << (s_k - 1).bit_length()))
    # bound VMEM: (block_q + 2*block_k) * d tiles + f32 accumulator
    while d * (block_q + 2 * block_k) * 4 + block_q * d * 4 > 8 * 2**20 and block_k > 128:
        block_k //= 2
        if block_q > 128:
            block_q //= 2

    qp = _pad_to(q, 1, block_q)
    kp = _pad_to(k, 1, block_k)
    vp = _pad_to(v, 1, block_k)
    sq_p, sk_p = qp.shape[1], kp.shape[1]
    if bias is None and sk_p != s_k:
        # padded keys must be masked out
        bias = jnp.zeros((1, s_q, s_k), qp.dtype)
    if bias is not None:
        bias = jnp.broadcast_to(bias, (bh, s_q, s_k))
        bias = _pad_to(_pad_to(bias, 2, block_k, NEG_INF), 1, block_q)

    num_kv = sk_p // block_k
    grid = (bh, sq_p // block_q, num_kv)
    common = dict(scale=scale, num_kv=num_kv)
    scratch = [
        pltpu.VMEM((block_q, 1), jnp.float32),
        pltpu.VMEM((block_q, 1), jnp.float32),
        pltpu.VMEM((block_q, d), jnp.float32),
    ]
    q_spec = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM)
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary")
    )

    if bias is not None:
        b_spec = pl.BlockSpec(
            (1, block_q, block_k), lambda b, i, j: (b, i, j), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            functools.partial(_attn_bias_kernel, **common),
            out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec, b_spec],
            out_specs=out_spec,
            scratch_shapes=scratch,
            compiler_params=params,
        )(qp, kp, vp, bias)
    else:
        out = pl.pallas_call(
            functools.partial(_attn_kernel, **common),
            out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=out_spec,
            scratch_shapes=scratch,
            compiler_params=params,
        )(qp, kp, vp)
    return out[:, :s_q, :]


def reference_attention(q: Array, k: Array, v: Array, bias: Array | None = None) -> Array:
    """Plain XLA softmax attention — numerics reference for the kernel."""
    d = q.shape[-1]
    s = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32), k.astype(jnp.float32))
    s = s / math.sqrt(d)
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v.astype(jnp.float32)).astype(q.dtype)
