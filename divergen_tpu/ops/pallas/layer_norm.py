"""Fused Pallas LayerNorm (TPU).

Why: XLA lowers LayerNorm as a convert+reduce fusion (moments) plus a
separate apply fusion — the SDXL UNet runs ~210 of them per denoise step
and the trace shows them costing ~25 ms/step (~10x the HBM-bandwidth
bound; the moment reductions schedule poorly at (tokens, ch) shapes).
Here each row block is read into VMEM once: moments, normalization and the
affine transform happen in-register, and the only HBM traffic is one bf16
read + one bf16 write.

Inference-grade: the backward falls back to recomputing through the XLA
reference formula (custom_vjp), which is what training paths used anyway.

Reference counterpart: torch.nn.LayerNorm uses a fused CUDA kernel
(reference Swin/UNet modules); this is its TPU equivalent.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ln_kernel(x_ref, g_ref, b_ref, o_ref, *, eps):
    x = x_ref[:].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    xc = x - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    o_ref[:] = (y * g_ref[:].astype(jnp.float32)
                + b_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _reference(x: Array, gamma: Array, beta: Array, eps: float) -> Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    y = xc * jax.lax.rsqrt(var + eps)
    return (y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)).astype(x.dtype)


def _pick_rows(rows: int, cols: int) -> int:
    # bound the f32 working set to a few MB of VMEM
    budget = 4 * 2**20 // max(cols * 4, 1)
    br = 512
    while br > budget and br > 8:
        br //= 2
    while rows % br and br > 8:
        br //= 2
    return br if rows % br == 0 else 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_layer_norm(x: Array, gamma: Array, beta: Array, eps: float = 1e-5) -> Array:
    """LayerNorm over the last axis. x: (..., C); gamma/beta: (C,)."""
    lead = x.shape[:-1]
    c = x.shape[-1]
    rows = 1
    for s in lead:
        rows *= s
    on_tpu = jax.default_backend() in ("tpu", "axon")
    br = _pick_rows(rows, c) if on_tpu else 0
    if not br or c % 128:
        return _reference(x, gamma, beta, eps)
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(rows // br,),
        in_specs=[
            pl.BlockSpec((br, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((br, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, c), x.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel",)),
    )(x.reshape(rows, c), gamma.reshape(1, c), beta.reshape(1, c))
    return out.reshape(*lead, c)


def _fwd(x, gamma, beta, eps):
    return fused_layer_norm(x, gamma, beta, eps), (x, gamma, beta)


def _bwd(eps, res, g):
    x, gamma, beta = res
    _, vjp = jax.vjp(lambda a, s, b: _reference(a, s, b, eps), x, gamma, beta)
    return vjp(g)


fused_layer_norm.defvjp(_fwd, _bwd)
