"""Fused window attention (forward + custom-VJP backward) for Swin.

Round-1 profiling (tools/profile_swin_block.py) showed ~65% of a Swin block
is attention math: the (nW·B, H, n, n) f32 score tensor round-trips HBM in
both directions. A Swin window (n = 144/196 tokens) fits entirely in VMEM,
so unlike flash attention no online softmax is needed — each grid step
loads G window×head groups, computes scores+bias+mask+softmax+PV wholly
on-chip, and writes only the (G, H, n, d) output. The backward kernel
recomputes the (cheap) scores and produces dq/dk/dv plus the accumulated
relative-position-bias gradient in one pass — scores never touch HBM.

Layout: q/k/v (B, H, N, D) with B = batch·num_windows; bias (H, N, N)
shared across windows; mask (nW, N, N) (shift masks) or None, cycling with
``window index = b % nW``.

Off-TPU (CPU tests) the same math runs as plain jnp (autodiff-able), so
numerics/grad tests compare the pallas path (interpret mode on CPU) against
it.
"""
from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _blocking(num_heads: int, bwd: bool = True) -> Tuple[int, int]:
    """(window group G, head block HB): the bwd kernel holds ~6 score-sized
    f32 temporaries, so G·HB·N²·4·6 must stay well inside the 16 MB VMEM —
    G·HB ≈ 8 at N=144/196. The fwd kernel only holds s and p (~2.5 score
    tensors with the bf16 copy), so it can run 3× larger groups, which
    amortizes grid overhead over more of the tiny d=32 contractions."""
    budget = 8 if bwd else 24
    hb = min(num_heads, 8)
    g = max(1, budget // hb)
    return g, hb


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _fwd_kernel(q_ref, k_ref, v_ref, b_ref, m_ref, o_ref, *, scale, has_mask):
    g, h, n, d = q_ref.shape
    # Mosaic matmul supports one batch dim: flatten (G, H) → GH.
    # Dots run on the native (bf16) inputs with f32 accumulation — exact
    # (bf16 multiplies exactly into an f32 accumulator) and 2× the MXU rate
    # of upcasting first; scale is applied to the f32 scores after.
    q = q_ref[...].reshape(g * h, n, d)
    k = k_ref[...].reshape(g * h, n, d)
    v = v_ref[...].reshape(g * h, n, d)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ).reshape(g, h, n, n) * scale
    s = s + b_ref[...].astype(jnp.float32)[None]
    if has_mask:
        s = s + m_ref[...].astype(jnp.float32)[:, None]
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).reshape(g * h, n, n)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o_ref[...] = o.reshape(g, h, n, d).astype(o_ref.dtype)


def _bwd_kernel(
    q_ref, k_ref, v_ref, b_ref, m_ref, do_ref,
    dq_ref, dk_ref, dv_ref, db_ref, *, scale, has_mask,
):
    # Grid is (head_blocks, windows) with windows INNERMOST: db's block index
    # depends only on the head-block dim, so all revisits of one db block are
    # consecutive window steps — the only accumulation pattern Pallas TPU
    # defines. (With windows outermost and >1 head block, each db block is
    # revisited non-consecutively: undefined behavior, garbage bias grads.)
    i = pl.program_id(1)

    g, h, n, d = q_ref.shape
    # native-dtype (bf16) MXU dots with f32 accumulation throughout; p/ds
    # are cast back to the input dtype for their dots (same contraction
    # dtype as the XLA autodiff of the unfused path, which also runs the
    # probability matmuls in the compute dtype).
    q = q_ref[...].reshape(g * h, n, d)
    k = k_ref[...].reshape(g * h, n, d)
    v = v_ref[...].reshape(g * h, n, d)
    do = do_ref[...].reshape(g * h, n, d)
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(g, h, n, n) * scale
    s = s + b_ref[...].astype(jnp.float32)[None]
    if has_mask:
        s = s + m_ref[...].astype(jnp.float32)[:, None]
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).reshape(g * h, n, n)

    # dv = p^T @ do ; dp = do @ v^T ; ds = p*(dp - rowsum(p*dp))
    pc = p.astype(q.dtype)
    dv = jax.lax.dot_general(
        pc, do, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (GH, N, D)
    dp = jax.lax.dot_general(
        do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )  # (GH, N, N)
    ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
    dsc = ds.astype(q.dtype)
    dq = jax.lax.dot_general(
        dsc, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale
    dk = jax.lax.dot_general(
        dsc, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale
    dq_ref[...] = dq.reshape(g, h, n, d).astype(dq_ref.dtype)
    dk_ref[...] = dk.reshape(g, h, n, d).astype(dk_ref.dtype)
    dv_ref[...] = dv.reshape(g, h, n, d).astype(dv_ref.dtype)
    ds = ds.reshape(g, h, n, n)

    # bias grad accumulates across the sequential window grid dim (the
    # head-block grid dim selects distinct db blocks)
    @pl.when(i == 0)
    def _():
        db_ref[...] = jnp.zeros_like(db_ref)

    db_ref[...] += jnp.sum(ds, axis=0).astype(db_ref.dtype)  # (H, N, N)


# ---------------------------------------------------------------------------
# dispatch + custom vjp
# ---------------------------------------------------------------------------


def _reference(q, k, v, bias, mask):
    scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32) * scale,
                   k.astype(jnp.float32))
    s = s + bias.astype(jnp.float32)[None]
    if mask is not None:
        nw = mask.shape[0]
        b = q.shape[0]
        m = jnp.tile(mask, (b // nw, 1, 1))[:, None]
        s = s + m.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _specs(bsz, g, hb, n, d, has_mask, nw):
    """Grid is (heads/HB, windows/G) — windows innermost so the bwd kernel's
    db accumulation revisits each bias block consecutively."""
    qspec = pl.BlockSpec((g, hb, n, d), lambda j, i: (i, j, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((hb, n, n), lambda j, i: (j, 0, 0), memory_space=pltpu.VMEM)
    if has_mask:
        # G consecutive windows share the grid step; requires nW % G == 0
        mspec = pl.BlockSpec((g, n, n), lambda j, i: (i % (nw // g), 0, 0),
                             memory_space=pltpu.VMEM)
    else:
        mspec = pl.BlockSpec((1, n, n), lambda j, i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    return qspec, bspec, mspec


def _grid_and_specs(q, mask, bwd=True):
    bsz, h, n, d = q.shape
    has_mask = mask is not None
    nw = mask.shape[0] if has_mask else 1
    g, hb = _blocking(h, bwd)
    while bsz % g or (has_mask and nw % g):
        g -= 1
    while h % hb:
        hb -= 1
    grid = (h // hb, bsz // g)
    return grid, _specs(bsz, g, hb, n, d, has_mask, nw), has_mask, n


def _pallas_fwd(q, k, v, bias, mask, interpret=False):
    scale = 1.0 / math.sqrt(q.shape[-1])
    grid, (qspec, bspec, mspec), has_mask, n = _grid_and_specs(q, mask, bwd=False)
    m_in = mask if has_mask else jnp.zeros((1, n, n), q.dtype)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, has_mask=has_mask),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[qspec, qspec, qspec, bspec, mspec],
        out_specs=qspec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        interpret=interpret,
    )(q, k, v, bias, m_in)
    return out


def _pallas_bwd(q, k, v, bias, mask, do, interpret=False):
    scale = 1.0 / math.sqrt(q.shape[-1])
    grid, (qspec, bspec, mspec), has_mask, n = _grid_and_specs(q, mask)
    m_in = mask if has_mask else jnp.zeros((1, n, n), q.dtype)
    dq, dk, dv, db = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, has_mask=has_mask),
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(bias.shape, jnp.float32),
        ],
        grid=grid,
        in_specs=[qspec, qspec, qspec, bspec, mspec, qspec],
        out_specs=[qspec, qspec, qspec, bspec],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        interpret=interpret,
    )(q, k, v, bias, m_in, do)
    return dq, dk, dv, db.astype(bias.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _fused(q, k, v, bias, mask, interpret):
    return _pallas_fwd(q, k, v, bias, mask, interpret)


def _fused_fwd(q, k, v, bias, mask, interpret):
    return _pallas_fwd(q, k, v, bias, mask, interpret), (q, k, v, bias, mask)


def _fused_bwd(interpret, res, do):
    q, k, v, bias, mask = res
    dq, dk, dv, db = _pallas_bwd(q, k, v, bias, mask, do, interpret)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dq, dk, dv, db, dmask


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_window_attention(
    q: Array,  # (B, H, N, D)
    k: Array,
    v: Array,
    bias: Array,  # (H, N, N)
    mask: Optional[Array] = None,  # (nW, N, N)
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> Array:
    """Scores never hit HBM; backward included. Falls back to plain jnp
    (XLA autodiff) off-TPU unless ``interpret`` forces the kernel."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not (use_pallas or interpret):
        return _reference(q, k, v, bias, mask)
    return _fused(q, k, v, bias, mask, interpret)
