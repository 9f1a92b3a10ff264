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


# ---------------------------------------------------------------------------
# packed (transpose-free) entry: qkv straight from the fused projection
# ---------------------------------------------------------------------------
#
# The round-4 trace of the Swin-L train step put 58 ms of a 296 ms step in
# layout copies — the q/k/v (bn, n, H, d) -> (bn, H, n, d) transposes feeding
# this kernel plus their backward counterparts. Like the UNet's
# flash_attention_packed, the BlockSpec index maps below slice per-head
# channel blocks straight out of the (bn, n, 3C) fused-QKV GEMM output
# (channel axis = [q·H·d | k·H·d | v·H·d]) and the output lands (bn, n, C) —
# transpose-free on both sides of the kernel, forward AND backward. An
# hpb·d = 128-lane channel block also fills the VMEM/DMA lane tile that the
# (.., n, d=32) blocks of the transposed path leave 3/4 empty.


def _pick_hpb(h: int, d: int) -> int:
    """Heads per channel block: Mosaic requires 128-lane multiples. Swin
    d=32 -> hpb=4; stages with h % 4 (Swin-L stage 1, h=6) return 0 and take
    the transposed fallback."""
    for hpb in (1, 2, 4, 8):
        if (hpb * d) % 128 == 0 and h % hpb == 0:
            return hpb
    return 0


def _fwd_kernel_packed(q_ref, k_ref, v_ref, b_ref, m_ref, o_ref, *,
                       scale, has_mask, hpb, d):
    g = q_ref.shape[0]
    n = q_ref.shape[1]
    for t in range(hpb):
        sl = slice(t * d, (t + 1) * d)
        q = q_ref[:, :, sl]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale
        s = s + b_ref[t].astype(jnp.float32)[None]
        if has_mask:
            s = s + m_ref[...].astype(jnp.float32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, :, sl] = o.astype(o_ref.dtype)


def _bwd_kernel_packed(
    q_ref, k_ref, v_ref, b_ref, m_ref, do_ref,
    dq_ref, dk_ref, dv_ref, db_ref, *, scale, has_mask, hpb, d,
):
    # grid (head_blocks, windows), windows INNERMOST: db revisits are
    # consecutive (same accumulation contract as _bwd_kernel)
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        db_ref[...] = jnp.zeros_like(db_ref)

    for t in range(hpb):
        sl = slice(t * d, (t + 1) * d)
        q = q_ref[:, :, sl]
        k = k_ref[:, :, sl]
        v = v_ref[:, :, sl]
        do = do_ref[:, :, sl]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale
        s = s + b_ref[t].astype(jnp.float32)[None]
        if has_mask:
            s = s + m_ref[...].astype(jnp.float32)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s)
        p = p / jnp.sum(p, axis=-1, keepdims=True)

        pc = p.astype(q.dtype)
        dv = jax.lax.dot_general(
            pc, do, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )
        ds = p * (dp - jnp.sum(p * dp, axis=-1, keepdims=True))
        dsc = ds.astype(q.dtype)
        dq = jax.lax.dot_general(
            dsc, k, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale
        dk = jax.lax.dot_general(
            dsc, q, (((1,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        ) * scale
        dq_ref[:, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[:, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, :, sl] = dv.astype(dv_ref.dtype)
        db_ref[t] += jnp.sum(ds, axis=0).astype(db_ref.dtype)


def _packed_grid_specs(bn, n, c, hpb, d, has_mask, nw, bwd):
    g = 2 if bwd else 6
    while bn % g or (has_mask and nw % g):
        g -= 1
    nhb = c // (hpb * d)  # head blocks per qkv slot
    grid = (nhb, bn // g)
    bd = hpb * d
    qs = pl.BlockSpec((g, n, bd), lambda j, i: (i, 0, j), memory_space=pltpu.VMEM)
    ks = pl.BlockSpec((g, n, bd), lambda j, i: (i, 0, nhb + j),
                      memory_space=pltpu.VMEM)
    vs = pl.BlockSpec((g, n, bd), lambda j, i: (i, 0, 2 * nhb + j),
                      memory_space=pltpu.VMEM)
    os_ = pl.BlockSpec((g, n, bd), lambda j, i: (i, 0, j), memory_space=pltpu.VMEM)
    bs = pl.BlockSpec((hpb, n, n), lambda j, i: (j, 0, 0), memory_space=pltpu.VMEM)
    if has_mask:
        ms = pl.BlockSpec((g, n, n), lambda j, i: (i % (nw // g), 0, 0),
                          memory_space=pltpu.VMEM)
    else:
        ms = pl.BlockSpec((1, n, n), lambda j, i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    return grid, qs, ks, vs, os_, bs, ms


def _packed_fwd_call(qkv, bias, mask, hpb, d, interpret):
    bn, n, c3 = qkv.shape
    c = c3 // 3
    scale = 1.0 / math.sqrt(d)
    has_mask = mask is not None
    nw = mask.shape[0] if has_mask else 1
    grid, qs, ks, vs, os_, bs, ms = _packed_grid_specs(
        bn, n, c, hpb, d, has_mask, nw, bwd=False)
    m_in = mask if has_mask else jnp.zeros((1, n, n), qkv.dtype)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_packed, scale=scale, has_mask=has_mask,
                          hpb=hpb, d=d),
        out_shape=jax.ShapeDtypeStruct((bn, n, c), qkv.dtype),
        grid=grid,
        in_specs=[qs, ks, vs, bs, ms],
        out_specs=os_,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        interpret=interpret,
    )(qkv, qkv, qkv, bias, m_in)


def _packed_bwd_call(qkv, bias, mask, do, hpb, d, interpret):
    bn, n, c3 = qkv.shape
    c = c3 // 3
    scale = 1.0 / math.sqrt(d)
    has_mask = mask is not None
    nw = mask.shape[0] if has_mask else 1
    grid, qs, ks, vs, os_, bs, ms = _packed_grid_specs(
        bn, n, c, hpb, d, has_mask, nw, bwd=True)
    m_in = mask if has_mask else jnp.zeros((1, n, n), qkv.dtype)
    dq, dk, dv, db = pl.pallas_call(
        functools.partial(_bwd_kernel_packed, scale=scale, has_mask=has_mask,
                          hpb=hpb, d=d),
        out_shape=[
            jax.ShapeDtypeStruct((bn, n, c), qkv.dtype),
            jax.ShapeDtypeStruct((bn, n, c), qkv.dtype),
            jax.ShapeDtypeStruct((bn, n, c), qkv.dtype),
            jax.ShapeDtypeStruct(bias.shape, jnp.float32),
        ],
        grid=grid,
        in_specs=[qs, ks, vs, bs, ms, os_],
        out_specs=[os_, os_, os_, bs],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")
        ),
        interpret=interpret,
    )(qkv, qkv, qkv, bias, m_in, do)
    # channel concat back into the fused-QKV gradient — contiguous along the
    # minor axis, no transpose; XLA fuses it into the projection backward
    return jnp.concatenate([dq, dk, dv], axis=-1), db.astype(bias.dtype)


def _reference_packed(qkv, bias, mask, heads):
    bn, n, c3 = qkv.shape
    c = c3 // 3
    d = c // heads
    q, k, v = (
        qkv[..., s * c : (s + 1) * c].reshape(bn, n, heads, d).transpose(0, 2, 1, 3)
        for s in range(3)
    )
    out = _reference(q, k, v, bias, mask)  # (bn, H, n, d)
    return out.transpose(0, 2, 1, 3).reshape(bn, n, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_packed(qkv, bias, mask, hpb, d, interpret):
    return _packed_fwd_call(qkv, bias, mask, hpb, d, interpret)


def _fused_packed_fwd(qkv, bias, mask, hpb, d, interpret):
    return _packed_fwd_call(qkv, bias, mask, hpb, d, interpret), (qkv, bias, mask)


def _fused_packed_bwd(hpb, d, interpret, res, do):
    qkv, bias, mask = res
    dqkv, db = _packed_bwd_call(qkv, bias, mask, do, hpb, d, interpret)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dqkv, db, dmask


_fused_packed.defvjp(_fused_packed_fwd, _fused_packed_bwd)


def fused_window_attention_packed(
    qkv: Array,  # (bn, n, 3C) fused-QKV projection output, [q | k | v]
    bias: Array,  # (H, n, n)
    mask: Optional[Array],  # (nW, n, n) or None
    heads: int,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> Array:
    """Transpose-free fused window attention: (bn, n, 3C) in, (bn, n, C)
    out, scores in VMEM, fwd + bwd. Falls back to the transposed kernel
    when the head count can't tile 128 lanes (Swin-L stage 1, H=6) and to
    plain XLA off-TPU."""
    bn, n, c3 = qkv.shape
    c = c3 // 3
    d = c // heads
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not (use_pallas or interpret):
        return _reference_packed(qkv, bias, mask, heads)
    hpb = _pick_hpb(heads, d)
    if hpb == 0 or n % 8:
        perm = lambda s: (
            qkv[..., s * c : (s + 1) * c]
            .reshape(bn, n, heads, d).transpose(0, 2, 1, 3)
        )
        out = _fused(perm(0), perm(1), perm(2), bias, mask, interpret)
        return out.transpose(0, 2, 1, 3).reshape(bn, n, c)
    return _fused_packed(qkv, bias, mask, hpb, d, interpret)
