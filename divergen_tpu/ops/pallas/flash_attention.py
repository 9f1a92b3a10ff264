"""Pallas flash attention for TPU.

The hot attention op of the SDXL UNet (self-attention at 4096/1024 tokens)
and the VAE decoder (16384-token single-head attention). The reference runs
cuDNN softmax attention via torch; here it is a single fused Pallas kernel —
online softmax over K/V tiles so the (S, S) score matrix never hits HBM.

Performance notes (v5e, measured via tools/profile_unet.py):
- Both dots run on bf16 inputs with f32 accumulation (MXU native rate);
  upcasting q/k/v to f32 before the dot halves MXU throughput.
- K tiles are large (up to 1024) so the p@v contraction fills the MXU's
  128-deep systolic dimension even when head_dim is 64.
- Padded keys are masked in-kernel from an iota comparison — no
  materialized (BH, Sq, Sk) bias tensor for the common pad-only case
  (that bias alone cost ~40 MB of HBM traffic per cross-attention layer).
- Grid is (bh, q_tile, k_tile), K innermost and "arbitrary": VMEM scratch
  (running max / normalizer / accumulator) persists across k steps, so
  VMEM stays bounded for any sequence length.
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
LOG2_E = math.log2(math.e)


def _attn_kernel_main(
    q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, scale, num_kv, kv_len, block_k
):
    """No-bias kernel: bf16 (or f32) dots, f32 online softmax, in-kernel
    masking of padded key columns."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    # base-2 softmax: the VPU exponential is exp2-native, so exp(x) costs an
    # extra x·log2(e) multiply over the whole score tile. Folding log2(e)
    # into the matmul scale makes every exp here a bare exp2 — the softmax
    # is identical because p = 2^(s·log2e − m₂) = e^(s − m) with the running
    # max tracked in base-2 units.
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (scale * LOG2_E)
    if kv_len % block_k:
        col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        s = jnp.where(col < kv_len, s, NEG_INF)
    m_prev = m_scr[:, 0]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1))
    p = jnp.exp2(s - m_cur[:, None])
    alpha = jnp.exp2(m_prev - m_cur)
    l_scr[:, 0] = l_scr[:, 0] * alpha + jnp.sum(p, axis=-1)
    acc_scr[:] = acc_scr[:] * alpha[:, None] + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
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
    """Bias variant (Swin relative-position bias / arbitrary masks)."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale + b_ref[0].astype(jnp.float32)
    m_prev = m_scr[:, 0]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1))
    p = jnp.exp(s - m_cur[:, None])
    alpha = jnp.exp(m_prev - m_cur)
    l_scr[:, 0] = l_scr[:, 0] * alpha + jnp.sum(p, axis=-1)
    acc_scr[:] = acc_scr[:] * alpha[:, None] + jnp.dot(
        p.astype(v_ref.dtype), v_ref[0], preferred_element_type=jnp.float32
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


def _pick_blocks(s_q: int, s_k: int, d: int) -> tuple[int, int]:
    """Largest power-of-two tiles that fit the ~16 MB/core VMEM budget with
    input double-buffering. Large K tiles matter most: the p@v contraction
    is block_k deep, which keeps the MXU full even at head_dim 64."""

    def fits(bq, bk):
        scores = bq * bk * 4 + bq * bk * 2  # f32 s + bf16 p copy
        tiles = 2 * (bq * d * 2 + 2 * bk * d * 2)  # double-buffered q/k/v
        acc = bq * d * 4 + bq * 8 * 4 * 2
        return scores + tiles + acc < 12 * 2**20

    bq = min(1024, max(128, 1 << (s_q - 1).bit_length()))
    bk = min(1024, max(128, 1 << (s_k - 1).bit_length()))
    while not fits(bq, bk):
        if bq >= bk and bq > 128:
            bq //= 2
        elif bk > 128:
            bk //= 2
        else:
            break
    return bq, bk


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "use_pallas"))
def flash_attention(
    q: Array,
    k: Array,
    v: Array,
    bias: Array | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
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
    auto_q, auto_k = _pick_blocks(s_q, s_k, d)
    block_q = block_q or auto_q
    block_k = block_k or auto_k

    qp = _pad_to(q, 1, block_q)
    kp = _pad_to(k, 1, block_k)
    vp = _pad_to(v, 1, block_k)
    sq_p, sk_p = qp.shape[1], kp.shape[1]
    if bias is not None:
        bias = jnp.broadcast_to(bias, (bh, s_q, s_k))
        bias = _pad_to(_pad_to(bias, 2, block_k, NEG_INF), 1, block_q)

    num_kv = sk_p // block_k
    grid = (bh, sq_p // block_q, num_kv)
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
            functools.partial(_attn_bias_kernel, scale=scale, num_kv=num_kv),
            out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec, b_spec],
            out_specs=out_spec,
            scratch_shapes=scratch,
            compiler_params=params,
        )(qp, kp, vp, bias)
    else:
        out = pl.pallas_call(
            functools.partial(
                _attn_kernel_main, scale=scale, num_kv=num_kv, kv_len=s_k,
                block_k=block_k,
            ),
            out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=out_spec,
            scratch_shapes=scratch,
            compiler_params=params,
        )(qp, kp, vp)
    return out[:, :s_q, :]


def _packed_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *, scale, num_kv):
    """Same online-softmax body as ``_attn_kernel_main`` but on (1, block, d)
    blocks sliced straight out of the (B, N, 3C) fused-QKV tensor — the
    channel axis is [q·H·D | k·H·D | v·H·D], so head h of slot s is the
    d-sized block at channel-block index s·H + h."""
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    # base-2 softmax with log2(e) folded into the scale (see
    # _attn_kernel_main) — exact, one fewer score-tile VPU multiply
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (scale * LOG2_E)
    m_prev = m_scr[:, 0]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1))
    p = jnp.exp2(s - m_cur[:, None])
    alpha = jnp.exp2(m_prev - m_cur)
    l_scr[:, 0] = l_scr[:, 0] * alpha + jnp.sum(p, axis=-1)
    acc_scr[:] = acc_scr[:] * alpha[:, None] + jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    m_scr[:, 0] = m_cur

    @pl.when(j == num_kv - 1)
    def _():
        o_ref[0] = (
            acc_scr[:] / jnp.maximum(l_scr[:, 0], 1e-30)[:, None]
        ).astype(o_ref.dtype)


def _packed_kernel2(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, *,
                    scale, num_kv, d, softmax_mode="exact"):
    """Two adjacent heads per grid step: the (1, block, 2D) channel block
    fills all 128 lanes at D=64 (a single-head block leaves half the lane
    tile empty in VMEM and DMA); the softmax body runs per sub-head.

    ``softmax_mode`` — the kernel is VPU(softmax)-bound at SDXL shapes
    (the two depth-64 dots are ~3 us/step while the score-tile VPU chain
    is ~2-3x that), so the variants trim full-score-tile VPU ops:

    * ``"exact"``: scale applied to the score tile, f32 exp2, separate
      bf16 cast for the p@v dot (3 full-tile ops around exp2).
    * ``"rawmax"``: running max kept in RAW score units (max commutes with
      the positive scale), scale folded into the exp2 argument's
      multiply-subtract — one fused full-tile FMA instead of mul+sub,
      algebraically identical output.
    * ``"bf16exp"``: rawmax + exp2 computed directly in bf16 — drops the
      separate f32->bf16 cast tile; l accumulates in f32 via the reduce's
      accumulator dtype. Argument rounding to bf16 perturbs tail
      probabilities by ~2^-8 relative (head terms, |x| near 0, are
      near-exact); A/B'd end-to-end before any default flip.
    """
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    c = scale * LOG2_E
    for t in range(2):
        sl = slice(t * d, (t + 1) * d)
        q = q_ref[0][:, sl]
        k = k_ref[0][:, sl]
        v = v_ref[0][:, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if softmax_mode == "exact":
            s = s * c
            m_prev = m_scr[:, t]
            m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1))
            p = jnp.exp2(s - m_cur[:, None])
            alpha = jnp.exp2(m_prev - m_cur)
            l_scr[:, t] = l_scr[:, t] * alpha + jnp.sum(p, axis=-1)
        else:
            # m_scr holds the RAW-unit running max; per-row scaling happens
            # on (block_q,) vectors, the score tile sees one FMA + exp2
            m_prev = m_scr[:, t]
            m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1))
            x = s * c - (m_cur * c)[:, None]
            if softmax_mode == "bf16exp":
                p = jnp.exp2(x.astype(jnp.bfloat16))
                row_sum = jnp.sum(p, axis=-1, dtype=jnp.float32)
            else:
                p = jnp.exp2(x)
                row_sum = jnp.sum(p, axis=-1)
            alpha = jnp.exp2((m_prev - m_cur) * c)
            l_scr[:, t] = l_scr[:, t] * alpha + row_sum
        acc_scr[:, sl] = acc_scr[:, sl] * alpha[:, None] + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        m_scr[:, t] = m_cur

    @pl.when(j == num_kv - 1)
    def _():
        out = []
        for t in range(2):
            sl = slice(t * d, (t + 1) * d)
            out.append(
                acc_scr[:, sl] / jnp.maximum(l_scr[:, t], 1e-30)[:, None]
            )
        o_ref[0] = jnp.concatenate(out, axis=-1).astype(o_ref.dtype)


def flash_attention_packed(
    qkv: Array, heads: int, use_pallas: bool | None = None, interpret: bool = False,
    heads_per_block: int | None = None, softmax_mode: str = "exact",
) -> Array:
    """Self-attention on a fused-QKV projection without any head transpose.

    ``qkv``: (B, N, 3C) — the raw output of one fused (C, 3C) GEMM, laid
    out [q | k | v] along the channel axis with H·D channels each. q/k/v
    are never materialized in (BH, N, D) layout; the kernel's BlockSpec
    index maps slice (1, block, D) blocks straight out of the channel axis
    (head h of slot s = channel-block s·H + h), and the output lands in
    (B, N, C) — the whole attention is transpose-free on both sides (the
    round-1 layout pool around `_attention` was measured at ~15 ms/step,
    tools/profile_unet.py). Requires N to be a multiple of the tile size
    (always true for the SDXL 4096/1024-token levels).
    """
    b, n, c3 = qkv.shape
    h = heads
    assert c3 % (3 * h) == 0
    # unknown strings must fail loudly, not silently run the rawmax branch
    # (the mode can arrive from the DIVERGEN_ATTN_SOFTMAX env var)
    assert softmax_mode in ("exact", "rawmax", "bf16exp"), softmax_mode
    d = c3 // (3 * h)
    scale = 1.0 / math.sqrt(d)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not (use_pallas or interpret):
        qh, kh, vh = (
            qkv[..., s * h * d : (s + 1) * h * d].reshape(b, n, h, d)
            for s in range(3)
        )
        s = jnp.einsum("bnhd,bmhd->bhnm", qh, kh, preferred_element_type=jnp.float32) * scale
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum(
            "bhnm,bmhd->bnhd", p.astype(vh.dtype), vh, preferred_element_type=jnp.float32
        ).astype(qkv.dtype).reshape(b, n, h * d)

    block_q, block_k = _pick_blocks(n, n, d)
    block_q, block_k = min(block_q, n), min(block_k, n)
    # Mosaic lane constraint: the last block dim must be a multiple of 128
    # (or span the whole channel axis). At SDXL's d=64 a single-head block
    # is 64-wide and fails to lower on hardware (caught by tests/tpu), so
    # hpb=2 (128-lane channel block) is the only valid packed config there;
    # shapes that can't tile to 128 lanes take the transposed flash path.
    if heads_per_block is None:
        hpb = 1 if d % 128 == 0 else (2 if (2 * d) % 128 == 0 and h % 2 == 0 else 0)
        if hpb == 0 and interpret:
            hpb = 1  # lane constraint is hardware-only; interpreter can run any width
    else:
        hpb = heads_per_block if (heads_per_block == 2 and h % 2 == 0) else 1
        if (hpb * d) % 128 and not interpret:
            hpb = 0
    if hpb == 0 or n % block_q or n % block_k:
        perm = lambda s: (
            qkv[..., s * h * d : (s + 1) * h * d]
            .reshape(b, n, h, d).transpose(0, 2, 1, 3).reshape(b * h, n, d)
        )
        out = flash_attention(perm(0), perm(1), perm(2), use_pallas=use_pallas)
        return out.reshape(b, h, n, d).transpose(0, 2, 1, 3).reshape(b, n, h * d)

    num_kv = n // block_k
    grid = (b, h // hpb, n // block_q, num_kv)
    bd = hpb * d  # channel-block width; index units below are bd-sized
    q_spec = pl.BlockSpec((1, block_q, bd), lambda bb, hh, i, j: (bb, i, hh),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, block_k, bd),
                          lambda bb, hh, i, j: (bb, j, h // hpb + hh),
                          memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((1, block_k, bd),
                          lambda bb, hh, i, j: (bb, j, 2 * (h // hpb) + hh),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, block_q, bd), lambda bb, hh, i, j: (bb, i, hh),
                            memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((block_q, hpb), jnp.float32),
        pltpu.VMEM((block_q, hpb), jnp.float32),
        pltpu.VMEM((block_q, bd), jnp.float32),
    ]
    kernel = (
        functools.partial(_packed_kernel2, scale=scale, num_kv=num_kv, d=d,
                          softmax_mode=softmax_mode)
        if hpb == 2
        else functools.partial(_packed_kernel, scale=scale, num_kv=num_kv)
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, n, h * d), qkv.dtype),
        grid=grid,
        in_specs=[q_spec, k_spec, v_spec],
        out_specs=out_spec,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(qkv, qkv, qkv)
    return out


def reference_attention(q: Array, k: Array, v: Array, bias: Array | None = None) -> Array:
    """Plain XLA softmax attention — numerics reference for the kernel.

    Products are computed on the native input dtype with f32 accumulation
    (for bf16 inputs this is bit-identical to upcasting first: the MXU
    multiplies bf16 exactly into an f32 accumulator)."""
    d = q.shape[-1]
    s = jnp.einsum(
        "bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32
    ) / math.sqrt(d)
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bqk,bkd->bqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


# ---------------------------------------------------------------------------
# decomposed relative-position flash attention (ViTDet/SAM global layers)
# ---------------------------------------------------------------------------
#
# SAM ViT-H's 4 global-attention layers at 64x64 tokens materialize
# (BH, 4096, 4096) scores PLUS an equal-size decomposed-rel-pos bias in the
# XLA path — ~1 GB of HBM round-trips per layer per image. The ViTDet bias
# decomposes as bias[q=(y,x), k=(u,v)] = Bh[q, u] + Bw[q, v] (reference
# semantics: segment-anything image_encoder add_decomposed_rel_pos), so the
# kernel streams only the (BH, H, N) / (BH, W, N) factors and rebuilds each
# score tile's bias in VMEM with sublane-axis broadcasts.
#
# Layout trick: the score tile is computed TRANSPOSED — s_t (block_k,
# block_q) = k·qᵀ — so both bias expansions run along the sublane (major)
# axis, where broadcast/reshape is free, and the online softmax reduces over
# sublanes. The p@v contraction dot_general(((0,), (0,))) lands the
# accumulator back in (block_q, d) without any transpose.
#
# Forward-only: used by the SAM inference graph (pipeline/segmentation/
# sam.py); the detection ViT backbone keeps the XLA path for training.


def _relpos_kernel(q_ref, k_ref, v_ref, bh_ref, bw_ref, o_ref,
                   m_scr, l_scr, acc_scr, *, scale, num_kv, block_k, w):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    du = block_k // w
    # transposed score tile: (block_k, block_q)
    s = jax.lax.dot_general(
        k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * (scale * LOG2_E)
    bh = bh_ref[0].astype(jnp.float32)  # (du, block_q)
    bw = bw_ref[0].astype(jnp.float32)  # (w, block_q)
    bias = (bh[:, None, :] + bw[None, :, :]).reshape(block_k, bh.shape[-1])
    s = s + bias * LOG2_E
    m_prev = m_scr[0]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=0))
    p = jnp.exp2(s - m_cur[None, :])
    alpha = jnp.exp2(m_prev - m_cur)
    l_scr[0] = l_scr[0] * alpha + jnp.sum(p, axis=0)
    acc_scr[:] = acc_scr[:] * alpha[:, None] + jax.lax.dot_general(
        p.astype(v.dtype), v, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[0] = m_cur

    @pl.when(j == num_kv - 1)
    def _():
        o_ref[0] = (
            acc_scr[:] / jnp.maximum(l_scr[0], 1e-30)[:, None]
        ).astype(o_ref.dtype)


def reference_attention_relpos(q, k, v, bias_h_t, bias_w_t, hw):
    """XLA reference: q/k/v (BH, N, D); bias_h_t (BH, H, N); bias_w_t
    (BH, W, N); hw = (H, W) with N = H*W."""
    h, w = hw
    bhn, n, d = q.shape
    s = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32)
    s = s / math.sqrt(d)
    bias = (bias_h_t[:, :, None, :] + bias_w_t[:, None, :, :])  # (BH,H,W,N)
    s = s + bias.reshape(bhn, n, n).transpose(0, 2, 1).astype(jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum(
        "bqk,bkd->bqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


def flash_attention_relpos(
    q: Array,  # (BH, N, D)
    k: Array,
    v: Array,
    bias_h_t: Array,  # (BH, H, N) f32: Bh[b, u, q] (q flattened (y,x))
    bias_w_t: Array,  # (BH, W, N) f32: Bw[b, v, q]
    hw: tuple[int, int],
    block_q: int = 512,
    block_k: int | None = None,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> Array:
    """Fused global attention with decomposed relative-position bias."""
    hh, ww = hw
    bh_n, n, d = q.shape
    assert n == hh * ww
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if block_k is None:
        block_k = max(ww, min(512 // ww * ww, n))
    ok = (
        (use_pallas or interpret)
        and n % block_q == 0
        and n % block_k == 0
        and block_k % ww == 0
        and block_q % 128 == 0
    )
    if not ok:
        return reference_attention_relpos(q, k, v, bias_h_t, bias_w_t, hw)

    scale = 1.0 / math.sqrt(d)
    num_kv = n // block_k
    du = block_k // ww
    grid = (bh_n, n // block_q, num_kv)
    q_spec = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0),
                           memory_space=pltpu.VMEM)
    bh_spec = pl.BlockSpec((1, du, block_q), lambda b, i, j: (b, j, i),
                           memory_space=pltpu.VMEM)
    bw_spec = pl.BlockSpec((1, ww, block_q), lambda b, i, j: (b, 0, i),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0),
                            memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((1, block_q), jnp.float32),
        pltpu.VMEM((1, block_q), jnp.float32),
        pltpu.VMEM((block_q, d), jnp.float32),
    ]
    return pl.pallas_call(
        functools.partial(_relpos_kernel, scale=scale, num_kv=num_kv,
                          block_k=block_k, w=ww),
        out_shape=jax.ShapeDtypeStruct((bh_n, n, d), q.dtype),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, bh_spec, bw_spec],
        out_specs=out_spec,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        interpret=interpret,
    )(q, k, v, bias_h_t, bias_w_t)
