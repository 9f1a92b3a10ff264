"""Pallas W8A8 GEMM with fused dequantization epilogue.

Why a kernel: XLA lowers ``int8 x int8 -> int32 dot ; convert ; scale`` as a
materialized int32 accumulator in HBM followed by an elementwise fusion —
at SDXL shapes (e.g. 2048x10240 int32 = 84 MB per GEMM) that extra HBM
round trip erases the int8 MXU win (measured: the full int8 UNet step got
*slower* than bf16). Here the int32 accumulator lives in VMEM scratch and
the dequant (rank-1 outer product of per-row activation scales and
per-column weight scales) happens in-register on the final K step, so the
only HBM writes are the bf16 outputs.

Used by ``ops.quant.int8_matmul`` when the operands tile cleanly on TPU;
callers keep the XLA path otherwise (tiny context GEMMs, CPU tests).

Reference counterpart: none (the reference serves fp16 through torch);
this is TPU-native serving work for the v5e int8 MXU (2x bf16 peak).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xq_ref, xs_ref, wq_ref, ws_ref, o_ref, acc_scr, *, num_k):
    k_step = pl.program_id(2)

    @pl.when(k_step == 0)
    def _():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    acc_scr[:] += jax.lax.dot_general(
        xq_ref[:],
        wq_ref[:],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k_step == num_k - 1)
    def _():
        # dequant epilogue in-register: int32 -> f32, rank-1 scale
        o_ref[:] = (
            acc_scr[:].astype(jnp.float32) * xs_ref[:] * ws_ref[:]
        ).astype(o_ref.dtype)


def _pick_block(dim: int, candidates=(1024, 640, 512, 256, 128)) -> int:
    for c in candidates:
        if dim % c == 0:
            return c
    return 0


def supported(m: int, k: int, n: int) -> bool:
    return bool(_pick_block(m) and _pick_block(k) and _pick_block(n))


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def int8_matmul_pallas(
    x_q: Array,  # (M, K) int8
    x_scale: Array,  # (M, 1) f32
    w_q: Array,  # (K, N) int8
    w_scale: Array,  # (N,) f32
    out_dtype=jnp.bfloat16,
) -> Array:
    m, k = x_q.shape
    _, n = w_q.shape
    bm, bk, bn = _pick_block(m), _pick_block(k), _pick_block(n)
    # bound the int32 accumulator + operand tiles to a few MB of VMEM
    bm = min(bm, 1024)
    bn = min(bn, 1024)
    bk = min(bk, 1024)
    grid = (m // bm, n // bn, k // bk)
    return pl.pallas_call(
        functools.partial(_kernel, num_k=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, s: (i, s)),
            pl.BlockSpec((bm, 1), lambda i, j, s: (i, 0)),
            pl.BlockSpec((bk, bn), lambda i, j, s: (s, j)),
            pl.BlockSpec((1, bn), lambda i, j, s: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, s: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
    )(x_q, x_scale, w_q, w_scale.reshape(1, n))


def _kernel_fq(x_ref, wq_ref, ws_ref, o_ref):
    """Fused dynamic activation quantization + int8 dot + dequant epilogue.

    The whole K extent lives in the (bm, K) block, so the per-row absmax is
    computed in VMEM — the separate quantize pass (one extra HBM round trip
    of x + one more kernel launch per GEMM) disappears. Semantics match
    ops.quant.quantize_act (symmetric absmax / 127)."""
    x = x_ref[:].astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(x), axis=1, keepdims=True), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq_ref[:], (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    o_ref[:] = (acc.astype(jnp.float32) * scale * ws_ref[:]).astype(o_ref.dtype)


# block candidates for the fused-quant path: every candidate must stay a
# divisor after capping (a plain min(_pick_block(m), 512) turns 640 into 512,
# which doesn't divide m=640/1280/... and the grid would floor-drop the tail)
_FQ_M_BLOCKS = (512, 256, 128)
_FQ_N_BLOCKS = (1024, 640, 512, 256, 128)


def supported_fused_quant(m: int, k: int, n: int) -> bool:
    # K is unblocked (whole extent in VMEM): (bm, K) bf16 + (K, bn) int8
    # must fit comfortably; SDXL transformer K <= 2560
    return (
        bool(_pick_block(m, _FQ_M_BLOCKS) and _pick_block(n, _FQ_N_BLOCKS))
        and k % 128 == 0
        and k <= 4096
    )


@functools.partial(jax.jit, static_argnames=("out_dtype", "interpret"))
def int8_matmul_fused_quant(
    x: Array,  # (M, K) bf16/f32
    w_q: Array,  # (K, N) int8
    w_scale: Array,  # (N,) f32
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> Array:
    m, k = x.shape
    _, n = w_q.shape
    bm = _pick_block(m, _FQ_M_BLOCKS)
    bn = _pick_block(n, _FQ_N_BLOCKS)
    grid = (m // bm, n // bn)
    return pl.pallas_call(
        _kernel_fq,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, bn), lambda i, j: (0, j)),
            pl.BlockSpec((1, bn), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        ),
        interpret=interpret,
    )(x, w_q, w_scale.reshape(1, n))
