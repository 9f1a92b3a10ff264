"""Interpret-mode parity for the fused LN+GEMM kernel (ops/pallas/ln_matmul).

Hardware parity lives in tests/tpu/test_kernels_tpu.py; here the Pallas
interpreter checks the kernel math (moment/affine fusion, scratch reuse
across column blocks, GEGLU epilogue, bias add) against the XLA reference
on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from divergen_tpu.ops.pallas.ln_matmul import _reference, fused_ln_matmul


def _mk(m, k, n, dtype, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(m, k), dtype)
    w = jnp.asarray(rng.randn(k, n) / np.sqrt(k), dtype)
    gamma = jnp.asarray(rng.rand(k) + 0.5, jnp.float32)
    beta = jnp.asarray(rng.randn(k) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.randn(n) * 0.1, jnp.float32)
    return x, w, gamma, beta, bias


@pytest.mark.parametrize("m,k,n,bm,bn", [
    (32, 256, 384, 16, 128),   # multiple row/col blocks (scratch reuse)
    (16, 128, 128, 16, 128),   # single block
    (64, 256, 1280, 32, 256),  # many column blocks
])
@pytest.mark.parametrize("with_bias", [False, True])
def test_ln_matmul_interpret(m, k, n, bm, bn, with_bias):
    x, w, gamma, beta, bias = _mk(m, k, n, jnp.float32)
    b = bias if with_bias else None
    got = fused_ln_matmul(x, w, gamma, beta, 1e-5, b, bm=bm, bn=bn,
                          use_pallas=False, interpret=True)
    want = _reference(x, w, gamma, beta, 1e-5, b, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("m,k,n,bm,bn", [
    (32, 256, 512, 16, 128),   # GEGLU: h/g halves 256 apart, 2 col blocks
    (16, 128, 256, 16, 128),
])
@pytest.mark.parametrize("with_bias", [False, True])
def test_ln_matmul_geglu_interpret(m, k, n, bm, bn, with_bias):
    x, w, gamma, beta, bias = _mk(m, k, n, jnp.float32, seed=1)
    b = bias if with_bias else None
    got = fused_ln_matmul(x, w, gamma, beta, 1e-5, b, geglu=True,
                          bm=bm, bn=bn, use_pallas=False, interpret=True)
    want = _reference(x, w, gamma, beta, 1e-5, b, True)
    assert got.shape == (m, n // 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ln_matmul_bf16_interpret():
    x, w, gamma, beta, bias = _mk(64, 256, 384, jnp.bfloat16, seed=2)
    got = fused_ln_matmul(x, w, gamma, beta, 1e-5, bias, bm=32, bn=128,
                          use_pallas=False, interpret=True)
    want = _reference(x, w, gamma, beta, 1e-5, bias, False)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=3e-2, atol=3e-2)


def test_ln_matmul_fallback_shapes():
    # K not a 128-multiple -> XLA reference path, still correct
    x, w, gamma, beta, bias = _mk(32, 96, 128, jnp.float32, seed=3)
    got = fused_ln_matmul(x, w, gamma, beta, 1e-5, bias, use_pallas=True)
    want = _reference(x, w, gamma, beta, 1e-5, bias, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("mode", [True, "qkv"])
def test_unet_ln_gemm_param_tree_and_equivalence(mode):
    """UNetSDXL(ln_gemm=True/'qkv') accepts the default module's param tree
    and matches its outputs (CPU: the kernel's XLA reference path — same
    math, different fusion)."""
    import jax

    from divergen_tpu.pipeline.generation.unet import UNetSDXL

    kw = dict(
        block_channels=(32, 64),
        transformer_depths=(0, 1),
        layers_per_block=1,
        head_dim=32,
        context_dim=32,
        addition_time_embed_dim=8,
        pooled_proj_dim=32 + 6 * 8,
        dtype=jnp.float32,
    )
    base = UNetSDXL(**kw)
    B, H, W = 2, 16, 16
    x = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 4))
    t = jnp.full((B,), 500.0)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (B, 9, 32))
    pooled = jax.random.normal(jax.random.PRNGKey(3), (B, 32))
    tids = jnp.tile(
        jnp.asarray([[H * 8, W * 8, 0, 0, H * 8, W * 8]], jnp.float32), (B, 1)
    )
    params = base.init(jax.random.PRNGKey(0), x, t, ctx, pooled, tids)
    ref = base.apply(params, x, t, ctx, pooled, tids)
    got = UNetSDXL(ln_gemm=mode, **kw).apply(params, x, t, ctx, pooled, tids)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=5e-4, rtol=5e-4
    )


@pytest.mark.parametrize("m,k,n,bm,bn", [
    (32, 256, 384, 16, 128),
    (64, 128, 512, 32, 256),
])
def test_ln_matmul_gelu_interpret(m, k, n, bm, bn):
    x, w, gamma, beta, bias = _mk(m, k, n, jnp.float32, seed=4)
    got = fused_ln_matmul(x, w, gamma, beta, 1e-5, bias, act="gelu",
                          bm=bm, bn=bn, use_pallas=False, interpret=True)
    want = _reference(x, w, gamma, beta, 1e-5, bias, False, act="gelu")
    # erf via Abramowitz-Stegun in-kernel (|err|<1.5e-7 on erf, scaled by
    # the GEMM output magnitude ~sqrt(k))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_vit_block_ln_gemm_param_tree_and_equivalence():
    """ViTBlock(ln_gemm=True) accepts the default param tree and matches
    outputs for BOTH the global-attention path (norm1 folded into qkv) and
    the window path (norm1 stays XLA — reference pads AFTER the norm)."""
    from divergen_tpu.modeling.backbone.vit import ViTBlock

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 64))
    for window in (0, 4):
        base = ViTBlock(64, 2, window=window)
        params = base.init(jax.random.PRNGKey(0), x)
        fused = ViTBlock(64, 2, window=window, ln_gemm=True)
        p2 = fused.init(jax.random.PRNGKey(0), x)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(p2)), f"window={window}"
        ref = base.apply(params, x)
        got = fused.apply(params, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=5e-5, rtol=5e-5, err_msg=f"window={window}")


def test_sam_ln_gemm_equivalence():
    """SAM tiny forward with encoder ln_gemm on/off: same params, same
    masks+ious through the full promptable graph."""
    from divergen_tpu.pipeline.segmentation.sam import SAM, SAMImageEncoder

    enc = dict(img_size=64, dim=32, layers=2, heads=2, window=4, global_layers=(1,))
    base = SAM(encoder=SAMImageEncoder(**enc))
    fused = SAM(encoder=SAMImageEncoder(**enc, ln_gemm=True))
    imgs = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3) * 255, jnp.float32)
    pts = jnp.asarray([[[5.0, 5.0], [60.0, 60.0]]])
    lbl = jnp.ones((1, 2), jnp.int32)
    params = base.init(jax.random.PRNGKey(0), imgs, pts, lbl)
    m0, i0 = base.apply(params, imgs, pts, lbl)
    m1, i1 = fused.apply(params, imgs, pts, lbl)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i0), atol=1e-4, rtol=1e-4)


# --------- decomposed rel-pos flash attention (SAM/ViTDet global) ---------
@pytest.mark.parametrize("bh,hw,d,bq", [
    (2, (8, 8), 32, 128),     # du = 2 rows per k-tile (block_k=128)
    (1, (16, 16), 16, 128),   # n=256, multi q/k tiles
])
def test_flash_relpos_interpret(bh, hw, d, bq):
    from divergen_tpu.ops.pallas.flash_attention import (
        flash_attention_relpos,
        reference_attention_relpos,
    )

    h, w = hw
    n = h * w
    rng = np.random.RandomState(7)
    q = jnp.asarray(rng.randn(bh, n, d), jnp.float32)
    k = jnp.asarray(rng.randn(bh, n, d), jnp.float32)
    v = jnp.asarray(rng.randn(bh, n, d), jnp.float32)
    bh_t = jnp.asarray(rng.randn(bh, h, n) * 0.3, jnp.float32)
    bw_t = jnp.asarray(rng.randn(bh, w, n) * 0.3, jnp.float32)
    got = flash_attention_relpos(q, k, v, bh_t, bw_t, hw, block_q=bq,
                                 use_pallas=False, interpret=True)
    want = reference_attention_relpos(q, k, v, bh_t, bw_t, hw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_vit_block_flash_relpos_equivalence():
    """ViTBlock(flash_attn=True) global layer: same params, same outputs
    (CPU: the kernel's XLA fallback — same math, reordered ops)."""
    from divergen_tpu.modeling.backbone.vit import ViTBlock

    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 64))
    base = ViTBlock(64, 2, window=0)
    params = base.init(jax.random.PRNGKey(0), x)
    fused = ViTBlock(64, 2, window=0, flash_attn=True)
    p2 = fused.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))
    ref = base.apply(params, x)
    got = fused.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
