"""int8 W8A8 quantization path (ops/quant.py + MaybeQuantDense + pipeline)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from divergen_tpu.ops.quant import (
    dense_apply,
    int8_matmul,
    quantize_act,
    quantize_param_tree,
    quantize_weight,
)


def test_quantize_weight_roundtrip():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(64, 32).astype(np.float32))
    q, s = quantize_weight(w)
    assert q.dtype == jnp.int8 and s.shape == (32,)
    deq = np.asarray(q, np.float32) * np.asarray(s)[None]
    err = np.abs(deq - np.asarray(w)).max(axis=0)
    # symmetric absmax: per-channel error bounded by scale/2
    assert (err <= np.asarray(s) * 0.5 + 1e-7).all()


def test_int8_matmul_close_to_float():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(16, 64).astype(np.float32))
    w = jnp.asarray(rng.randn(64, 32).astype(np.float32) * 0.1)
    q, s = quantize_weight(w)
    got = np.asarray(int8_matmul(x, q, s))
    want = np.asarray(x @ w)
    # relative error of W8A8 dynamic quant on gaussian data: ~1%
    rel = np.abs(got - want) / (np.abs(want).mean() + 1e-6)
    assert rel.mean() < 0.02, rel.mean()


def test_quantize_act_outliers():
    x = jnp.asarray([[1.0, -200.0, 3.0], [0.001, 0.002, -0.001]])
    q, s = quantize_act(x)
    deq = np.asarray(q, np.float32) * np.asarray(s)
    np.testing.assert_allclose(deq[0, 1], -200.0, rtol=0.01)
    np.testing.assert_allclose(deq[1], np.asarray(x)[1], rtol=0.01)


def test_quantize_param_tree_select_and_dense_apply():
    rng = np.random.RandomState(2)
    tree = {
        "params": {
            "block0": {
                "attn1_q": {"kernel": jnp.asarray(rng.randn(8, 8), jnp.float32)},
                "norm1": {"scale": jnp.ones((8,)), "bias": jnp.zeros((8,))},
            },
            "time_embed_1": {
                "kernel": jnp.asarray(rng.randn(8, 8), jnp.float32),
                "bias": jnp.zeros((8,)),
            },
        }
    }
    from divergen_tpu.pipeline.generation.unet import transformer_quant_select

    out = quantize_param_tree(tree, select=transformer_quant_select)
    q_node = out["params"]["block0"]["attn1_q"]
    assert "kernel_q" in q_node and "kernel" not in q_node
    # non-selected dense untouched
    assert "kernel" in out["params"]["time_embed_1"]
    # norm untouched
    assert "scale" in out["params"]["block0"]["norm1"]

    x = jnp.asarray(rng.randn(4, 8), jnp.float32)
    got = np.asarray(dense_apply(q_node, x, jnp.float32))
    want = np.asarray(x @ tree["params"]["block0"]["attn1_q"]["kernel"])
    assert np.abs(got - want).mean() < 0.1


def test_tiny_unet_int8_close_to_float():
    """Full tiny UNet: quant=True apply on the quantized tree vs the float
    forward — outputs must be close (serving-quality tolerance)."""
    from divergen_tpu.pipeline.generation.unet import (
        UNetSDXL,
        transformer_quant_select,
    )

    float_unet = UNetSDXL.tiny(dtype=jnp.float32)
    quant_unet = float_unet.clone(quant=True)
    rng = jax.random.PRNGKey(0)
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 7, float_unet.context_dim))
    t = jnp.zeros((1,))
    params = float_unet.init(rng, lat, t, ctx)
    want = np.asarray(float_unet.apply(params, lat, t, ctx))
    qparams = quantize_param_tree(params, select=transformer_quant_select)
    got = np.asarray(quant_unet.apply(qparams, lat, t, ctx))
    assert np.isfinite(got).all()
    denom = np.abs(want).mean() + 1e-6
    assert np.abs(got - want).mean() / denom < 0.1, np.abs(got - want).mean() / denom


def test_pipeline_int8_generate_runs():
    from divergen_tpu.pipeline.generation.pipeline import SDXLPipeline
    from divergen_tpu.pipeline.generation.unet import UNetSDXL
    from divergen_tpu.pipeline.generation.vae import VAEDecoder

    float_unet = UNetSDXL.tiny(dtype=jnp.float32)
    unet = float_unet.clone(quant=True)
    vae = VAEDecoder(channels=(8, 8), dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    lat = jnp.zeros((1, 8, 8, 4))
    ctx = jnp.zeros((1, 7, float_unet.context_dim))
    params = float_unet.init(rng, lat, jnp.zeros((1,)), ctx)
    vp = vae.init(rng, lat)
    pipe = SDXLPipeline(unet, params, vae, vp, steps=2, int8=True)
    out = pipe.generate(rng, ctx, ctx, height=64, width=64)
    o = np.asarray(out)
    # tiny 2-level VAE upscales 2x from the 8x8 latent
    assert o.shape == (1, 16, 16, 3) and np.isfinite(o).all()


@pytest.mark.parametrize("m,k,n", [(256, 640, 512), (1280, 640, 640)])
def test_int8_matmul_fused_quant_interpret(m, k, n):
    """Fused in-kernel activation quantization == quantize_act + int8 dot
    (interpret mode; hardware timing in tools/r2_perf_sweep.py).

    m=1280 regression-pins the block pick: a plain min(_pick_block(m), 512)
    chose bm=512 for m divisible by 640 but not 512, silently dropping the
    last m % 512 output rows."""
    import jax
    import jax.numpy as jnp

    from divergen_tpu.ops.pallas.int8_matmul import (
        int8_matmul_fused_quant,
        supported_fused_quant,
    )
    from divergen_tpu.ops.quant import quantize_act, quantize_weight

    rng = np.random.RandomState(0)
    assert supported_fused_quant(m, k, n)
    x = jnp.asarray(rng.randn(m, k) * 0.2, jnp.float32)
    w = jnp.asarray(rng.randn(k, n) * 0.05, jnp.float32)
    wq, ws = quantize_weight(w)
    got = np.asarray(int8_matmul_fused_quant(x, wq, ws, out_dtype=jnp.float32,
                                             interpret=True))
    xq, xs = quantize_act(x)
    acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    want = np.asarray(acc.astype(jnp.float32) * xs * ws)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
