"""Swin backbone shape/gradient tests (pattern: detectron2 tests/modeling
random-input no-weights tests, SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from divergen_tpu.modeling.backbone.swin import SwinTransformer, _shift_attn_mask


def test_swin_shapes():
    m = SwinTransformer.from_size("T")
    x = jnp.zeros((2, 96, 128, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = jax.jit(lambda p, x: m.apply(p, x))(params, x)
    assert out["s2"].shape == (2, 24, 32, 96)
    assert out["s3"].shape == (2, 12, 16, 192)
    assert out["s4"].shape == (2, 6, 8, 384)
    assert out["s5"].shape == (2, 3, 4, 768)


def test_swin_nonmultiple_input_padding():
    # H,W not multiples of window*patch: internal padding must keep shapes
    m = SwinTransformer.from_size("T")
    x = jnp.zeros((1, 100, 130, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out["s2"].shape[1:3] == (25, 33)


def test_swin_grads_finite():
    m = SwinTransformer.from_size("T")
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)

    def loss(p):
        out = m.apply(p, x)
        return sum(jnp.sum(v**2) for v in out.values())

    g = jax.grad(loss)(params)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_shift_mask_blocks_cross_region():
    mask = _shift_attn_mask(14, 14, 7, 3)
    assert mask.shape == (4, 49, 49)
    # the first (interior) window has no region boundary → all-zero mask
    assert np.all(mask[0] == 0)
    # boundary windows must mask something
    assert np.any(mask[-1] < 0)


def test_droppath_deterministic_by_default():
    sw = SwinTransformer(embed_dim=32, depths=(2,), num_heads=(2,), window=4, drop_path_rate=0.5)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 16, 3))
    p = sw.init(jax.random.PRNGKey(0), x)
    a = sw.apply(p, x, deterministic=True)
    b = sw.apply(p, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(a["s2"]), np.asarray(b["s2"]))
    # stochastic path requires dropout rng and differs across keys
    c = sw.apply(p, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
    d = sw.apply(p, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(c["s2"]), np.asarray(d["s2"]))
