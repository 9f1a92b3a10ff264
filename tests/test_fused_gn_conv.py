"""Fused GN+SiLU+conv3x3 kernel vs the unfused reference path (interpret
mode; hardware timing in tools/r2_perf_sweep.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from divergen_tpu.ops.pallas.fused_gn_conv import fused_gn_silu_conv3x3


def _reference(x, scale, bias, kernel, cbias, groups, eps=1e-6):
    b, h, w, c = x.shape
    g = min(groups, c)
    while c % g:
        g -= 1
    xf = np.asarray(x, np.float64)
    xg = xf.reshape(b, h, w, g, c // g)
    m = xg.mean(axis=(1, 2, 4), keepdims=True)
    v = xg.var(axis=(1, 2, 4), keepdims=True)
    y = ((xg - m) / np.sqrt(v + eps)).reshape(b, h, w, c)
    y = y * np.asarray(scale) + np.asarray(bias)
    y = y / (1 + np.exp(-y))  # silu
    yp = np.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
    co = kernel.shape[-1]
    out = np.zeros((b, h, w, co))
    for dy in range(3):
        for dx in range(3):
            tap = yp[:, dy : dy + h, dx : dx + w, :]
            out += np.einsum("bhwc,co->bhwo", tap, np.asarray(kernel[dy, dx], np.float64))
    return out + np.asarray(cbias)


@pytest.mark.parametrize("shape,co,groups", [
    ((2, 8, 8, 32), 64, 32),
    ((1, 16, 12, 64), 32, 32),
    ((1, 8, 8, 48), 16, 8),  # gcd group fallback (48 % 32 != 0)
])
def test_fused_gn_silu_conv_interpret(shape, co, groups):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape) * 0.5, jnp.float32)
    c = shape[-1]
    scale = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
    gbias = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    kernel = jnp.asarray(rng.randn(3, 3, c, co) * 0.05, jnp.float32)
    cbias = jnp.asarray(rng.randn(co) * 0.1, jnp.float32)

    got = np.asarray(fused_gn_silu_conv3x3(
        x, scale, gbias, kernel, cbias, groups=groups, interpret=True
    ))
    want = _reference(x, scale, gbias, kernel, cbias, groups)
    # bf16 slab + bf16 kernel inputs: tolerance at bf16 resolution
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)
    # and structurally: nonzero border rows (padding masked AFTER silu, so a
    # wrong mask would leak silu(b) != 0 into border bins)
    assert np.isfinite(got).all()


def test_fused_matches_unfused_module_path():
    """Same numerics as the UNet's GroupNorm32 + silu + nn.Conv chain (the
    path it would replace), at matched precision."""
    import flax.linen as nn

    from divergen_tpu.pipeline.generation.unet import GroupNorm32

    rng = np.random.RandomState(1)
    b, h, w, c, co = 1, 8, 8, 32, 32
    x = jnp.asarray(rng.randn(b, h, w, c) * 0.7, jnp.float32)

    class Chain(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = nn.silu(GroupNorm32(name="norm")(x))
            return nn.Conv(co, (3, 3), padding=1, name="conv")(y)

    m = Chain()
    params = m.init(jax.random.PRNGKey(0), x)
    want = np.asarray(m.apply(params, x))
    p = params["params"]
    got = np.asarray(fused_gn_silu_conv3x3(
        x, p["norm"]["GroupNorm_0"]["scale"], p["norm"]["GroupNorm_0"]["bias"],
        p["conv"]["kernel"], p["conv"]["bias"], interpret=True,
    ))
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_resblock_fused_mode_matches_default():
    """UNet ResBlock conv_matmul='fused' shares the exact param tree with
    the default path and matches its outputs (XLA fallback on CPU; the
    Pallas path itself is pinned by the interpret tests above and
    tests/tpu on hardware)."""
    from divergen_tpu.pipeline.generation.unet import ResBlock

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 32) * 0.6, jnp.float32)
    emb = jnp.asarray(rng.randn(1, 48), jnp.float32)
    base = ResBlock(out_channels=64)
    params = base.init(jax.random.PRNGKey(0), x, emb)
    fused = ResBlock(out_channels=64, conv_matmul="fused")
    p2 = fused.init(jax.random.PRNGKey(0), x, emb)
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(p2)
    want = np.asarray(base.apply(params, x, emb))
    got = np.asarray(fused.apply(params, x, emb))
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)
