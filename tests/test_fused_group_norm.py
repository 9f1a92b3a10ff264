"""Parity tests for the Pallas fused GroupNorm(+SiLU) kernel.

The kernel targets the SDXL ResBlock/SpatialTransformer GroupNorms
(reference: torch nn.GroupNorm inside diffusers ResnetBlock2D, driven by
DiverGen/generation/txt2img_diffusers_stages_from_txt.py). On CPU the
kernel runs in interpret mode against the channel-moment XLA reference.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from divergen_tpu.ops.pallas.group_norm import _reference, fused_group_norm
from divergen_tpu.pipeline.generation.unet import UNetSDXL


@pytest.mark.parametrize(
    "shape,groups",
    [
        ((2, 16, 8, 256), 32),
        ((2, 8, 16, 320), 32),  # SDXL level-0 channel count (non-128-mult)
        ((1, 32, 8, 128), 32),
        ((3, 8, 8, 64), 32),  # gcd path: groups -> 32 % 64 -> 32
    ],
)
@pytest.mark.parametrize("silu", [False, True])
def test_kernel_matches_reference(shape, groups, silu):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape) * 2 + 0.3, jnp.float32)
    c = shape[-1]
    scale = jnp.asarray(rng.rand(c) + 0.5, jnp.float32)
    bias = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    import math

    g = math.gcd(groups, c)
    got = fused_group_norm(x, scale, bias, g, 1e-6, silu, interpret=True)
    want = _reference(x, scale, bias, g, 1e-6, silu)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_kernel_bf16_io():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 256), jnp.bfloat16)
    scale = jnp.ones((256,), jnp.float32)
    bias = jnp.zeros((256,), jnp.float32)
    got = fused_group_norm(x, scale, bias, 32, 1e-6, True, interpret=True)
    want = _reference(x, scale, bias, 32, 1e-6, True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=2e-2
    )


def test_grad_falls_back_to_reference():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 128), jnp.float32)
    scale = jnp.asarray(rng.rand(128) + 0.5, jnp.float32)
    bias = jnp.zeros((128,), jnp.float32)

    def f(x, s, b):
        return jnp.sum(fused_group_norm(x, s, b, 32, 1e-6, True, interpret=True) ** 2)

    def f_ref(x, s, b):
        return jnp.sum(_reference(x, s, b, 32, 1e-6, True) ** 2)

    gx, gs, gb = jax.grad(f, argnums=(0, 1, 2))(x, scale, bias)
    rx, rs, rb = jax.grad(f_ref, argnums=(0, 1, 2))(x, scale, bias)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(rs), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), atol=1e-4, rtol=1e-4)


def test_unet_fused_norm_flags_same_params_and_output():
    """fused_ln/fused_gn change the compute path, not the param tree or (on
    the CPU fallback) the numerics."""
    rng = jax.random.PRNGKey(0)
    lat = jnp.zeros((1, 16, 16, 4), jnp.float32)
    ctx = jnp.zeros((1, 7, 64), jnp.float32)
    base = UNetSDXL.tiny()
    fused = UNetSDXL.tiny(fused_ln=True, fused_gn=True)
    p0 = base.init(rng, lat, jnp.zeros((1,)), ctx)
    p1 = fused.init(rng, lat, jnp.zeros((1,)), ctx)
    assert jax.tree_util.tree_structure(p0) == jax.tree_util.tree_structure(p1)
    y0 = base.apply(p0, lat + 0.1, jnp.ones((1,)), ctx + 0.2)
    y1 = fused.apply(p0, lat + 0.1, jnp.ones((1,)), ctx + 0.2)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5, rtol=1e-5)


def test_gn_dot_stats_equivalence(monkeypatch):
    """DIVERGEN_GN_DOT=1 (moments as MXU ones-contractions) matches the
    reduce path within bf16 square-rounding tolerance."""
    import jax
    import jax.numpy as jnp

    from divergen_tpu.pipeline.generation.unet import GroupNorm32

    x = jnp.asarray(
        np.random.RandomState(0).randn(2, 16, 16, 64) * 2 + 0.5, jnp.bfloat16
    )
    gn = GroupNorm32(dtype=jnp.bfloat16)
    params = gn.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(gn.apply(params, x), np.float32)
    monkeypatch.setenv("DIVERGEN_GN_DOT", "1")
    got = np.asarray(gn.apply(params, x), np.float32)
    np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)
