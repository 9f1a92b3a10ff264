"""Fused window attention kernel vs plain-jnp reference (fwd + grads).

Runs the pallas kernel in interpret mode on CPU — same code path that
executes on TPU, numerics checked against XLA autodiff.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from divergen_tpu.ops.pallas.window_attention import (
    _reference,
    fused_window_attention,
)


def make_inputs(bsz=8, h=3, n=16, d=8, with_mask=True, nw=4, seed=0):
    rng = np.random.RandomState(seed)
    q = jnp.asarray(rng.randn(bsz, h, n, d), jnp.float32)
    k = jnp.asarray(rng.randn(bsz, h, n, d), jnp.float32)
    v = jnp.asarray(rng.randn(bsz, h, n, d), jnp.float32)
    bias = jnp.asarray(rng.randn(h, n, n) * 0.1, jnp.float32)
    mask = None
    if with_mask:
        m = rng.choice([0.0, -100.0], size=(nw, n, n), p=[0.8, 0.2])
        mask = jnp.asarray(m, jnp.float32)
    return q, k, v, bias, mask


@pytest.mark.parametrize("with_mask", [False, True])
def test_fused_forward_matches_reference(with_mask):
    q, k, v, bias, mask = make_inputs(with_mask=with_mask)
    ref = _reference(q, k, v, bias, mask)
    got = fused_window_attention(q, k, v, bias, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("with_mask", [False, True])
def test_fused_grads_match_reference(with_mask):
    q, k, v, bias, mask = make_inputs(with_mask=with_mask)

    def loss_ref(q, k, v, bias):
        return jnp.sum(jnp.sin(_reference(q, k, v, bias, mask)))

    def loss_fused(q, k, v, bias):
        return jnp.sum(jnp.sin(fused_window_attention(q, k, v, bias, mask, interpret=True)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_fus = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, a, b in zip("qkvb", g_ref, g_fus):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-5, rtol=1e-3, err_msg=f"d{name}"
        )


@pytest.mark.parametrize("h", [16, 24])
def test_fused_grads_multiple_head_blocks(h):
    """>8 heads → multiple head blocks (HB=8): exercises the db-accumulation
    grid ordering (windows must be the innermost grid dim; with the old
    (windows, heads) grid the interpreter raises 'Revisited block' and
    hardware produces garbage bias grads)."""
    q, k, v, bias, mask = make_inputs(bsz=4, h=h, n=8, d=4, nw=2, seed=3)

    def loss_ref(q, k, v, bias):
        return jnp.sum(jnp.sin(_reference(q, k, v, bias, mask)))

    def loss_fused(q, k, v, bias):
        return jnp.sum(jnp.sin(fused_window_attention(q, k, v, bias, mask, interpret=True)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_fus = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, a, b in zip("qkvb", g_ref, g_fus):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-5, rtol=1e-3, err_msg=f"d{name}"
        )


def test_fused_grouping_odd_batch():
    # bsz not divisible by the default group → group shrinks to 1
    q, k, v, bias, mask = make_inputs(bsz=6, h=5, nw=3)
    ref = _reference(q, k, v, bias, mask)
    got = fused_window_attention(q, k, v, bias, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


# ---------------- packed (transpose-free) entry ----------------
from divergen_tpu.ops.pallas.window_attention import (  # noqa: E402
    _reference_packed,
    fused_window_attention_packed,
)


def make_packed(bsz=4, h=4, n=16, d=32, with_mask=True, nw=2, seed=7):
    rng = np.random.RandomState(seed)
    qkv = jnp.asarray(rng.randn(bsz, n, 3 * h * d), jnp.float32)
    bias = jnp.asarray(rng.randn(h, n, n) * 0.1, jnp.float32)
    mask = None
    if with_mask:
        m = rng.choice([0.0, -100.0], size=(nw, n, n), p=[0.8, 0.2])
        mask = jnp.asarray(m, jnp.float32)
    return qkv, bias, mask


@pytest.mark.parametrize("with_mask", [False, True])
@pytest.mark.parametrize("h,d", [(4, 32), (12, 32), (2, 128)])
def test_packed_forward_matches_reference(with_mask, h, d):
    """hpb=4 at d=32 (the Swin head width) incl. multiple head blocks, and
    hpb=1 at d=128."""
    qkv, bias, mask = make_packed(h=h, d=d, with_mask=with_mask)
    ref = _reference_packed(qkv, bias, mask, h)
    got = fused_window_attention_packed(qkv, bias, mask, h, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("with_mask", [False, True])
@pytest.mark.parametrize("h", [4, 8])
def test_packed_grads_match_reference(with_mask, h):
    qkv, bias, mask = make_packed(h=h, with_mask=with_mask, seed=11)

    def loss_ref(qkv, bias):
        return jnp.sum(jnp.sin(_reference_packed(qkv, bias, mask, h)))

    def loss_fused(qkv, bias):
        return jnp.sum(jnp.sin(
            fused_window_attention_packed(qkv, bias, mask, h, interpret=True)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
    g_fus = jax.grad(loss_fused, argnums=(0, 1))(qkv, bias)
    for name, a, b in zip(("qkv", "bias"), g_ref, g_fus):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-5, rtol=1e-3, err_msg=f"d{name}"
        )


def test_packed_head_fallback():
    """H that can't tile 128 lanes (Swin-L stage 1: H=6, d=32) routes
    through the transposed kernel — same result, grads included."""
    qkv, bias, mask = make_packed(h=6, seed=13)
    ref = _reference_packed(qkv, bias, mask, 6)
    got = fused_window_attention_packed(qkv, bias, mask, 6, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)

    def loss_fused(qkv, bias):
        return jnp.sum(jnp.sin(
            fused_window_attention_packed(qkv, bias, mask, 6, interpret=True)))

    def loss_ref(qkv, bias):
        return jnp.sum(jnp.sin(_reference_packed(qkv, bias, mask, 6)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
    g_fus = jax.grad(loss_fused, argnums=(0, 1))(qkv, bias)
    for name, a, b in zip(("qkv", "bias"), g_ref, g_fus):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=5e-5, rtol=1e-3, err_msg=f"d{name}"
        )
