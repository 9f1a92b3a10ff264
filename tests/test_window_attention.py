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
