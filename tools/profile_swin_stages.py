"""Swin per-stage fwd+bwd timing on TPU (scan-chain diff method).

Round-1 finding (b2 896²): stage1 28.5 / stage2 14.3 / stage3 76.2 /
stage4 5.0 ms — see STATUS.md Known gaps and tools/profile_swin_block.py
for the per-block ablation (attention math dominates)."""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from divergen_tpu.modeling.backbone.swin import SwinBlock

def probe(name, dim, heads, blocks, hw, window=12):
    mods = [SwinBlock(dim, heads, window, shift=0 if i % 2 == 0 else window // 2,
                      dtype=jnp.bfloat16, name=f"b{i}") for i in range(blocks)]
    import flax.linen as nn
    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(blocks):
                x = SwinBlock(dim, heads, window, shift=0 if i % 2 == 0 else window // 2,
                              dtype=jnp.bfloat16, name=f"b{i}")(x)
            return x
    m = Stack()
    x = jnp.asarray(np.random.RandomState(0).rand(2, hw, hw, dim), jnp.bfloat16)
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x)

    def loss(p, xx):
        return jnp.sum(jnp.abs(m.apply(p, xx).astype(jnp.float32))) * 1e-6
    g = jax.grad(loss)
    runners = {}
    def make(k):
        @jax.jit
        def run(p, xx, seed):
            def body(c, i):
                gr = g(p, xx * (1.0 + c))
                leaf = jax.tree_util.tree_leaves(gr)[0]
                return (jnp.mean(leaf).astype(c.dtype) * 1e-20 + c), None
            out, _ = jax.lax.scan(body, seed, jnp.arange(k))
            return out
        return run
    def timed(k):
        if k not in runners: runners[k] = make(k)
        t0 = time.perf_counter()
        o = runners[k](params, x, jnp.zeros((), jnp.bfloat16))
        _ = float(np.asarray(o))
        return time.perf_counter() - t0
    _ = timed(1); _ = timed(3)
    t1 = min(timed(1) for _ in range(2)); t3 = min(timed(3) for _ in range(2))
    print(f"{name}: {(t3-t1)/2*1e3:7.1f} ms fwd+bwd", flush=True)

probe("stage1 2x(224² d192 h6)", 192, 6, 2, 224)
probe("stage2 2x(112² d384 h12)", 384, 12, 2, 112)
probe("stage3 18x(56² d768 h24)", 768, 24, 18, 56)
probe("stage4 2x(28² d1536 h48)", 1536, 48, 2, 28)
