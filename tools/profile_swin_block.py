"""Ablate one stage-1 Swin block: what costs 14 ms fwd+bwd at 224x192?"""
import sys, time, functools
import numpy as np
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import flax.linen as nn

DIM, HEADS, WIN, HW = 192, 6, 14, 224

class Variant(nn.Module):
    mode: str = "full"
    @nn.compact
    def __call__(self, x):
        from divergen_tpu.modeling.backbone.swin import (
            WindowAttention, window_partition, window_reverse)
        b, h, w, c = x.shape
        shortcut = x
        x = nn.LayerNorm(dtype=jnp.bfloat16, name="norm1")(x)
        if self.mode == "nowin":
            # attention over non-overlapping reshape "windows" without the
            # 6D transpose: straight reshape to (b*nw, win*win, c)
            x = x.reshape(b * (h // 16) * (w // 16), 256, c)
            attn = WindowAttention(DIM, 16, HEADS, dtype=jnp.bfloat16, name="attn")
            x = attn(x, None)
            x = x.reshape(b, h, w, c)
        else:
            xw = window_partition(x, WIN)
            if self.mode == "noattn":
                qkv = nn.Dense(3 * DIM, dtype=jnp.bfloat16, name="qkv")(xw)
                xw = nn.Dense(DIM, dtype=jnp.bfloat16, name="proj")(qkv[..., :DIM])
            else:
                attn = WindowAttention(DIM, WIN, HEADS, dtype=jnp.bfloat16, name="attn")
                xw = attn(xw, None)
            x = window_reverse(xw, WIN, h, w)
        x = shortcut + x
        y = nn.LayerNorm(dtype=jnp.bfloat16, name="norm2")(x)
        y = nn.Dense(4 * DIM, dtype=jnp.bfloat16, name="fc1")(y)
        y = nn.Dense(DIM, dtype=jnp.bfloat16, name="fc2")(nn.gelu(y))
        return x + y

def run(mode):
    m = Variant(mode)
    x = jnp.asarray(np.random.RandomState(0).rand(2, HW, HW, DIM), jnp.bfloat16)
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    def loss(p, xx):
        return jnp.sum(jnp.abs(m.apply(p, xx).astype(jnp.float32))) * 1e-6
    g = jax.grad(loss)
    runners = {}
    def make(k):
        @jax.jit
        def r(p, xx, seed):
            def body(c, i):
                gr = g(p, xx * (1.0 + c))
                return jnp.mean(jax.tree_util.tree_leaves(gr)[0]).astype(c.dtype) * 1e-20 + c, None
            out, _ = jax.lax.scan(body, seed, jnp.arange(k))
            return out
        return r
    def timed(k):
        if k not in runners: runners[k] = make(k)
        t0 = time.perf_counter()
        o = runners[k](params, x, jnp.zeros((), jnp.bfloat16))
        _ = float(np.asarray(o)); return time.perf_counter() - t0
    _ = timed(1); _ = timed(5)
    t1 = min(timed(1) for _ in range(2)); t5 = min(timed(5) for _ in range(2))
    print(f"{mode:8s}: {(t5-t1)/4*1e3:7.2f} ms fwd+bwd", flush=True)

for mode in ("full", "noattn", "nowin"):
    run(mode)
