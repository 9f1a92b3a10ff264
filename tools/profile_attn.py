"""Micro-bench the flash attention kernel at UNet shapes on TPU.

Chains K kernel invocations inside one jitted scan and differences two
chain lengths — the axon tunnel's per-dispatch RTT would otherwise dominate
sub-ms kernels.
"""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from divergen_tpu.ops.pallas.flash_attention import flash_attention, reference_attention

def t_one(bh, s, d, dtype=jnp.bfloat16, label=""):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(bh, s, d), dtype)
    k = jnp.asarray(rng.randn(bh, s, d), dtype)
    v = jnp.asarray(rng.randn(bh, s, d), dtype)
    o = flash_attention(q, k, v)
    ref = reference_attention(q, k, v)
    err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - ref.astype(jnp.float32))))

    runners = {}
    def make(n):
        @jax.jit
        def run(q):
            def body(x, _):
                return flash_attention(x, k, v).astype(x.dtype) * 0.5, None
            out, _ = jax.lax.scan(body, q, None, length=n)
            return out
        return run
    def timed(n):
        if n not in runners:
            runners[n] = make(n)
        t0 = time.perf_counter()
        out = runners[n](q)
        _ = float(np.asarray(out[0, 0, 0]))
        return time.perf_counter() - t0
    _ = timed(2); _ = timed(32)
    t2 = min(timed(2) for _ in range(2))
    t32 = min(timed(32) for _ in range(2))
    dt = (t32 - t2) / 30
    fl = 4 * bh * s * s * d
    print(f"{label:12s} bh={bh} s={s} d={d}: {dt*1e6:9.1f} us  {fl/dt/1e12:6.1f} TFLOP/s  maxerr={err:.4f}", flush=True)

t_one(20, 4096, 64, label="unet-lvl1")
t_one(40, 1024, 64, label="unet-lvl2")
t_one(1, 16384, 512, label="vae")
