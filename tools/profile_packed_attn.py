"""Micro-bench the packed UNet attention's softmax_mode variants on TPU.

The packed kernel is VPU-bound at SDXL shapes (depth-64 dots finish before
the score-tile softmax chain); `rawmax` and `bf16exp` trim full-tile VPU
ops (see _packed_kernel2 docstring). Prints one JSON line per (shape,
mode) with time and max error vs the XLA reference — end-to-end A/B via
`tools/r2_perf_sweep.py --only attn_fast` decides any default flip.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from divergen_tpu.ops.pallas.flash_attention import (
    flash_attention_packed,
    reference_attention,
)

# (B_cfg, tokens, heads, d): the two SDXL transformer levels at gen B=4
SHAPES = [(8, 4096, 10, 64), (8, 1024, 20, 64)]
MODES = ["exact", "rawmax", "bf16exp"]


def ref_packed(qkv, h):
    b, n, c3 = qkv.shape
    d = c3 // (3 * h)
    qh, kh, vh = (
        qkv[..., s * h * d : (s + 1) * h * d]
        .reshape(b, n, h, d).transpose(0, 2, 1, 3).reshape(b * h, n, d)
        for s in range(3)
    )
    out = reference_attention(qh, kh, vh)
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3).reshape(b, n, h * d)


def main():
    for b, n, h, d in SHAPES:
        rng = np.random.RandomState(0)
        qkv = jnp.asarray(rng.randn(b, n, 3 * h * d), jnp.bfloat16)
        ref = np.asarray(ref_packed(qkv, h), np.float32)
        for mode in MODES:
            out = flash_attention_packed(qkv, h, softmax_mode=mode)
            err = float(np.max(np.abs(np.asarray(out, np.float32) - ref)))

            runners = {}

            def make(kk, mode=mode):
                @jax.jit
                def run(x):
                    def body(y, _):
                        o = flash_attention_packed(y, h, softmax_mode=mode)
                        # feed the output back into the q slice so the loop
                        # body is not loop-invariant (LICM would hoist it)
                        y = jnp.concatenate(
                            [(o * 0.5).astype(y.dtype), y[..., o.shape[-1]:]],
                            axis=-1,
                        )
                        return y, None

                    out2, _ = jax.lax.scan(body, x, None, length=kk)
                    return out2

                return run

            def timed(kk):
                if kk not in runners:
                    runners[kk] = make(kk)
                t0 = time.perf_counter()
                o = runners[kk](qkv)
                _ = float(np.asarray(o[0, 0, 0]))
                return time.perf_counter() - t0

            _ = timed(2); _ = timed(18)
            t2 = min(timed(2) for _ in range(3))
            t18 = min(timed(18) for _ in range(3))
            dt = (t18 - t2) / 16
            fl = 4 * b * h * n * n * d
            print(json.dumps({
                "metric": f"packed_attn_b{b}_n{n}_h{h}_{mode}",
                "value": round(dt * 1e6, 1),
                "unit": "us",
                "tflops": round(fl / dt / 1e12, 1),
                "maxerr_vs_xla": round(err, 5),
            }), flush=True)


if __name__ == "__main__":
    main()
