"""Profile the SDXL UNet denoise step on the real TPU — component breakdown.

Usage: python tools/profile_unet.py [--variant all|conv|flash|xla]

Times one CFG denoise step (batch 2 through the UNet at 128x128 latents)
under several ablations to locate where the ~180 ms/step goes:
  full   : as shipped (pallas flash attention everywhere)
  conv   : transformer_depths=(0,0,0)  -> resblock/conv-only cost
  xla    : reference_attention everywhere (no pallas)
  selfxla: pallas for self-attn, XLA for cross-attn (s_k=77)
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def time_step(unet, n_small=2, n_big=8, B=1):
    from divergen_tpu.pipeline.generation.scheduler import euler_sigmas, make_scheduler

    lat = jnp.zeros((B, 128, 128, 4), jnp.float32)
    ctx = jnp.zeros((2 * B, 77, 2048), jnp.bfloat16)
    pooled = jnp.zeros((2 * B, 1280), jnp.bfloat16)
    tids = jnp.zeros((2 * B, 6), jnp.float32)
    params = jax.jit(unet.init)(jax.random.PRNGKey(0), lat[:1], jnp.zeros((1,)),
                                ctx[:1], pooled[:1], tids[:1])
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    sched = make_scheduler("scaled_linear")
    ts, sigmas = euler_sigmas(sched, 50)
    ts_j = jnp.asarray(ts, jnp.float32)
    sig_j = jnp.asarray(sigmas, jnp.float32)

    runners = {}

    def make(k):
        @jax.jit
        def run(params, latents):
            def body(l, i):
                x = l / jnp.sqrt(sig_j[i] ** 2 + 1.0)
                x2 = jnp.concatenate([x, x], axis=0)
                t2 = jnp.broadcast_to(ts_j[i], (2 * B,))
                eps2 = unet.apply(params, x2, t2, ctx, pooled, tids)
                eu, ec = jnp.split(eps2, 2, axis=0)
                eps = eu + 7.5 * (ec - eu)
                pred_x0 = l - sig_j[i] * eps.astype(l.dtype)
                d = (l - pred_x0) / jnp.maximum(sig_j[i], 1e-9)
                return l + (sig_j[i + 1] - sig_j[i]) * d, None

            out, _ = jax.lax.scan(body, latents, jnp.arange(k))
            return out

        return run

    def timed(k):
        if k not in runners:
            runners[k] = make(k)
        t0 = time.perf_counter()
        out = runners[k](params, lat)
        _ = float(np.asarray(out[0, ::64, ::64, 0]).sum())
        return time.perf_counter() - t0

    _ = timed(n_small)
    t_small = min(timed(n_small) for _ in range(2))
    _ = timed(n_big)
    t_big = min(timed(n_big) for _ in range(2))
    per_step = (t_big - t_small) / (n_big - n_small)
    # roofline position from XLA's own flop count of the compiled scan body
    # (one CFG UNet eval + latent update per scan step); v5e bf16 peak
    # 197 TFLOP/s. Pallas kernel flops are NOT in XLA's count, so this is a
    # lower bound on achieved MFU when the flash path is active.
    try:
        ca = runners[n_big].lower(params, lat).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0)) / n_big
        if flops > 0:
            print(
                f"  XLA-counted {flops / 1e12:.2f} TF/step -> "
                f"{flops / per_step / 1e12:.1f} TFLOP/s = "
                f"{flops / per_step / 197e12 * 100:.1f}% MFU (pallas flops excluded)",
                flush=True,
            )
    except Exception as e:
        print(f"  cost_analysis unavailable: {e}", flush=True)
    return per_step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="all")
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    from divergen_tpu.pipeline.generation import unet as unet_mod
    from divergen_tpu.ops.pallas import flash_attention as fa

    results = {}

    def full():
        return unet_mod.UNetSDXL(dtype=jnp.bfloat16)

    def conv_only():
        return unet_mod.UNetSDXL(dtype=jnp.bfloat16, transformer_depths=(0, 0, 0))

    variants = {
        "full": (full, None),
        "conv": (conv_only, None),
        "xla": (full, "xla"),
        "selfxla": (full, "selfxla"),
        "noattn": (full, "noattn"),
        "crosspallas": (full, "crosspallas"),
        "nocross": (full, "nocross"),
    }
    want = list(variants) if args.variant == "all" else [args.variant]

    orig = fa.flash_attention
    orig_ref = fa.reference_attention
    orig_packed = fa.flash_attention_packed
    for name in want:
        ctor, patch = variants[name]
        # self-attention now runs the packed fused-QKV kernel; mirror every
        # self-attn ablation onto it
        if patch == "xla":
            fa.flash_attention = lambda q, k, v, bias=None, **kw: fa.reference_attention(q, k, v, bias)
            fa.flash_attention_packed = lambda qkv, heads, **kw: orig_packed(qkv, heads, use_pallas=False)
        elif patch == "nocross":
            fa.reference_attention = lambda q, k, v, bias=None: jnp.broadcast_to(v[:, :1], q.shape)
        elif patch == "noattn":
            def noat(q, k, v, bias=None, **kw):
                if k.shape[1] == q.shape[1]:
                    return v  # self-attn: skip the attention math, keep matmuls
                return jnp.broadcast_to(v[:, :1], q.shape)  # cross: seq mismatch
            fa.flash_attention = noat
            fa.flash_attention_packed = (
                lambda qkv, heads, **kw: qkv[..., : qkv.shape[-1] // 3]
            )
        elif patch == "crosspallas":
            # unet routes nk<=128 through reference_attention; patch that name
            fa.reference_attention = lambda q, k, v, bias=None: orig(q, k, v, bias)
        elif patch == "selfxla":
            def sel(q, k, v, bias=None, **kw):
                if k.shape[1] < 256:
                    return fa.reference_attention(q, k, v, bias)
                return orig(q, k, v, bias, **kw)
            fa.flash_attention = sel
            fa.flash_attention_packed = lambda qkv, heads, **kw: orig_packed(qkv, heads, use_pallas=False)
        else:
            fa.flash_attention = orig
            fa.reference_attention = orig_ref
            fa.flash_attention_packed = orig_packed
        t = time_step(ctor(), B=args.batch)
        results[name] = t
        print(f"{name:8s}: {t * 1e3:8.2f} ms/step (B={args.batch}, {t * 1e3 / args.batch:.2f} ms/img/step)", flush=True)
    fa.flash_attention = orig

    if "full" in results and "conv" in results:
        print(f"attn part: {(results['full'] - results['conv']) * 1e3:8.2f} ms/step")


if __name__ == "__main__":
    main()
