"""Driver benchmark — prints ONE JSON line.

Measures the BASELINE.json headline: generated+filtered+pasted instances
per hour per chip, through the real on-device graphs of every stage:

  1. SDXL-base UNet (2.6B) 1024² CFG denoise + VAE decode (bf16, one
     lax.scan) — per-step time measured by differencing two scan lengths,
     scaled to the sampler's step count (headline: DPM-Solver++ 2M @ 25
     steps, the standard quality-neutral setting, parity-pinned against
     diffusers in tests/parity/test_dpmpp_parity.py; --sampler euler
     --steps 50 reproduces the reference DiffusionPipeline default)
  2. SAM ViT-H corner-prompt mask extraction at 1024²
  3. CLIP ViT-L/14 score+similarity at 224²
  4. on-device copy-paste compositing at 896² (4 pastes/img)

chain rate = 1 / (t_gen + t_sam + t_clip + t_paste) per instance.
vs_baseline = rate / 2000 inst/hr (the BASELINE.json north-star target).

Weights are random (throughput is architecture-, not weight-, dependent).
The axon tunnel is async with ~35ms readback RTT — every timing uses the
difference method (K-iter chain + one scalar readback, minus 0-iter RTT).
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _backend_available(probe_timeout=90, retries=2, backoff=15):
    """Bounded device-backend probe, in a subprocess.

    A down axon tunnel makes ``jax.devices()`` HANG (not raise), so the
    probe must run with an external timeout. Distinguishes "TPU
    unreachable" (infra outage → structured error line, rc 0) from "code
    broken" (real traceback, rc 1) in the driver's record."""
    code = "import jax; d = jax.devices(); print(d[0].platform, len(d))"
    for attempt in range(retries):
        try:
            p = subprocess.run(
                [sys.executable, "-c", code],
                timeout=probe_timeout,
                capture_output=True,
                text=True,
                env=dict(os.environ),
            )
            if p.returncode == 0:
                return True, p.stdout.strip()
            last = p.stderr.strip().splitlines()[-1] if p.stderr.strip() else f"rc={p.returncode}"
        except subprocess.TimeoutExpired:
            last = f"probe hung >{probe_timeout}s (tunnel down?)"
        if attempt + 1 < retries:
            time.sleep(backoff)
    return False, last


def _diff_time(run_k, k_small, k_big, probe):
    """Wall time per iteration via two chain lengths + scalar readback."""

    def timed(k):
        t0 = time.perf_counter()
        out = run_k(k)
        _ = float(probe(out))
        return time.perf_counter() - t0

    _ = timed(k_small)  # warmup / compile
    t_small = min(timed(k_small) for _ in range(2))
    t_big = min(timed(k_big) for _ in range(2))
    return max(t_big - t_small, 1e-9) / (k_big - k_small)


def bench_sdxl(steps_full=50, B=1, int8=False, sampler="euler", ln_gemm=False,
               encoder_reuse=False):
    import jax
    import jax.numpy as jnp

    if encoder_reuse and sampler != "dpmpp_2m":
        raise ValueError("bench --encoder_reuse is measured under dpmpp_2m")

    from divergen_tpu.pipeline.generation.scheduler import (
        dpmpp_2m_step,
        dpmpp_timesteps_sigmas,
        euler_sigmas,
        make_scheduler,
    )
    from divergen_tpu.pipeline.generation.unet import (
        UNetSDXL,
        transformer_quant_select,
    )
    from divergen_tpu.pipeline.generation.vae import VAEDecoder

    unet = UNetSDXL(dtype=jnp.bfloat16, quant=int8, ln_gemm=ln_gemm)
    float_unet = UNetSDXL(dtype=jnp.bfloat16)
    lat = jnp.zeros((B, 128, 128, 4), jnp.float32)
    ctx = jnp.zeros((2 * B, 77, 2048), jnp.bfloat16)
    pooled = jnp.zeros((2 * B, 1280), jnp.bfloat16)
    tids = jnp.zeros((2 * B, 6), jnp.float32)
    # jit the init: eager init would run thousands of tiny ops through the
    # async tunnel; one compiled program instead
    params = jax.jit(float_unet.init)(jax.random.PRNGKey(0), lat[:1], jnp.zeros((1,)),
                                      ctx[:1], pooled[:1], tids[:1])
    # serve in bf16: halves HBM and matches the bf16 compute path
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    if int8:
        # quantize once on device (W8A8, ops/quant.py); in the pipeline this
        # runs inside the denoise jit before the scan — here it's hoisted so
        # the per-step differencing measures the steady state either way
        from divergen_tpu.ops.quant import quantize_param_tree

        params = jax.jit(
            lambda p: quantize_param_tree(p, select=transformer_quant_select)
        )(params)
    sched = make_scheduler("scaled_linear")
    if sampler == "dpmpp_2m":
        ts, sigmas = dpmpp_timesteps_sigmas(sched, steps_full)
    else:
        ts, sigmas = euler_sigmas(sched, steps_full)
    ts_j = jnp.asarray(ts, jnp.float32)
    sig_j = jnp.asarray(sigmas, jnp.float32)

    def make_runner(k):
        # one UNet CFG eval per step for BOTH samplers (DPM-Solver++ 2M is
        # multistep, not multi-eval) — only the cheap latent update differs
        def eps_at(params, l, i):
            x = l / jnp.sqrt(sig_j[i] ** 2 + 1.0)
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.broadcast_to(ts_j[i], (2 * B,))
            eps2 = unet.apply(params, x2, t2, ctx, pooled, tids)
            eu, ec = jnp.split(eps2, 2, axis=0)
            return (eu + 7.5 * (ec - eu)).astype(l.dtype)

        if sampler == "dpmpp_2m":
            if encoder_reuse:
                # Faster-Diffusion alternation (pipeline.py dpmpp branch):
                # full UNet on even steps, mid+up over the cached down-path
                # on odd steps. The k=2→10 differencing window covers steps
                # 2..9 = 4 full + 4 reuse — the steady-state average; the
                # hoisted cache0 eval cancels between the two chain lengths.
                @jax.jit
                def run(params, latents):
                    x0g = latents / jnp.sqrt(sig_j[0] ** 2 + 1.0)
                    _, cache0 = unet.apply(
                        params, jnp.concatenate([x0g, x0g], axis=0),
                        jnp.broadcast_to(ts_j[0], (2 * B,)), ctx, pooled,
                        tids, return_encoder=True,
                    )

                    def body(carry, i):
                        l, x0_prev, cache = carry
                        x = l / jnp.sqrt(sig_j[i] ** 2 + 1.0)
                        x2 = jnp.concatenate([x, x], axis=0)
                        t2 = jnp.broadcast_to(ts_j[i], (2 * B,))

                        def full(x2, t2, cache):
                            return unet.apply(params, x2, t2, ctx, pooled,
                                              tids, return_encoder=True)

                        def reuse(x2, t2, cache):
                            return unet.apply(params, x2, t2, ctx, pooled,
                                              tids, cached_encoder=cache), cache

                        eps2, cache = jax.lax.cond(
                            i % 2 == 0, full, reuse, x2, t2, cache
                        )
                        eu, ec = jnp.split(eps2, 2, axis=0)
                        eps = (eu + 7.5 * (ec - eu)).astype(l.dtype)
                        x0 = l - sig_j[i] * eps
                        l = dpmpp_2m_step(l, x0, x0_prev, i, sig_j, steps_full)
                        return (l, x0, cache), None

                    (out, _, _), _ = jax.lax.scan(
                        body, (latents, jnp.zeros_like(latents), cache0),
                        jnp.arange(k),
                    )
                    return out

                return run

            @jax.jit
            def run(params, latents):
                def body(carry, i):
                    l, x0_prev = carry
                    x0 = l - sig_j[i] * eps_at(params, l, i)
                    l = dpmpp_2m_step(l, x0, x0_prev, i, sig_j, steps_full)
                    return (l, x0), None

                (out, _), _ = jax.lax.scan(
                    body, (latents, jnp.zeros_like(latents)), jnp.arange(k)
                )
                return out

            return run

        @jax.jit
        def run(params, latents):
            def body(l, i):
                eps = eps_at(params, l, i)
                pred_x0 = l - sig_j[i] * eps
                d = (l - pred_x0) / jnp.maximum(sig_j[i], 1e-9)
                return l + (sig_j[i + 1] - sig_j[i]) * d, None

            out, _ = jax.lax.scan(body, latents, jnp.arange(k))
            return out

        return run

    probes = {}

    def run_k(k):
        if k not in probes:
            probes[k] = make_runner(k)
        return probes[k](params, lat)

    per_step = _diff_time(run_k, 2, 10, lambda o: np.asarray(o[0, ::64, ::64, 0]).sum())
    t_denoise = per_step * steps_full

    vae = VAEDecoder(dtype=jnp.bfloat16)
    vparams = jax.jit(vae.init)(jax.random.PRNGKey(1), lat[:1])
    vparams = jax.tree.map(lambda x: x.astype(jnp.bfloat16), vparams)
    # per-image decode under one jit (matches SDXLPipeline.generate):
    # whole-batch 1024² decode OOMs HBM at B≥4
    dec = jax.jit(
        lambda vp, l: jax.lax.map(lambda x: vae.apply(vp, x[None])[0], l)
        if B > 1
        else vae.apply(vp, l)
    )

    def vae_k(k):
        out = lat
        for _ in range(k):
            img = dec(vparams, out)
            out = lat + jnp.mean(img).astype(lat.dtype) * 0.0  # chain dep
        return dec(vparams, out)

    t_vae = _diff_time(vae_k, 0, 2, lambda o: np.asarray(o[0, ::256, ::256, 0]).sum())
    return (t_denoise + t_vae) / B


def bench_sam(B=4, ln_gemm=False, flash_attn=False):
    import jax
    import jax.numpy as jnp

    from divergen_tpu.pipeline.segmentation.sam import SAM

    sam = SAM.vit_h(dtype=jnp.bfloat16, ln_gemm=ln_gemm, flash_attn=flash_attn)
    imgs = jnp.zeros((B, 1024, 1024, 3), jnp.float32)
    pts = jnp.tile(jnp.asarray([[10.0, 10.0], [1014, 10], [10, 1014], [1014, 1014]])[None], (B, 1, 1))
    lbl = jnp.ones((B, 4), jnp.int32)
    params = jax.jit(sam.init)(jax.random.PRNGKey(0), imgs, pts, lbl)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    fwd = jax.jit(lambda p, im: sam.apply(p, im, pts, lbl)[0])

    def run_k(k):
        im = imgs
        out = None
        for _ in range(k):
            out = fwd(params, im)
            im = imgs + out[:, :1, :1, :1].reshape(B, 1, 1, 1) * 0  # chain dep
        return fwd(params, im)

    t = _diff_time(run_k, 0, 3, lambda o: np.asarray(o[0, 0, ::8, ::8]).sum())
    return t / B


def bench_clip():
    import jax
    import jax.numpy as jnp

    from divergen_tpu.modeling.text.clip import build_clip, preprocess_images

    B = 16
    vision, _ = build_clip("ViT-L/14")
    imgs = jnp.zeros((B, 224, 224, 3), jnp.float32)
    params = jax.jit(vision.init)(jax.random.PRNGKey(0), imgs)
    fwd = jax.jit(lambda p, im: vision.apply(p, preprocess_images(im)))

    def run_k(k):
        im = imgs
        out = None
        for _ in range(k):
            out = fwd(params, im)
            im = imgs + out[:, 0].reshape(B, 1, 1, 1) * 0
        return fwd(params, im)

    t = _diff_time(run_k, 0, 4, lambda o: np.asarray(o[:, 0]).sum())
    return t / B


def bench_paste():
    import jax
    import jax.numpy as jnp

    from divergen_tpu.ops.copy_paste import paste_instances_boxframe

    B, P, N, S, PS, H = 8, 4, 8, 28, 128, 896
    rng = np.random.RandomState(0)
    batch = dict(
        image=jnp.asarray(rng.rand(B, H, H, 3).astype(np.float32) * 255),
        masks=jnp.ones((B, N, S, S), jnp.float32),
        boxes=jnp.asarray(np.tile([100.0, 100.0, 300.0, 300.0], (B, N, 1)).astype(np.float32)),
        classes=jnp.zeros((B, N), jnp.int32),
        valid=jnp.ones((B, N), bool),
        source=jnp.zeros((B, N), jnp.int32),
        patches=jnp.asarray(rng.rand(B, P, PS, PS, 4).astype(np.float32)),
        pboxes=jnp.asarray(np.tile([200.0, 200.0, 400.0, 400.0], (B, P, 1)).astype(np.float32)),
        pcls=jnp.zeros((B, P), jnp.int32),
        pval=jnp.ones((B, P), bool),
        pflip=jnp.zeros((B, P), bool),
    )

    @jax.jit
    def fwd(img):
        def one(im, s_masks, s_boxes, s_cls, s_val, s_src, pc, pb, pcl, pv, pf):
            return paste_instances_boxframe(
                im, s_masks, s_boxes, s_cls, s_val, s_src, pc, pb, pcl, pv, pf
            )["image"]

        return jax.vmap(one)(
            img, batch["masks"], batch["boxes"], batch["classes"], batch["valid"],
            batch["source"], batch["patches"], batch["pboxes"], batch["pcls"],
            batch["pval"], batch["pflip"],
        )

    def run_k(k):
        im = batch["image"]
        for _ in range(k):
            im = fwd(im)
        return im

    t = _diff_time(run_k, 0, 8, lambda o: np.asarray(o[0, ::128, ::128, 0]).sum())
    return t / (B * P)  # per pasted instance


def main():
    import argparse

    ap = argparse.ArgumentParser()
    # B=4 measured best on v5e (5.45 s/img vs 5.58 at B=1, 5.63 at B=8);
    # int8 off: W8A8 wins 1.3-2x on isolated GEMMs but loses end-to-end
    # (launch/fusion-barrier overhead), numbers in STATUS.md
    ap.add_argument("--B", type=int, default=4)
    ap.add_argument("--int8", action="store_true")
    # dpmpp_2m @ 25 steps is the headline: the standard quality-neutral
    # production setting (2x fewer UNet evals than Euler-50 at equal
    # quality), parity-pinned against diffusers DPMSolverMultistepScheduler
    # in tests/parity/test_dpmpp_parity.py. --sampler euler reproduces the
    # reference DiffusionPipeline default (Euler-50); both numbers are
    # recorded in STATUS.md.
    ap.add_argument("--sampler", choices=["euler", "dpmpp_2m"], default="dpmpp_2m")
    ap.add_argument("--steps", type=int, default=None,
                    help="default: 25 for dpmpp_2m, 50 for euler")
    ap.add_argument("--gen_only", action="store_true")
    # kernel-fusion toggles (defaults = the measured optimum, SWEEP_r04):
    ap.add_argument("--unet_ln_gemm", choices=["off", "geglu", "all"],
                    default="geglu",
                    help="geglu = measured winner (SWEEP_r05: 419->382 ms "
                         "B=4 step); off reproduces the r4 baseline")
    ap.add_argument("--encoder_reuse", action="store_true",
                    help="Faster-Diffusion cache under dpmpp_2m "
                         "(approximate — A/B knob, not the headline default)")
    # defaults measured on v5e (SWEEP_r05): flash+ln_gemm encode 0.096 s/img
    # vs 0.1642 plain; ln_gemm WITHOUT flash OOMs vit_h (the unflashed
    # 4096-token attention already fills HBM), so the pair flips together
    ap.add_argument("--sam_ln_gemm", type=int, default=1)
    ap.add_argument("--sam_flash", type=int, default=1)
    ap.add_argument("--skip_probe", action="store_true",
                    help="skip the backend-availability preflight")
    args = ap.parse_args()

    if not args.skip_probe:
        ok, detail = _backend_available()
        if not ok:
            # infra outage, not a perf regression: one structured JSON line,
            # rc 0, value null (VERDICT r2 weak #5)
            print(json.dumps({
                "metric": "gen_filter_paste_instances_per_hr_per_chip",
                "value": None,
                "unit": "inst/hr",
                "vs_baseline": None,
                "error": "backend-unavailable",
                "detail": detail,
            }))
            return

    steps = args.steps or (25 if args.sampler == "dpmpp_2m" else 50)
    lng = False if args.unet_ln_gemm == "off" else (
        True if args.unet_ln_gemm == "all" else "geglu")
    t_gen = bench_sdxl(steps_full=steps, B=args.B, int8=args.int8,
                       sampler=args.sampler, ln_gemm=lng,
                       encoder_reuse=args.encoder_reuse)
    if args.gen_only:
        print(json.dumps({"metric": "sdxl_s_per_img", "value": round(t_gen, 4),
                          "unit": f"s/img B={args.B} int8={args.int8} "
                                  f"{args.sampler}-{steps}",
                          "vs_baseline": 0}))
        return
    t_sam = bench_sam(ln_gemm=bool(args.sam_ln_gemm), flash_attn=bool(args.sam_flash))
    t_clip = bench_clip()
    t_paste = bench_paste()
    per_instance = t_gen + t_sam + t_clip + t_paste
    rate_hr = 3600.0 / per_instance
    print(
        json.dumps(
            {
                "metric": "gen_filter_paste_instances_per_hr_per_chip",
                "value": round(rate_hr, 1),
                "unit": (
                    f"inst/hr (SDXL-1024²-{args.sampler}-{steps}step {t_gen:.2f}s "
                    f"+ SAM-H {t_sam:.3f}s "
                    f"+ CLIP-L {t_clip:.4f}s + paste {t_paste * 1e3:.2f}ms per inst)"
                ),
                "vs_baseline": round(rate_hr / 2000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
