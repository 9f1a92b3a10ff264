"""One-shot round-2 hardware measurement sweep (run when the TPU tunnel is up).

Measures, in one process with one compile cache:
  1. SDXL UNet CFG denoise step (B=1 and B=4)  — packed attention + exp2
  2. Swin-L 896 b2 train step, FUSED_ATTN off/on — window fwd blocking
  3. chain estimate from (1)

Usage: timeout 3600 python tools/r2_perf_sweep.py [--skip_swin] [--skip_unet]
Prints one JSON line per measurement; safe to rerun (differencing method).
"""
import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def _diff_time(run_k, k_small, k_big, probe):
    def timed(k):
        t0 = time.perf_counter()
        out = run_k(k)
        _ = float(probe(out))
        return time.perf_counter() - t0

    _ = timed(k_small)  # warmup/compile
    t_small = min(timed(k_small) for _ in range(2))
    t_big = min(timed(k_big) for _ in range(2))
    return max(t_big - t_small, 1e-9) / (k_big - k_small)


def bench_unet(B, conv_matmul=False, int8=False, fused_ln=False, fused_gn=False,
               ln_gemm=False):
    from divergen_tpu.pipeline.generation.scheduler import euler_sigmas, make_scheduler
    from divergen_tpu.pipeline.generation.unet import UNetSDXL, transformer_quant_select

    unet = UNetSDXL(dtype=jnp.bfloat16, conv_matmul=conv_matmul, quant=int8,
                    fused_ln=fused_ln, fused_gn=fused_gn, ln_gemm=ln_gemm)
    # init with the FLOAT module (plain `kernel` leaves) and quantize the
    # cast tree afterwards — initializing the quant module and then
    # blanket-casting would silently turn the int8 kernel_q params bf16
    float_unet = unet.clone(quant=False) if int8 else unet
    lat = jnp.zeros((B, 128, 128, 4), jnp.float32)
    ctx = jnp.zeros((2 * B, 77, 2048), jnp.bfloat16)
    pooled = jnp.zeros((2 * B, 1280), jnp.bfloat16)
    tids = jnp.zeros((2 * B, 6), jnp.float32)
    params = jax.jit(float_unet.init)(jax.random.PRNGKey(0), lat[:1], jnp.zeros((1,)),
                                      ctx[:1], pooled[:1], tids[:1])
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    if int8:
        from divergen_tpu.ops.quant import quantize_param_tree

        params = jax.jit(
            lambda p: quantize_param_tree(p, select=transformer_quant_select)
        )(params)
    sched = make_scheduler("scaled_linear")
    ts, sigmas = euler_sigmas(sched, 50)
    ts_j, sig_j = jnp.asarray(ts, jnp.float32), jnp.asarray(sigmas, jnp.float32)
    probes = {}

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

    def run_k(k):
        if k not in probes:
            probes[k] = make(k)
        return probes[k](params, lat)

    per_step = _diff_time(run_k, 2, 10, lambda o: np.asarray(o[0, ::64, ::64, 0]).sum())
    tag = f"unet_step_ms_B{B}_convmm{conv_matmul}_int8{int(int8)}"
    if fused_ln or fused_gn:
        tag += f"_ln{int(fused_ln)}gn{int(fused_gn)}"
    if ln_gemm:
        tag += f"_lngemm-{ln_gemm}"
    # env-var A/B knobs must be visible in the record (the r5 gn_dot entry
    # initially landed under the plain-baseline key). The EFFECTIVE softmax
    # mode mirrors unet.py's env default ("rawmax" since r5) — untagged keys
    # mean "exact" in every round's record, so a plain run today is tagged.
    import os as _os
    if _os.environ.get("DIVERGEN_GN_DOT") == "1":
        tag += "_gndot"
    sm = _os.environ.get("DIVERGEN_ATTN_SOFTMAX", "rawmax")
    if sm != "exact":
        tag += f"_attn-{sm}"
    print(json.dumps({"metric": tag,
                      "value": round(per_step * 1e3, 2),
                      "per_img_50step_s": round(per_step * 50 / B, 3)}), flush=True)
    return per_step


def bench_sam(ln_gemm, flash_attn=False):
    """SAM ViT-H forward at 1024² B=4 (the bench.py chain stage): XLA LNs
    vs LNs folded into the qkv/mlp GEMMs (ops/pallas/ln_matmul.py), and the
    XLA global attention vs the rel-pos flash kernel."""
    from divergen_tpu.pipeline.segmentation.sam import SAM

    B = 4
    sam = SAM.vit_h(dtype=jnp.bfloat16, ln_gemm=ln_gemm, flash_attn=flash_attn)
    imgs = jnp.zeros((B, 1024, 1024, 3), jnp.float32)
    pts = jnp.tile(
        jnp.asarray([[10.0, 10.0], [1014, 10], [10, 1014], [1014, 1014]])[None],
        (B, 1, 1))
    lbl = jnp.ones((B, 4), jnp.int32)
    params = jax.jit(sam.init)(jax.random.PRNGKey(0), imgs, pts, lbl)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    fwd = jax.jit(lambda p, im: sam.apply(p, im, pts, lbl)[0])

    def run_k(k):
        im = imgs
        out = None
        for _ in range(k):
            out = fwd(params, im)
            im = imgs + out[:, :1, :1, :1].reshape(B, 1, 1, 1) * 0
        return fwd(params, im)

    t = _diff_time(run_k, 0, 3, lambda o: np.asarray(o[0, 0, ::8, ::8]).sum())
    print(json.dumps({"metric": (f"sam_h_s_per_img_lngemm{int(ln_gemm)}"
                                 f"_flash{int(flash_attn)}"),
                      "value": round(t / B, 4)}), flush=True)


def bench_swin(fused):
    import subprocess
    # separate process: MODEL.SWIN.FUSED_ATTN is baked into the jit
    out = subprocess.run(
        [sys.executable, "tools/bench_train_step.py", "--batch", "2", "--img", "896",
         *(["--fused_attn"] if fused else [])],
        capture_output=True, text=True, timeout=3000,
    )
    # stdout carries the result line; stderr (axon warnings) only matters
    # on failure — concatenating them put a warning in `raw` once (r4)
    lines = out.stdout.strip().splitlines()
    raw = lines[-1] if lines else (
        out.stderr.strip().splitlines()[-1] if out.stderr.strip() else "no output"
    )
    print(json.dumps({"metric": f"swin_train_step_fused={fused}",
                      "raw": raw, "rc": out.returncode}), flush=True)


def bench_packed_kernel():
    """Isolated packed-attention kernel at the SDXL level-1 shape, for the
    single-head vs two-head (lane-filling) channel-block decision."""
    from divergen_tpu.ops.pallas.flash_attention import flash_attention_packed

    b, n, h, d = 2, 4096, 10, 64
    qkv = jnp.asarray(np.random.RandomState(0).randn(b, n, 3 * h * d),
                      jnp.bfloat16)
    for hpb in (1, 2):
        fn = jax.jit(lambda x, _hpb=hpb: flash_attention_packed(
            x, heads=h, use_pallas=True, heads_per_block=_hpb))

        def run_k(k, _fn=fn):
            out = qkv
            y = None
            for _ in range(k):
                y = _fn(out)
                out = qkv + y[..., :1].mean() * 0  # chain dep
            return _fn(out)

        t = _diff_time(run_k, 2, 12, lambda o: np.asarray(o[0, 0, :4]).sum())
        print(json.dumps({"metric": f"packed_attn_ms_hpb{hpb}",
                          "value": round(t * 1e3, 3)}), flush=True)


def bench_norm_micro():
    """Isolated LN/GN at the SDXL B=4 step shapes: XLA lowering vs the
    Pallas kernels, per-call ms. Discriminates kernel/launch cost from
    layout costs that only appear end-to-end. Repetition runs INSIDE one
    jitted lax.scan (eager chain deps stall through the axon tunnel)."""
    from divergen_tpu.ops.pallas.group_norm import (
        _reference as gn_ref, fused_group_norm,
    )
    from divergen_tpu.ops.pallas.layer_norm import (
        _reference as ln_ref, fused_layer_norm,
    )

    rng = np.random.RandomState(0)

    def scan_time(name, fn, x, k_small=2, k_big=12):
        runners = {}

        def make(k):
            @jax.jit
            def run(x):
                def body(c, _):
                    return fn(c).astype(c.dtype), None

                out, _ = jax.lax.scan(body, x, None, length=k)
                return out

            return run

        def run_k(k):
            if k not in runners:
                runners[k] = make(k)
            return runners[k](x)

        t = _diff_time(run_k, k_small, k_big,
                       lambda o: np.asarray(o).reshape(-1)[0])
        print(json.dumps({"metric": f"norm_micro_{name}_ms",
                          "value": round(t * 1e3, 4)}), flush=True)

    g2 = jnp.asarray(rng.rand(1280) + 0.5, jnp.float32)
    b2 = jnp.asarray(rng.randn(1280) * 0.1, jnp.float32)
    x2 = jnp.asarray(rng.randn(8 * 1024, 1280), jnp.bfloat16)
    scan_time("ln_xla_8192x1280", lambda x: ln_ref(x, g2, b2, 1e-5), x2)
    scan_time("ln_pallas_8192x1280", lambda x: fused_layer_norm(x, g2, b2, 1e-5), x2)
    g3 = jnp.asarray(rng.rand(640) + 0.5, jnp.float32)
    b3 = jnp.asarray(rng.randn(640) * 0.1, jnp.float32)
    x3 = jnp.asarray(rng.randn(8, 64, 64, 640), jnp.bfloat16)
    scan_time("gn_xla_8x64x64x640", lambda x: gn_ref(x, g3, b3, 32, 1e-6, True), x3)
    scan_time("gn_pallas_8x64x64x640",
              lambda x: fused_group_norm(x, g3, b3, 32, 1e-6, True), x3)
    g4 = jnp.asarray(rng.rand(320) + 0.5, jnp.float32)
    b4 = jnp.asarray(rng.randn(320) * 0.1, jnp.float32)
    x4 = jnp.asarray(rng.randn(8, 128, 128, 320), jnp.bfloat16)
    scan_time("gn_xla_8x128x128x320", lambda x: gn_ref(x, g4, b4, 32, 1e-6, True), x4)
    scan_time("gn_pallas_8x128x128x320",
              lambda x: fused_group_norm(x, g4, b4, 32, 1e-6, True), x4)


def bench_ln_gemm_micro():
    """Fused LN+GEMM kernel vs the XLA LN->dot chain at the six SDXL
    transformer LN sites (B=4 CFG batch 8): level-2 M=8192 K=1280 and
    level-1 M=32768 K=640, for qkv (N=3K), cross-q (N=K) and GEGLU
    (N=8K with the h*gelu(g) epilogue). Repetition inside one jitted
    lax.scan; the carry feeds back a scalar of the output so nothing is
    loop-invariant (same inflation on both arms)."""
    from divergen_tpu.ops.pallas.ln_matmul import _reference, fused_ln_matmul

    rng = np.random.RandomState(0)

    def scan_time(name, fn, x, args, k=64):
        # ONE compile per arm (remote compiles through the axon tunnel cost
        # minutes): k iterations inside a single jitted scan, per-iteration
        # time = total/k; the per-call dispatch RTT amortizes to <0.2 ms/k.
        @jax.jit
        def run(x, args):
            def body(c, _):
                out = fn(c, *args)
                return c + out[0, 0].astype(c.dtype) * 1e-30, None

            c, _ = jax.lax.scan(body, x, None, length=k)
            # scalar result: returning the full carry pulls 20-40 MB back
            # through the axon tunnel per call and dominates the timing
            return jnp.sum(c, dtype=jnp.float32)

        def timed():
            t0 = time.perf_counter()
            _ = float(np.asarray(run(x, args)))
            return time.perf_counter() - t0

        _ = timed()  # compile
        t = min(timed() for _ in range(3)) / k
        print(json.dumps({"metric": f"ln_gemm_{name}_ms",
                          "value": round(t * 1e3, 4)}), flush=True)
        return t

    results = {}
    for tag, m, k, nmul, geglu in [
        ("l2_qkv", 8192, 1280, 3, False),
        ("l2_geglu", 8192, 1280, 8, True),
        ("l1_qkv", 32768, 640, 3, False),
        ("l1_geglu", 32768, 640, 8, True),
    ]:
        n = k * nmul
        x = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
        w = jnp.asarray(rng.randn(k, n) / np.sqrt(k), jnp.bfloat16)
        gamma = jnp.asarray(rng.rand(k) + 0.5, jnp.float32)
        beta = jnp.asarray(rng.randn(k) * 0.1, jnp.float32)
        bias = jnp.asarray(rng.randn(n) * 0.1, jnp.float32)
        args = (w, gamma, beta, bias)
        txla = scan_time(
            f"{tag}_xla",
            lambda c, w_, g_, b_, bb_, gg=geglu: _reference(c, w_, g_, b_, 1e-5, bb_, gg),
            x, args)
        tpal = scan_time(
            f"{tag}_pallas",
            lambda c, w_, g_, b_, bb_, gg=geglu: fused_ln_matmul(
                c, w_, g_, b_, 1e-5, bb_, geglu=gg),
            x, args)
        results[tag] = round(txla / tpal, 3)
    print(json.dumps({"metric": "ln_gemm_speedups_xla_over_pallas",
                      "value": results}), flush=True)


def _with_env(key, val, fn):
    import os
    prev = os.environ.get(key)
    os.environ[key] = val
    try:
        return fn()
    finally:
        if prev is None:
            os.environ.pop(key, None)
        else:
            os.environ[key] = prev


ALL_VARIANTS = {
    "ln_gemm_micro": bench_ln_gemm_micro,
    "norm_micro": bench_norm_micro,
    "packed": bench_packed_kernel,
    "b1": lambda: bench_unet(1),
    "b4": lambda: bench_unet(4),
    "im2col": lambda: bench_unet(4, conv_matmul=True),
    "tapsum": lambda: bench_unet(4, conv_matmul="tapsum"),
    "fused": lambda: bench_unet(4, conv_matmul="fused"),
    "fused_b1": lambda: bench_unet(1, conv_matmul="fused"),
    "int8": lambda: bench_unet(4, int8=True),
    "int8_fused": lambda: bench_unet(4, conv_matmul="fused", int8=True),
    "fused_ln": lambda: bench_unet(4, fused_ln=True),
    "fused_gn": lambda: bench_unet(4, fused_gn=True),
    "fused_norms": lambda: bench_unet(4, fused_ln=True, fused_gn=True),
    "fused_norms_b1": lambda: bench_unet(1, fused_ln=True, fused_gn=True),
    "ln_gemm": lambda: bench_unet(4, ln_gemm=True),
    "ln_gemm_geglu": lambda: bench_unet(4, ln_gemm="geglu"),
    "ln_gemm_qkv": lambda: bench_unet(4, ln_gemm="qkv"),
    "ln_gemm_b1": lambda: bench_unet(1, ln_gemm=True),
    "sam": lambda: bench_sam(False),
    "sam_ln_gemm": lambda: bench_sam(True),
    "sam_flash": lambda: bench_sam(False, flash_attn=True),
    "sam_full": lambda: bench_sam(True, flash_attn=True),
    "gn_dot": lambda: _with_env("DIVERGEN_GN_DOT", "1", lambda: bench_unet(4)),
    "attn_rawmax": lambda: _with_env(
        "DIVERGEN_ATTN_SOFTMAX", "rawmax",
        lambda: bench_unet(4, ln_gemm="geglu")),  # = the shipped default
    "attn_exact": lambda: _with_env(
        "DIVERGEN_ATTN_SOFTMAX", "exact",
        lambda: bench_unet(4, ln_gemm="geglu")),  # pre-r5 baseline A/B
    "attn_bf16exp": lambda: _with_env(
        "DIVERGEN_ATTN_SOFTMAX", "bf16exp",
        lambda: bench_unet(4, ln_gemm="geglu")),
    "swin": lambda: bench_swin(False),
    "swin_fused": lambda: bench_swin(True),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip_swin", action="store_true")
    ap.add_argument("--skip_unet", action="store_true")
    ap.add_argument("--only", type=str, default=None,
                    help="comma list from: " + ",".join(ALL_VARIANTS))
    args = ap.parse_args()
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    if args.only:
        names = args.only.split(",")
        unknown = sorted(set(names) - set(ALL_VARIANTS))
        if unknown:
            ap.error(f"unknown variant(s) {unknown}; valid: {','.join(ALL_VARIANTS)}")
        for name in names:
            ALL_VARIANTS[name]()
        return
    bench_packed_kernel()
    if not args.skip_unet:
        for B in (1, 4):
            bench_unet(B)
        bench_unet(4, conv_matmul=True)   # im2col-GEMM resblock convs A/B
        bench_unet(4, conv_matmul="tapsum")  # 9-GEMM tap-sum conv variant
        bench_unet(4, conv_matmul="fused")  # Pallas fused GN+SiLU+conv
        bench_unet(4, int8=True)  # W8A8 with in-kernel activation quant
    if not args.skip_swin:
        for fused in (False, True):
            bench_swin(fused)


if __name__ == "__main__":
    main()

# Measurement-gated kernel ideas (do not implement blind):
# - packed kernel: process TWO adjacent heads per grid step — block
#   (1, bq, 128) spans 2 heads' channels, filling all 128 lanes at d=64
#   (currently half-empty); kernel slices [:, :64]/[:, 64:] in VMEM.
# - bf16 exp2 input: cast (s - m) to bf16 before exp2 if the VPU
#   transcendental runs 2x at bf16; validate numerics vs f32 first.
