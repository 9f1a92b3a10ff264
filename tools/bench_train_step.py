"""Time the flagship detector train step on the real TPU.

Swin 896² CustomRCNN (DiverGen_swinL.yaml geometry) fwd+bwd+adamw, timed
the way the production trainer dispatches it: one donated jit call per
step (engine/trainer.py:114), chained asynchronously so axon dispatch RTT
overlaps device compute, with the chain-difference method cancelling the
fixed sync cost. Prints seconds/step, images/hr/chip and achieved MFU.

``--method scan`` keeps the old lax.scan-of-k-steps measurement for
comparison; on v5e it runs each loop iteration ~2.3x slower than the
straight-line step (the while-loop body re-materializes the ~3 GB
params+adamw carry every iteration instead of aliasing it, xplane trace
/tmp/swin_trace round-4), so it is NOT the production-faithful number.

Usage: python tools/bench_train_step.py [--size L] [--batch 2] [--img 896]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="L-22k-384")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--img", type=int, default=896)
    ap.add_argument("--instances", type=int, default=64)
    ap.add_argument("--mode", default="full",
                    choices=["full", "backbone", "nomask", "gtprop"])
    ap.add_argument("--no_remat", action="store_true")
    # tri-state: default None keeps the shipped config default (True since
    # r2, defaults.py MODEL.SWIN.FUSED_ATTN) instead of silently forcing the
    # non-default XLA path when the flag is absent
    ap.add_argument("--fused_attn", action="store_true", default=None)
    ap.add_argument("--no_fused_attn", dest="fused_attn", action="store_false")
    ap.add_argument("--trace", default="",
                    help="write a jax.profiler xplane trace of 1 step to DIR "
                         "(summarize with tools/trace_summary.py)")
    ap.add_argument("--method", default="percall", choices=["percall", "scan"],
                    help="percall = donated jit per step (trainer-faithful); "
                         "scan = lax.scan of k steps (legacy, ~2.3x slower "
                         "per iteration from the non-aliased carry)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from divergen_tpu.config import get_cfg
    from divergen_tpu.modeling.meta_arch.rcnn import build_model

    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_swintransformer_fpn_backbone"
    cfg.MODEL.SWIN.SIZE = args.size
    cfg.FP16 = True  # bf16 compute path
    cfg.MODEL.SWIN.USE_CHECKPOINT = not args.no_remat  # remat trades HBM for recompute
    if args.fused_attn is not None:
        cfg.MODEL.SWIN.FUSED_ATTN = args.fused_attn
    if args.mode == "nomask":
        cfg.MODEL.MASK_ON = False
    model = build_model(cfg)

    b, s, n = args.batch, args.img, args.instances
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(b, s, s, 3) * 255, jnp.float32)
    sizes = jnp.asarray([[s, s]] * b, jnp.int32)
    xy = rng.rand(b, n, 2) * (s - 100)
    wh = rng.rand(b, n, 2) * 80 + 16
    gt = {
        "boxes": jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32),
        "classes": jnp.asarray(rng.randint(0, 1203, (b, n)), jnp.int32),
        "valid": jnp.asarray(np.broadcast_to(np.arange(n)[None] < 20, (b, n))),
        "masks": jnp.asarray((rng.rand(b, n, 28, 28) > 0.5).astype(np.float32)),
        "instance_source": jnp.zeros((b, n), jnp.int32),
    }

    key = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda: model.init(key, images, sizes, gt=gt, rng=key, training=True)
    )()
    tx = optax.adamw(1e-4)
    opt_state = jax.jit(tx.init)(params)
    print("params:", sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params)) / 1e6,
          "M", flush=True)

    def loss_fn(p, k):
        if args.mode == "backbone":
            feats = model.apply(p, images, sizes, gt=gt, rng=k, training=True,
                                method=lambda m, *a, **kw: m._features(a[0]))
            return sum(jnp.sum(jnp.abs(f.astype(jnp.float32))) for f in feats.values()) * 1e-6
        losses = model.apply(p, images, sizes, gt=gt, rng=k, training=True,
                             gt_as_proposals=(args.mode == "gtprop"))
        return sum(jax.tree_util.tree_leaves(losses))

    def one_step(carry, i):
        p, o = carry
        k = jax.random.fold_in(key, i)
        loss, grads = jax.value_and_grad(loss_fn)(p, k)
        updates, o = tx.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return (p, o), loss

    # --- production-faithful dispatch: donated jit call per step, like
    # engine/trainer.py's jax.jit(step_fn, donate_argnums=(0,)) ---
    step_jit = jax.jit(one_step, donate_argnums=(0,))
    # donation consumes the input buffers: thread one rolling state through
    # the whole benchmark instead of re-feeding the originals
    state = (params, opt_state)
    del params, opt_state

    def chain(nsteps, state):
        t0 = time.perf_counter()
        for i in range(nsteps):
            state, loss = step_jit(state, jnp.int32(i))
        _ = float(np.asarray(loss))  # one sync at the end of the chain
        return time.perf_counter() - t0, state

    def run_percall():
        nonlocal state
        print("compiling...", flush=True)
        _, state = chain(1, state)
        n_small, n_big = 2, 10
        ts = []
        for _ in range(2):
            t, state2 = chain(n_small, state)
            ts.append(t)
            state = state2
        t_small = min(ts)
        ts = []
        for _ in range(2):
            t, state2 = chain(n_big, state)
            ts.append(t)
            state = state2
        t_big = min(ts)
        compiled = step_jit.lower(state, jnp.int32(0)).compile()
        return (t_big - t_small) / (n_big - n_small), compiled

    # --- legacy scan-of-k-steps method (kept for methodology comparison) ---
    def run_scan():
        runners = {}

        def make(kk):
            @jax.jit
            def run(p, o):
                (p, o), losses = jax.lax.scan(one_step, (p, o), jnp.arange(kk))
                return losses[-1]

            return run

        def timed(kk):
            if kk not in runners:
                runners[kk] = make(kk)
            t0 = time.perf_counter()
            out = runners[kk](*state)
            _ = float(np.asarray(out))
            return time.perf_counter() - t0

        print("compiling...", flush=True)
        _ = timed(1)
        t1 = min(timed(1) for _ in range(2))
        t3 = min(timed(3) for _ in range(2))
        return (t3 - t1) / 2, runners[1].lower(*state).compile()

    per_step, compiled = run_percall() if args.method == "percall" else run_scan()
    # achieved MFU from XLA's own flop count of the whole compiled step
    # (fwd+bwd+adamw); v5e bf16 peak 197 TFLOP/s. Pallas kernel flops
    # (fused window attention) are NOT in XLA's count -> lower bound.
    mfu = ""
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", 0.0))
        if flops > 0:
            mfu = f", {flops / per_step / 1e12:.1f} TFLOP/s = {flops / per_step / 197e12 * 100:.1f}% MFU (XLA-counted {flops / 1e12:.1f} TF/step, pallas excluded)"
    except Exception as e:  # cost_analysis availability varies by backend
        mfu = f" (cost_analysis unavailable: {e})"
    print(
        f"swin-{args.size} {s}x{s} b{b} {args.mode} [{args.method}]: "
        f"{per_step * 1e3:.1f} ms/step, "
        f"{3600.0 / per_step * b:.0f} imgs/hr/chip{mfu}",
        flush=True,
    )
    if args.trace:
        with jax.profiler.trace(args.trace):
            _, state = chain(1, state)
        print(f"trace written to {args.trace}", flush=True)


if __name__ == "__main__":
    main()
