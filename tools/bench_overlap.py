"""Overlap proof for the pipeline orchestrator (BASELINE north star: "the
TPU never stalls on host-side preprocessing").

Runs the flagship detector train step in the main thread while an
``InstanceProducer`` (real SDXL-geometry UNet denoise → synthetic mask →
threshold filter) generates instances into a ``LivePool`` on the same chip,
then reports:

  * train step time alone vs train step time with the producer active
    (XLA async dispatch interleaves the two programs);
  * producer throughput (instances/s) achieved during training;
  * pool fill level over the run.

Usage: python tools/bench_overlap.py [--size T] [--img 640] [--steps 30]
       [--gen_res 256] [--gen_steps 4] [--tiny]
"""
import argparse
import sys
import threading
import time

import numpy as np

sys.path.insert(0, ".")


def build_train_step(args):
    import jax
    import jax.numpy as jnp
    import optax

    from divergen_tpu.config import get_cfg
    from divergen_tpu.modeling.meta_arch.rcnn import build_model

    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_swintransformer_fpn_backbone"
    cfg.MODEL.SWIN.SIZE = args.size
    cfg.FP16 = True
    cfg.MODEL.SWIN.USE_CHECKPOINT = True
    model = build_model(cfg)

    b, s, n = args.batch, args.img, 64
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

    def loss_fn(p, k):
        losses = model.apply(p, images, sizes, gt=gt, rng=k, training=True)
        return sum(jax.tree_util.tree_leaves(losses))

    @jax.jit
    def step(p, o, i):
        k = jax.random.fold_in(key, i)
        loss, grads = jax.value_and_grad(loss_fn)(p, k)
        updates, o = tx.update(grads, o, p)
        p = optax.apply_updates(p, updates)
        return p, o, loss

    return step, params, opt_state


def build_producer(args, pool):
    """SDXL-geometry denoise (reduced steps/res for the bench) + cheap
    synthetic mask + area filter — the device cost profile of the real
    generation chain without checkpoints."""
    import types

    import jax
    import jax.numpy as jnp

    from divergen_tpu.pipeline.generation.txt2img import _build_pipeline
    from divergen_tpu.pipeline.orchestrator import InstanceProducer

    gen_args = types.SimpleNamespace(
        tiny=args.tiny, height=args.gen_res, width=args.gen_res,
        steps=args.gen_steps, guidance=7.5, unet_ckpt=None,
        data_parallel=False, encoder_reuse=False,
    )
    pipe, ctx_dim = _build_pipeline(gen_args)
    b = args.gen_batch
    ctx = jnp.zeros((b, 77, ctx_dim), jnp.float32)
    pooled = None if args.tiny else jnp.zeros((b, 1280), jnp.float32)

    def generate_fn(cat, rng):
        key = jax.random.PRNGKey(int(rng.integers(0, 2**31)))
        imgs = pipe.generate(
            key, ctx, ctx, pooled, pooled,
            height=args.gen_res, width=args.gen_res,
        )
        return np.asarray(imgs).astype(np.uint8)

    def mask_fn(images):
        h, w = images.shape[1:3]
        yy, xx = np.mgrid[0:h, 0:w]
        m = ((yy - h / 2) ** 2 + (xx - w / 2) ** 2) < (h / 3) ** 2
        return np.broadcast_to(m, images.shape[:3])

    return InstanceProducer(
        pool, categories=[1, 2, 3], generate_fn=generate_fn, mask_fn=mask_fn,
        clip_threshold=-1.0,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="T")
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--gen_res", type=int, default=256)
    ap.add_argument("--gen_steps", type=int, default=4)
    ap.add_argument("--gen_batch", type=int, default=1)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax

    from divergen_tpu.pipeline.orchestrator import LivePool

    step, params, opt_state = build_train_step(args)
    print("compiling train step...", flush=True)
    p, o, loss = step(params, opt_state, 0)
    jax.block_until_ready(loss)

    def run_steps(k0):
        nonlocal p, o
        t0 = time.perf_counter()
        for i in range(args.steps):
            p, o, loss = step(p, o, k0 + i)
        jax.block_until_ready(loss)
        return (time.perf_counter() - t0) / args.steps

    t_alone = run_steps(1)
    print(f"train alone: {t_alone * 1e3:.1f} ms/step", flush=True)

    pool = LivePool(patch_size=64)
    producer = build_producer(args, pool)
    print("compiling producer...", flush=True)
    producer.generate_fn(1, np.random.default_rng(0))  # compile outside timing
    producer.start()
    time.sleep(0.5)
    t_overlap = run_steps(1000)
    produced_during = producer.produced
    producer.stop()
    producer.join(timeout=60)

    wall = args.steps * t_overlap
    print(
        f"train with producer: {t_overlap * 1e3:.1f} ms/step "
        f"({(t_overlap / t_alone - 1) * 100:.1f}% slowdown)", flush=True,
    )
    print(
        f"producer during training: {produced_during} instances "
        f"({produced_during / wall:.2f} inst/s), pool={pool.counts()}", flush=True,
    )
    import json

    print(json.dumps({
        "train_ms_alone": round(t_alone * 1e3, 2),
        "train_ms_overlap": round(t_overlap * 1e3, 2),
        "slowdown_pct": round((t_overlap / t_alone - 1) * 100, 2),
        "producer_inst_per_s": round(produced_during / max(wall, 1e-9), 3),
    }))


if __name__ == "__main__":
    main()
