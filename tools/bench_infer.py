"""Detector serving benchmark: Swin-L 896² inference on the real TPU.

Times the full jitted inference graph (backbone → CenterNet proposals →
cascade heads → NMS → mask head) with the scan-chain difference method.

Usage: python tools/bench_infer.py [--size L-22k-384] [--batch 1]
"""
import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="L-22k-384")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--img", type=int, default=896)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from divergen_tpu.config import get_cfg
    from divergen_tpu.modeling.meta_arch.rcnn import build_model

    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_swintransformer_fpn_backbone"
    cfg.MODEL.SWIN.SIZE = args.size
    cfg.FP16 = True
    model = build_model(cfg)
    b, s = args.batch, args.img
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(b, s, s, 3) * 255, jnp.float32)
    sizes = jnp.asarray([[s, s]] * b, jnp.int32)
    params = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), images, sizes, training=False))()

    runners = {}

    def make(k):
        @jax.jit
        def run(p, im):
            def body(c, _):
                dets = model.apply(p, im + c, sizes, training=False)
                return c + jnp.sum(dets["scores"]).astype(c.dtype) * 0.0, None

            out, _ = jax.lax.scan(body, jnp.zeros((), im.dtype), None, length=k)
            return out

        return run

    def timed(k):
        if k not in runners:
            runners[k] = make(k)
        t0 = time.perf_counter()
        o = runners[k](params, images)
        _ = float(np.asarray(o))
        return time.perf_counter() - t0

    print("compiling...", flush=True)
    _ = timed(1)
    t1 = min(timed(1) for _ in range(2))
    t3 = min(timed(3) for _ in range(2))
    per = (t3 - t1) / 2
    print(
        f"swin-{args.size} {s}x{s} b{b} inference: {per * 1e3:.1f} ms/img-batch, "
        f"{b / per:.1f} imgs/s/chip",
        flush=True,
    )


if __name__ == "__main__":
    main()
