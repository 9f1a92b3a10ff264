"""Micro-bench detector ops on TPU: NMS and multilevel ROIAlign."""
import sys, time
import numpy as np
sys.path.insert(0, ".")
import jax, jax.numpy as jnp

def chain_time(fn, x, iters_small=1, iters_big=5, probe=None):
    runners = {}
    def make(k):
        @jax.jit
        def run(x):
            def body(c, _):
                out = fn(c)
                return out, None
            out, _ = jax.lax.scan(body, x, None, length=k)
            return out
        return run
    def timed(k):
        if k not in runners: runners[k] = make(k)
        t0 = time.perf_counter()
        o = runners[k](x)
        _ = float(np.asarray(probe(o)))
        return time.perf_counter() - t0
    _ = timed(iters_small); _ = timed(iters_big)
    ts = min(timed(iters_small) for _ in range(2))
    tb = min(timed(iters_big) for _ in range(2))
    return (tb - ts) / (iters_big - iters_small)

rng = np.random.RandomState(0)

# ---- NMS at train-time shapes (pre_nms_topk=4000 per image, 2 images) ----
from divergen_tpu.ops.nms import batched_nms_mask
N = 4000
boxes = jnp.asarray(rng.rand(2, N, 4) * 800, jnp.float32)
boxes = boxes.at[..., 2:].set(boxes[..., :2] + rng.rand(2, N, 2) * 100 + 4)
scores = jnp.asarray(rng.rand(2, N), jnp.float32)
classes = jnp.zeros((2, N), jnp.int32)
valid = jnp.ones((2, N), bool)

def nms_fn(b):
    keep = jax.vmap(lambda bb: batched_nms_mask(bb, scores[0], classes[0], 0.9, valid[0]))(b)
    return b + keep[..., None].astype(b.dtype) * 0.0

t = chain_time(nms_fn, boxes, probe=lambda o: o[0, 0, 0])
print(f"batched_nms_mask 2x{N}: {t*1e3:8.2f} ms", flush=True)

# ---- multilevel ROIAlign at cascade shapes ----
from divergen_tpu.ops.roi_align import multilevel_roi_align
fm = [jnp.asarray(rng.rand(2, s, s, 256), jnp.bfloat16) for s in (112, 56, 28)]
R = 576
rois = jnp.asarray(rng.rand(2, R, 4) * 800, jnp.float32)
rois = rois.at[..., 2:].set(rois[..., :2] + rng.rand(2, R, 2) * 120 + 8)

def ra_fn(r):
    pooled = jax.vmap(lambda f3, f4, f5, rr: multilevel_roi_align([f3, f4, f5], [8, 16, 32], rr, 7))(
        fm[0], fm[1], fm[2], r)
    return r + jnp.mean(pooled.astype(jnp.float32)) * 0.0

t = chain_time(ra_fn, rois, probe=lambda o: o[0, 0, 0])
print(f"multilevel_roi_align 2x{R}x7x7x256: {t*1e3:8.2f} ms", flush=True)

# ---- centernet ground truth + proposals ----
from divergen_tpu.config import get_cfg
from divergen_tpu.modeling.centernet.centernet import (
    CenterNetConfig, centernet_ground_truth, centernet_proposals, level_geometry)
cfg = get_cfg()
ccfg = CenterNetConfig.from_cfg(cfg)
shapes = tuple((896 // s, 896 // s) for s in (8, 16, 32, 64, 128))
geom = level_geometry(ccfg, shapes)
M = sum(h * w for h, w in shapes)
gtb = jnp.asarray(rng.rand(2, 64, 4) * 800, jnp.float32)
gtb = gtb.at[..., 2:].set(gtb[..., :2] + 50)
gtv = jnp.ones((2, 64), bool)
agn = jnp.asarray(rng.rand(2, M), jnp.float32)
reg = jnp.asarray(rng.rand(2, M, 4) * 50, jnp.float32)
sizes = jnp.asarray([[896, 896]] * 2)

def gt_fn(b):
    rt, hm, pc = centernet_ground_truth(ccfg, geom, b, gtv)
    return b + jnp.mean(hm) * 0.0

t = chain_time(gt_fn, gtb, probe=lambda o: o[0, 0, 0])
print(f"centernet_ground_truth: {t*1e3:8.2f} ms", flush=True)

def prop_fn(a):
    p = centernet_proposals(ccfg, geom, a, reg, sizes, training=True)
    return a + jnp.mean(p["scores"]) * 0.0

t = chain_time(prop_fn, agn, probe=lambda o: o[0, 0])
print(f"centernet_proposals (incl NMS): {t*1e3:8.2f} ms", flush=True)
