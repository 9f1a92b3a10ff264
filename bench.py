"""Driver benchmark — prints ONE JSON line.

Round-1 workload: the copy-paste compositing stage (BASELINE.json configs[0]
— "paste 4 pre-generated RGBA instances onto one LVIS image (CPU
numpy/PIL)"). Ours runs the whole compositor on-device (vmapped XLA ops,
ops/copy_paste.py); the baseline is the reference's CPU numpy path
(custom_build_copypaste_mapper.py:510-566 semantics, reimplemented with the
same numpy ops: cv2.resize + np.where blends + mask updates + bbox scan).

vs_baseline = ours / cpu_reference (higher is better).

As later rounds land generation/filtering stages this grows toward the full
"SDXL imgs/hr/chip through gen+filter+paste" metric.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

H = W = 896  # TRAIN_SIZE of the flagship config (DiverGen_swinL.yaml)
B = 8  # images composited per device step
N_DST = 8  # real instances per image
P = 4  # pasted instances per image
PATCH = 128


def make_inputs(rng):
    image = (rng.rand(H, W, 3) * 255).astype(np.float32)
    masks = np.zeros((N_DST, H, W), bool)
    for i in range(N_DST):
        y, x = rng.randint(0, H - 100), rng.randint(0, W - 100)
        masks[i, y : y + 80, x : x + 80] = True
    boxes = np.zeros((N_DST, 4), np.float32)
    for i in range(N_DST):
        ys, xs = np.where(masks[i])
        boxes[i] = [xs.min(), ys.min(), xs.max() + 1, ys.max() + 1]
    patches = (rng.rand(P, PATCH, PATCH, 4)).astype(np.float32)
    patches[..., :3] *= 255
    patches[..., 3] = (patches[..., 3] > 0.3).astype(np.float32)
    pboxes = np.zeros((P, 4), np.float32)
    for i in range(P):
        y, x = rng.randint(0, H - 200), rng.randint(0, W - 200)
        s = rng.randint(60, 180)
        pboxes[i] = [x, y, x + s, y + s]
    return image, masks, boxes, patches, pboxes


def bench_cpu(inputs, iters=3):
    """Reference-style CPU paste: cv2.resize patch to box + numpy blends."""
    import cv2

    image, masks, boxes, patches, pboxes = inputs
    t0 = time.perf_counter()
    for _ in range(iters):
        img = image.copy()
        cur = list(masks.copy())
        for k in range(P):
            x1, y1, x2, y2 = pboxes[k].astype(int)
            pw, ph = x2 - x1, y2 - y1
            resized = cv2.resize(patches[k], (pw, ph))
            full = np.zeros((H, W, 4), np.float32)
            full[y1:y2, x1:x2] = resized
            bin_mask = full[..., 3] > 128 / 255
            wgt = bin_mask.astype(np.float32)[..., None]
            img = img * (1 - wgt) + full[..., :3] * wgt
            cur = [np.where(bin_mask, False, m) for m in cur]
            cur.append(bin_mask)
        allm = np.stack(cur)
        # bbox recompute (get_bboxes)
        for i in range(len(allm)):
            ys, xs = np.where(allm[i])
            if len(ys):
                _ = (xs.min(), ys.min(), xs.max() + 1, ys.max() + 1)
    dt = (time.perf_counter() - t0) / iters
    return P / dt  # pasted instances per second per image


def bench_device(inputs, iters=64):
    """Difference timing: the axon tunnel is fully async (block_until_ready
    returns before execution) and a scalar readback costs a fixed ~35ms RTT
    after warmup. So: time (K chained calls + readback) minus (0 calls +
    readback) and divide by K. Chaining feeds each call's output image into
    the next call so nothing can be elided."""
    import jax
    import jax.numpy as jnp

    from divergen_tpu.ops.copy_paste import paste_instances_batch

    image, masks, boxes, patches, pboxes = inputs
    batch = {
        "image": jnp.array(np.broadcast_to(image, (B, H, W, 3))),
        "masks": jnp.array(np.broadcast_to(masks, (B, N_DST, H, W))),
        "boxes": jnp.array(np.broadcast_to(boxes, (B, N_DST, 4))),
        "classes": jnp.zeros((B, N_DST), jnp.int32),
        "valid": jnp.ones((B, N_DST), bool),
        "instance_source": jnp.zeros((B, N_DST), jnp.int32),
        "patches": jnp.array(np.broadcast_to(patches, (B, P, PATCH, PATCH, 4))),
        "patch_boxes": jnp.array(np.broadcast_to(pboxes, (B, P, 4))),
        "patch_classes": jnp.zeros((B, P), jnp.int32),
        "patch_valid": jnp.ones((B, P), bool),
        "patch_flip": jnp.zeros((B, P), bool),
    }
    fn = jax.jit(paste_instances_batch(mode="basic"))
    probe = jax.jit(lambda o: jnp.sum(o["image"][:, ::97, ::97]))

    def run(k):
        b = dict(batch)
        for _ in range(k):
            b["image"] = fn(b)["image"]
        t0 = time.perf_counter()
        _ = float(probe({"image": b["image"]}))
        return time.perf_counter() - t0

    # warmup: compile + first-execution tunnel latency
    _ = run(1)
    _ = run(1)

    def timed(k):
        t0 = time.perf_counter()
        b = dict(batch)
        for _ in range(k):
            b["image"] = fn(b)["image"]
        _ = float(probe({"image": b["image"]}))
        return time.perf_counter() - t0

    base = min(timed(0) for _ in range(3))
    total = min(timed(iters) for _ in range(3))
    dt = max(total - base, 1e-9) / iters
    return B * P / dt  # pasted instances per second


def main():
    rng = np.random.RandomState(0)
    inputs = make_inputs(rng)
    cpu_per_image = bench_cpu(inputs)
    dev = bench_device(inputs)
    print(
        json.dumps(
            {
                "metric": "copy_paste_pasted_instances_per_s",
                "value": round(dev, 2),
                "unit": "inst/s (896x896, 4 pastes/img, on-device)",
                "vs_baseline": round(dev / cpu_per_image, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
