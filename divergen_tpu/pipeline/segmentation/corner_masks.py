"""SAM corner-prompt instance annotation CLI (stage L5).

Counterpart of ``DiverGen/segmentation/get_background_sam_mask.py``:
4 image-corner points with ``--corner_margin`` prompted as *foreground of
the background* (:150-161), take ``masks[2]`` and invert → instance mask
PNG 0/255 (:163-174); categories sorted by image_count (:75-78); files
rank-sharded ``i % world == rank`` (:129-136); existence-check resume
(:143-145). TPU redesign: files are processed in fixed-size device batches
through ONE jitted encode+predict graph instead of per-image
set_image/predict calls.
"""
from __future__ import annotations

import argparse
import json
import os
from glob import glob
from typing import List, Optional

import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("get_background_sam_mask")
    p.add_argument("--sam_checkpoint", type=str, default="")
    p.add_argument("--model_type", type=str, default="vit_h")
    p.add_argument("--in_dir", type=str, required=True)
    p.add_argument("--out_dir", type=str, required=True)
    p.add_argument("--dataset_json_path", type=str, default="")
    p.add_argument("--corner_margin", type=int, default=10)
    p.add_argument("--img_size", type=int, default=1024)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--dist", action="store_true", default=False)
    p.add_argument("--disable_overwrite", action="store_true", default=True)
    p.add_argument("--tiny", action="store_true", help="tiny random model (smoke)")
    # Hardware-measured defaults (SWEEP_r05 sam_h_s_per_img_*): rel-pos flash
    # on the 4096-token global layers + LN folded into the consuming GEMMs cut
    # ViT-H encode 0.1642 -> 0.096 s/img on v5e. --no_fused_encoder restores
    # the plain path (e.g. for interpret-mode debugging off-TPU).
    p.add_argument("--no_fused_encoder", action="store_true", default=False)
    return p


def corner_points(size: int, margin: int) -> np.ndarray:
    """(4, 2) xy prompts at the 4 corners (get_background_sam_mask:150-161)."""
    m = margin
    return np.array(
        [[m, m], [size - m, m], [m, size - m], [size - m, size - m]], np.float32
    )


def build_sam(args):
    import jax
    import jax.numpy as jnp

    from .sam import SAM

    fused = not getattr(args, "no_fused_encoder", False)
    if args.tiny:
        sam = SAM.tiny(img_size=args.img_size)
    elif args.model_type == "vit_b":
        sam = SAM.vit_b(dtype=jnp.bfloat16)
    else:
        sam = SAM.vit_h(dtype=jnp.bfloat16, ln_gemm=fused, flash_attn=fused)
    dummy = jnp.zeros((1, args.img_size, args.img_size, 3))
    pts = jnp.zeros((1, 4, 2))
    lbl = jnp.ones((1, 4), jnp.int32)
    if args.sam_checkpoint:
        from ...utils.torch_weights import load_sam_params

        params = load_sam_params(args.sam_checkpoint, sam)
    else:
        params = sam.init(jax.random.PRNGKey(0), dummy, pts, lbl)
    return sam, params


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    import cv2
    import jax
    import jax.numpy as jnp

    from .sam import upscale_masks

    rank = jax.process_index() if args.dist else int(os.environ.get("RANK", 0))
    world = jax.process_count() if args.dist else int(os.environ.get("WORLD_SIZE", 1))

    # categories sorted by image_count ascending (reference :75-78)
    cats = sorted(os.listdir(args.in_dir))
    if args.dataset_json_path and os.path.exists(args.dataset_json_path):
        with open(args.dataset_json_path) as f:
            infos = {c["name"]: c.get("image_count", 0) for c in json.load(f)["categories"]}
        cats.sort(key=lambda c: infos.get(c, 0))

    sam, params = build_sam(args)
    size = args.img_size
    pts = jnp.asarray(np.tile(corner_points(size, args.corner_margin), (args.batch, 1, 1)))
    lbl = jnp.ones((args.batch, 4), jnp.int32)

    @jax.jit
    def predict(params, images):
        masks, iou = sam.apply(params, images, pts, lbl)
        up = upscale_masks(masks.astype(jnp.float32), size)
        # masks[2] = whole-background mask; instance = inverse (ref :169)
        return up[:, 2] <= 0.0

    n_done = 0
    for cat in cats:
        files = sorted(glob(os.path.join(args.in_dir, cat, "*.png")) +
                       glob(os.path.join(args.in_dir, cat, "*.jpg")))
        files = [f for i, f in enumerate(files) if i % world == rank]
        out_cat = os.path.join(args.out_dir, cat)
        os.makedirs(out_cat, exist_ok=True)
        todo = []
        for f in files:
            out_path = os.path.join(out_cat, os.path.basename(f).rsplit(".", 1)[0] + ".png")
            if args.disable_overwrite and os.path.exists(out_path):
                continue
            todo.append((f, out_path))
        for ofs in range(0, len(todo), args.batch):
            chunk = todo[ofs : ofs + args.batch]
            imgs = []
            shapes = []
            for f, _ in chunk:
                img = cv2.cvtColor(cv2.imread(f), cv2.COLOR_BGR2RGB)
                shapes.append(img.shape[:2])
                imgs.append(cv2.resize(img, (size, size)).astype(np.float32))
            pad = args.batch - len(imgs)
            if pad:
                imgs += [np.zeros((size, size, 3), np.float32)] * pad
            inst = np.asarray(predict(params, jnp.asarray(np.stack(imgs))))
            for k, (f, out_path) in enumerate(chunk):
                h, w = shapes[k]
                m = cv2.resize(
                    inst[k].astype(np.uint8) * 255, (w, h), interpolation=cv2.INTER_NEAREST
                )
                cv2.imwrite(out_path, m)
                n_done += 1
    print(f"done: {n_done} masks → {args.out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
