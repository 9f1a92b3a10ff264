"""On-device copy-paste compositor (vmapped XLA image ops).

TPU-native replacement for the reference's CPU paste kernel
(``DiverGen/divergen/data/custom_build_copypaste_mapper.py:510-566``
``InstPool._copy_paste`` + ``transforms/custom_cp_method.py:5-22``
``blend_image`` + ``get_updated_masks``/``get_bboxes`` at ``:73-92``) —
the per-sample numpy/PIL chain that is the reference's dataloader
throughput wall (SURVEY.md §3.1 hot loops). Here the host only decodes
RGBA patches; placement, scaling, blending, occlusion updates, and
bbox recomputation all run on-device with static shapes.

Semantics parity notes:
- Pastes compose sequentially (later patches occlude earlier ones and the
  dst instances), exactly like the reference's per-instance ``_copy_paste``
  loop (``get_mix_result`` :494-506).
- Instead of resizing each RGBA patch to its target box (dynamic shapes),
  every output pixel inverse-warps into patch space and bilinearly samples
  — the same image up to resampling kernel (cv2.resize bilinear).
- Blend modes: ``basic`` (hard mask), ``alpha`` (alpha matte), ``gaussian``
  (5x5 box-blur feathered mask — cv2.blur is a box filter). ``possion``
  stays a host-side scipy path (data/transforms).
- The occluded-object filter (bbox moved ≤ ``bbox_occluded_thr`` on every
  coord OR remaining mask > ``mask_occluded_thr`` px, :539-546) is applied
  once after all pastes against the pre-paste boxes; the reference applies
  it per paste step against the previous step's boxes. Identical unless an
  instance erodes >10px in two different pastes yet stays >10px per step —
  a measure-zero corner the tests pin down.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax import Array

MASK_THRESHOLD = 128.0 / 255.0  # alpha cut (mapper MASK_THRESHOLD=128, cfg)


def rasterize_patch(
    patch: Array,  # (ph, pw, 4) RGBA float 0..1 alpha / 0..255 rgb
    tgt_box: Array,  # (4,) x1,y1,x2,y2 in output coords
    out_hw: Tuple[int, int],
    flip: Array | None = None,  # () bool — horizontal flip
    angle: Array | None = None,  # () radians, rotation about the box center
) -> Tuple[Array, Array]:
    """Inverse-warp a patch into a full-frame RGB + alpha layer.

    Returns (rgb (H,W,3), alpha (H,W)) with alpha 0 outside the box. The
    optional rotation covers T.RandomRotation / the inp-rotate augmentation
    (custom_build_copypaste_mapper.py:111-240) — same inverse-warp, with the
    normalized box coordinates rotated about (0.5, 0.5).
    """
    h, w = out_hw
    ph, pw, _ = patch.shape
    x1, y1, x2, y2 = tgt_box[0], tgt_box[1], tgt_box[2], tgt_box[3]
    bw = jnp.maximum(x2 - x1, 1e-6)
    bh = jnp.maximum(y2 - y1, 1e-6)
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5 - y1) / bh  # 0..1 inside box
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5 - x1) / bw
    if flip is not None:
        xs = jnp.where(flip, 1.0 - xs, xs)
    if angle is not None:
        # rotated grid: full 2D sample coordinates (bigger gather)
        ca, sa = jnp.cos(angle), jnp.sin(angle)
        u = xs[None, :] - 0.5
        v = ys[:, None] - 0.5
        xg = ca * u + sa * v + 0.5  # rotate sample grid (inverse warp)
        yg = -sa * u + ca * v + 0.5
        py = yg * ph - 0.5
        px = xg * pw - 0.5
        y0 = jnp.floor(py)
        x0 = jnp.floor(px)
        ly, lx = py - y0, px - x0
        y0i = jnp.clip(y0.astype(jnp.int32), 0, ph - 1)
        y1i = jnp.clip(y0i + 1, 0, ph - 1)
        x0i = jnp.clip(x0.astype(jnp.int32), 0, pw - 1)
        x1i = jnp.clip(x0i + 1, 0, pw - 1)
        flat = patch.reshape(-1, patch.shape[-1])

        def gather(yi, xi):
            return flat[(yi * pw + xi).reshape(-1)].reshape(h, w, -1)

        v00 = gather(y0i, x0i)
        v01 = gather(y0i, x1i)
        v10 = gather(y1i, x0i)
        v11 = gather(y1i, x1i)
        top = v00 * (1 - lx)[..., None] + v01 * lx[..., None]
        bot = v10 * (1 - lx)[..., None] + v11 * lx[..., None]
        out = top * (1 - ly)[..., None] + bot * ly[..., None]
        inside = (yg >= 0) & (yg < 1) & (xg >= 0) & (xg < 1)
        rgb = out[..., :3]
        alpha = jnp.where(inside, out[..., 3], 0.0)
        return rgb, alpha

    # axis-aligned fast path: separable row/col slices (~60x cheaper than the
    # 2D gather; this is the hot per-step paste path)
    py = ys * ph - 0.5
    px = xs * pw - 0.5
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    ly = py - y0
    lx = px - x0
    y0i = jnp.clip(y0.astype(jnp.int32), 0, ph - 1)
    y1i = jnp.clip(y0i + 1, 0, ph - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, pw - 1)
    x1i = jnp.clip(x0i + 1, 0, pw - 1)

    def gather(yi, xi):
        return patch[yi][:, xi]  # (H, W, 4)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)
    top = v00 * (1 - lx)[None, :, None] + v01 * lx[None, :, None]
    bot = v10 * (1 - lx)[None, :, None] + v11 * lx[None, :, None]
    out = top * (1 - ly)[:, None, None] + bot * ly[:, None, None]
    inside = ((ys >= 0) & (ys < 1))[:, None] & ((xs >= 0) & (xs < 1))[None, :]
    rgb = out[..., :3]
    alpha = jnp.where(inside, out[..., 3], 0.0)
    return rgb, alpha


def _box_blur_5x5(x: Array) -> Array:
    """Separable 5x5 box filter (cv2.blur(…,(5,5)) w/ zero border)."""
    k = jnp.ones((5,), x.dtype) / 5.0
    pad = [(2, 2), (0, 0)]
    a = jnp.pad(x, pad)
    a = sum(a[i : i + x.shape[0]] * k[i] for i in range(5))
    a = jnp.pad(a, [(0, 0), (2, 2)])
    return sum(a[:, i : i + x.shape[1]] * k[i] for i in range(5))


def boxes_from_masks(masks: Array) -> Array:
    """(N,H,W) bool → (N,4) x1,y1,x2+1,y2+1 (get_bboxes, mapper :79-92).
    All-empty masks give a zero box."""
    n, h, w = masks.shape
    x_any = jnp.any(masks, axis=1)  # (N, W)
    y_any = jnp.any(masks, axis=2)  # (N, H)
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    big = jnp.float32(1e9)
    x1 = jnp.min(jnp.where(x_any, xs[None], big), axis=1)
    x2 = jnp.max(jnp.where(x_any, xs[None], -big), axis=1) + 1
    y1 = jnp.min(jnp.where(y_any, ys[None], big), axis=1)
    y2 = jnp.max(jnp.where(y_any, ys[None], -big), axis=1) + 1
    empty = ~jnp.any(x_any, axis=1)
    boxes = jnp.stack([x1, y1, x2, y2], axis=1)
    return jnp.where(empty[:, None], 0.0, boxes)


def paste_instances(
    image: Array,  # (H, W, 3) float RGB
    masks: Array,  # (N, H, W) bool dst instance masks
    boxes: Array,  # (N, 4)
    classes: Array,  # (N,) int
    valid: Array,  # (N,) bool
    source: Array,  # (N,) int 0=real
    patches: Array,  # (P, ph, pw, 4) RGBA, rgb 0..255, alpha 0..1
    patch_boxes: Array,  # (P, 4) placement in image coords
    patch_classes: Array,  # (P,) int
    patch_valid: Array,  # (P,) bool
    patch_flip: Array | None = None,  # (P,) bool
    mode: str = "basic",
    bbox_occluded_thr: float = 10.0,
    mask_occluded_thr: float = 300.0,
    patch_angle: Array | None = None,  # (P,) radians
) -> Dict[str, Array]:
    """Sequentially paste P instances onto one sample. Static output
    capacity N+P; occluded dst instances are invalidated, not removed."""
    h, w = image.shape[:2]
    n, p = masks.shape[0], patches.shape[0]
    if patch_flip is None:
        patch_flip = jnp.zeros((p,), bool)

    # Rasterize all P layers at once, then resolve occlusion in ONE pass:
    # sequential semantics are preserved exactly because patch k's final mask
    # is bin[k] minus the union of later patches, and dst masks lose the
    # union of all patches. This touches each mask once instead of carrying
    # (N+P, H, W) through a P-step scan — ~P× less HBM traffic.
    if patch_angle is None:
        rgbs, alphas = jax.vmap(
            lambda pc, tb, fl: rasterize_patch(pc, tb, (h, w), fl)
        )(patches, patch_boxes, patch_flip)
    else:
        rgbs, alphas = jax.vmap(
            lambda pc, tb, fl, an: rasterize_patch(pc, tb, (h, w), fl, an)
        )(patches, patch_boxes, patch_flip, patch_angle)  # (P,H,W,3), (P,H,W)
    bins = (alphas > MASK_THRESHOLD) & patch_valid[:, None, None]

    # suffix union: occ_after[k] = OR_{j>k} bins[j]
    def suffix_body(carry, b):
        new = carry | b
        return new, carry

    _, occ_after_rev = jax.lax.scan(
        suffix_body, jnp.zeros((h, w), bool), bins[::-1]
    )
    occ_after = occ_after_rev[::-1]  # (P,H,W)

    patch_masks = bins & ~occ_after
    dst_occ = jnp.any(bins, axis=0)
    all_masks = jnp.concatenate([masks & ~dst_occ[None], patch_masks], axis=0)

    # image composite, sequential over P (exact paint order; P is small)
    def blend_body(img, inputs):
        rgb, alpha, bin_mask, pval = inputs
        if mode == "alpha":
            weight = jnp.where(pval, alpha, 0.0)
        elif mode == "gaussian":
            weight = _box_blur_5x5(bin_mask.astype(jnp.float32))
        else:  # basic
            weight = bin_mask.astype(jnp.float32)
        img = img * (1.0 - weight[..., None]) + rgb * weight[..., None]
        return img, None

    image_out, _ = jax.lax.scan(blend_body, image, (rgbs, alphas, bins, patch_valid))

    new_boxes = boxes_from_masks(all_masks)
    dst_boxes_new = new_boxes[:n]
    areas = jnp.sum(all_masks[:n], axis=(1, 2))
    bbox_ok = jnp.all(jnp.abs(dst_boxes_new - boxes) <= bbox_occluded_thr, axis=-1)
    mask_ok = areas > mask_occluded_thr
    dst_valid = valid & (bbox_ok | mask_ok)

    out_classes = jnp.concatenate([classes, patch_classes])
    out_valid = jnp.concatenate([dst_valid, patch_valid])
    out_source = jnp.concatenate([source, jnp.ones((p,), source.dtype)])
    return {
        "image": image_out,
        "masks": all_masks,
        "boxes": new_boxes,
        "classes": out_classes,
        "valid": out_valid,
        "instance_source": out_source,
    }


def _crop_binary(full: Array, box: Array, side: int) -> Array:
    """Bilinear-sample a full-frame (H,W) float field on an SxS grid inside
    ``box`` (zero outside the frame)."""
    h, w = full.shape
    x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
    ys = y1 + (jnp.arange(side, dtype=jnp.float32) + 0.5) * (y2 - y1) / side - 0.5
    xs = x1 + (jnp.arange(side, dtype=jnp.float32) + 0.5) * (x2 - x1) / side - 0.5
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ly, lx = ys - y0, xs - x0
    y0i, x0i = y0.astype(jnp.int32), x0.astype(jnp.int32)

    def at(yi, xi):
        v = full[jnp.clip(yi, 0, h - 1)[:, None], jnp.clip(xi, 0, w - 1)[None, :]]
        ok = ((yi >= 0) & (yi < h))[:, None] & ((xi >= 0) & (xi < w))[None, :]
        return jnp.where(ok, v, 0.0)

    top = at(y0i, x0i) * (1 - lx)[None] + at(y0i, x0i + 1) * lx[None]
    bot = at(y0i + 1, x0i) * (1 - lx)[None] + at(y0i + 1, x0i + 1) * lx[None]
    return top * (1 - ly)[:, None] + bot * ly[:, None]


def _boxframe_subbox(mask: Array, box: Array) -> Array:
    """Tight bbox (image coords) of an SxS box-frame mask>0.5; zero if empty."""
    s = mask.shape[0]
    on = mask > 0.5
    xs = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    ys = xs
    big = jnp.float32(1e9)
    col_any = jnp.any(on, axis=0)
    row_any = jnp.any(on, axis=1)
    u1 = jnp.min(jnp.where(col_any, xs, big))
    u2 = jnp.max(jnp.where(col_any, xs, -big))
    v1 = jnp.min(jnp.where(row_any, ys, big))
    v2 = jnp.max(jnp.where(row_any, ys, -big))
    half = 0.5 / s
    x1, y1, x2, y2 = box[0], box[1], box[2], box[3]
    bw, bh = x2 - x1, y2 - y1
    out = jnp.stack(
        [x1 + (u1 - half) * bw, y1 + (v1 - half) * bh, x1 + (u2 + half) * bw, y1 + (v2 + half) * bh]
    )
    return jnp.where(jnp.any(on), out, jnp.zeros(4))


def normalize_cp_method(method) -> str:
    """INPUT.CP_METHOD is a list in BSGAL YAMLs (``['basic']``,
    config.py:187; blend_image samples from it per paste,
    custom_cp_method.py:6). The device compositor specializes the blend at
    trace time, so only single-method lists are supported."""
    if isinstance(method, (list, tuple)):
        if len(method) != 1:
            raise NotImplementedError(
                f"CP_METHOD={method}: per-paste random blend sampling is not "
                "supported on the static compositor; pick one method"
            )
        return method[0]
    return method


def paste_instances_boxframe(
    image: Array,  # (H, W, 3)
    gt_masks: Array,  # (N, S, S) float box-frame crops
    boxes: Array,  # (N, 4)
    classes: Array,
    valid: Array,
    source: Array,
    patches: Array,  # (P, ps, ps, 4)
    patch_boxes: Array,  # (P, 4)
    patch_classes: Array,
    patch_valid: Array,
    patch_flip: Array | None = None,
    mode: str = "basic",
    bbox_occluded_thr: float = 10.0,
    mask_occluded_thr: float = 300.0,
    patch_angle: Array | None = None,
) -> Dict[str, Array]:
    """Copy-paste with **box-frame** instance masks — the memory-light form
    the trainer uses (masks are O((N+P)·S²), never (N,H,W)). Same sequential
    occlusion semantics as ``paste_instances``; dst masks/boxes are updated
    by cropping the paste-union into each gt box frame; areas are estimated
    as mean(mask)·box_area (exact up to the SxS raster)."""
    h, w = image.shape[:2]
    n, s = gt_masks.shape[0], gt_masks.shape[1]
    p = patches.shape[0]
    if patch_flip is None:
        patch_flip = jnp.zeros((p,), bool)

    if patch_angle is None:
        rgbs, alphas = jax.vmap(
            lambda pc, tb, fl: rasterize_patch(pc, tb, (h, w), fl)
        )(patches, patch_boxes, patch_flip)
    else:
        rgbs, alphas = jax.vmap(
            lambda pc, tb, fl, an: rasterize_patch(pc, tb, (h, w), fl, an)
        )(patches, patch_boxes, patch_flip, patch_angle)
    bins = (alphas > MASK_THRESHOLD) & patch_valid[:, None, None]

    def suffix_body(carry, b):
        return carry | b, carry

    _, occ_after_rev = jax.lax.scan(suffix_body, jnp.zeros((h, w), bool), bins[::-1])
    occ_after = occ_after_rev[::-1]
    union = jnp.any(bins, axis=0).astype(jnp.float32)

    # dst masks: subtract the union cropped into each box frame
    occ_crops = jax.vmap(lambda b: _crop_binary(union, b, s))(boxes)  # (N,S,S)
    new_gt_masks = jnp.where(occ_crops > 0.5, 0.0, gt_masks)
    # patch own masks in their own box frame
    own = jax.vmap(
        lambda bm, oa, b: _crop_binary(bm.astype(jnp.float32), b, s)
        * (1.0 - (_crop_binary(oa.astype(jnp.float32), b, s) > 0.5))
    )(bins, occ_after, patch_boxes)

    all_masks = jnp.concatenate([new_gt_masks, own], axis=0)
    all_boxes_in = jnp.concatenate([boxes, patch_boxes], axis=0)
    new_boxes = jax.vmap(_boxframe_subbox)(all_masks, all_boxes_in)
    # untouched dst instances keep their exact original box (avoids SxS
    # raster-quantization drift against the 10px occlusion threshold)
    touched = jnp.any(occ_crops > 0.5, axis=(1, 2))
    new_boxes = new_boxes.at[:n].set(
        jnp.where(touched[:, None], new_boxes[:n], boxes)
    )

    box_areas = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    areas = jnp.mean(new_gt_masks > 0.5, axis=(1, 2)) * box_areas
    bbox_ok = jnp.all(jnp.abs(new_boxes[:n] - boxes) <= bbox_occluded_thr, axis=-1)
    dst_valid = valid & (bbox_ok | (areas > mask_occluded_thr))
    patch_ok = patch_valid & jnp.any(own > 0.5, axis=(1, 2))

    def blend_body(img, inputs):
        rgb, alpha, bin_mask, pval = inputs
        if mode == "alpha":
            weight = jnp.where(pval, alpha, 0.0)
        elif mode == "gaussian":
            weight = _box_blur_5x5(bin_mask.astype(jnp.float32))
        else:
            weight = bin_mask.astype(jnp.float32)
        return img * (1.0 - weight[..., None]) + rgb * weight[..., None], None

    image_out, _ = jax.lax.scan(blend_body, image, (rgbs, alphas, bins, patch_valid))

    return {
        "image": image_out,
        "masks": all_masks,
        "boxes": new_boxes,
        "classes": jnp.concatenate([classes, patch_classes]),
        "valid": jnp.concatenate([dst_valid, patch_ok]),
        "instance_source": jnp.concatenate([source, jnp.ones((p,), source.dtype)]),
    }


def paste_instances_batch(mode: str = "basic", **thresholds):
    """vmapped-over-batch compositor; jit once, reuse every step."""

    def fn(batch_sample):
        return paste_instances(
            batch_sample["image"],
            batch_sample["masks"],
            batch_sample["boxes"],
            batch_sample["classes"],
            batch_sample["valid"],
            batch_sample["instance_source"],
            batch_sample["patches"],
            batch_sample["patch_boxes"],
            batch_sample["patch_classes"],
            batch_sample["patch_valid"],
            batch_sample.get("patch_flip"),
            mode=mode,
            **thresholds,
        )

    return jax.vmap(fn)
