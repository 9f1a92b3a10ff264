"""On-device copy-paste compositor vs a numpy reference implementing the
exact semantics of custom_build_copypaste_mapper.py:510-566 (_copy_paste),
custom_cp_method.py:5-22 (blend_image) and get_bboxes/get_updated_masks."""
import cv2
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from divergen_tpu.ops.copy_paste import (
    MASK_THRESHOLD,
    boxes_from_masks,
    paste_instances,
    rasterize_patch,
)


def np_get_bboxes(masks):
    num = len(masks)
    boxes = np.zeros((num, 4), np.float32)
    x_any = masks.any(axis=1)
    y_any = masks.any(axis=2)
    for i in range(num):
        x = np.where(x_any[i])[0]
        y = np.where(y_any[i])[0]
        if len(x) and len(y):
            boxes[i] = [x[0], y[0], x[-1] + 1, y[-1] + 1]
    return boxes


def np_copy_paste(image, masks, boxes, valid, layers, mode, bbox_thr=10, mask_thr=300):
    """Reference-sequential paste. layers: list of (rgb(H,W,3), alpha(H,W))."""
    img = image.copy()
    cur_masks = [m.copy() for m in masks]
    paste_masks = []
    for rgb, alpha in layers:
        bin_mask = alpha > MASK_THRESHOLD
        if mode == "alpha":
            w = alpha
        elif mode == "gaussian":
            w = cv2.blur(bin_mask.astype(np.float32), (5, 5), borderType=cv2.BORDER_CONSTANT)
        else:
            w = bin_mask.astype(np.float32)
        img = img * (1 - w[..., None]) + rgb * w[..., None]
        cur_masks = [np.where(bin_mask, False, m) for m in cur_masks]
        paste_masks = [np.where(bin_mask, False, m) for m in paste_masks]
        paste_masks.append(bin_mask)
    all_masks = np.stack(cur_masks + paste_masks)
    new_boxes = np_get_bboxes(all_masks)
    keep = []
    for i in range(len(masks)):
        bbox_ok = np.all(np.abs(new_boxes[i] - boxes[i]) <= bbox_thr)
        mask_ok = all_masks[i].sum() > mask_thr
        keep.append(valid[i] & (bbox_ok | mask_ok))
    return img, all_masks, new_boxes, np.array(keep)


def make_patch(rng, ph=32, pw=32, full=False):
    rgb = rng.rand(ph, pw, 3).astype(np.float32) * 255
    alpha = np.zeros((ph, pw), np.float32)
    if full:
        alpha[:] = 1.0
    else:
        alpha[4:-4, 6:-6] = 1.0
    return np.concatenate([rgb, alpha[..., None]], -1)


def test_boxes_from_masks_matches_numpy():
    rng = np.random.RandomState(0)
    masks = rng.rand(5, 40, 60) > 0.8
    masks[3] = False  # empty
    ours = np.asarray(boxes_from_masks(jnp.array(masks)))
    ref = np_get_bboxes(masks)
    np.testing.assert_allclose(ours, ref)


def test_rasterize_patch_identity():
    # pasting a patch at its native size reproduces the patch exactly
    rng = np.random.RandomState(1)
    patch = make_patch(rng, 16, 16, full=True)
    rgb, alpha = rasterize_patch(jnp.array(patch), jnp.array([8.0, 4.0, 24.0, 20.0]), (32, 32))
    np.testing.assert_allclose(np.asarray(rgb[4:20, 8:24]), patch[..., :3], atol=1e-3)
    assert np.all(np.asarray(alpha[4:20, 8:24]) == 1.0)
    assert np.asarray(alpha).sum() == 16 * 16


def test_rasterize_patch_flip():
    rng = np.random.RandomState(2)
    patch = make_patch(rng, 16, 16, full=True)
    rgb_f, _ = rasterize_patch(
        jnp.array(patch), jnp.array([8.0, 4.0, 24.0, 20.0]), (32, 32), flip=jnp.array(True)
    )
    np.testing.assert_allclose(
        np.asarray(rgb_f[4:20, 8:24]), patch[:, ::-1, :3], atol=1e-3
    )


@pytest.mark.parametrize("mode", ["basic", "alpha", "gaussian"])
def test_paste_matches_numpy_reference(mode):
    rng = np.random.RandomState(3)
    H = W = 64
    image = rng.rand(H, W, 3).astype(np.float32) * 255
    masks = np.zeros((3, H, W), bool)
    masks[0, 5:25, 5:25] = True
    masks[1, 30:60, 30:60] = True
    masks[2, 0:10, 50:64] = True
    boxes = np_get_bboxes(masks)
    valid = np.array([True, True, True])
    classes = np.array([1, 2, 3], np.int32)
    source = np.zeros(3, np.int32)

    patches = np.stack([make_patch(rng), make_patch(rng)])
    patch_boxes = np.array([[4.0, 4.0, 36.0, 36.0], [20.0, 20.0, 52.0, 52.0]], np.float32)

    out = paste_instances(
        jnp.array(image),
        jnp.array(masks),
        jnp.array(boxes),
        jnp.array(classes),
        jnp.array(valid),
        jnp.array(source),
        jnp.array(patches),
        jnp.array(patch_boxes),
        jnp.array([7, 8], np.int32),
        jnp.array([True, True]),
        mode=mode,
    )

    # numpy reference: rasterize with the SAME warp (tested above), then
    # compose with reference-sequential semantics
    layers = []
    for pch, tb in zip(patches, patch_boxes):
        rgb, a = rasterize_patch(jnp.array(pch), jnp.array(tb), (H, W))
        layers.append((np.asarray(rgb), np.asarray(a)))
    ref_img, ref_masks, ref_boxes, ref_keep = np_copy_paste(
        image, masks, boxes, valid, layers, mode
    )

    atol = 0.6 if mode == "gaussian" else 1e-2  # border handling of cv2.blur
    np.testing.assert_allclose(np.asarray(out["image"]), ref_img, atol=atol)
    np.testing.assert_array_equal(np.asarray(out["masks"]), ref_masks)
    np.testing.assert_allclose(np.asarray(out["boxes"]), ref_boxes)
    np.testing.assert_array_equal(np.asarray(out["valid"][:3]), ref_keep)
    assert np.asarray(out["valid"])[3:].all()
    np.testing.assert_array_equal(np.asarray(out["instance_source"]), [0, 0, 0, 1, 1])
    np.testing.assert_array_equal(np.asarray(out["classes"]), [1, 2, 3, 7, 8])


def test_paste_occludes_dst_instance():
    # a big paste fully covering a dst instance must invalidate it
    H = W = 64
    image = np.zeros((H, W, 3), np.float32)
    masks = np.zeros((1, H, W), bool)
    masks[0, 10:20, 10:20] = True
    boxes = np_get_bboxes(masks)
    patch = make_patch(np.random.RandomState(0), full=True)
    out = paste_instances(
        jnp.array(image),
        jnp.array(masks),
        jnp.array(boxes),
        jnp.array([0], np.int32),
        jnp.array([True]),
        jnp.array([0], np.int32),
        jnp.array(patch[None]),
        jnp.array([[0.0, 0.0, 40.0, 40.0]]),
        jnp.array([5], np.int32),
        jnp.array([True]),
    )
    assert not bool(out["valid"][0])
    assert bool(out["valid"][1])


def test_invalid_patch_is_noop():
    rng = np.random.RandomState(4)
    H = W = 32
    image = rng.rand(H, W, 3).astype(np.float32) * 255
    masks = np.zeros((1, H, W), bool)
    masks[0, 2:30, 2:30] = True
    boxes = np_get_bboxes(masks)
    patch = make_patch(rng, full=True)
    out = paste_instances(
        jnp.array(image),
        jnp.array(masks),
        jnp.array(boxes),
        jnp.array([0], np.int32),
        jnp.array([True]),
        jnp.array([0], np.int32),
        jnp.array(patch[None]),
        jnp.array([[0.0, 0.0, 31.0, 31.0]]),
        jnp.array([5], np.int32),
        jnp.array([False]),  # invalid → no paste
    )
    np.testing.assert_allclose(np.asarray(out["image"]), image, atol=1e-4)
    assert bool(out["valid"][0])
    assert not bool(out["valid"][1])
    np.testing.assert_array_equal(np.asarray(out["masks"][0]), masks[0])


def test_rasterize_patch_rotation_90deg():
    rng = np.random.RandomState(7)
    patch = make_patch(rng, 16, 16, full=True)
    rgb, alpha = rasterize_patch(
        jnp.array(patch), jnp.array([8.0, 8.0, 24.0, 24.0]), (32, 32),
        angle=jnp.float32(np.pi / 2),
    )
    # 90° rotation: output(y,x) samples patch at rotated coords; the square
    # alpha support is invariant, rgb is the transposed/flipped patch
    assert np.asarray(alpha[10:22, 10:22]).min() > 0.99
    got = np.asarray(rgb[8:24, 8:24])
    # inverse-warp by +90°: out(y, x) = patch(x, ph-1-y)
    exp = np.flip(patch[..., :3].transpose(1, 0, 2), axis=1)
    np.testing.assert_allclose(got[1:-1, 1:-1], exp[1:-1, 1:-1], atol=1.0)
