"""Rotated-box ops + deformable conv vs numpy/shapely-free references.

Mirrors the reference's kernel test pattern (detectron2
``tests/layers/test_roi_align_rotated.py`` / ``test_nms_rotated.py`` /
``test_deformable.py``: CUDA vs CPU vs straightforward reference impls).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from divergen_tpu.ops.rotated import (
    nms_rotated,
    pairwise_iou_rotated,
    roi_align_rotated,
)
from divergen_tpu.ops.deform_conv import deform_conv2d


# ---------------- rotated IoU ----------------
def np_rect_area_inter(b1, b2, res=512):
    """Monte-Carlo-free rasterized intersection reference."""
    def inside(px, py, b):
        # Inverse of the detectron2 rotated-box frame (box_iou_rotated_utils.h:
        # world = c + [[cos, sin], [-sin, cos]] @ local), y-down CCW angles.
        cx, cy, w, h, a = b
        th = a * math.pi / 180.0
        dx, dy = px - cx, py - cy
        lx = dx * math.cos(th) - dy * math.sin(th)
        ly = dx * math.sin(th) + dy * math.cos(th)
        return (abs(lx) <= w / 2) & (abs(ly) <= h / 2)

    xs = np.linspace(-20, 20, res)
    ys = np.linspace(-20, 20, res)
    gx, gy = np.meshgrid(xs, ys)
    m1 = inside(gx, gy, b1)
    m2 = inside(gx, gy, b2)
    # rasterized IoU directly — discretization bias cancels between
    # intersection and union
    union = (m1 | m2).sum()
    return (m1 & m2).sum() / max(union, 1)


@pytest.mark.parametrize(
    "b1,b2",
    [
        ([0, 0, 4, 4, 0], [0, 0, 4, 4, 0]),       # identical
        ([0, 0, 4, 4, 0], [2, 0, 4, 4, 0]),       # half overlap
        ([0, 0, 4, 4, 0], [0, 0, 4, 4, 45]),      # rotated 45°
        ([0, 0, 6, 2, 30], [1, 1, 3, 5, -20]),    # generic
        ([0, 0, 4, 4, 0], [10, 10, 4, 4, 0]),     # disjoint
        ([0, 0, 8, 8, 15], [0, 0, 2, 2, 60]),     # containment
    ],
)
def test_pairwise_iou_rotated_vs_raster(b1, b2):
    iou = float(pairwise_iou_rotated(jnp.asarray([b1], jnp.float32),
                                     jnp.asarray([b2], jnp.float32))[0, 0])
    ref = np_rect_area_inter(b1, b2)
    assert abs(iou - ref) < 0.02, (iou, ref)


def test_iou_rotated_matches_axis_aligned():
    """Angle-0 boxes must agree with the standard IoU."""
    from divergen_tpu.structures.boxes import pairwise_iou

    rng = np.random.RandomState(0)
    n, m = 6, 5
    xy = rng.rand(n, 2) * 10
    wh = rng.rand(n, 2) * 8 + 1
    xy2 = rng.rand(m, 2) * 10
    wh2 = rng.rand(m, 2) * 8 + 1
    rot1 = jnp.asarray(np.concatenate([xy + wh / 2, wh, np.zeros((n, 1))], 1), jnp.float32)
    rot2 = jnp.asarray(np.concatenate([xy2 + wh2 / 2, wh2, np.zeros((m, 1))], 1), jnp.float32)
    xyxy1 = jnp.asarray(np.concatenate([xy, xy + wh], 1), jnp.float32)
    xyxy2 = jnp.asarray(np.concatenate([xy2, xy2 + wh2], 1), jnp.float32)
    got = np.asarray(pairwise_iou_rotated(rot1, rot2))
    ref = np.asarray(pairwise_iou(xyxy1, xyxy2))
    np.testing.assert_allclose(got, ref, atol=1e-4)


# ---------------- rotated NMS ----------------
def test_nms_rotated_greedy():
    boxes = jnp.asarray(
        [
            [0, 0, 4, 4, 0],
            [0.5, 0.5, 4, 4, 10],   # overlaps #0, lower score → suppressed
            [10, 10, 4, 4, 45],     # disjoint → kept
            [10.2, 10.2, 4, 4, 40], # overlaps #2, lower score → suppressed
        ],
        jnp.float32,
    )
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.6])
    keep = np.asarray(nms_rotated(boxes, scores, 0.3))
    assert keep.tolist() == [True, False, True, False]


def test_nms_rotated_chain():
    """A suppressed box must not suppress others (greedy semantics)."""
    boxes = jnp.asarray(
        [[0, 0, 4, 4, 0], [1.5, 0, 4, 4, 0], [3.0, 0, 4, 4, 0]], jnp.float32
    )
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep = np.asarray(nms_rotated(boxes, scores, 0.3))
    # box1 suppressed by box0; box2 overlaps box1 (suppressed) but not box0
    # enough → kept
    assert keep.tolist() == [True, False, True]


# ---------------- ROIAlignRotated ----------------
def test_roi_align_rotated_angle0_matches_roi_align():
    from divergen_tpu.ops.roi_align import roi_align

    rng = np.random.RandomState(1)
    fmap = jnp.asarray(rng.rand(16, 16, 3), jnp.float32)
    # xyxy box and its (cx, cy, w, h, 0) twin
    box = np.array([2.0, 3.0, 10.0, 9.0])
    rot = np.array([[(2 + 10) / 2, (3 + 9) / 2, 8.0, 6.0, 0.0]])
    got = np.asarray(roi_align_rotated(fmap, jnp.asarray(rot, jnp.float32), 4))
    ref = np.asarray(roi_align(fmap, jnp.asarray([box], jnp.float32), 4, 1.0))
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_roi_align_rotated_nonzero_angle_reference_coords():
    """Hand-computed check of the sampling frame at a nonzero angle.

    With a linear ramp fmap f(y, x) = x, bilinear sampling is exact and each
    output bin equals the x-coordinate of its bin center mapped through the
    detectron2 frame (ROIAlignRotated_cpu.cpp:62-63):
        x = (cx - 0.5) + gx*cos(th) + gy*sin(th)
    The (previously shipped) flipped convention gives gx*cos - gy*sin and
    fails this test for any angle not a multiple of 180.
    """
    h = w = 32
    fmap = jnp.broadcast_to(jnp.arange(w, dtype=jnp.float32)[None, :, None], (h, w, 1))
    cx, cy, bw, bh, ang = 16.0, 16.0, 8.0, 4.0, 30.0
    res = 2
    out = np.asarray(
        roi_align_rotated(fmap, jnp.asarray([[cx, cy, bw, bh, ang]], jnp.float32), res)
    )[0, :, :, 0]
    th = math.radians(ang)
    for i in range(res):
        for j in range(res):
            gy = (i + 0.5) * (bh / res) - bh / 2
            gx = (j + 0.5) * (bw / res) - bw / 2
            expect = (cx - 0.5) + gx * math.cos(th) + gy * math.sin(th)
            np.testing.assert_allclose(out[i, j], expect, atol=1e-4)


def test_roi_align_rotated_90deg_rotates_content():
    rng = np.random.RandomState(2)
    fmap = jnp.asarray(rng.rand(20, 20, 1), jnp.float32)
    base = np.array([[10.0, 10.0, 8.0, 4.0, 0.0]])
    rot90 = np.array([[10.0, 10.0, 8.0, 4.0, 90.0]])
    out0 = np.asarray(roi_align_rotated(fmap, jnp.asarray(base, jnp.float32), 4))
    out90 = np.asarray(roi_align_rotated(fmap, jnp.asarray(rot90, jnp.float32), 4))
    assert out0.shape == out90.shape == (1, 4, 4, 1)
    assert not np.allclose(out0, out90)
    assert np.isfinite(out90).all()


# ---------------- deformable conv ----------------
def test_deform_conv_zero_offset_equals_conv():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 8, 8, 4), jnp.float32)
    w = jnp.asarray(rng.rand(3, 3, 4, 6).astype(np.float32) * 0.1)
    off = jnp.zeros((2, 8, 8, 18), jnp.float32)
    got = np.asarray(deform_conv2d(x, off, w, stride=1, padding=1))
    ref = np.asarray(
        jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_deform_conv_integer_offset_shifts():
    """Offset (0, +1) on every tap equals convolving a shifted image."""
    rng = np.random.RandomState(4)
    x = np.zeros((1, 8, 8, 2), np.float32)
    x[:, :, :7] = rng.rand(1, 8, 7, 2)
    w = jnp.asarray(rng.rand(3, 3, 2, 3).astype(np.float32) * 0.1)
    off = np.zeros((1, 8, 8, 18), np.float32)
    off[..., 1::2] = 1.0  # dx = +1 everywhere
    got = np.asarray(deform_conv2d(jnp.asarray(x), jnp.asarray(off), w, padding=1))
    x_shift = np.roll(x, -1, axis=2)
    x_shift[:, :, -1] = 0
    ref = np.asarray(deform_conv2d(jnp.asarray(x_shift),
                                   jnp.zeros((1, 8, 8, 18), jnp.float32), w, padding=1))
    # interior columns match exactly (border handling differs at the roll seam)
    np.testing.assert_allclose(got[:, 1:-1, 1:-2], ref[:, 1:-1, 1:-2], rtol=1e-4, atol=1e-5)


def test_deform_conv_v2_mask():
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(1, 6, 6, 2), jnp.float32)
    w = jnp.asarray(rng.rand(3, 3, 2, 2).astype(np.float32) * 0.1)
    off = jnp.zeros((1, 6, 6, 18), jnp.float32)
    m_half = jnp.full((1, 6, 6, 9), 0.5, jnp.float32)
    full = np.asarray(deform_conv2d(x, off, w, padding=1))
    half = np.asarray(deform_conv2d(x, off, w, mask=m_half, padding=1))
    np.testing.assert_allclose(half, full * 0.5, rtol=1e-4, atol=1e-6)


def test_rotated_boxes_structure():
    from divergen_tpu.structures import rotated_boxes as rb

    b = jnp.asarray([[5, 5, 4, 2, 190.0], [100, 5, 4, 2, 0.0]], jnp.float32)
    nb = rb.normalize_angles(b)
    assert -180 <= float(nb[0, 4]) < 180
    clipped = rb.clip(nb, (10, 10))
    assert float(clipped[1, 2]) < 4.0  # out-of-frame angle-0 box shrinks
    assert rb.nonempty(b).tolist() == [True, True]
    r = rb.xyxy_to_rotated(jnp.asarray([[0.0, 0, 4, 2]]))
    np.testing.assert_allclose(np.asarray(r[0]), [2, 1, 4, 2, 0], atol=1e-6)


def test_dla_up_with_dcn_nodes():
    from divergen_tpu.modeling.backbone.dla import DLAUp

    rng = np.random.RandomState(6)
    feats = {
        "dla2": jnp.asarray(rng.rand(1, 16, 16, 8), jnp.float32),
        "dla3": jnp.asarray(rng.rand(1, 8, 8, 16), jnp.float32),
        "dla4": jnp.asarray(rng.rand(1, 4, 4, 32), jnp.float32),
    }
    m = DLAUp(out_channels=32, node_type="dcn", norm="GN")
    params = m.init(jax.random.PRNGKey(0), feats)
    out = m.apply(params, feats)
    assert out["dlaup"].shape == (1, 16, 16, 32)
    assert np.isfinite(np.asarray(out["dlaup"])).all()
    # zero-init offsets: DCN node must start equal to its plain-conv twin
    m2 = DLAUp(out_channels=32, node_type="conv", norm="GN")
    p2 = m2.init(jax.random.PRNGKey(0), feats)
    out2 = m2.apply(p2, feats)
    assert out2["dlaup"].shape == (1, 16, 16, 32)
