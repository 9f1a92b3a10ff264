"""CenterNet GT-assignment parity vs the reference torch implementation.

``centernet_ground_truth`` (our batched static-shape version) vs the
reference ``CenterNet._get_ground_truth`` / ``_get_label_inds``
(``centernet/modeling/dense_heads/centernet.py:338-484,533-562``): the
heatmap rendering, center-3x3 regression assignment and per-level positive
selection drive proposal quality — a mismatch here silently moves APr.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
import ref_loader  # noqa: E402

STRIDES = (8, 16)
SOI = ((0, 64), (48, 100000))
SHAPES = [(16, 16), (8, 8)]  # h, w per level (image 128x128)


@pytest.fixture(scope="module")
def ref_cn():
    ref_loader.install()
    import torch  # noqa: F401
    from centernet.modeling.dense_heads.centernet import CenterNet

    # in_channels divisible by 32: the reference head inserts GroupNorm(25)
    # for other widths (centernet_head.py:73-74), which rejects ch=8
    return CenterNet(
        in_channels=32,
        num_classes=4,
        in_features=("p3", "p4"),
        strides=STRIDES,
        sizes_of_interest=[list(s) for s in SOI],
        only_proposal=True,
        with_agn_hm=True,
        device="cpu",
    )


def _ref_targets(ref_cn, boxes_np, classes_np):
    import torch
    from detectron2.structures import Boxes, Instances

    features = [torch.zeros(1, 32, h, w) for h, w in SHAPES]
    grids = ref_cn.compute_grids(features)
    shapes_per_level = torch.tensor(SHAPES)
    inst = Instances((128, 128))
    inst.gt_boxes = Boxes(torch.tensor(boxes_np, dtype=torch.float32))
    inst.gt_classes = torch.tensor(classes_np, dtype=torch.int64)
    pos_inds, labels, reg_targets, hms = ref_cn._get_ground_truth(
        grids, shapes_per_level, [inst]
    )
    return (
        pos_inds.numpy(),
        labels.numpy(),
        reg_targets.numpy(),
        hms.numpy()[:, 0],
    )


def _our_targets(boxes_np, classes_np, n_pad=8):
    import jax.numpy as jnp

    from divergen_tpu.modeling.centernet.centernet import (
        CenterNetConfig,
        centernet_ground_truth,
        level_geometry,
    )

    cfg = CenterNetConfig(strides=STRIDES, sizes_of_interest=SOI)
    geom = level_geometry(cfg, SHAPES)
    n = len(boxes_np)
    boxes = np.zeros((1, n_pad, 4), np.float32)
    if n:
        boxes[0, :n] = boxes_np
    valid = np.zeros((1, n_pad), bool)
    valid[0, :n] = True
    reg, hm, pos_count = centernet_ground_truth(
        cfg, geom, jnp.asarray(boxes), jnp.asarray(valid)
    )
    return np.asarray(reg[0]), np.asarray(hm[0]), np.asarray(pos_count[0])


BOXES = [
    # (boxes, classes): mixed sizes — small (level 0), large (level 1),
    # overlapping pair sharing a region, box near the border
    ([[10.0, 12.0, 50.0, 40.0], [20.0, 20.0, 120.0, 120.0]], [1, 3]),
    ([[4.0, 4.0, 24.0, 24.0], [8.0, 8.0, 28.0, 28.0], [60.0, 70.0, 126.0, 126.0]],
     [0, 2, 2]),
    ([[100.0, 100.0, 126.0, 126.0]], [1]),
]


@pytest.mark.parametrize("boxes,classes", BOXES)
def test_centernet_gt_parity(ref_cn, boxes, classes):
    ref_pos, ref_labels, ref_reg, ref_hm = _ref_targets(ref_cn, boxes, classes)
    reg, hm, pos_count = _our_targets(boxes, classes)

    # agnostic heatmap: exact formula parity (exp(-min wd2), <1e-4 → 0)
    np.testing.assert_allclose(hm, ref_hm, atol=1e-5)

    # regression targets: same assignment mask, same stride-normalized ltrb
    assigned_ref = ref_reg.max(axis=1) > -1e5
    assigned_ours = reg.max(axis=1) > -1e5
    np.testing.assert_array_equal(assigned_ours, assigned_ref)
    np.testing.assert_allclose(
        reg[assigned_ours], ref_reg[assigned_ref], rtol=1e-5, atol=1e-5
    )

    # positives: multiset equality (ours counts multiplicity per cell)
    want = np.zeros(pos_count.shape[0], np.int64)
    np.add.at(want, ref_pos, 1)
    np.testing.assert_array_equal(pos_count, want)


def test_centernet_gt_empty_image(ref_cn):
    ref_pos, _, ref_reg, ref_hm = _ref_targets(
        ref_cn, [[0.0, 0.0, 0.0, 0.0]], [0]
    )
    # ours: all-invalid padded gt
    reg, hm, pos_count = _our_targets([], [])
    assert (reg.max(axis=1) <= -1e5).all()
    np.testing.assert_allclose(hm, 0.0, atol=1e-6)
    assert pos_count.sum() == 0


@pytest.fixture(scope="module")
def ref_cn_cls():
    ref_loader.install()
    from centernet.modeling.dense_heads.centernet import CenterNet

    return CenterNet(
        in_channels=32,
        num_classes=4,
        in_features=("p3", "p4"),
        strides=STRIDES,
        sizes_of_interest=[list(s) for s in SOI],
        only_proposal=False,
        with_agn_hm=True,
        device="cpu",
    )


@pytest.mark.parametrize("boxes,classes", BOXES)
def test_centernet_gt_classwise_parity(ref_cn_cls, boxes, classes):
    """Per-class heatmaps + per-(loc, class) positives of the standalone
    detector (reference _get_ground_truth with C-channel hms + labels)."""
    import torch
    import jax.numpy as jnp
    from detectron2.structures import Boxes, Instances

    from divergen_tpu.modeling.centernet.centernet import (
        CenterNetConfig,
        centernet_ground_truth_classwise,
        level_geometry,
    )

    features = [torch.zeros(1, 32, h, w) for h, w in SHAPES]
    grids = ref_cn_cls.compute_grids(features)
    shapes_per_level = torch.tensor(SHAPES)
    inst = Instances((128, 128))
    inst.gt_boxes = Boxes(torch.tensor(boxes, dtype=torch.float32))
    inst.gt_classes = torch.tensor(classes, dtype=torch.int64)
    ref_pos, ref_labels, ref_reg, ref_hms = ref_cn_cls._get_ground_truth(
        grids, shapes_per_level, [inst]
    )

    cfg = CenterNetConfig(strides=STRIDES, sizes_of_interest=SOI,
                          only_proposal=False, num_classes=4)
    geom = level_geometry(cfg, SHAPES)
    n_pad = 8
    b = np.zeros((1, n_pad, 4), np.float32)
    c = np.zeros((1, n_pad), np.int32)
    b[0, :len(boxes)] = boxes
    c[0, :len(classes)] = classes
    valid = np.zeros((1, n_pad), bool)
    valid[0, :len(boxes)] = True
    reg, hm_agn, hm_cls, pos_cls = centernet_ground_truth_classwise(
        cfg, geom, jnp.asarray(b), jnp.asarray(c), jnp.asarray(valid)
    )
    np.testing.assert_allclose(
        np.asarray(hm_cls[0]), ref_hms.numpy(), atol=1e-5, err_msg="classwise hms"
    )
    # positives: reference gives flat (loc) indices + labels; ours a count grid
    want = np.zeros(np.asarray(pos_cls[0]).shape, np.int32)
    np.add.at(want, (ref_pos.numpy(), ref_labels.numpy()), 1)
    np.testing.assert_array_equal(np.asarray(pos_cls[0]), want)
    # reg targets identical to the agnostic path
    finite = ref_reg.numpy() > -1e7
    np.testing.assert_allclose(
        np.asarray(reg[0])[finite[:, 0] if finite.ndim > 1 else finite],
        ref_reg.numpy()[finite[:, 0] if finite.ndim > 1 else finite],
        atol=1e-4,
    )
