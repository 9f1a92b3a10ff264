"""Loss-math parity vs the reference torch implementations.

Targets the CenterNet loss stack (``centernet/modeling/layers/
heatmap_focal_loss.py:5-88``, ``iou_loss.py:5-66``) — the functions that set
proposal quality and hence downstream APr.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
import ref_loader  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _install():
    ref_loader.install()


def _rand_heatmap(rng, n_loc=257, n_cls=5, n_pos=9):
    logits = rng.randn(n_loc, n_cls).astype(np.float32) * 2
    targets = np.zeros((n_loc, n_cls), np.float32)
    pos_inds = rng.choice(n_loc, n_pos, replace=False)
    labels = rng.randint(0, n_cls, n_pos)
    # gaussian-ish targets with exact 1.0 at the positive (ind, label) cells
    targets = np.clip(rng.rand(n_loc, n_cls) * 0.6, 0, 1).astype(np.float32)
    targets[pos_inds, labels] = 1.0
    return logits, targets, pos_inds, labels


@pytest.mark.parametrize("alpha,ignore_high_fp", [(-1.0, -1.0), (0.25, 0.85)])
def test_binary_heatmap_focal_loss_parity(alpha, ignore_high_fp):
    import torch
    from centernet.modeling.layers.heatmap_focal_loss import (
        binary_heatmap_focal_loss,
    )

    import jax.numpy as jnp

    from divergen_tpu.ops.losses import heatmap_focal_loss as ours

    rng = np.random.RandomState(0)
    n_loc, n_pos = 311, 7
    logits = rng.randn(n_loc).astype(np.float32) * 2
    targets = np.clip(rng.rand(n_loc) * 0.7, 0, 1).astype(np.float32)
    pos_inds = rng.choice(n_loc, n_pos, replace=False)
    targets[pos_inds] = 1.0

    want_pos, want_neg = binary_heatmap_focal_loss(
        torch.from_numpy(logits.copy()), torch.from_numpy(targets),
        torch.from_numpy(pos_inds.astype(np.int64)),
        alpha=alpha, beta=4.0, gamma=2.0, ignore_high_fp=ignore_high_fp,
    )

    pos_count = np.zeros((n_loc,), np.int32)
    np.add.at(pos_count, pos_inds, 1)
    got_pos, got_neg = ours(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(pos_count),
        alpha=alpha, beta=4.0, gamma=2.0, ignore_high_fp=ignore_high_fp,
    )
    np.testing.assert_allclose(float(got_pos), float(want_pos), rtol=1e-5)
    np.testing.assert_allclose(float(got_neg), float(want_neg), rtol=1e-5)


def test_binary_heatmap_focal_loss_parity_with_multiplicity():
    """Two GT centers on one cell: reference indexes with multiplicity."""
    import torch
    from centernet.modeling.layers.heatmap_focal_loss import (
        binary_heatmap_focal_loss,
    )

    import jax.numpy as jnp

    from divergen_tpu.ops.losses import heatmap_focal_loss as ours

    rng = np.random.RandomState(3)
    n_loc = 64
    logits = rng.randn(n_loc).astype(np.float32)
    targets = np.clip(rng.rand(n_loc) * 0.5, 0, 1).astype(np.float32)
    pos_inds = np.array([4, 4, 17], np.int64)  # duplicated cell
    targets[pos_inds] = 1.0

    want_pos, want_neg = binary_heatmap_focal_loss(
        torch.from_numpy(logits.copy()), torch.from_numpy(targets),
        torch.from_numpy(pos_inds),
    )
    pos_count = np.zeros((n_loc,), np.int32)
    np.add.at(pos_count, pos_inds, 1)
    got_pos, got_neg = ours(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(pos_count),
        alpha=-1.0,
    )
    np.testing.assert_allclose(float(got_pos), float(want_pos), rtol=1e-5)
    np.testing.assert_allclose(float(got_neg), float(want_neg), rtol=1e-5)


def test_classwise_heatmap_focal_loss_parity():
    """Multi-class variant (heatmap_focal_loss.py:5-49): our binary kernel on
    a one-hot pos_count grid must reproduce the gather-by-label positives."""
    import torch
    from centernet.modeling.layers.heatmap_focal_loss import heatmap_focal_loss

    import jax.numpy as jnp

    from divergen_tpu.ops.losses import heatmap_focal_loss as ours

    rng = np.random.RandomState(1)
    logits, targets, pos_inds, labels = _rand_heatmap(rng)
    want_pos, want_neg = heatmap_focal_loss(
        torch.from_numpy(logits.copy()), torch.from_numpy(targets),
        torch.from_numpy(pos_inds.astype(np.int64)),
        torch.from_numpy(labels.astype(np.int64)),
        alpha=0.25, beta=4.0, gamma=2.0, reduction="sum",
    )
    pos_count = np.zeros(logits.shape, np.int32)
    np.add.at(pos_count, (pos_inds, labels), 1)
    got_pos, got_neg = ours(
        jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(pos_count),
        alpha=0.25,
    )
    np.testing.assert_allclose(float(got_pos), float(want_pos), rtol=1e-5)
    np.testing.assert_allclose(float(got_neg), float(want_neg), rtol=1e-5)


@pytest.mark.parametrize("loss_type", ["iou", "linear_iou", "giou"])
@pytest.mark.parametrize("weighted", [False, True])
def test_iou_loss_parity(loss_type, weighted):
    import torch
    from centernet.modeling.layers.iou_loss import IOULoss

    import jax.numpy as jnp

    from divergen_tpu.ops.losses import iou_loss as ours

    rng = np.random.RandomState(2)
    n = 37
    pred = (rng.rand(n, 4) * 30).astype(np.float32)
    target = (rng.rand(n, 4) * 30).astype(np.float32)
    weight = (rng.rand(n).astype(np.float32) + 0.1) if weighted else None

    ref = IOULoss(loss_type)
    want = ref(
        torch.from_numpy(pred), torch.from_numpy(target),
        None if weight is None else torch.from_numpy(weight),
        reduction="sum",
    ).item()
    got = float(ours(
        jnp.asarray(pred), jnp.asarray(target),
        None if weight is None else jnp.asarray(weight),
        loss_type=loss_type, reduction="sum",
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_giou_xyxy_and_smooth_l1_parity():
    """Cascade box-head regression losses vs fvcore semantics (the shim in
    ref_loader implements the published fvcore formulas)."""
    import torch

    import jax.numpy as jnp

    from fvcore.nn import giou_loss as ref_giou, smooth_l1_loss as ref_sl1

    from divergen_tpu.ops.losses import giou_loss_xyxy, smooth_l1_loss

    rng = np.random.RandomState(4)
    n = 23
    b1 = rng.rand(n, 4).astype(np.float32) * 20
    b1[:, 2:] += b1[:, :2] + 1
    b2 = rng.rand(n, 4).astype(np.float32) * 20
    b2[:, 2:] += b2[:, :2] + 1

    want = ref_giou(torch.from_numpy(b1), torch.from_numpy(b2)).numpy()
    got = np.asarray(giou_loss_xyxy(jnp.asarray(b1), jnp.asarray(b2)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    for beta in (0.0, 0.5):
        want = ref_sl1(torch.from_numpy(b1), torch.from_numpy(b2), beta).numpy()
        got = np.asarray(smooth_l1_loss(jnp.asarray(b1), jnp.asarray(b2), beta))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
