"""Detic output-layer loss parity vs the reference torch implementation.

Targets ``DiverGen/divergen/modeling/roi_heads/detic_fast_rcnn.py:203-235``
(sigmoid CE + federated loss) and ``divergen/modeling/utils.py:16-29``
(get_fed_loss_inds) — the classification loss that sets AP on LVIS.

The fed-loss negative sampling is random; parity is asserted on the
deterministic regime (#appeared classes >= NUM_SAMPLE_CATS budget, where the
reference draws nothing) and on the mask-budget semantics elsewhere.
"""
import sys
import types
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
import ref_loader  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _install():
    ref_loader.install()


def _ref_sigmoid_ce(logits_np, gt_np, freq_w, use_fed, num_cat):
    import torch

    from divergen.modeling.roi_heads.detic_fast_rcnn import (
        DeticFastRCNNOutputLayers,
    )

    self_like = types.SimpleNamespace(
        use_fed_loss=use_fed,
        freq_weight=torch.tensor(freq_w) if freq_w is not None else None,
        ignore_zero_cats=False,
        fed_loss_num_cat=num_cat,
    )
    return float(
        DeticFastRCNNOutputLayers.sigmoid_cross_entropy_loss(
            self_like, torch.tensor(logits_np), torch.tensor(gt_np)
        )
    )


def test_sigmoid_ce_no_fed_parity():
    import jax.numpy as jnp

    from divergen_tpu.ops.losses import sigmoid_cross_entropy_with_fed_loss

    rng = np.random.RandomState(0)
    n, c = 64, 10
    logits = rng.randn(n, c + 1).astype(np.float32)
    gt = rng.randint(0, c + 1, n).astype(np.int64)  # c = background
    want = _ref_sigmoid_ce(logits, gt, None, False, 50)
    got = float(
        sigmoid_cross_entropy_with_fed_loss(
            jnp.asarray(logits[:, :c]), jnp.asarray(gt), jnp.ones((n,), bool), c
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_sigmoid_ce_fed_loss_deterministic_parity():
    """#unique(gt) >= budget → the reference samples nothing; the fed mask
    is exactly the appeared classes on both sides."""
    import jax
    import jax.numpy as jnp

    from divergen_tpu.ops.losses import (
        get_fed_loss_classes,
        sigmoid_cross_entropy_with_fed_loss,
    )

    rng = np.random.RandomState(1)
    n, c, budget = 64, 12, 6
    logits = rng.randn(n, c + 1).astype(np.float32)
    gt = rng.randint(0, c + 1, n).astype(np.int64)
    assert len(np.unique(gt)) >= budget
    freq_w = (rng.rand(c).astype(np.float32) + 0.1) ** 0.5
    want = _ref_sigmoid_ce(logits, gt, freq_w, True, budget)
    mask = get_fed_loss_classes(
        jax.random.PRNGKey(0), jnp.asarray(gt), jnp.ones((n,), bool), c,
        budget, jnp.asarray(freq_w),
    )
    got = float(
        sigmoid_cross_entropy_with_fed_loss(
            jnp.asarray(logits[:, :c]), jnp.asarray(gt), jnp.ones((n,), bool),
            c, fed_mask=mask,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_fed_mask_budget_semantics():
    """When sampling IS needed, the mask holds exactly
    min(budget, #appeared + #eligible-negatives) classes and every appeared
    class (get_fed_loss_inds: ``num_sample_cats - len(appeared)`` draws)."""
    import jax
    import jax.numpy as jnp

    from divergen_tpu.ops.losses import get_fed_loss_classes

    c, budget = 20, 10
    gt = np.array([0, 1, 2, 2, c], np.int64)  # 4 appeared incl background
    freq_w = np.ones(c, np.float32)
    mask = np.asarray(
        get_fed_loss_classes(
            jax.random.PRNGKey(3), jnp.asarray(gt), jnp.ones((5,), bool), c,
            budget, jnp.asarray(freq_w),
        )
    )
    assert mask[[0, 1, 2]].all() and mask[c] == 1.0
    assert int(mask.sum()) == budget  # 4 appeared + 6 sampled negatives
    # budget already covered -> no negatives at all
    gt2 = np.arange(12, dtype=np.int64)
    mask2 = np.asarray(
        get_fed_loss_classes(
            jax.random.PRNGKey(4), jnp.asarray(gt2), jnp.ones((12,), bool), c,
            10, jnp.asarray(freq_w),
        )
    )
    assert int(mask2.sum()) == 12 and mask2[:12].all()


def test_box2box_transform_parity():
    """Delta encode/decode vs detectron2 Box2BoxTransform (the math that
    positions every cascade-stage box; box_regression.py counterpart)."""
    import torch

    import jax.numpy as jnp

    from detectron2.modeling.box_regression import Box2BoxTransform
    from divergen_tpu.modeling.roi_heads import box_regression

    rng = np.random.RandomState(9)
    n = 64
    xy = rng.rand(n, 2) * 200
    wh = rng.rand(n, 2) * 80 + 4
    src = np.concatenate([xy, xy + wh], 1).astype(np.float32)
    xy2 = xy + rng.randn(n, 2) * 10
    wh2 = wh * np.exp(rng.randn(n, 2) * 0.3)
    dst = np.concatenate([xy2, xy2 + wh2], 1).astype(np.float32)
    weights = (10.0, 10.0, 5.0, 5.0)

    ref = Box2BoxTransform(weights=weights)
    want_deltas = ref.get_deltas(torch.tensor(src), torch.tensor(dst)).numpy()
    got_deltas = np.asarray(
        box_regression.get_deltas(jnp.asarray(src), jnp.asarray(dst), weights)
    )
    np.testing.assert_allclose(got_deltas, want_deltas, rtol=1e-5, atol=1e-5)

    # decode round-trip + decode of arbitrary (clamped) deltas
    big = (rng.randn(n, 4) * 2).astype(np.float32)
    want_boxes = ref.apply_deltas(torch.tensor(big), torch.tensor(src)).numpy()
    got_boxes = np.asarray(
        box_regression.apply_deltas(jnp.asarray(big), jnp.asarray(src), weights)
    )
    np.testing.assert_allclose(got_boxes, want_boxes, rtol=1e-4, atol=1e-4)


def test_matcher_parity():
    """Single-threshold proposal↔gt matching vs detectron2 Matcher (the
    label assignment behind every cascade stage; match_proposals,
    cascade_heads.py:308)."""
    import torch

    import jax.numpy as jnp

    from detectron2.modeling.matcher import Matcher
    from detectron2.structures import Boxes, pairwise_iou
    from divergen_tpu.modeling.roi_heads.cascade_heads import match_proposals

    rng = np.random.RandomState(10)
    n_gt, n_prop = 7, 64
    def boxes(n):
        xy = rng.rand(n, 2) * 200
        wh = rng.rand(n, 2) * 90 + 4
        return np.concatenate([xy, xy + wh], 1).astype(np.float32)

    gt, prop = boxes(n_gt), boxes(n_prop)
    for thr in (0.5, 0.6, 0.7):
        ref = Matcher([thr], [0, 1], allow_low_quality_matches=False)
        iou = pairwise_iou(Boxes(torch.tensor(gt)), Boxes(torch.tensor(prop)))
        want_idx, want_lbl = ref(iou)
        got_idx, got_fg = match_proposals(
            jnp.asarray(prop), jnp.asarray(gt), jnp.ones((n_gt,), bool), thr
        )[:2]
        np.testing.assert_array_equal(np.asarray(got_fg), want_lbl.numpy() == 1)
        # matched index only meaningful on foreground rows (ties broken
        # identically because both argmax over the same IoU matrix)
        fg = want_lbl.numpy() == 1
        np.testing.assert_array_equal(np.asarray(got_idx)[fg], want_idx.numpy()[fg])
