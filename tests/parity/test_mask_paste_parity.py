"""Mask pasting parity vs detectron2's real ``paste_masks_in_image``
(``detectron2/layers/mask_ops.py``): the op that turns 28² ROI logits into
full-frame masks — mask AP measures ITS output, so a semantic mismatch here
shifts AP silently."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
import ref_loader  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _install():
    ref_loader.install()


def _cases(rng, n=8, h=64, w=80):
    masks = rng.rand(n, 28, 28).astype(np.float32)
    # fractional boxes of mixed sizes, some clipped at the border
    x1 = rng.rand(n) * (w - 10)
    y1 = rng.rand(n) * (h - 10)
    bw = rng.rand(n) * 40 + 3
    bh = rng.rand(n) * 40 + 3
    boxes = np.stack([x1, y1, np.minimum(x1 + bw, w - 0.01),
                      np.minimum(y1 + bh, h - 0.01)], 1).astype(np.float32)
    return masks, boxes


def _ref(masks, boxes, h, w):
    import torch

    from detectron2.layers.mask_ops import paste_masks_in_image
    from detectron2.structures import Boxes

    return paste_masks_in_image(
        torch.tensor(masks), Boxes(torch.tensor(boxes)), (h, w), threshold=0.5
    ).numpy().astype(bool)


def test_device_paste_masks_parity():
    import jax.numpy as jnp

    from divergen_tpu.ops.mask_paste import paste_masks

    rng = np.random.RandomState(0)
    h, w = 64, 80
    masks, boxes = _cases(rng, h=h, w=w)
    want = _ref(masks, boxes, h, w)
    got = np.asarray(
        paste_masks(jnp.asarray(masks), jnp.asarray(boxes), (h, w))
    ).astype(bool)
    # bilinear ties at exactly 0.5 may flip a border pixel either way;
    # demand >= 99.7% pixel agreement and IoU >= 0.99 per instance
    agree = (got == want).mean()
    assert agree >= 0.997, agree
    for i in range(len(masks)):
        inter = (got[i] & want[i]).sum()
        union = (got[i] | want[i]).sum()
        if union:
            assert inter / union >= 0.99, (i, inter / union)


def test_host_paste_mask_np_parity():
    from divergen_tpu.evaluation.lvis_evaluator import paste_mask_np

    rng = np.random.RandomState(1)
    h, w = 64, 80
    masks, boxes = _cases(rng, h=h, w=w)
    want = _ref(masks, boxes, h, w)
    for i in range(len(masks)):
        got = paste_mask_np(masks[i], boxes[i], h, w)
        inter = (got & want[i]).sum()
        union = (got | want[i]).sum()
        if union:
            assert inter / union >= 0.99, (i, inter / union)
