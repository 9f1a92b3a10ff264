"""EfficientDetResizeCrop geometry parity vs the reference augmentation
(``DiverGen/divergen/data/transforms/custom_augmentation_impl.py:25-73``):
identical random draws must give identical scale/crop/offset geometry, and
the coordinate/box transforms must match the reference transform math."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
import ref_loader  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _install():
    ref_loader.install()


class _FixedRng:
    """numpy-Generator-shaped stub yielding a fixed uniform sequence."""

    def __init__(self, vals):
        self.vals = list(vals)

    def uniform(self, lo=0.0, hi=1.0):
        v = self.vals.pop(0)
        return lo + (hi - lo) * v


@pytest.mark.parametrize("hw,draws", [
    ((480, 640), (0.37, 0.81, 0.22)),
    ((1024, 768), (0.92, 0.05, 0.66)),
    ((333, 500), (0.50, 0.99, 0.01)),
])
def test_resize_crop_geometry_parity(hw, draws, monkeypatch):
    from divergen.data.transforms.custom_augmentation_impl import (
        EfficientDetResizeCrop as RefAug,
    )
    from divergen_tpu.data.transforms import EfficientDetResizeCrop

    seq = list(draws)
    monkeypatch.setattr(
        "divergen.data.transforms.custom_augmentation_impl.np.random.uniform",
        lambda lo, hi=None: (lo + (hi - lo) * seq.pop(0)) if hi is not None
        else seq.pop(0),
    )
    h, w = hw
    img = np.zeros((h, w, 3), np.uint8)
    ref_t = RefAug(896, (0.1, 2.0)).get_transform(img)
    our_t = EfficientDetResizeCrop(896, (0.1, 2.0)).get_transform(
        img, _FixedRng(draws)
    )
    assert (ref_t.scaled_h, ref_t.scaled_w) == (our_t.scaled_h, our_t.scaled_w)
    assert (ref_t.offset_y, ref_t.offset_x) == (our_t.offset_y, our_t.offset_x)
    assert ref_t.img_scale == pytest.approx(our_t.img_scale)
    assert tuple(ref_t.target_size) == tuple(our_t.target_size)

    # coordinate transform parity on random points
    rng = np.random.RandomState(0)
    pts = rng.rand(13, 2).astype(np.float32) * [w, h]
    np.testing.assert_allclose(
        our_t.apply_coords(pts.copy()), ref_t.apply_coords(pts.copy()),
        rtol=1e-5, atol=1e-5,
    )


def test_inverse_apply_box_parity():
    """Eval-time box back-projection vs the reference transform
    (custom_transform.py:96-114 inverse_apply_box)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_ct",
        "/root/reference/DiverGen/divergen/data/transforms/custom_transform.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from divergen_tpu.data.transforms import ResizeCropTransform

    rng = np.random.RandomState(3)
    ref_t = mod.EfficientDetResizeCropTransform(
        300, 400, 17, 23, 0.625, (896, 896), None
    )
    our_t = ResizeCropTransform(300, 400, 17, 23, 0.625, (896, 896))
    boxes = (rng.rand(10, 4) * 400).astype(np.float32)
    boxes[:, 2:] += boxes[:, :2]
    np.testing.assert_allclose(
        our_t.inverse_apply_box(boxes.copy()),
        ref_t.inverse_apply_box(boxes.copy()),
        rtol=1e-5, atol=1e-4,
    )
