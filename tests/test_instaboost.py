"""Functional InstaBoost port (data/instaboost.py) — the reference gates on
the external instaboostfast package (custom_build_copypaste_mapper.py:596-666);
ours re-implements the configured transform subset."""
import numpy as np
import pytest

from divergen_tpu.data.instaboost import InstaBoost, InstaBoostConfig, get_new_data


def _scene(side=96):
    img = np.full((side, side, 3), 40, np.uint8)
    img[20:52, 24:56] = (200, 60, 60)  # instance pixels
    ann = {
        "bbox": [24.0, 20.0, 32.0, 32.0],
        "segmentation": [[24, 20, 56, 20, 56, 52, 24, 52]],
        "category_id": 3,
        "area": 32 * 32,
    }
    return img, ann


def test_get_new_data_jitters_within_bounds():
    img, ann = _scene()
    cfg = InstaBoostConfig(action_prob=(1, 0, 0), scale=(0.9, 1.1), dx=8, dy=8,
                           theta=(-2, 2), color_prob=0.0)
    rng = np.random.default_rng(0)
    new_anns, new_img = get_new_data([ann], img, cfg, rng)
    assert len(new_anns) == 1
    nb = new_anns[0]["bbox"]
    assert nb[2] > 0 and nb[3] > 0
    # center moved at most dx/dy + scale growth
    assert abs((nb[0] + nb[2] / 2) - 40) <= 8 + 4
    assert abs((nb[1] + nb[3] / 2) - 36) <= 8 + 4
    assert new_anns[0]["segmentation"], "polygons must survive"
    # the instance pixels actually moved on the canvas
    assert not np.array_equal(new_img, img)
    # red pixels still present somewhere (pasted, not lost)
    red = (new_img[..., 0] > 150) & (new_img[..., 1] < 120)
    assert red.sum() > 0.5 * 32 * 32


def test_skip_action_is_identity_on_annotations():
    img, ann = _scene()
    cfg = InstaBoostConfig(action_candidate=("skip",), action_prob=(1,),
                           color_prob=0.0)
    new_anns, new_img = get_new_data([ann], img, cfg, np.random.default_rng(1))
    np.testing.assert_allclose(new_anns[0]["bbox"], ann["bbox"])
    # original pixels restored over the inpainted background
    assert np.array_equal(new_img[20:52, 24:56], img[20:52, 24:56])


def test_wrapper_freq_filter_and_ratio(tmp_path):
    img, ann = _scene()
    import cv2

    path = str(tmp_path / "x.png")
    cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    record = {"file_name": path, "annotations": [ann], "height": 96, "width": 96}

    # frequency bucket not in apply_freq → untouched
    ib = InstaBoost(cid_to_freq={3: "f"}, apply_freq=("r", "c"), aug_ratio=1.0)
    out = ib(record, np.random.default_rng(0))
    assert "image_new" not in out

    ib2 = InstaBoost(cid_to_freq={3: "r"}, apply_freq=("r", "c"), aug_ratio=1.0)
    out2 = ib2(record, np.random.default_rng(0))
    assert "image_new" in out2 and len(out2["annotations"]) == 1


def test_mapper_gate_builds_and_runs(tmp_path):
    """cfg.INPUT.USE_INSTABOOST now builds the port instead of raising
    (round-2 partial closed); the mapped sample still has valid gt."""
    import cv2

    from divergen_tpu.config import get_cfg
    from divergen_tpu.data.copy_paste_mapper import CopyPasteMapper
    from divergen_tpu.data.dataset_mapper import DatasetMapper

    img, ann = _scene(128)
    path = str(tmp_path / "y.png")
    cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    record = {"file_name": path, "annotations": [ann], "height": 128, "width": 128}

    cfg = get_cfg()
    cfg.INPUT.TRAIN_SIZE = 128
    cfg.INPUT.USE_INSTABOOST = True
    cfg.INPUT.INSTABOOST_APPLY_TYPE = "both"
    cfg.INPUT.INST_POOL = False
    cfg.INPUT.COPY_METHOD = "self_copy"
    mapper = CopyPasteMapper(DatasetMapper(cfg, is_train=True), cfg)
    assert mapper.instaboost is not None and mapper.instaboost_dst
    mapper.set_dataset([record])
    sample = mapper(record, np.random.default_rng(2))
    assert sample["image"].shape[2] == 3
    assert sample["gt"]["valid"].any()


def test_heatmap_mode_places_on_matching_background():
    """hflag=True (InstaBoost ICCV'19 appearance-consistency heatmap): on an
    image whose left half matches the instance's surroundings and whose right
    half is a very different color, sampled placements stay in the left half."""
    side = 128
    img = np.full((side, side, 3), 40, np.uint8)
    img[:, side // 2:] = (250, 250, 250)  # hostile background on the right
    img[40:72, 24:56] = (200, 60, 60)  # instance on the left
    ann = {
        "bbox": [24.0, 40.0, 32.0, 32.0],
        "segmentation": [[24, 40, 56, 40, 56, 72, 24, 72]],
        "category_id": 3,
        "area": 32 * 32,
    }
    cfg = InstaBoostConfig(action_prob=(1, 0, 0), scale=(1.0, 1.0), dx=15,
                           dy=15, theta=(0, 0), color_prob=0.0, hflag=True)
    rng = np.random.default_rng(3)
    for _ in range(5):
        new_anns, _ = get_new_data([ann], img, cfg, rng)
        assert len(new_anns) == 1
        nb = new_anns[0]["bbox"]
        cx = nb[0] + nb[2] / 2
        # heatmap mass concentrates where background matches (left half);
        # the box never lands fully inside the hostile right half
        assert cx < side // 2 + 8, f"center {cx} drifted onto mismatched bg"


def test_heatmap_translation_deterministic_and_in_bounds():
    from divergen_tpu.data.instaboost import _heatmap_translation, _poly_mask

    side = 96
    img = np.full((side, side, 3), 90, np.uint8)
    img[10:40, 10:40] = (10, 200, 10)
    ann = {
        "bbox": [10.0, 10.0, 30.0, 30.0],
        "segmentation": [[10, 10, 40, 10, 40, 40, 10, 40]],
    }
    mask = _poly_mask([ann], side, side)
    t1 = _heatmap_translation(img, mask, ann["bbox"], np.random.default_rng(7))
    t2 = _heatmap_translation(img, mask, ann["bbox"], np.random.default_rng(7))
    assert t1 == t2, "seeded rng must be deterministic"
    cx, cy = 25 + t1[0], 25 + t1[1]
    assert 10 <= cx <= side - 10 and 10 <= cy <= side - 10
