"""Filtration stage: drive the whole chain (features → similarity → filter
→ clip_score → clean_pool) plus lvis_crop, on tiny data with a small CLIP."""
import csv
import json
import os

import numpy as np
import pytest

from divergen_tpu.pipeline.filteration import cli as fcli
from divergen_tpu.pipeline.filteration.core import (
    ClipEncoder,
    dict_to_csv,
    filename_pivot,
    threshold_filter,
)


@pytest.fixture(autouse=True)
def small_clip(monkeypatch):
    """Swap ViT-L/14 for a tiny tower in CLI tests."""
    from divergen_tpu.modeling.text import clip as clip_mod

    monkeypatch.setitem(
        clip_mod.CLIP_CONFIGS, "ViT-L/14", (16, (32, 2, 2, 16), (32, 2, 2))
    )
    yield


def _make_images(root, cats, n, rng, size=48):
    import cv2

    for c in cats:
        os.makedirs(root / c, exist_ok=True)
        for i in range(n):
            cv2.imwrite(str(root / c / f"{c}_{i:07d}.png"),
                        rng.randint(0, 255, (size, size, 3), np.uint8))


def _make_masks(root, cats, n, size=48):
    import cv2

    for c in cats:
        os.makedirs(root / c, exist_ok=True)
        for i in range(n):
            m = np.zeros((size, size), np.uint8)
            m[8:40, 8:40] = 255
            cv2.imwrite(str(root / c / f"{c}_{i:07d}.png"), m)


def test_threshold_filter_unit():
    fd = {"a.png": {"l1": 0.9, "l2": 0.7}, "b.png": {"l1": 0.1, "l2": 0.2}}
    kept = threshold_filter(fd, 0.5)
    assert set(kept) == {"a.png"}
    assert kept["a.png"] == pytest.approx(0.8)


def test_full_filtration_chain(tmp_path):
    rng = np.random.RandomState(0)
    gen = tmp_path / "gen"
    lvis = tmp_path / "lvis_crops"
    masks = tmp_path / "masks"
    cats = ["17", "42"]
    _make_images(gen, cats, 3, rng)
    _make_images(lvis, cats, 2, rng)
    _make_masks(masks, cats, 3)

    # 1. features for both sides
    assert fcli.extract_features([
        "--in_dir", str(gen), "--out_dir", str(tmp_path / "gen_feat"),
        "--mask_dir", str(masks), "--batch", "4",
    ]) == 0
    assert fcli.extract_features([
        "--in_dir", str(lvis), "--out_dir", str(tmp_path / "lvis_feat"), "--batch", "4",
    ]) == 0
    assert len(os.listdir(tmp_path / "gen_feat" / "17")) == 3

    # 2. similarity
    assert fcli.compute_similarity([
        "--lvis_feature_dir", str(tmp_path / "lvis_feat"),
        "--gen_feature_dir", str(tmp_path / "gen_feat"),
        "--out_dir", str(tmp_path / "sim"),
    ]) == 0
    total = json.load(open(tmp_path / "sim" / "17" / "total.json"))
    assert len(total) == 2 and len(next(iter(total.values()))) == 3
    assert os.path.exists(tmp_path / "sim" / "17" / "total.csv")

    # 3. threshold filter (threshold -1 keeps everything)
    assert fcli.filter_by_similarity([
        "--sim_dir", str(tmp_path / "sim"),
        "--out_path", str(tmp_path / "filtered" / "filename.csv"),
        "--threshold", "-1.0",
    ]) == 0
    kept = json.load(open(tmp_path / "filtered" / "filename_thres_-1.0.json"))
    assert set(kept) == {"17", "42"} and len(kept["17"]) == 3

    # 4. clip score
    assert fcli.clip_score([
        "--in_dir", str(gen), "--mask_dir", str(masks),
        "--out_dir", str(tmp_path / "scores"), "--batch", "4",
    ]) == 0
    res = json.load(open(tmp_path / "scores" / "results.json"))
    assert len(res) == 6
    k0 = next(iter(res))
    assert "clip_score" in res[k0] and 0.0 < res[k0]["mask_area"] < 1.0

    # 5. clean pool
    assert fcli.clean_pool([
        "--image_dir", str(gen),
        "--mask_dirs", str(masks),
        "--score_jsons", str(tmp_path / "scores" / "results.json"),
        "--out_dir", str(tmp_path / "pool_rgba"),
        "--out_json", str(tmp_path / "pool.json"),
        "--clip_threshold", "-10", "--area_min", "0", "--area_max", "1",
    ]) == 0
    pool = json.load(open(tmp_path / "pool.json"))
    assert sum(len(v) for v in pool.values()) == 6
    import cv2

    rgba = cv2.imread(pool["17"][0], cv2.IMREAD_UNCHANGED)
    assert rgba.shape == (32, 32, 4)  # cropped to the 8:40 mask bbox


def test_lvis_crop(tmp_path):
    import cv2

    rng = np.random.RandomState(1)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    cv2.imwrite(str(img_dir / "0001.jpg"), rng.randint(0, 255, (64, 80, 3), np.uint8))
    data = {
        "images": [{"id": 1, "file_name": "0001.jpg", "width": 80, "height": 64}],
        "annotations": [
            {"id": 5, "image_id": 1, "category_id": 3, "bbox": [10, 10, 30, 20],
             "area": 600, "segmentation": [[10, 10, 40, 10, 40, 30, 10, 30]]}
        ],
        "categories": [{"id": 3, "name": "thing", "frequency": "r"}],
    }
    jf = tmp_path / "lvis.json"
    jf.write_text(json.dumps(data))
    assert fcli.lvis_crop([
        "--lvis_json", str(jf), "--image_root", str(img_dir),
        "--out_dir", str(tmp_path / "crops"), "--crop_mode", "padding",
        "--padding_width", "5", "--background", "blur",
    ]) == 0
    crop = __import__("cv2").imread(str(tmp_path / "crops" / "3" / "5.png"))
    assert crop.shape == (30, 40, 3)  # 20+2*5, 30+2*5
