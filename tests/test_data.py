"""Data-layer tests: mask codec, LVIS registration, samplers, InstPool.
Pattern: detectron2 tests/data/ (test_coco.py, test_sampler.py,
test_detection_utils.py)."""
import json
import os

import numpy as np
import pytest

from divergen_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from divergen_tpu.data.datasets.lvis import (
    frequency_groups,
    load_lvis_json,
    register_lvis_instances,
)
from divergen_tpu.data.inst_pool import InstPool, largest_component
from divergen_tpu.data.samplers import (
    InferenceSampler,
    MultiDatasetSampler,
    RepeatFactorTrainingSampler,
    TrainingSampler,
    repeat_factors_from_category_frequency,
)
from divergen_tpu.utils.mask_codec import (
    polygons_to_bitmask,
    rle_area,
    rle_decode,
    rle_encode,
)


# ---------------- mask codec ----------------
def test_rle_roundtrip(rng):
    m = rng.rand(37, 53) > 0.5
    rle = rle_encode(m)
    assert isinstance(rle["counts"], bytes)
    out = rle_decode(rle)
    np.testing.assert_array_equal(out, m)
    assert rle_area(rle) == m.sum()


def test_rle_empty_and_full():
    for m in (np.zeros((5, 7), bool), np.ones((5, 7), bool)):
        np.testing.assert_array_equal(rle_decode(rle_encode(m)), m)


def test_polygon_rasterize():
    mask = polygons_to_bitmask([[2, 2, 10, 2, 10, 8, 2, 8]], 12, 14)
    assert mask[5, 5]
    assert not mask[0, 0]
    assert 48 <= mask.sum() <= 64  # 8x6 rect ± boundary convention


# ---------------- LVIS json ----------------
@pytest.fixture
def lvis_json(tmp_path):
    data = {
        "images": [
            {
                "id": 1,
                "coco_url": "http://images.cocodataset.org/train2017/0001.jpg",
                "width": 64,
                "height": 48,
                "neg_category_ids": [2],
                "not_exhaustive_category_ids": [],
            },
            {"id": 2, "file_name": "0002.jpg", "width": 32, "height": 32},
        ],
        "annotations": [
            {
                "id": 10,
                "image_id": 1,
                "category_id": 1,
                "bbox": [2, 2, 10, 10],
                "area": 100,
                "segmentation": [[2, 2, 12, 2, 12, 12, 2, 12]],
            },
            {
                "id": 11,
                "image_id": 2,
                "category_id": 3,
                "bbox": [0, 0, 5, 5],
                "area": 25,
                "segmentation": [[0, 0, 5, 0, 5, 5, 0, 5]],
            },
        ],
        "categories": [
            {"id": 1, "name": "cat_a", "frequency": "r", "image_count": 1},
            {"id": 2, "name": "cat_b", "frequency": "c", "image_count": 5},
            {"id": 3, "name": "cat_c", "frequency": "f", "image_count": 99},
        ],
    }
    p = tmp_path / "lvis.json"
    p.write_text(json.dumps(data))
    return str(p)


def test_load_lvis_json(lvis_json, tmp_path):
    recs = load_lvis_json(lvis_json, str(tmp_path))
    assert len(recs) == 2
    assert recs[0]["file_name"].endswith("train2017/0001.jpg")
    assert recs[0]["neg_category_ids"] == [1]  # 0-based
    assert recs[0]["annotations"][0]["category_id"] == 0
    assert recs[1]["annotations"][0]["category_id"] == 2
    recs_id = load_lvis_json(lvis_json, str(tmp_path), keep_ann_ids=True)
    assert recs_id[0]["annotations"][0]["ann_id"] == 10


def test_register_and_catalog(lvis_json, tmp_path):
    name = "lvis_test_tmp"
    DatasetCatalog.remove(name)
    register_lvis_instances(name, {"thing_classes": ["a", "b", "c"]}, lvis_json, str(tmp_path))
    recs = DatasetCatalog.get(name)
    assert len(recs) == 2
    assert MetadataCatalog.get(name).evaluator_type == "lvis"
    DatasetCatalog.remove(name)


def test_frequency_groups():
    info = [
        {"id": 1, "frequency": "r"},
        {"id": 2, "frequency": "c"},
        {"id": 3, "frequency": "f"},
        {"id": 4, "frequency": "r"},
    ]
    g = frequency_groups(info)
    assert g["r"] == {0, 3} and g["c"] == {1} and g["f"] == {2}


# ---------------- samplers ----------------
def test_training_sampler_shards_cover_all():
    seen = set()
    for rank in range(4):
        it = iter(TrainingSampler(16, seed=7, rank=rank, world_size=4))
        seen.update(next(it) for _ in range(4))
    assert seen == set(range(16))


def test_repeat_factor_sampler_oversamples_rare():
    recs = [{"annotations": [{"category_id": 0}]} for _ in range(99)]
    recs += [{"annotations": [{"category_id": 1}]}]  # rare
    rfs = repeat_factors_from_category_frequency(recs, repeat_thresh=0.5)
    assert rfs[-1] > rfs[0] == 1.0
    it = iter(RepeatFactorTrainingSampler(rfs, seed=0))
    draws = [next(it) for _ in range(5000)]
    frac_rare = np.mean(np.array(draws) == 99)
    assert frac_rare > 0.02  # ≫ 1/100 without RFS... boosted ~7x

def test_multi_dataset_sampler_ratio():
    s = MultiDatasetSampler([100, 100], [3.0, 1.0], seed=0)
    it = iter(s)
    draws = np.array([next(it) for _ in range(8000)])
    frac_d0 = np.mean(draws < 100)
    assert 0.70 < frac_d0 < 0.80


def test_inference_sampler_partitions():
    parts = [list(InferenceSampler(10, rank=r, world_size=3)) for r in range(3)]
    flat = [i for p in parts for i in p]
    assert sorted(flat) == list(range(10))


# ---------------- InstPool ----------------
@pytest.fixture
def pool_dir(tmp_path):
    import cv2

    os.makedirs(tmp_path / "pool", exist_ok=True)
    entries = {}
    rng = np.random.RandomState(0)
    for cat in [0, 1]:
        files = []
        for i in range(3):
            rgba = np.zeros((40, 30, 4), np.uint8)
            rgba[..., :3] = rng.randint(0, 255, (40, 30, 3))
            rgba[8:32, 5:25, 3] = 255  # solid blob
            name = f"pool/{cat}_{i}.png"
            cv2.imwrite(str(tmp_path / name), cv2.cvtColor(rgba, cv2.COLOR_RGBA2BGRA))
            files.append(name)
        entries[str(cat)] = files
    (tmp_path / "pool.json").write_text(json.dumps(entries))
    cat_info = [
        {"id": 1, "frequency": "r", "image_count": 1},
        {"id": 2, "frequency": "f", "image_count": 50},
    ]
    (tmp_path / "cat_info.json").write_text(json.dumps(cat_info))
    priors = {"1": [0.2, 0.02], "2": [0.3, 0.05]}
    (tmp_path / "priors.json").write_text(json.dumps(priors))
    return tmp_path


def test_largest_component():
    m = np.zeros((20, 20), np.uint8)
    m[2:6, 2:6] = 1  # 16 px
    m[10:19, 10:19] = 1  # 81 px
    out = largest_component(m)
    assert out[12, 12] and not out[3, 3]


def test_inst_pool_load_and_sample(pool_dir):
    pool = InstPool(
        str(pool_dir / "pool.json"),
        image_root=str(pool_dir),
        train_size=(256, 256),
        max_samples=5,
        patch_size=64,
        cat_freq_path=str(pool_dir / "cat_info.json"),
        mean_std2_path=str(pool_dir / "priors.json"),
    )
    assert len(pool.dataset) == 6
    rgba = pool.load_rgba(0)
    assert rgba is not None
    assert rgba.shape == (24, 20, 4)  # cropped to the blob bbox
    rng = np.random.default_rng(0)
    sample = pool.make_paste_sample(rng, max_pastes=4)
    assert sample["patches"].shape == (4, 64, 64, 4)
    nv = sample["patch_valid"].sum()
    assert 0 <= nv <= 4
    if nv:
        k = np.where(sample["patch_valid"])[0][0]
        assert sample["patches"][k, ..., 3].max() <= 1.0
        x1, y1, x2, y2 = sample["patch_boxes"][k]
        assert x2 > x1 and y2 > y1


def test_inst_pool_freq_filter(pool_dir):
    pool = InstPool(
        str(pool_dir / "pool.json"),
        image_root=str(pool_dir),
        apply_freq=("r",),
        cat_freq_path=str(pool_dir / "cat_info.json"),
    )
    assert pool.cats == [0]
    assert len(pool.dataset) == 3


def test_inst_pool_cats_random(pool_dir):
    pool = InstPool(str(pool_dir / "pool.json"), image_root=str(pool_dir))
    rng = np.random.default_rng(1)
    ids = pool.sample_ids(rng, 10, "cats_random", cids=[1])
    assert all(pool.data_to_cat[i] == 1 for i in ids)
