"""DatasetMapper / CopyPasteMapper / TrainLoader / box-frame paste tests."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from divergen_tpu.config import get_cfg
from divergen_tpu.data.dataset_mapper import DatasetMapper
from divergen_tpu.data.copy_paste_mapper import CopyPasteMapper
from divergen_tpu.data.inst_pool import InstPool
from divergen_tpu.data.loader import TrainLoader, _stack_samples, device_prefetch
from divergen_tpu.data.samplers import TrainingSampler
from divergen_tpu.ops.copy_paste import paste_instances, paste_instances_boxframe


def small_cfg(tmp_path=None):
    cfg = get_cfg()
    cfg.INPUT.TRAIN_SIZE = 128
    cfg.DATALOADER.MAX_INSTANCES = 8
    cfg.DATALOADER.MAX_PASTES = 3
    cfg.DATALOADER.PATCH_SIZE = 32
    cfg.INPUT.PASTE_MAX_INST = 4
    cfg.INPUT.RANDOM_SCALE = True
    cfg.INPUT.RANDOM_SCALE_MIN = 0.5
    cfg.INPUT.RANDOM_SCALE_MAX = 1.0
    cfg.MODEL.ROI_BOX_HEAD.CAT_FREQ_PATH = ""
    cfg.INPUT.AREA_PRIOR_PATH = ""
    return cfg


@pytest.fixture
def image_dataset(tmp_path):
    import cv2

    records = []
    rng = np.random.RandomState(0)
    for i in range(3):
        img = rng.randint(0, 255, (100, 140, 3), np.uint8)
        path = str(tmp_path / f"img{i}.jpg")
        cv2.imwrite(path, img)
        records.append(
            {
                "file_name": path,
                "image_id": i,
                "height": 100,
                "width": 140,
                "annotations": [
                    {
                        "bbox": [10, 10, 60, 50],  # XYWH
                        "category_id": i % 3,
                        "segmentation": [[10, 10, 70, 10, 70, 60, 10, 60]],
                    },
                    {
                        "bbox": [80, 30, 30, 40],
                        "category_id": 1,
                        "segmentation": [[80, 30, 110, 30, 110, 70, 80, 70]],
                    },
                ],
            }
        )
    return records


def test_dataset_mapper_shapes(image_dataset):
    cfg = small_cfg()
    m = DatasetMapper(cfg, is_train=True)
    s = m(image_dataset[0], np.random.default_rng(0))
    assert s["image"].shape == (128, 128, 3)
    assert s["gt"]["boxes"].shape == (8, 4)
    assert s["gt"]["masks"].shape == (8, 28, 28)
    nv = s["gt"]["valid"].sum()
    assert 1 <= nv <= 2
    for i in range(nv):
        b = s["gt"]["boxes"][i]
        assert b[2] > b[0] and b[3] > b[1]
        assert s["gt"]["masks"][i].max() > 0.5


def test_dataset_mapper_deterministic(image_dataset):
    cfg = small_cfg()
    m = DatasetMapper(cfg, is_train=True)
    a = m(image_dataset[0], np.random.default_rng(7))
    b = m(image_dataset[0], np.random.default_rng(7))
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["gt"]["boxes"], b["gt"]["boxes"])


@pytest.fixture
def pool_json(tmp_path):
    import cv2

    entries = {"0": [], "1": []}
    rng = np.random.RandomState(1)
    for cat in entries:
        for i in range(2):
            rgba = np.zeros((40, 40, 4), np.uint8)
            rgba[..., :3] = rng.randint(0, 255, (40, 40, 3))
            rgba[5:35, 5:35, 3] = 255
            name = f"p{cat}_{i}.png"
            cv2.imwrite(str(tmp_path / name), cv2.cvtColor(rgba, cv2.COLOR_RGBA2BGRA))
            entries[cat].append(name)
    p = tmp_path / "pool.json"
    p.write_text(json.dumps(entries))
    return str(p)


def test_copy_paste_mapper_syn(image_dataset, pool_json, tmp_path):
    cfg = small_cfg()
    cfg.INPUT.COPY_METHOD = "syn_copy"
    pool = InstPool(pool_json, image_root=str(tmp_path), train_size=(128, 128),
                    max_samples=4, patch_size=32, random_scale=True,
                    random_scale_min=0.5, random_scale_max=1.0)
    m = CopyPasteMapper(DatasetMapper(cfg, True), cfg, inst_pool=pool)
    s = m(image_dataset[0], np.random.default_rng(3))
    assert s["patches"].shape == (3, 32, 32, 4)
    assert s["patch_valid"].dtype == bool


def test_copy_paste_mapper_self(image_dataset, pool_json, tmp_path):
    cfg = small_cfg()
    cfg.INPUT.COPY_METHOD = "self_copy"
    cfg.INPUT.INST_POOL = False
    m = CopyPasteMapper(DatasetMapper(cfg, True), cfg)
    m.set_dataset(image_dataset)
    s = m(image_dataset[0], np.random.default_rng(4))
    assert s["patch_valid"].sum() >= 1
    k = np.where(s["patch_valid"])[0][0]
    assert s["patches"][k, ..., 3].max() > 0.5  # real alpha from gt mask


def test_train_loader_batches(image_dataset):
    cfg = small_cfg()
    mapper = DatasetMapper(cfg, True)
    loader = TrainLoader(
        image_dataset, mapper, TrainingSampler(len(image_dataset), seed=0),
        batch_size=2, num_workers=2,
    )
    it = iter(loader)
    b1 = next(it)
    b2 = next(it)
    loader.stop()
    assert b1["image"].shape == (2, 128, 128, 3)
    assert b1["gt"]["boxes"].shape == (2, 8, 4)
    assert not np.array_equal(b1["image"], b2["image"])


def test_boxframe_paste_matches_fullres():
    rng = np.random.RandomState(5)
    H = W = 96
    S = 32
    image = rng.rand(H, W, 3).astype(np.float32) * 255
    # one dst instance as a box-aligned rectangle (exact in both reps)
    boxes = np.array([[16.0, 16.0, 48.0, 48.0]], np.float32)
    full_masks = np.zeros((1, H, W), bool)
    full_masks[0, 16:48, 16:48] = True
    bf_masks = np.ones((1, S, S), np.float32)
    classes = np.array([2], np.int32)
    valid = np.array([True])
    source = np.zeros(1, np.int32)
    patch = np.zeros((24, 24, 4), np.float32)
    patch[..., :3] = rng.rand(24, 24, 3) * 255
    patch[..., 3] = 1.0
    patches = patch[None]
    pboxes = np.array([[40.0, 40.0, 72.0, 72.0]], np.float32)  # overlaps dst corner
    pcls = np.array([5], np.int32)
    pval = np.array([True])

    full = paste_instances(
        jnp.array(image), jnp.array(full_masks), jnp.array(boxes), jnp.array(classes),
        jnp.array(valid), jnp.array(source), jnp.array(patches), jnp.array(pboxes),
        jnp.array(pcls), jnp.array(pval),
    )
    bf = paste_instances_boxframe(
        jnp.array(image), jnp.array(bf_masks), jnp.array(boxes), jnp.array(classes),
        jnp.array(valid), jnp.array(source), jnp.array(patches), jnp.array(pboxes),
        jnp.array(pcls), jnp.array(pval),
    )
    # identical composite image
    np.testing.assert_allclose(np.asarray(bf["image"]), np.asarray(full["image"]), atol=1e-3)
    # same validity decisions
    np.testing.assert_array_equal(np.asarray(bf["valid"]), np.asarray(full["valid"]))
    # dst box shrinks consistently (within one SxS cell ≈ 1px here)
    np.testing.assert_allclose(np.asarray(bf["boxes"][0]), np.asarray(full["boxes"][0]), atol=1.5)
    # patch box matches the full-res mask-derived box within a cell
    np.testing.assert_allclose(np.asarray(bf["boxes"][1]), np.asarray(full["boxes"][1]), atol=1.5)


def test_device_prefetch_passthrough():
    batches = [{"x": np.ones((2, 2)) * i, "tfms": [None]} for i in range(3)]
    out = list(device_prefetch(iter(batches), size=2))
    assert len(out) == 3
    assert float(out[2]["x"][0, 0]) == 2.0


def test_color_jitter_applies_inside_masks(image_dataset):
    cfg = small_cfg()
    cfg.INPUT.USE_COLOR_JITTER = True
    cfg.INPUT.INST_POOL = False
    cfg.INPUT.COPY_METHOD = "syn_copy"  # no pool → no pastes; just jitter
    m = CopyPasteMapper(DatasetMapper(cfg, True), cfg)
    base = DatasetMapper(cfg, True)(image_dataset[0], np.random.default_rng(11))
    out = m(image_dataset[0], np.random.default_rng(11))
    # at least sometimes changes pixels, and only meaningfully near instances
    assert out["image"].shape == base["image"].shape


def test_custom_dataset_mapper_ann_types(image_dataset):
    from divergen_tpu.data.custom_dataset_mapper import CustomDatasetMapper

    cfg = small_cfg()
    cfg.DATALOADER.DATASET_ANN = ["box", "image"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 5
    m = CustomDatasetMapper(cfg, True)
    # box dataset: instances kept
    s0 = m(dict(image_dataset[0], dataset_source=0), np.random.default_rng(0))
    assert s0["ann_type"] == "box" and s0["gt"]["valid"].sum() >= 1
    # image dataset: labels only
    s1 = m(dict(image_dataset[1], dataset_source=1), np.random.default_rng(0))
    assert s1["ann_type"] == "image"
    assert s1["gt"]["valid"].sum() == 0
    assert s1["image_labels"].sum() >= 1


def test_custom_dataset_mapper_tar(tmp_path, image_dataset):
    import cv2
    import io
    import tarfile

    from divergen_tpu.data.custom_dataset_mapper import CustomDatasetMapper
    from divergen_tpu.data.tar_dataset import DiskTarDataset

    tar_path = str(tmp_path / "cls.tar")
    with tarfile.open(tar_path, "w") as tf:
        img = (np.random.RandomState(0).rand(50, 60, 3) * 255).astype(np.uint8)
        ok, buf = cv2.imencode(".jpg", img)
        info = tarfile.TarInfo("x.jpg")
        info.size = len(buf)
        tf.addfile(info, io.BytesIO(buf.tobytes()))
    cfg = small_cfg()
    cfg.DATALOADER.DATASET_ANN = ["box", "image"]
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 5
    m = CustomDatasetMapper(cfg, True, tar_dataset=DiskTarDataset([tar_path]))
    rec = {"tar_index": 0, "image_id": 77, "dataset_source": 1, "pos_category_ids": [2]}
    s = m(rec, np.random.default_rng(1))
    assert s["image"].shape == (128, 128, 3)
    assert s["image_labels"][2] == 1.0
    assert s["gt"]["valid"].sum() == 0


def test_inp_rotate(image_dataset):
    from divergen_tpu.data.inp_rotate import inp_rotate_sample

    cfg = small_cfg()
    m = DatasetMapper(cfg, True)
    s = m(image_dataset[0], np.random.default_rng(2))
    n_valid = int(s["gt"]["valid"].sum())
    out = inp_rotate_sample(s, np.random.default_rng(3), patch_size=32, max_pastes=4)
    # originals invalidated, same count of rotated patch copies
    assert int(out["gt"]["valid"].sum()) == 0
    assert int(out["patch_valid"].sum()) == n_valid
    assert np.abs(out["patch_angle"][out["patch_valid"]]).max() <= np.deg2rad(30) + 1e-6
    # inpainted background differs from the original inside instance boxes
    assert not np.array_equal(out["image"], s["image"])


def test_inp_rotate_via_mapper(image_dataset):
    """USE_INP_ROTATE wired into CopyPasteMapper (reference applies
    _inp_rotate instead of SCP w.p. INP_ROTATE_PROB,
    custom_copypaste.py:250-252)."""
    from divergen_tpu.data.copy_paste_mapper import CopyPasteMapper

    cfg = small_cfg()
    cfg.INPUT.USE_COPY_PASTE = True
    cfg.INPUT.INST_POOL = False
    cfg.INPUT.COPY_METHOD = "self_copy"
    cfg.INPUT.USE_INP_ROTATE = True
    cfg.INPUT.INP_ROTATE_PROB = 1.0  # always take the rotate branch
    m = CopyPasteMapper(DatasetMapper(cfg, True), cfg)
    m.set_dataset(image_dataset)
    s = m(image_dataset[0], np.random.default_rng(5))
    # rotate branch: originals invalidated, patch copies carry supervision
    assert int(s["patch_valid"].sum()) > 0
    assert int(s["gt"]["valid"].sum()) == 0
    assert "patch_angle" in s and "patch_filenames" in s
    # off → normal SCP path still emits the uniform schema
    cfg2 = small_cfg()
    cfg2.INPUT.USE_COPY_PASTE = True
    cfg2.INPUT.INST_POOL = False
    cfg2.INPUT.COPY_METHOD = "self_copy"
    m2 = CopyPasteMapper(DatasetMapper(cfg2, True), cfg2)
    m2.set_dataset(image_dataset)
    s2 = m2(image_dataset[0], np.random.default_rng(5))
    assert "patch_angle" in s2
