"""Full-loop smoke: synthetic LVIS dataset on disk → do_train (with
on-device copy-paste) → do_test (LVIS evaluator). The 'fake backend'
integration pattern of SURVEY.md §4, extended to the whole trainer."""
import json
import os

import numpy as np
import pytest

from divergen_tpu.config import get_cfg
from divergen_tpu.data.catalog import DatasetCatalog, MetadataCatalog
from divergen_tpu.data.datasets.lvis import register_lvis_instances


@pytest.fixture
def tiny_lvis(tmp_path):
    import cv2

    rng = np.random.RandomState(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    images, annotations = [], []
    aid = 1
    for i in range(1, 5):
        img = rng.randint(0, 255, (96, 120, 3), np.uint8)
        cv2.imwrite(str(img_dir / f"{i:04d}.jpg"), img)
        images.append(
            {
                "id": i,
                "file_name": f"{i:04d}.jpg",
                "width": 120,
                "height": 96,
                "neg_category_ids": [],
                "not_exhaustive_category_ids": [],
            }
        )
        for k in range(2):
            x, y = int(rng.randint(0, 60)), int(rng.randint(0, 40))
            w, h = int(rng.randint(20, 50)), int(rng.randint(20, 40))
            annotations.append(
                {
                    "id": aid,
                    "image_id": i,
                    "category_id": (k % 3) + 1,
                    "bbox": [x, y, w, h],
                    "area": w * h,
                    "segmentation": [[x, y, x + w, y, x + w, y + h, x, y + h]],
                }
            )
            aid += 1
    cats = [
        {"id": c, "name": f"cat{c}", "frequency": f, "image_count": n}
        for c, f, n in [(1, "r", 1), (2, "c", 4), (3, "f", 30)]
    ]
    data = {"images": images, "annotations": annotations, "categories": cats}
    jf = tmp_path / "train.json"
    jf.write_text(json.dumps(data))

    # tiny instance pool
    pool = {}
    for c in range(3):
        files = []
        for i in range(2):
            rgba = np.zeros((30, 30, 4), np.uint8)
            rgba[..., :3] = rng.randint(0, 255, (30, 30, 3))
            rgba[4:26, 4:26, 3] = 255
            name = f"pool_{c}_{i}.png"
            cv2.imwrite(str(tmp_path / name), cv2.cvtColor(rgba, cv2.COLOR_RGBA2BGRA))
            files.append(name)
        pool[str(c)] = files
    pf = tmp_path / "pool.json"
    pf.write_text(json.dumps(pool))

    for n in ("tiny_lvis_train", "tiny_lvis_val"):
        DatasetCatalog.remove(n)
        MetadataCatalog.remove(n)
    register_lvis_instances("tiny_lvis_train", {}, str(jf), str(img_dir))
    register_lvis_instances("tiny_lvis_val", {}, str(jf), str(img_dir))
    return tmp_path, str(jf), str(img_dir), str(pf)


def tiny_cfg(tmp_path, pool_path):
    cfg = get_cfg()
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.DATASETS.TRAIN = ("tiny_lvis_train",)
    cfg.DATASETS.TEST = ("tiny_lvis_val",)
    cfg.MODEL.CENTERNET.NUM_CLASSES = 3
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.CENTERNET.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.CENTERNET.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.CENTERNET.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.CENTERNET.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.TEST.DETECTIONS_PER_IMAGE = 16
    cfg.INPUT.TRAIN_SIZE = 128
    cfg.INPUT.TEST_SIZE = 128
    cfg.INPUT.MIN_SIZE_TEST = 96
    cfg.INPUT.MAX_SIZE_TEST = 128
    cfg.DATALOADER.MAX_INSTANCES = 16
    cfg.DATALOADER.MAX_PASTES = 2
    cfg.DATALOADER.PATCH_SIZE = 32
    cfg.DATALOADER.NUM_WORKERS = 2
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.MAX_ITER = 4
    cfg.SOLVER.WARMUP_ITERS = 2
    cfg.SOLVER.CHECKPOINT_PERIOD = 4
    cfg.MODEL.MODEL_EMA = 0.99
    cfg.INPUT.USE_COPY_PASTE = True
    cfg.INPUT.COPY_METHOD = "syn_copy"
    cfg.INPUT.INST_POOL = True
    cfg.INPUT.INST_POOL_PATH = pool_path
    cfg.INPUT.RANDOM_SCALE = True
    cfg.INPUT.RANDOM_SCALE_MIN = 0.5
    cfg.INPUT.RANDOM_SCALE_MAX = 1.0
    cfg.MODEL.ROI_BOX_HEAD.CAT_FREQ_PATH = ""
    cfg.INPUT.AREA_PRIOR_PATH = ""
    cfg.FP16 = False
    return cfg


@pytest.mark.slow
def test_train_and_eval_e2e(tiny_lvis):
    tmp_path, jf, img_dir, pool = tiny_lvis
    cfg = tiny_cfg(tmp_path, pool)
    cfg.INPUT.INST_POOL_ROOT = str(tmp_path)

    from divergen_tpu.engine.trainer import do_train
    from divergen_tpu.engine.eval_loop import do_test

    state = do_train(cfg)
    assert int(state.step) == 4
    # metrics.json written
    assert os.path.exists(os.path.join(cfg.OUTPUT_DIR, "metrics.json"))
    # checkpoint saved at max_iter
    from divergen_tpu.engine.checkpoint import Checkpointer

    assert Checkpointer(cfg.OUTPUT_DIR).latest_step() == 4

    results = do_test(cfg, state=state)
    r = results["tiny_lvis_val"]
    assert "bbox" in r and "segm" in r
    for task in ("bbox", "segm"):
        assert set(r[task]) >= {"AP", "AP50", "AP75", "APr", "APc", "APf"}

    # eval sharded over the 8-device data axis must reproduce the
    # single-device metrics exactly (VERDICT r1 item 9)
    import math

    cfg.PARALLEL.DATA_PARALLEL = 1
    r1 = do_test(cfg, state=state)["tiny_lvis_val"]
    for task in ("bbox", "segm"):
        for k in r[task]:
            a, b = r[task][k], r1[task][k]
            assert (math.isnan(a) and math.isnan(b)) or a == pytest.approx(b, abs=1e-9), (
                task, k, a, b)


@pytest.mark.slow
def test_bsgal_do_train_e2e(tiny_lvis):
    tmp_path, jf, img_dir, pool = tiny_lvis
    cfg = tiny_cfg(tmp_path, pool)
    cfg.OUTPUT_DIR = str(tmp_path / "out_active")
    cfg.INPUT.INST_POOL_ROOT = str(tmp_path)
    cfg.MODEL.ACTIVE.ENABLED = True
    cfg.MODEL.ACTIVE.THRESHOLD = -1e9  # always accept pastes
    cfg.MODEL.ACTIVE.BANK_CKPT_PERIOD = 2
    cfg.MODEL.ACTIVE.LOG_PERIOD = 1
    cfg.SOLVER.MAX_ITER = 2
    cfg.SOLVER.CHECKPOINT_PERIOD = 2

    from divergen_tpu.engine.trainer import do_train

    state = do_train(cfg)
    assert int(state.step) == 2
    # grad bank checkpointed
    from divergen_tpu.engine.checkpoint import Checkpointer

    assert Checkpointer(os.path.join(cfg.OUTPUT_DIR, "grad_bank")).latest_step() == 2
    # per-decision log in the reference layout
    # (custom_rcnn.py:610-686: paste_source/rank_*/N0000.txt)
    log = os.path.join(cfg.OUTPUT_DIR, "paste_source", "rank_0", "10000.txt")
    assert os.path.exists(log)
    lines = open(log).read().strip().splitlines()
    assert len(lines) >= 1
    assert "select_class:" in lines[0] and "paste:" in lines[0]
    assert "loss_dif:" in lines[0] and "paste_num:" in lines[0]
