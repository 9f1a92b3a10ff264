"""Evaluation tests: DetEval on hand-checkable cases; LVIS ignore rules."""
import numpy as np
import pytest

from divergen_tpu.evaluation.coco_eval_np import DetEval, box_iou_xywh
from divergen_tpu.utils.mask_codec import rle_encode


def _gt(img, cat, box, area=None, **kw):
    return {
        "image_id": img,
        "category_id": cat,
        "bbox": list(box),
        "area": area if area is not None else box[2] * box[3],
        "iscrowd": 0,
        **kw,
    }


def _det(img, cat, box, score):
    return {"image_id": img, "category_id": cat, "bbox": list(box), "score": score}


def run(gts, dets, **kw):
    ev = DetEval(gts, dets, **kw)
    ev.evaluate()
    ev.accumulate()
    return ev


def test_box_iou():
    ious = box_iou_xywh(
        np.array([[0, 0, 10, 10]], np.float64),
        np.array([[0, 0, 10, 10], [5, 5, 10, 10]], np.float64),
        np.array([False, False]),
    )
    assert ious[0, 0] == pytest.approx(1.0)
    assert ious[0, 1] == pytest.approx(25 / 175)


def test_perfect_detection_ap1():
    gts = [_gt(1, 1, [10, 10, 50, 50])]
    dets = [_det(1, 1, [10, 10, 50, 50], 0.9)]
    ev = run(gts, dets)
    res = ev.summarize()
    assert res["AP"] == pytest.approx(1.0)
    assert res["AP50"] == pytest.approx(1.0)


def test_false_positive_reduces_ap():
    gts = [_gt(1, 1, [10, 10, 50, 50])]
    dets = [
        _det(1, 1, [200, 200, 50, 50], 0.95),  # FP ranked above TP
        _det(1, 1, [10, 10, 50, 50], 0.9),
    ]
    res = run(gts, dets).summarize()
    assert res["AP"] == pytest.approx(0.5, abs=0.01)


def test_miss_reduces_recall():
    gts = [_gt(1, 1, [10, 10, 50, 50]), _gt(1, 1, [100, 100, 50, 50])]
    dets = [_det(1, 1, [10, 10, 50, 50], 0.9)]
    ev = run(gts, dets)
    res = ev.summarize()
    assert res["AP"] == pytest.approx(0.5, abs=0.01)


def test_localization_quality_thresholds():
    # IoU ≈ 0.68 det: TP at 0.5..0.65, FP at 0.7+
    gts = [_gt(1, 1, [0, 0, 100, 100])]
    dets = [_det(1, 1, [0, 0, 100, 68.0], 0.9)]  # IoU = 0.68 (det ⊂ gt)
    res = run(gts, dets).summarize()
    assert res["AP50"] == pytest.approx(1.0)
    assert res["AP75"] == pytest.approx(0.0)
    assert 0.3 < res["AP"] < 0.5


def test_crowd_gt_absorbs_det():
    gts = [_gt(1, 1, [0, 0, 100, 100], iscrowd=1)]
    dets = [_det(1, 1, [10, 10, 50, 50], 0.9)]
    ev = run(gts, dets)
    res = ev.summarize()
    # only crowd gt → no real gt → category contributes nothing (AP = nan)
    assert np.isnan(res["AP"])


def test_lvis_ignores_unverified_images():
    # det on an image whose category is neither pos nor neg → ignored
    gts = [_gt(1, 1, [10, 10, 50, 50])]
    dets = [
        _det(1, 1, [10, 10, 50, 50], 0.9),
        _det(2, 1, [0, 0, 50, 50], 0.95),  # img 2: cat unverified
    ]
    infos = {1: {"neg_category_ids": [], "pos_category_ids": [1]},
             2: {"neg_category_ids": [], "pos_category_ids": []}}
    res = run(gts, dets, lvis_mode=True, img_infos=infos).summarize()
    assert res["AP"] == pytest.approx(1.0)
    # same det counted when img2 certifies cat-1 absent (neg) → FP above TP
    infos2 = {1: {"neg_category_ids": [], "pos_category_ids": [1]},
              2: {"neg_category_ids": [1], "pos_category_ids": []}}
    res2 = run(gts, dets, lvis_mode=True, img_infos=infos2).summarize()
    assert res2["AP"] == pytest.approx(0.5, abs=0.01)


def test_freq_group_split():
    gts = [_gt(1, 1, [0, 0, 50, 50]), _gt(1, 2, [100, 100, 50, 50])]
    dets = [_det(1, 1, [0, 0, 50, 50], 0.9)]  # cat 2 missed entirely
    ev = run(gts, dets)
    res = ev.summarize(freq_groups={"r": {1}, "c": {2}, "f": set()})
    assert res["APr"] == pytest.approx(1.0)
    assert res["APc"] == pytest.approx(0.0)
    assert np.isnan(res["APf"])


def test_segm_iou_path():
    m1 = np.zeros((64, 64), bool)
    m1[10:30, 10:30] = True
    gts = [dict(_gt(1, 1, [10, 10, 20, 20]), segmentation=rle_encode(m1))]
    dets = [dict(_det(1, 1, [10, 10, 20, 20], 0.9), segmentation=rle_encode(m1))]
    res = run(gts, dets, iou_type="segm").summarize()
    assert res["AP"] == pytest.approx(1.0)


def test_per_category_ap():
    gts = [_gt(1, 1, [0, 0, 50, 50]), _gt(1, 2, [100, 100, 50, 50])]
    dets = [_det(1, 1, [0, 0, 50, 50], 0.9)]
    ev = run(gts, dets)
    pc = ev.per_category_ap()
    assert pc[1] == pytest.approx(1.0)
    assert pc[2] == pytest.approx(0.0)


def test_print_csv_format_and_per_class_table():
    from divergen_tpu.evaluation.lvis_evaluator import per_class_ap_table, print_csv_format

    gts = [_gt(1, 1, [0, 0, 50, 50])]
    dets = [_det(1, 1, [0, 0, 50, 50], 0.9)]
    ev = run(gts, dets)
    out = print_csv_format({"bbox": ev.summarize(freq_groups={"r": {1}, "c": set(), "f": set()})})
    assert "copypaste: Task: bbox" in out and "100.0000" in out
    table = per_class_ap_table(ev, class_names=["thing"])
    assert "thing: 100.0" in table


def test_oid_evaluator_protocol():
    # AP50-only, group-of absorbs, federated ignore via image labels
    from divergen_tpu.evaluation.coco_eval_np import DetEval

    gts = [_gt(1, 1, [0, 0, 50, 50])]
    dets = [
        _det(1, 1, [0, 0, 48, 52], 0.9),   # IoU ~0.88 → TP at 0.5
        _det(2, 1, [0, 0, 50, 50], 0.95),  # unverified image → ignored
    ]
    infos = {1: {"neg_category_ids": [], "pos_category_ids": [1]},
             2: {"neg_category_ids": [], "pos_category_ids": []}}
    ev = DetEval(gts, dets, lvis_mode=True, img_infos=infos,
                 iou_thrs=np.array([0.5]))
    ev.evaluate()
    ev.accumulate()
    res = ev.summarize()
    assert res["AP50"] == pytest.approx(1.0)
    assert np.isnan(res["AP75"])  # single-threshold protocol


def test_lvis_to_coco_evaluator(tmp_path):
    """Cross-dataset evaluator (lvis_to_coco_evaluation.py:33-763): LVIS
    contiguous class ids remapped to COCO category ids via the mapper json;
    unmapped classes dropped; COCO protocol AP."""
    import json

    from divergen_tpu.data.catalog import MetadataCatalog
    from divergen_tpu.evaluation.lvis_evaluator import (
        LVISToCOCOEvaluator,
        build_lvis_to_coco_mapper,
    )

    coco = {
        "images": [{"id": 1, "height": 100, "width": 100}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 7, "bbox": [10, 10, 30, 30],
             "area": 900, "iscrowd": 0},
        ],
        "categories": [{"id": 7, "name": "person"}, {"id": 9, "name": "dog"}],
    }
    jf = tmp_path / "coco.json"
    jf.write_text(json.dumps(coco))
    mapper = tmp_path / "mapper.json"
    mapper.write_text(json.dumps({"0": 7}))  # LVIS cont id 0 → COCO cat 7

    name = "xdset_coco_val"
    MetadataCatalog.remove(name)
    meta = MetadataCatalog.get(name)
    meta.json_file = str(jf)
    meta.evaluator_type = "lvis_to_coco"

    ev = LVISToCOCOEvaluator(name, mapper_json=str(mapper), tasks=("bbox",))
    outputs = {
        "boxes": np.array([[[10.0, 10.0, 40.0, 40.0], [50.0, 50.0, 70.0, 70.0]]]),
        "scores": np.array([[0.9, 0.95]]),
        "classes": np.array([[0, 3]]),  # 3 unmapped → dropped
        "valid": np.array([[True, True]]),
    }
    ev.process([{"image_id": 1}], outputs)
    assert len(ev._predictions) == 1
    assert ev._predictions[0]["category_id"] == 7
    res = ev.evaluate()
    assert res["bbox"]["AP"] == pytest.approx(1.0)

    # name/synonym mapper builder (tools/lvis_to_coco_results.py rule)
    lvis = {
        "categories": [
            {"id": 1, "name": "person", "synonyms": ["person"]},
            {"id": 2, "name": "weird_thing", "synonyms": ["weird_thing"]},
        ]
    }
    lj = tmp_path / "lvis.json"
    lj.write_text(json.dumps(lvis))
    m = build_lvis_to_coco_mapper(str(lj), coco["categories"])
    assert m == {0: 7}
