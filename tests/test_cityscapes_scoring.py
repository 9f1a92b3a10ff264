"""Native cityscapes instance-AP scorer, pinned on hand-computed cases.

Each scenario's AP is derivable by hand from the published protocol
(see divergen_tpu/evaluation/cityscapes_instance_scoring.py docstring;
reference consumer: divergen/evaluation/lvis_to_cityscapes_evaluation.py
:140-172).
"""
import numpy as np
import pytest

from divergen_tpu.evaluation.cityscapes_instance_scoring import (
    InstanceScorer,
    score_prediction_dir,
)

CAR = 26
PERSON = 24
ROAD = 7


def _canvas(h=64, w=64, fill=ROAD):
    return np.full((h, w), fill, np.int64)


def _rect_mask(h, w, y0, y1, x0, x1):
    m = np.zeros((h, w), bool)
    m[y0:y1, x0:x1] = True
    return m


def test_perfect_match_is_ap_1():
    gt = _canvas()
    gt[10:30, 10:30] = CAR * 1000 + 1  # 400 px instance
    pred = _rect_mask(64, 64, 10, 30, 10, 30)
    s = InstanceScorer()
    s.add_image(gt, [(pred, CAR, 0.9)])
    res = s.summarize()
    assert res["allAp"] == pytest.approx(1.0)
    assert res["allAp50%"] == pytest.approx(1.0)
    assert res["classes"]["car"]["ap"] == pytest.approx(1.0)


def test_partial_recall_has_no_phantom_area():
    # 2 GT cars, one found perfectly, one missed, no FPs: PR curve reaches
    # only recall 0.5 at precision 1 -> AP must be 0.5. (An artificial
    # (p=0, r=1) endpoint would trapezoid a phantom +0.25 — the protocol
    # integrates over ACHIEVED recall only.)
    gt = _canvas()
    gt[10:30, 10:30] = CAR * 1000 + 1
    gt[40:60, 40:60] = CAR * 1000 + 2
    pred = _rect_mask(64, 64, 10, 30, 10, 30)
    s = InstanceScorer()
    s.add_image(gt, [(pred, CAR, 0.9)])
    res = s.summarize()
    assert res["allAp"] == pytest.approx(0.5)
    assert res["allAp50%"] == pytest.approx(0.5)


def test_miss_plus_false_positive_is_ap_0():
    gt = _canvas()
    gt[10:30, 10:30] = CAR * 1000 + 1
    far = _rect_mask(64, 64, 40, 60, 40, 60)  # clean-background FP
    s = InstanceScorer()
    s.add_image(gt, [(far, CAR, 0.9)])
    res = s.summarize()
    assert res["allAp"] == pytest.approx(0.0)


def test_crowd_region_suppresses_false_positive():
    # pred B sits entirely on a same-class crowd region (bare label id):
    # with suppression AP=1.0; counting B as FP would give 0.25 at every
    # overlap (higher-scored FP above the TP: PR points (0,0) then (1,.5))
    gt = _canvas()
    gt[10:30, 10:30] = CAR * 1000 + 1
    gt[40:60, 40:60] = CAR  # crowd/group region
    pred_a = _rect_mask(64, 64, 10, 30, 10, 30)
    pred_b = _rect_mask(64, 64, 42, 58, 42, 58)
    s = InstanceScorer()
    s.add_image(gt, [(pred_a, CAR, 0.8), (pred_b, CAR, 0.9)])
    assert s.summarize()["allAp"] == pytest.approx(1.0)


def test_uncovered_false_positive_ranks_above_tp():
    # same geometry but B on clean background: the 0.25 number
    gt = _canvas()
    gt[10:30, 10:30] = CAR * 1000 + 1
    pred_a = _rect_mask(64, 64, 10, 30, 10, 30)
    pred_b = _rect_mask(64, 64, 42, 58, 42, 58)
    s = InstanceScorer()
    s.add_image(gt, [(pred_a, CAR, 0.8), (pred_b, CAR, 0.9)])
    assert s.summarize()["allAp"] == pytest.approx(0.25)


def test_double_match_keeps_highest_confidence_as_tp():
    # two identical preds on one gt: TP must take conf 0.9 and the 0.6
    # duplicate becomes an FP BELOW it -> AP stays 1.0. Keeping the
    # first-seen (0.6) as TP instead would score 0.25.
    gt = _canvas()
    gt[10:30, 10:30] = CAR * 1000 + 1
    pred = _rect_mask(64, 64, 10, 30, 10, 30)
    s = InstanceScorer()
    s.add_image(gt, [(pred, CAR, 0.6), (pred.copy(), CAR, 0.9)])
    assert s.summarize()["allAp"] == pytest.approx(1.0)


def test_iou_crosses_subset_of_overlap_thresholds():
    # inter 75, union 125 -> IoU exactly 0.60: matches at overlap 0.50 and
    # 0.55 only (strict >), so allAp = 2/10, allAp50% = 1
    gt = _canvas(32, 32)
    gt[0:10, 0:10] = CAR * 1000 + 1  # 100 px
    pred = np.zeros((32, 32), bool)
    pred[0:10, 0:10] = True
    pred[0:5, 5:10] = False  # drop 25 px of gt
    pred[10:15, 5:10] = True  # add 25 px outside
    s = InstanceScorer()
    s.add_image(gt, [(pred, CAR, 0.9)])
    res = s.summarize()
    assert res["allAp50%"] == pytest.approx(1.0)
    assert res["allAp"] == pytest.approx(0.2)


def test_small_gt_ignored_and_shields_preds():
    # 50 px gt < minRegionSize: dropped from GT, and a pred covering it is
    # shielded from FP. Car class then has no GT anywhere -> excluded from
    # the average entirely; the person class carries the numbers.
    gt = _canvas()
    gt[0:5, 0:10] = CAR * 1000 + 1  # 50 px, under the 100 px minimum
    gt[20:40, 20:40] = PERSON * 1000 + 1
    pred_car = _rect_mask(64, 64, 0, 5, 0, 10)
    pred_person = _rect_mask(64, 64, 20, 40, 20, 40)
    s = InstanceScorer()
    s.add_image(gt, [(pred_car, CAR, 0.9), (pred_person, PERSON, 0.7)])
    res = s.summarize()
    assert "car" not in res["classes"]
    assert res["classes"]["person"]["ap"] == pytest.approx(1.0)
    assert res["allAp"] == pytest.approx(1.0)


def test_score_prediction_dir_roundtrip(tmp_path):
    from PIL import Image

    gt = _canvas()
    gt[10:30, 10:30] = CAR * 1000 + 1
    gt_dir = tmp_path / "gtFine" / "val" / "city"
    gt_dir.mkdir(parents=True)
    Image.fromarray(gt.astype(np.int32), mode="I").save(
        gt_dir / "city_000000_000019_gtFine_instanceIds.png"
    )
    pred_dir = tmp_path / "preds"
    pred_dir.mkdir()
    mask = _rect_mask(64, 64, 10, 30, 10, 30)
    Image.fromarray(mask.astype(np.uint8) * 255).save(pred_dir / "city_000000_000019_0_car.png")
    (pred_dir / "city_000000_000019_leftImg8bit_pred.txt").write_text(
        "city_000000_000019_0_car.png 26 0.95\n"
    )
    res = score_prediction_dir(str(pred_dir), str(tmp_path / "gtFine"))
    assert res["allAp"] == pytest.approx(1.0)
    assert res["classes"]["car"]["ap50%"] == pytest.approx(1.0)
