"""Full OID protocol tests (oid_eval.py vs hand-computed expectations,
mirroring divergen/evaluation/oideval.py semantics)."""
import numpy as np
import pytest

from divergen_tpu.evaluation.oid_eval import (
    OIDEval,
    compute_average_precision,
    expand_predictions,
    hierarchy_ancestors,
    _match_img_google,
)


def det(img, cat, box, score):
    return {"image_id": img, "category_id": cat, "bbox": list(map(float, box)),
            "score": float(score)}


def gt(img, cat, box, group_of=0):
    return {"image_id": img, "category_id": cat, "bbox": list(map(float, box)),
            "iscrowd": group_of}


def _gt_data(images, anns, cats=(1, 2)):
    return {
        "images": [{"id": i, **extra} for i, extra in images],
        "annotations": anns,
        "categories": [{"id": c, "name": f"c{c}", "freebase_id": f"/m/{c}"} for c in cats],
    }


# ---------------- VOC AP ----------------
def test_compute_average_precision_perfect():
    # single TP at recall 1 → AP 1
    ap = compute_average_precision(np.array([1.0]), np.array([1.0]))
    assert ap == pytest.approx(1.0)


def test_compute_average_precision_half():
    # two dts, first TP second FP over one gt: pr=[1,0.5], rc=[1,1] → AP=1
    ap = compute_average_precision(np.array([1.0, 0.5]), np.array([1.0, 1.0]))
    assert ap == pytest.approx(1.0)
    # TP after an FP: pr=[0,0.5], rc=[0,1] → envelope gives 0.5
    ap = compute_average_precision(np.array([0.0, 0.5]), np.array([0.0, 1.0]))
    assert ap == pytest.approx(0.5)


# ---------------- google matching ----------------
def test_match_argmax_iou_not_greedy_cocostyle():
    """Google matching assigns each dt only to its ARGMAX-IoU gt: if that gt
    is taken, the dt is a FP even though another gt overlaps > 0.5 (COCO
    greedy would recover it)."""
    g = [gt(0, 1, [0, 0, 10, 10]), gt(0, 1, [4, 0, 10, 10])]
    # dt1 overlaps gt0 best and takes it; dt2 also argmax-overlaps gt0
    d = [det(0, 1, [0, 0, 10, 10], 0.9), det(0, 1, [1, 0, 10, 10], 0.8)]
    scores, tpfp, num_gt = _match_img_google(d, g, "bbox")
    assert num_gt == 2
    assert tpfp.tolist() == [1.0, 0.0]


def test_match_group_of_absorbs_to_single_tp():
    """Multiple dts inside a group-of box collapse to ONE TP at the max
    score; the dts themselves leave the scored list."""
    g = [gt(0, 1, [0, 0, 20, 20], group_of=1)]
    d = [det(0, 1, [1, 1, 5, 5], 0.7), det(0, 1, [10, 10, 5, 5], 0.9)]
    scores, tpfp, num_gt = _match_img_google(d, g, "bbox")
    # both matched group-of → removed; one synthetic TP with score 0.9
    assert len(scores) == 1
    assert scores[0] == pytest.approx(0.9)
    assert tpfp.tolist() == [1.0]


def test_match_group_of_only_unmatched_dts():
    """A dt that already TP-matched a normal gt is not absorbed."""
    g = [gt(0, 1, [0, 0, 10, 10]), gt(0, 1, [0, 0, 30, 30], group_of=1)]
    d = [det(0, 1, [0, 0, 10, 10], 0.9)]
    scores, tpfp, _ = _match_img_google(d, g, "bbox")
    assert tpfp.tolist() == [1.0]
    assert len(scores) == 1  # no extra group-of entry


# ---------------- federated filtering ----------------
def test_federated_filter_ignores_unverified_categories():
    """A detection for a category in neither pos nor neg image labels must
    not count as FP."""
    images = [(0, {"pos_category_ids": [1], "neg_category_ids": []})]
    anns = [gt(0, 1, [0, 0, 10, 10])]
    preds = [
        det(0, 1, [0, 0, 10, 10], 0.9),
        det(0, 2, [0, 0, 10, 10], 0.95),  # cat 2 unverified → dropped
    ]
    ev = OIDEval(_gt_data(images, anns), preds)
    res = ev.run()
    assert res["AP50"] == pytest.approx(1.0)

    # with cat 2 in neg labels the same detection becomes a counted FP for
    # cat 2, but cat 2 has no gt → category skipped; AP still 1.0
    images2 = [(0, {"pos_category_ids": [1], "neg_category_ids": [2]})]
    ev2 = OIDEval(_gt_data(images2, anns), preds)
    assert ev2.run()["AP50"] == pytest.approx(1.0)


def test_ap_mean_over_categories_with_gt():
    images = [(0, {"pos_category_ids": [1, 2], "neg_category_ids": []})]
    anns = [gt(0, 1, [0, 0, 10, 10]), gt(0, 2, [20, 20, 10, 10])]
    preds = [
        det(0, 1, [0, 0, 10, 10], 0.9),     # cat1 TP
        det(0, 2, [40, 40, 10, 10], 0.8),   # cat2 FP (no overlap)
    ]
    ev = OIDEval(_gt_data(images, anns), preds)
    res = ev.run()
    assert res["AP50"] == pytest.approx(0.5)  # (1.0 + 0.0) / 2
    assert ev.per_class_ap[0] == pytest.approx(1.0)
    assert ev.per_class_ap[1] == pytest.approx(0.0)
    # instance-aware AP weighted by gt counts (1 and 1)
    assert res["AP50_instance_aware"] == pytest.approx(0.5)


# ---------------- hierarchy expansion ----------------
HIERARCHY = {
    "LabelName": "/m/root",
    "Subcategory": [
        {"LabelName": "/m/1", "Subcategory": [{"LabelName": "/m/2"}]},
    ],
}


def test_hierarchy_ancestors_dfs():
    # the top-level hierarchy node is the synthetic root (cur_id=-1,
    # oideval.py:130) and never becomes an ancestor
    fb2id = {"/m/1": 1, "/m/2": 2}
    anc = hierarchy_ancestors(HIERARCHY, fb2id)
    assert anc[2] == {1}
    assert 1 not in anc or anc[1] == set()


def test_expand_predictions_duplicates_to_ancestors():
    anc = {2: {1}}
    preds = [det(0, 2, [0, 0, 10, 10], 0.9)]
    out = expand_predictions(preds, anc)
    assert len(out) == 2
    assert sorted(p["category_id"] for p in out) == [1, 2]
    # originals untouched
    assert preds[0]["category_id"] == 2


def test_oideval_expand_scores_parent_gt():
    """A child-class prediction matches a parent-class gt only after
    hierarchy expansion (AP50_expand semantics)."""
    images = [(0, {"pos_category_ids": [1], "neg_category_ids": []})]
    anns = [gt(0, 1, [0, 0, 10, 10])]
    preds = [det(0, 2, [0, 0, 10, 10], 0.9)]  # child category
    base = OIDEval(_gt_data(images, anns), preds)
    assert base.run()["AP50"] == pytest.approx(0.0)

    fbmap_hier = {
        "LabelName": "/m/root",
        "Subcategory": [{"LabelName": "/m/1", "Subcategory": [{"LabelName": "/m/2"}]}],
    }
    ex = OIDEval(
        _gt_data(images, anns), preds, expand_pred_label=True, hierarchy=fbmap_hier
    )
    assert ex.run()["AP50"] == pytest.approx(1.0)


def test_max_dets_cap():
    images = [(0, {"pos_category_ids": [1], "neg_category_ids": []})]
    anns = [gt(0, 1, [0, 0, 10, 10])]
    preds = [det(0, 1, [100 + i, 100, 5, 5], 0.5 - i * 1e-3) for i in range(50)]
    preds.append(det(0, 1, [0, 0, 10, 10], 0.001))  # lowest score, the only TP
    ev = OIDEval(_gt_data(images, anns), preds, max_dets=10)
    res = ev.run()
    # the TP got capped away → AP 0
    assert res["AP50"] == pytest.approx(0.0)
