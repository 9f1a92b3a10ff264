"""Native C++ kernels vs numpy references (pattern: detectron2
tests/layers/* CUDA-vs-CPU comparisons)."""
import numpy as np
import pytest

from divergen_tpu.native import get_lib, greedy_match, rle_iou_matrix
from divergen_tpu.utils.mask_codec import rle_decode, rle_encode

pytestmark = pytest.mark.skipif(get_lib() is None, reason="g++ unavailable")


def np_greedy(ious, g_ignore, iscrowd, thrs):
    T, (D, G) = len(thrs), ious.shape
    dt_matched = np.zeros((T, D), np.int64)
    dt_ignore = np.zeros((T, D), bool)
    gt_used = np.zeros((T, G), bool)
    for t, thr in enumerate(thrs):
        for di in range(D):
            best, best_iou = -1, min(thr, 1 - 1e-10)
            for gi in range(G):
                if gt_used[t, gi] and not iscrowd[gi]:
                    continue
                if best > -1 and not g_ignore[best] and g_ignore[gi]:
                    break
                if ious[di, gi] >= best_iou:
                    best_iou, best = ious[di, gi], gi
            if best > -1:
                dt_matched[t, di] = best + 1
                dt_ignore[t, di] = g_ignore[best]
                gt_used[t, best] = True
    return dt_matched, dt_ignore


def test_greedy_match_vs_numpy(rng):
    for trial in range(10):
        D, G = rng.randint(1, 12), rng.randint(1, 8)
        ious = rng.rand(D, G)
        g_ignore = np.sort(rng.rand(G) > 0.7)  # ignored last (protocol order)
        iscrowd = (rng.rand(G) > 0.8) & g_ignore
        thrs = np.linspace(0.5, 0.95, 10)
        got_m, got_i = greedy_match(ious, g_ignore, iscrowd, thrs)
        exp_m, exp_i = np_greedy(ious, g_ignore, iscrowd, thrs)
        np.testing.assert_array_equal(got_m, exp_m, err_msg=f"trial {trial}")
        np.testing.assert_array_equal(got_i, exp_i)


def test_rle_iou_vs_decode(rng):
    dets, gts, masks_d, masks_g = [], [], [], []
    for _ in range(4):
        m = rng.rand(40, 50) > 0.6
        dets.append(rle_encode(m))
        masks_d.append(m)
    for _ in range(3):
        m = rng.rand(40, 50) > 0.6
        gts.append(rle_encode(m))
        masks_g.append(m)
    iscrowd = np.array([False, True, False])
    got = rle_iou_matrix(dets, gts, iscrowd)
    assert got is not None
    for i, dm in enumerate(masks_d):
        for j, gm in enumerate(masks_g):
            inter = np.logical_and(dm, gm).sum()
            union = dm.sum() if iscrowd[j] else dm.sum() + gm.sum() - inter
            assert got[i, j] == pytest.approx(inter / union, rel=1e-9)


def test_rle_string_decode_roundtrip(rng):
    lib = get_lib()
    m = rng.rand(33, 47) > 0.5
    rle = rle_encode(m)
    np.testing.assert_array_equal(rle_decode(rle), m)
    # native string decoder agrees with python
    from divergen_tpu.native import _runs_of
    from divergen_tpu.utils.mask_codec import _string_to_counts

    np.testing.assert_array_equal(
        _runs_of(rle), np.asarray(_string_to_counts(rle["counts"]), np.uint32)
    )
