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


def test_paste_mask_rle_matches_numpy():
    """Native fused paste+RLE == numpy paste_mask_np → rle_encode."""
    from divergen_tpu.evaluation.lvis_evaluator import paste_mask_np
    from divergen_tpu.native import get_lib, paste_mask_rle
    from divergen_tpu.utils.mask_codec import rle_decode, rle_encode

    if get_lib() is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    rng = np.random.RandomState(0)
    for trial, (h, w) in enumerate([(64, 80), (128, 96), (50, 50)]):
        prob = rng.rand(28, 28).astype(np.float32)
        box = np.array(
            [rng.rand() * w * 0.5, rng.rand() * h * 0.5, 0, 0], np.float32
        )
        box[2] = box[0] + rng.rand() * w * 0.6 + 2
        box[3] = box[1] + rng.rand() * h * 0.6 + 2
        native = paste_mask_rle(prob, box, h, w)
        ref_mask = paste_mask_np(prob, box, h, w)
        ref = rle_encode(ref_mask)
        got_mask = rle_decode({"size": native["size"], "counts": native["counts"]})
        # bilinear tie-breaking at threshold can differ by a hair between
        # cv2 and the native resampler — demand near-exact agreement
        diff = int(np.sum(got_mask != ref_mask))
        assert diff <= max(4, int(0.002 * ref_mask.sum() + 1)), (trial, diff)
        assert native["size"] == ref["size"]


def test_paste_mask_rle_degenerate_box():
    from divergen_tpu.native import get_lib, paste_mask_rle
    from divergen_tpu.utils.mask_codec import rle_decode

    if get_lib() is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    prob = np.ones((28, 28), np.float32)
    out = paste_mask_rle(prob, np.array([90.0, 90.0, 91.0, 91.0]), 64, 64)
    m = rle_decode({"size": out["size"], "counts": out["counts"]})
    assert m.sum() == 0  # fully out of frame -> empty mask


def test_native_string_roundtrip():
    from divergen_tpu.native import get_lib, _ptr
    from divergen_tpu.utils.mask_codec import _counts_to_string, _string_to_counts
    import ctypes

    lib = get_lib()
    if lib is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    runs = [0, 5, 100, 3, 77, 1, 100000, 2]
    arr = np.asarray(runs, np.int64)
    buf = ctypes.create_string_buffer(256)
    n = lib.rle_counts_to_string(_ptr(arr), len(runs), buf, 256)
    assert buf.raw[:n] == _counts_to_string(runs)
    out = np.zeros(32, np.int64)
    m = lib.rle_string_to_counts(buf.raw[:n], n, _ptr(out), 32)
    assert out[:m].tolist() == runs
    assert _string_to_counts(buf.raw[:n]) == runs
