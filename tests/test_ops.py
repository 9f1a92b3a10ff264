"""Kernel tests vs numpy references (pattern: detectron2 tests/layers/)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from divergen_tpu.ops import (
    batched_nms_mask,
    flash_attention,
    flash_attention_packed,
    heatmap_focal_loss,
    iou_loss,
    multilevel_roi_align,
    nms_mask,
    paste_masks,
    reference_attention,
    roi_align,
    smooth_l1_loss,
    top_scoring,
)


def np_greedy_nms(boxes, scores, thresh):
    order = np.argsort(-scores)
    keep = np.zeros(len(boxes), bool)
    suppressed = np.zeros(len(boxes), bool)
    for idx in order:
        if suppressed[idx]:
            continue
        keep[idx] = True
        a = boxes[idx]
        for j in order:
            if j == idx or suppressed[j] or keep[j]:
                continue
            b = boxes[j]
            ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
            ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
            inter = max(ix2 - ix1, 0) * max(iy2 - iy1, 0)
            ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
            if inter > 0 and inter / ua > thresh:
                suppressed[j] = True
    return keep


class TestNMS:
    def test_matches_numpy_greedy(self, rng):
        for _ in range(5):
            xy = rng.rand(40, 2) * 60
            wh = rng.rand(40, 2) * 40 + 2
            boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
            scores = rng.rand(40).astype(np.float32)
            got = np.asarray(nms_mask(jnp.array(boxes), jnp.array(scores), 0.5))
            want = np_greedy_nms(boxes, scores, 0.5)
            np.testing.assert_array_equal(got, want)

    def test_invalid_rows_ignored(self, rng):
        boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30]], jnp.float32)
        scores = jnp.array([0.9, 0.8, 0.7])
        valid = jnp.array([False, True, True])
        keep = nms_mask(boxes, scores, 0.5, valid)
        assert keep.tolist() == [False, True, True]

    def test_batched_classes_dont_suppress(self):
        boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10]], jnp.float32)
        scores = jnp.array([0.9, 0.8])
        classes = jnp.array([0, 1])
        keep = batched_nms_mask(boxes, scores, classes, 0.5)
        assert keep.tolist() == [True, True]

    def test_top_scoring_static(self):
        boxes = jnp.arange(20, dtype=jnp.float32).reshape(5, 4)
        scores = jnp.array([0.1, 0.9, 0.5, 0.7, 0.3])
        keep = jnp.array([True, True, False, True, True])
        ob, os_, valid, _, _ = top_scoring(boxes, scores, keep, 3)
        np.testing.assert_allclose(os_, [0.9, 0.7, 0.3])
        assert valid.tolist() == [True, True, True]


def np_roi_align(feat, box, out, scale, ratio=2):
    # feat: (H, W, C)
    h, w, c = feat.shape

    def bil(y, x):
        # torchvision roi_align border semantics: >1px outside → 0; within
        # the 1px band → clamped onto the border pixel with full weight
        if y < -1 or y > h or x < -1 or x > w:
            return np.zeros(c)
        y = min(max(y, 0.0), h - 1)
        x = min(max(x, 0.0), w - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1i, x1i = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
        ly, lx = y - y0, x - x0
        return (
            feat[y0, x0] * (1 - ly) * (1 - lx)
            + feat[y0, x1i] * (1 - ly) * lx
            + feat[y1i, x0] * ly * (1 - lx)
            + feat[y1i, x1i] * ly * lx
        )

    x1, y1, x2, y2 = box * scale - 0.5 * np.array([1, 1, 1, 1]) * 0  # placeholder
    x1 = box[0] * scale - 0.5
    y1 = box[1] * scale - 0.5
    x2 = box[2] * scale - 0.5
    y2 = box[3] * scale - 0.5
    bw = max(x2 - x1, 1e-6) / out
    bh = max(y2 - y1, 1e-6) / out
    res = np.zeros((out, out, c))
    for i in range(out):
        for j in range(out):
            acc = np.zeros(c)
            for sy in range(ratio):
                for sx in range(ratio):
                    y = y1 + (i + (sy + 0.5) / ratio) * bh
                    x = x1 + (j + (sx + 0.5) / ratio) * bw
                    acc += bil(y, x)
            res[i, j] = acc / (ratio * ratio)
    return res


class TestROIAlign:
    def test_matches_numpy(self, rng):
        feat = rng.rand(16, 16, 4).astype(np.float32)
        boxes = np.array([[4.0, 4, 40, 40], [0, 0, 17, 9]], np.float32)
        got = np.asarray(roi_align(jnp.array(feat), jnp.array(boxes), 4, 0.25))
        for i, b in enumerate(boxes):
            want = np_roi_align(feat, b, 4, 0.25)
            np.testing.assert_allclose(got[i], want, atol=1e-4)

    def test_multilevel_shapes_and_level_routing(self, rng):
        feats = [rng.rand(32, 32, 8).astype(np.float32), rng.rand(16, 16, 8).astype(np.float32)]
        # small box → level 0 (stride 8); huge box → level 1 (stride 16)
        boxes = jnp.array([[0, 0, 32, 32], [0, 0, 250, 250]], jnp.float32)
        out = multilevel_roi_align([jnp.array(f) for f in feats], [8, 16], boxes, 7)
        assert out.shape == (2, 7, 7, 8)
        # the pooler runs d2's adaptive sampling (ratio 0: ceil(bin) samples
        # per bin, computed at the SELECTED level) — match it per level
        want_small = roi_align(jnp.array(feats[0]), boxes[:1], 7, 1 / 8,
                               sampling_ratio=0)
        np.testing.assert_allclose(out[0], want_small[0], atol=1e-5)
        want_big = roi_align(jnp.array(feats[1]), boxes[1:], 7, 1 / 16,
                             sampling_ratio=0)
        np.testing.assert_allclose(out[1], want_big[0], atol=1e-5)


class TestPasteMasks:
    def test_full_box_identity(self):
        m = np.ones((1, 4, 4), np.float32)
        out = paste_masks(jnp.array(m), jnp.array([[2.0, 2, 10, 10]]), (12, 12))
        # inside the box → 1, outside → 0
        assert float(out[0, 3:9, 3:9].min()) == 1.0
        assert float(out[0, :2, :].max()) == 0.0
        assert float(out[0, 11:, :].max()) == 0.0

    def test_soft_output(self):
        m = np.ones((1, 2, 2), np.float32)
        out = paste_masks(jnp.array(m), jnp.array([[0.0, 0, 6, 6]]), (8, 8), threshold=-1)
        assert out.dtype == jnp.float32
        assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0


class TestLosses:
    def test_heatmap_focal_perfect_pred(self):
        logits = jnp.array([10.0, -10.0, -10.0])
        targets = jnp.array([1.0, 0.0, 0.0])
        pos = jnp.array([1, 0, 0])
        p, n = heatmap_focal_loss(logits, targets, pos)
        assert float(p) < 1e-2 and float(n) < 1e-2

    def test_heatmap_focal_matches_reference_formula(self, rng):
        logits = jnp.array(rng.randn(16).astype(np.float32))
        targets = jnp.array(rng.rand(16).astype(np.float32))
        pos = jnp.array((rng.rand(16) > 0.7).astype(np.int32) * (1 + (rng.rand(16) > 0.9)))
        alpha, beta, gamma, clamp = 0.25, 4.0, 2.0, 1e-4
        pred = np.clip(1 / (1 + np.exp(-np.asarray(logits))), clamp, 1 - clamp)
        t = np.asarray(targets)
        pc = np.asarray(pos)
        pos_want = -alpha * np.sum(pc * np.log(pred) * (1 - pred) ** gamma)
        neg_want = -(1 - alpha) * np.sum(np.log(1 - pred) * pred**gamma * (1 - t) ** beta)
        p, n = heatmap_focal_loss(logits, targets, pos, alpha, beta, gamma, clamp)
        np.testing.assert_allclose(p, pos_want, rtol=1e-4)
        np.testing.assert_allclose(n, neg_want, rtol=1e-4)

    def test_iou_loss_zero_at_match(self):
        t = jnp.array([[1.0, 2, 3, 4]])
        assert float(iou_loss(t, t, loss_type="giou")) < 1e-5
        assert float(iou_loss(t, t, loss_type="linear_iou")) < 1e-5

    def test_smooth_l1(self):
        p = jnp.array([0.0, 2.0])
        t = jnp.array([0.5, 0.0])
        np.testing.assert_allclose(smooth_l1_loss(p, t, 1.0), [0.125, 1.5])
        np.testing.assert_allclose(smooth_l1_loss(p, t, 0.0), [0.5, 2.0])


class TestAttention:
    def test_reference_matches_naive(self, rng):
        q = jnp.array(rng.randn(2, 8, 16).astype(np.float32))
        k = jnp.array(rng.randn(2, 8, 16).astype(np.float32))
        v = jnp.array(rng.randn(2, 8, 16).astype(np.float32))
        out = reference_attention(q, k, v)
        s = np.einsum("bqd,bkd->bqk", q, k) / np.sqrt(16)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        want = np.einsum("bqk,bkd->bqd", p, v)
        np.testing.assert_allclose(out, want, atol=1e-5)

    def test_flash_cpu_fallback(self, rng):
        q = jnp.array(rng.randn(2, 64, 32).astype(np.float32))
        out = flash_attention(q, q, q)
        np.testing.assert_allclose(out, reference_attention(q, q, q), atol=1e-5)

    def test_bias(self, rng):
        q = jnp.array(rng.randn(1, 8, 16).astype(np.float32))
        bias = jnp.full((1, 8, 8), 0.0).at[:, :, 4:].set(-1e30)
        out = flash_attention(q, q, q, bias=bias)
        want = reference_attention(q[:, :, :], q[:, :4], q[:, :4])
        np.testing.assert_allclose(out, want, atol=1e-5)

    def _packed_reference(self, qkv, heads):
        """Unpack the (B, N, 3C) channel axis → per-head reference
        attention → repack, in f64 numpy."""
        b, n, c3 = qkv.shape
        d = c3 // (3 * heads)
        q, k, v = (
            np.asarray(
                qkv[..., s * heads * d : (s + 1) * heads * d], np.float64
            ).reshape(b, n, heads, d)
            for s in range(3)
        )
        s = np.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(d)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        return np.einsum("bhnm,bmhd->bnhd", p, v).reshape(b, n, heads * d)

    def test_packed_xla_fallback(self, rng):
        qkv = jnp.array(rng.randn(2, 64, 3 * 4 * 16).astype(np.float32))
        out = flash_attention_packed(qkv, heads=4, use_pallas=False)
        np.testing.assert_allclose(
            out, self._packed_reference(np.asarray(qkv), 4), atol=1e-5
        )

    def test_packed_pallas_interpret(self, rng):
        """The BlockSpec q/k/v channel-block slicing of the fused-QKV
        tensor, in Pallas interpret mode (hardware parity in tests/tpu/)."""
        qkv = jnp.array(rng.randn(1, 256, 3 * 2 * 64).astype(np.float32))
        out = flash_attention_packed(qkv, heads=2, interpret=True)
        np.testing.assert_allclose(
            out, self._packed_reference(np.asarray(qkv), 2), atol=2e-3, rtol=2e-3
        )

    def test_packed_two_heads_per_block_interpret(self, rng):
        """heads_per_block=2: the (1, block, 2D) channel block and per-
        sub-head softmax must match the unpacked reference; odd head counts
        fall back to single-head blocks."""
        qkv = jnp.array(rng.randn(1, 256, 3 * 4 * 64).astype(np.float32))
        out = flash_attention_packed(qkv, heads=4, interpret=True,
                                     heads_per_block=2)
        np.testing.assert_allclose(
            out, self._packed_reference(np.asarray(qkv), 4), atol=2e-3, rtol=2e-3
        )
        qkv3 = jnp.array(rng.randn(1, 256, 3 * 3 * 64).astype(np.float32))
        out3 = flash_attention_packed(qkv3, heads=3, interpret=True,
                                      heads_per_block=2)  # falls back to 1
        np.testing.assert_allclose(
            out3, self._packed_reference(np.asarray(qkv3), 3), atol=2e-3, rtol=2e-3
        )

    @pytest.mark.parametrize("mode,tol", [("rawmax", 2e-3), ("bf16exp", 2e-2)])
    def test_packed_softmax_mode_variants(self, rng, mode, tol):
        """VPU-trimming softmax variants (hpb=2 kernel): `rawmax` keeps the
        running max in raw score units (algebraically identical — same
        tolerance as exact); `bf16exp` rounds the exp2 argument to bf16
        (tail-probability perturbation ~2^-8, hence the looser bound)."""
        qkv = jnp.array(rng.randn(1, 256, 3 * 4 * 64).astype(np.float32))
        out = flash_attention_packed(qkv, heads=4, interpret=True,
                                     heads_per_block=2, softmax_mode=mode)
        np.testing.assert_allclose(
            out, self._packed_reference(np.asarray(qkv), 4), atol=tol, rtol=tol
        )


@pytest.mark.parametrize("mode", ["im2col", "tapsum"])
def test_conv3x3_gemm_matches_nn_conv(mode):
    """ops/conv_matmul: identical params, identical outputs to nn.Conv
    (the UNet's conv_matmul path must be a pure layout change) — both the
    one-GEMM im2col form and the 9-GEMM tap-sum form."""
    import flax.linen as nn

    from divergen_tpu.ops.conv_matmul import Conv3x3MM

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 12, 10, 16), jnp.float32)
    ref = nn.Conv(24, (3, 3), padding=1)
    params = ref.init(jax.random.PRNGKey(0), x)
    want = ref.apply(params, x)
    got = Conv3x3MM(24, mode=mode).apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
