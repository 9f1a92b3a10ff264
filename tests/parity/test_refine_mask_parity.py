"""RefineMask parity vs torch replicas of the reference semantics.

The replicas below re-implement, in torch, the behavior of
``DiverGen/divergen/modeling/roi_heads/refine_mask_head.py``:
``generate_block_target`` (:45-76), ``RefineCrossEntropyLoss`` (:79-143),
``SFMStage`` (:209-312) and the inference composition (:442-454) — then the
JAX implementations are checked against them numerically. ROIAlign itself
is parity-tested separately (tests/test_roi_align.py), so the SFM replica
consumes the same crops as the JAX stage."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from divergen_tpu.modeling.roi_heads.refine_mask_head import (  # noqa: E402
    RefineMaskHead,
    SFMStage,
    compose_stage_preds,
    generate_block_target,
    refine_cross_entropy,
    resize_align_corners,
)


def _block_target_torch(mask, boundary_width=3):
    """Reference :45-76 semantics in torch."""
    mask = torch.as_tensor(mask, dtype=torch.float32)
    k = 2 * boundary_width + 1
    lap = -torch.ones(1, 1, k, k)
    lap[0, 0, boundary_width, boundary_width] = k * k - 1
    pad = F.pad(mask.unsqueeze(1), (boundary_width,) * 4, "constant", 0)
    pos = (F.conv2d(pad, lap).clamp(min=0) / (k * k) > 0.1).float().squeeze(1)
    neg = (F.conv2d(1 - pad, lap).clamp(min=0) / (k * k) > 0.1).float().squeeze(1)
    block = torch.zeros_like(mask, dtype=torch.long)
    block[(pos + neg) > 0] = 1
    block[(mask - pos) > 0] = 2
    return block


def _refine_loss_torch(preds, targets, weights, boundary_width=2, start_stage=1):
    """Reference RefineCrossEntropyLoss.forward (:93-139) in torch; preds and
    targets are lists of (N, s, s) tensors (all rows real)."""
    losses = []
    pre_pred = None
    for idx, (p, t) in enumerate(zip(preds, targets)):
        p = torch.as_tensor(p, dtype=torch.float32)
        t = torch.as_tensor(t, dtype=torch.float32)
        if idx <= start_stage:
            losses.append(F.binary_cross_entropy_with_logits(p, t))
            pre_pred = p.sigmoid() >= 0.5
        else:
            region = _block_target_torch(pre_pred.float(), boundary_width) == 1
            region = region.unsqueeze(1) | (
                _block_target_torch(
                    torch.as_tensor(targets[idx - 1], dtype=torch.float32),
                    boundary_width,
                )
                == 1
            ).unsqueeze(1)
            region = (
                F.interpolate(region.float(), p.shape[-2:], mode="bilinear",
                              align_corners=True)
                >= 0.5
            ).squeeze(1)
            bce = F.binary_cross_entropy_with_logits(p, t, reduction="none")
            losses.append(bce[region].sum() / region.sum().clamp(min=1).float())
            b1 = _block_target_torch(pre_pred.float(), 1) == 1
            b1 = (
                F.interpolate(b1.unsqueeze(1).float(), p.shape[-2:],
                              mode="bilinear", align_corners=True)
                >= 0.5
            )
            prev = F.interpolate(
                torch.as_tensor(preds[idx - 1], dtype=torch.float32).unsqueeze(1),
                p.shape[-2:], mode="bilinear", align_corners=True,
            )
            prev[b1] = p.unsqueeze(1)[b1]
            pre_pred = prev.squeeze(1).sigmoid() >= 0.5
    return float(sum(w * l for w, l in zip(weights, losses)))


def _compose_torch(preds):
    """Reference inference composition (:442-454) in torch."""
    preds = [torch.as_tensor(p, dtype=torch.float32).unsqueeze(1) for p in preds[1:]]
    for idx in range(len(preds) - 1):
        cur = preds[idx].squeeze(1).sigmoid() >= 0.5
        nb = (_block_target_torch(cur.float(), 1) != 1).unsqueeze(1)
        nb = (
            F.interpolate(nb.float(), preds[idx + 1].shape[-2:], mode="bilinear",
                          align_corners=True)
            >= 0.5
        )
        up = F.interpolate(preds[idx], preds[idx + 1].shape[-2:], mode="bilinear",
                           align_corners=True)
        preds[idx + 1][nb] = up[nb]
    return preds[-1].squeeze(1).numpy()


def _rand_masks(rng, n, s):
    """Blobby binary masks (random boxes) — realistic boundary structure."""
    m = np.zeros((n, s, s), np.float32)
    for i in range(n):
        x0, y0 = rng.randint(0, s // 2, 2)
        x1 = rng.randint(x0 + 2, s)
        y1 = rng.randint(y0 + 2, s)
        m[i, y0:y1, x0:x1] = 1
    return m


@pytest.mark.parametrize("width", [1, 2, 3])
def test_generate_block_target_parity(width):
    rng = np.random.RandomState(width)
    m = _rand_masks(rng, 4, 28)
    got = np.asarray(generate_block_target(jnp.asarray(m), width))
    want = _block_target_torch(m, width).numpy()
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("shape", [(14, 28), (28, 56), (56, 112), (20, 20)])
def test_resize_align_corners_parity(shape):
    s, o = shape
    rng = np.random.RandomState(s)
    x = rng.randn(3, s, s).astype(np.float32)
    got = np.asarray(resize_align_corners(jnp.asarray(x), o, o))
    want = F.interpolate(torch.as_tensor(x).unsqueeze(1), (o, o), mode="bilinear",
                         align_corners=True).squeeze(1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)  # f32 accum floor


def test_refine_cross_entropy_parity():
    rng = np.random.RandomState(0)
    n = 6
    sizes = (14, 28, 56, 112)
    preds = [rng.randn(n, s, s).astype(np.float32) * 2 for s in sizes]
    base = _rand_masks(rng, n, 112)
    targets = [
        (np.asarray(
            jax.image.resize(jnp.asarray(base), (n, s, s), "nearest")
        ) >= 0.5).astype(np.float32)
        for s in sizes
    ]
    weights = (0.25, 0.5, 0.75, 1.0)
    got = float(
        refine_cross_entropy(
            [jnp.asarray(p) for p in preds],
            [jnp.asarray(t) for t in targets],
            jnp.ones((n,), bool),
            stage_weights=weights,
        )
    )
    want = _refine_loss_torch(preds, targets, weights)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_refine_cross_entropy_padded_rows_match_dense():
    """Padded invalid rows must not change the loss vs the dense subset."""
    rng = np.random.RandomState(1)
    sizes = (14, 28, 56)
    n, pad = 5, 3
    preds = [rng.randn(n + pad, s, s).astype(np.float32) for s in sizes]
    base = _rand_masks(rng, n + pad, 56)
    targets = [
        (np.asarray(jax.image.resize(jnp.asarray(base), (n + pad, s, s), "nearest"))
         >= 0.5).astype(np.float32)
        for s in sizes
    ]
    valid = np.array([True] * n + [False] * pad)
    w = (1 / 3, 2 / 3, 1.0)
    padded = float(refine_cross_entropy(
        [jnp.asarray(p) for p in preds], [jnp.asarray(t) for t in targets],
        jnp.asarray(valid), stage_weights=w,
    ))
    dense = float(refine_cross_entropy(
        [jnp.asarray(p[:n]) for p in preds], [jnp.asarray(t[:n]) for t in targets],
        jnp.ones((n,), bool), stage_weights=w,
    ))
    np.testing.assert_allclose(padded, dense, rtol=1e-6)


def test_compose_stage_preds_parity():
    rng = np.random.RandomState(2)
    n = 4
    sizes = (14, 28, 56, 112)
    preds = [rng.randn(n, s, s).astype(np.float32) * 3 for s in sizes]
    got = np.asarray(compose_stage_preds([jnp.asarray(p) for p in preds]))
    want = _compose_torch(preds)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


class _SFMTorch(torch.nn.Module):
    """Reference SFMStage (:209-312) forward in torch, taking pre-cropped
    semantic feats/preds (ROIAlign is parity-tested elsewhere)."""

    def __init__(self, cin, cout, ncls=1):
        super().__init__()
        self.t_in = torch.nn.Conv2d(cin, cin, 1)
        self.t_out = torch.nn.Conv2d(cin, cin, 1)
        self.inst_logits = torch.nn.Conv2d(cin, ncls, 1)
        self.fuse_in = torch.nn.Conv2d(cin + cin + 2, cin, 1)
        self.dil = torch.nn.ModuleList(
            [torch.nn.Conv2d(cin, cin, 3, padding=d, dilation=d) for d in (1, 3, 5)]
        )
        self.merge = torch.nn.Conv2d(cin, cin, 1)
        self.t_fuse_out = torch.nn.Conv2d(cin, cout - 2, 1)

    def forward(self, inst, sem_crop, sem_mask_crop):
        r = F.relu
        ins_sem = r(self.t_out(sem_crop))
        ip = self.inst_logits(inst)[:, :1]
        ip_s = ip.sigmoid()
        s = inst.shape[-1]
        im = F.interpolate(ip_s, s, mode="bilinear", align_corners=True)
        sm = F.interpolate(sem_mask_crop, (s, s), mode="bilinear", align_corners=True)
        fused = torch.cat([inst, ins_sem, im, sm], 1)
        fused = r(self.fuse_in(fused))
        fused = r(self.merge(sum(r(d(fused)) for d in self.dil)))
        fused = r(self.t_fuse_out(fused))
        fused = r(F.interpolate(fused, scale_factor=2, mode="bilinear"))
        im2 = F.interpolate(ip_s, 2 * s, mode="bilinear", align_corners=True)
        sm2 = F.interpolate(sm, 2 * s, mode="bilinear", align_corners=True)
        return ip.squeeze(1), torch.cat([fused, im2, sm2], 1)


def _load_conv(tconv, fparams, name):
    k = np.asarray(fparams[name]["kernel"])  # (kh, kw, cin, cout)
    b = np.asarray(fparams[name]["bias"])
    tconv.weight.data = torch.as_tensor(k.transpose(3, 2, 0, 1))
    tconv.bias.data = torch.as_tensor(b)


def test_sfm_stage_parity():
    cin, cout, s, n, b = 16, 8, 14, 4, 2
    rng = np.random.RandomState(3)
    stage = SFMStage(instance_in_channel=cin, instance_out_channel=cout, out_size=s)
    inst = rng.randn(n, s, s, cin).astype(np.float32)
    sem_full = rng.randn(b, 32, 32, cin).astype(np.float32)
    sem_pred = rng.randn(b, 32, 32).astype(np.float32) * 2
    # crop: trivially tile each image's centre crop to its rows — keeps both
    # sides crop-identical without ROIAlign (which has its own parity suite)
    rows_per = n // b

    def crop(full_map, res):
        c = full_map[:, 4:4 + res, 4:4 + res, :]
        return jnp.repeat(c, rows_per, axis=0)

    params = stage.init(
        jax.random.PRNGKey(0), jnp.asarray(inst), jnp.asarray(sem_full),
        jnp.asarray(sem_pred), crop,
    )
    preds, fused = stage.apply(
        params, jnp.asarray(inst), jnp.asarray(sem_full), jnp.asarray(sem_pred), crop
    )

    p = params["params"]
    tm = _SFMTorch(cin, cout)
    _load_conv(tm.t_in, p, "semantic_transform_in")
    _load_conv(tm.t_out, p, "semantic_transform_out")
    _load_conv(tm.inst_logits, p, "instance_logits")
    _load_conv(tm.fuse_in, p, "fuse_conv_in")
    for i in range(3):
        _load_conv(tm.dil[i], p["fuse_mbf"], f"dilation_conv_{i + 1}")
    _load_conv(tm.merge, p["fuse_mbf"], "merge_conv")
    _load_conv(tm.t_fuse_out, p, "fuse_transform_out")

    # torch-side crops of the torch-side transformed semantic map
    sem_t_torch = F.relu(tm.t_in(torch.as_tensor(sem_full.transpose(0, 3, 1, 2))))
    sem_crop = sem_t_torch[:, :, 4:4 + s, 4:4 + s].repeat_interleave(rows_per, 0)
    sp = torch.as_tensor(sem_pred).sigmoid().unsqueeze(1)
    sem_mask_crop = sp[:, :, 4:4 + s, 4:4 + s].repeat_interleave(rows_per, 0)

    with torch.no_grad():
        tp, tf = tm(torch.as_tensor(inst.transpose(0, 3, 1, 2)), sem_crop, sem_mask_crop)
    np.testing.assert_allclose(np.asarray(preds), tp.numpy(), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(fused), tf.numpy().transpose(0, 2, 3, 1), atol=2e-5, rtol=2e-5
    )


def test_refine_mask_head_shapes_and_channels():
    """Stage stack: 14→28→56→112 logits, channels halving 32→16→8 (tiny)."""
    head = RefineMaskHead(conv_dim=32, stage_sup_size=(14, 28, 56, 112))
    n, b = 4, 2
    rng = np.random.RandomState(0)
    inst = jnp.asarray(rng.randn(n, 14, 14, 32), jnp.float32)
    sem = jnp.asarray(rng.randn(b, 64, 64, 32), jnp.float32)  # ≥ largest crop res
    sp = jnp.asarray(rng.randn(b, 64, 64), jnp.float32)

    def crop(full_map, res):
        return jnp.repeat(full_map[:, :res, :res, :], n // b, axis=0)

    params = head.init(jax.random.PRNGKey(0), inst, sem, sp, crop)
    outs = head.apply(params, inst, sem, sp, crop)
    assert tuple(o.shape for o in outs) == (
        (n, 14, 14), (n, 28, 28), (n, 56, 56), (n, 112, 112)
    )
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)
