"""Weak-supervision (image-label / caption) loss path.

Reference semantics: detic_roi_heads.py:341-365 (get_top_proposals +
_add_image_box), detic_fast_rcnn.py:340-583 (image_label_losses and the
per-strategy helpers), custom_rcnn.py:210-223 (caption feature sync).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from divergen_tpu.config import get_cfg
from divergen_tpu.modeling.meta_arch.rcnn import build_model
from tests.test_model_e2e import small_cfg, synth_gt


def weak_cfg(loss="max_size", softmax_prop=False, zeroshot=False):
    cfg = small_cfg()
    cfg.WITH_IMAGE_LABELS = True
    cfg.MODEL.ROI_BOX_HEAD.IMAGE_LABEL_LOSS = loss
    cfg.MODEL.ROI_BOX_HEAD.ADD_IMAGE_BOX = True
    cfg.MODEL.ROI_BOX_HEAD.WS_NUM_PROPS = 16
    cfg.MODEL.ROI_BOX_HEAD.WITH_SOFTMAX_PROP = softmax_prop
    cfg.MODEL.ROI_BOX_HEAD.USE_ZEROSHOT_CLS = zeroshot
    return cfg


def build_with_labels(cfg, b=2, L=3):
    model = build_model(cfg)
    rng = np.random.RandomState(7)
    images = jnp.array(rng.rand(b, 128, 128, 3).astype(np.float32) * 255)
    sizes = jnp.array([[128, 128]] * b)
    gt = synth_gt(rng, b, 8, 8)
    gt["image_labels"] = jnp.array(rng.randint(0, 8, (b, L)), jnp.int32)
    gt["image_labels_valid"] = jnp.array([[True, True, False]] * b)
    params = model.init(
        jax.random.PRNGKey(0), images, sizes, gt=gt, rng=jax.random.PRNGKey(1),
        training=True,
    )
    return model, params, images, sizes, gt


@pytest.mark.parametrize("loss", ["max_size", "max_score", "first", "image", "min_loss"])
def test_image_label_losses_finite(loss):
    cfg = weak_cfg(loss)
    model, params, images, sizes, gt = build_with_labels(cfg)
    losses = model.apply(
        params, images, sizes, gt=gt, rng=jax.random.PRNGKey(2), training=True,
        ann_type="image",
    )
    for k in ["image_loss_stage0", "image_loss_stage1", "image_loss_stage2"]:
        assert k in losses and np.isfinite(float(losses[k])), k
    # weak batches produce zero box/cls/mask supervision (empty-mask parity)
    assert float(losses["loss_cls_stage0"]) == 0.0
    assert float(losses["loss_mask"]) == 0.0
    assert float(losses["image_loss_stage0"]) > 0.0


def test_wsddn_loss():
    cfg = weak_cfg("wsddn", softmax_prop=True)
    model, params, images, sizes, gt = build_with_labels(cfg)
    losses = model.apply(
        params, images, sizes, gt=gt, rng=jax.random.PRNGKey(2), training=True,
        ann_type="image",
    )
    assert np.isfinite(float(losses["image_loss_stage0"]))
    assert float(losses["image_loss_stage0"]) > 0.0


def test_image_label_grads_flow():
    cfg = weak_cfg("max_size")
    model, params, images, sizes, gt = build_with_labels(cfg)

    def loss_fn(p):
        losses = model.apply(
            p, images, sizes, gt=gt, rng=jax.random.PRNGKey(2), training=True,
            ann_type="image",
        )
        return sum(v for k, v in losses.items() if k.startswith("image_loss"))

    grads = jax.grad(loss_fn)(params)
    # classifier weights must receive gradient through the weak loss
    total = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(total) and total > 0


def test_caption_loss():
    cfg = weak_cfg("max_size", zeroshot=True)
    cfg.MODEL.WITH_CAPTION = True
    model, params, images, sizes, gt = build_with_labels(cfg)
    cap = jnp.asarray(np.random.RandomState(0).randn(2, 512), jnp.float32)
    losses = model.apply(
        params, images, sizes, gt=gt, rng=jax.random.PRNGKey(2), training=True,
        ann_type="caption", cap_emb=cap,
    )
    assert np.isfinite(float(losses["image_loss_stage0"]))
    assert float(losses["image_loss_stage0"]) > 0.0

    # captiontag also applies the image-label loss on top
    losses2 = model.apply(
        params, images, sizes, gt=gt, rng=jax.random.PRNGKey(2), training=True,
        ann_type="captiontag", cap_emb=cap,
    )
    assert float(losses2["image_loss_stage0"]) > float(losses["image_loss_stage0"]) * 0.5


def test_dynamic_classifier_sampling_unit():
    from divergen_tpu.ops.losses import sample_dynamic_classifier_inds

    key = jax.random.PRNGKey(0)
    gt = jnp.array([3, 7, 3, 0], jnp.int32)
    ok = jnp.array([True, True, True, False])
    inds, cmap = sample_dynamic_classifier_inds(key, gt, ok, 20, 5)
    inds = np.asarray(inds)
    cmap = np.asarray(cmap)
    assert set([3, 7]) <= set(inds.tolist())  # appeared classes included
    assert len(set(inds.tolist())) == 5
    # remap round-trips: cmap[orig] gives position of orig in inds
    for pos, orig in enumerate(inds.tolist()):
        assert cmap[orig] == pos
    assert cmap[20] == 5  # background -> K


def test_dynamic_classifier_train_step():
    cfg = weak_cfg("max_size", zeroshot=True)
    cfg.MODEL.DYNAMIC_CLASSIFIER = True
    cfg.MODEL.NUM_SAMPLE_CATS = 4
    model, params, images, sizes, gt = build_with_labels(cfg)
    losses = model.apply(
        params, images, sizes, gt=gt, rng=jax.random.PRNGKey(2), training=True,
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_res5_image_label_losses():
    cfg = weak_cfg("max_size")
    cfg.MODEL.ROI_HEADS.NAME = "CustomRes5ROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p4"]
    model, params, images, sizes, gt = build_with_labels(cfg)
    losses = model.apply(
        params, images, sizes, gt=gt, rng=jax.random.PRNGKey(2), training=True,
        ann_type="image",
    )
    assert np.isfinite(float(losses["image_loss"]))
    assert float(losses["image_loss"]) > 0.0
    assert float(losses["loss_cls"]) == 0.0


def test_dataset_loss_weight_scaling():
    cfg = weak_cfg("max_size")
    cfg.MODEL.DATASET_LOSS_WEIGHT = [1.0, 0.5]
    model, params, images, sizes, gt = build_with_labels(cfg)
    l0 = model.apply(params, images, sizes, gt=gt, rng=jax.random.PRNGKey(2),
                     training=True, dataset_source=jnp.asarray(0))
    l1 = model.apply(params, images, sizes, gt=gt, rng=jax.random.PRNGKey(2),
                     training=True, dataset_source=jnp.asarray(1))
    for k in l0:
        np.testing.assert_allclose(float(l1[k]), float(l0[k]) * 0.5, rtol=1e-5)


def test_weak_batch_zeroes_proposal_losses():
    cfg = weak_cfg("max_size")
    model, params, images, sizes, gt = build_with_labels(cfg)
    losses = model.apply(params, images, sizes, gt=gt, rng=jax.random.PRNGKey(2),
                         training=True, ann_type="image")
    # custom_rcnn.py:190-194: non-bbox batches ignore proposal losses
    assert float(losses["loss_centernet_agn_pos"]) == 0.0
    assert float(losses["image_loss_stage0"]) > 0.0
