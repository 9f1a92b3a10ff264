"""End-to-end model tests on random inputs — no weights, no data.

Pattern: detectron2 ``tests/modeling/test_model_e2e.py:12-88`` (build model,
random images, synthetic instances, assert loss shapes/finiteness; also the
empty-ground-truth case).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from divergen_tpu.config import get_cfg
from divergen_tpu.modeling.meta_arch.rcnn import build_model


def small_cfg():
    cfg = get_cfg()
    cfg.MODEL.CENTERNET.NUM_CLASSES = 8
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 8
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 64
    cfg.MODEL.CENTERNET.PRE_NMS_TOPK_TRAIN = 64
    cfg.MODEL.CENTERNET.POST_NMS_TOPK_TRAIN = 32
    cfg.MODEL.CENTERNET.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.CENTERNET.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.TEST.DETECTIONS_PER_IMAGE = 16
    cfg.FP16 = False
    return cfg


def synth_gt(rng, b, n, num_classes, img=128, mask_s=28, n_valid=3):
    xy = rng.rand(b, n, 2) * (img - 40)
    wh = rng.rand(b, n, 2) * 30 + 8
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    return {
        "boxes": jnp.array(boxes),
        "classes": jnp.array(rng.randint(0, num_classes, (b, n)), jnp.int32),
        "valid": jnp.array(np.broadcast_to(np.arange(n)[None] < n_valid, (b, n))),
        "masks": jnp.array((rng.rand(b, n, mask_s, mask_s) > 0.4).astype(np.float32)),
        "instance_source": jnp.zeros((b, n), jnp.int32),
    }


@pytest.fixture(scope="module")
def model_and_params():
    cfg = small_cfg()
    model = build_model(cfg)
    rng = np.random.RandomState(1)
    images = jnp.array(rng.rand(2, 128, 128, 3).astype(np.float32) * 255)
    image_sizes = jnp.array([[128, 128], [100, 120]])
    gt = synth_gt(rng, 2, 8, 8)
    params = model.init(
        jax.random.PRNGKey(0),
        images,
        image_sizes,
        gt=gt,
        rng=jax.random.PRNGKey(1),
        training=True,
    )
    return cfg, model, params, images, image_sizes, gt


def test_train_losses_finite(model_and_params):
    cfg, model, params, images, image_sizes, gt = model_and_params
    losses = model.apply(
        params, images, image_sizes, gt=gt, rng=jax.random.PRNGKey(2), training=True
    )
    expected = {
        "loss_centernet_loc",
        "loss_centernet_agn_pos",
        "loss_centernet_agn_neg",
        "loss_cls_stage0",
        "loss_box_reg_stage0",
        "loss_cls_stage1",
        "loss_box_reg_stage1",
        "loss_cls_stage2",
        "loss_box_reg_stage2",
        "loss_mask",
    }
    assert set(losses.keys()) == expected
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{k} not finite"


def test_train_losses_empty_gt(model_and_params):
    cfg, model, params, images, image_sizes, gt = model_and_params
    gt_empty = dict(gt)
    gt_empty["valid"] = jnp.zeros_like(gt["valid"])
    losses = model.apply(
        params, images, image_sizes, gt=gt_empty, rng=jax.random.PRNGKey(2), training=True
    )
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{k} not finite with empty gt"


def test_inference_shapes(model_and_params):
    cfg, model, params, images, image_sizes, gt = model_and_params
    dets = model.apply(params, images, image_sizes, training=False)
    k = cfg.TEST.DETECTIONS_PER_IMAGE
    assert dets["boxes"].shape == (2, k, 4)
    assert dets["scores"].shape == (2, k)
    assert dets["classes"].shape == (2, k)
    assert dets["mask_logits"].shape[:2] == (2, k)
    assert np.isfinite(np.asarray(dets["boxes"])).all()


def test_grads_flow(model_and_params):
    cfg, model, params, images, image_sizes, gt = model_and_params

    def loss_fn(p):
        losses = model.apply(
            p, images, image_sizes, gt=gt, rng=jax.random.PRNGKey(2), training=True
        )
        return sum(jax.tree_util.tree_leaves(losses))

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
    assert total > 0


def test_refine_mask_head_train_and_infer():
    cfg = small_cfg()
    cfg.MODEL.ROI_MASK_HEAD.NAME = "RefineMaskHead"
    model = build_model(cfg)
    rng = np.random.RandomState(3)
    images = jnp.array(rng.rand(1, 128, 128, 3).astype(np.float32) * 255)
    sizes = jnp.array([[128, 128]])
    gt = synth_gt(rng, 1, 8, 8)
    params = model.init(
        jax.random.PRNGKey(0), images, sizes, gt=gt, rng=jax.random.PRNGKey(1), training=True
    )
    losses = model.apply(
        params, images, sizes, gt=gt, rng=jax.random.PRNGKey(2), training=True
    )
    assert "loss_mask" in losses
    assert np.isfinite(float(losses["loss_mask"]))
    dets = model.apply(params, images, sizes, training=False)
    # refine head: final stage at 14 * 2^3 = 112 (stage_sup_size[-1])
    assert dets["mask_logits"].shape[2:] == (112, 112)


def test_refine_mask_with_semantic_loss():
    cfg = small_cfg()
    cfg.MODEL.ROI_MASK_HEAD.NAME = "RefineMaskHead"
    cfg.MODEL.ROI_MASK_HEAD.SEM_SEG_ON = True
    model = build_model(cfg)
    rng = np.random.RandomState(4)
    images = jnp.array(rng.rand(1, 128, 128, 3).astype(np.float32) * 255)
    sizes = jnp.array([[128, 128]])
    gt = synth_gt(rng, 1, 8, 8)
    gt["sem_seg"] = jnp.array((rng.rand(1, 16, 16) > 0.7).astype(np.float32))
    params = model.init(
        jax.random.PRNGKey(0), images, sizes, gt=gt, rng=jax.random.PRNGKey(1), training=True
    )
    losses = model.apply(
        params, images, sizes, gt=gt, rng=jax.random.PRNGKey(2), training=True
    )
    assert "loss_semantic" in losses
    assert np.isfinite(float(losses["loss_semantic"]))


def test_res5_roi_heads_train_and_infer():
    cfg = small_cfg()
    cfg.MODEL.ROI_HEADS.NAME = "CustomRes5ROIHeads"
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p4"]
    model = build_model(cfg)
    rng = np.random.RandomState(5)
    images = jnp.array(rng.rand(1, 128, 128, 3).astype(np.float32) * 255)
    sizes = jnp.array([[128, 128]])
    gt = synth_gt(rng, 1, 8, 8)
    params = model.init(
        jax.random.PRNGKey(0), images, sizes, gt=gt, rng=jax.random.PRNGKey(1), training=True
    )
    losses = model.apply(
        params, images, sizes, gt=gt, rng=jax.random.PRNGKey(2), training=True
    )
    assert "loss_cls" in losses and "loss_mask" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    dets = model.apply(params, images, sizes, training=False)
    assert dets["boxes"].shape[2] == 4


@pytest.mark.slow
def test_standalone_centernet_detector():
    """META_ARCHITECTURE CenterNetDetector: classwise losses in training,
    class-aware NMS'd detections at inference (reference
    centernet_detector.py:12-78 with ONLY_PROPOSAL=False)."""
    import jax
    import jax.numpy as jnp

    from divergen_tpu.config import get_cfg
    from divergen_tpu.modeling.meta_arch.rcnn import build_model

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "CenterNetDetector"
    cfg.MODEL.CENTERNET.NUM_CLASSES = 4
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.CENTERNET.POST_NMS_TOPK_TEST = 16
    model = build_model(cfg)
    assert model.centernet_cfg.only_proposal is False

    B, H, W, N = 1, 128, 128, 4
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(B, H, W, 3) * 255, jnp.float32)
    sizes = jnp.asarray([[H, W]], jnp.int32)
    gt = {
        "boxes": jnp.asarray([[[8.0, 8.0, 60.0, 70.0], [30, 40, 100, 90],
                               [0, 0, 0, 0], [0, 0, 0, 0]]], jnp.float32),
        "classes": jnp.asarray([[1, 3, 0, 0]], jnp.int32),
        "valid": jnp.asarray([[True, True, False, False]]),
    }
    key = jax.random.PRNGKey(0)
    params = model.init(key, imgs, sizes, gt=gt, rng=key, training=True)
    # no ROI-head params materialize (flax init traces __call__ only)
    assert "roi_heads" not in params["params"]
    losses = jax.jit(
        lambda p: model.apply(p, imgs, sizes, gt=gt, rng=key, training=True)
    )(params)
    for k in ("loss_centernet_pos", "loss_centernet_neg", "loss_centernet_loc",
              "loss_centernet_agn_pos", "loss_centernet_agn_neg"):
        assert k in losses and np.isfinite(float(losses[k])), (k, losses.get(k))
    dets = model.apply(params, imgs, sizes, training=False)
    assert dets["boxes"].shape == (B, 16, 4)
    assert dets["classes"].shape == (B, 16)
    assert set(np.asarray(dets["classes"]).ravel().tolist()) <= set(range(4))
    assert np.isfinite(np.asarray(dets["scores"])).all()


@pytest.mark.slow
def test_dla_bifpn_detector():
    """CenterNet2 real-time backbone pair: DLA-34 bottom-up + BiFPN neck
    (build_dla_bifpn_backbone, centernet/modeling/backbone/)."""
    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_dla_bifpn_backbone"
    cfg.MODEL.CENTERNET.NUM_CLASSES = 4
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.CENTERNET.PRE_NMS_TOPK_TRAIN = 32
    cfg.MODEL.CENTERNET.POST_NMS_TOPK_TRAIN = 16
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_MASK_HEAD.GT_SIDE = 16
    cfg.MODEL.BIFPN.NUM_BIFPN = 1
    model = build_model(cfg)
    assert model.fpn_kind == "bifpn" and model.backbone_name == "dla34"
    B, H, N = 1, 128, 4
    imgs = jnp.zeros((B, H, H, 3), jnp.float32)
    sizes = jnp.asarray([[H, H]], jnp.int32)
    gt = {"boxes": jnp.asarray([[[8.0, 8, 60, 60]] * N]),
          "classes": jnp.zeros((B, N), jnp.int32),
          "valid": jnp.asarray([[True] + [False] * (N - 1)]),
          "masks": jnp.ones((B, N, 16, 16), jnp.float32),
          "instance_source": jnp.zeros((B, N), jnp.int32)}
    key = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda: model.init(key, imgs, sizes, gt=gt, rng=key, training=True)
    )()
    losses = model.apply(params, imgs, sizes, gt=gt, rng=key, training=True)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, float(v))
