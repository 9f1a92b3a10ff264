"""Whole-detector end-to-end output parity vs the reference torch model.

Image in → preprocessing → backbone+FPN → CenterNet proposals → 3-stage
Detic cascade → NMS → mask head → paste, compared against the reference's
full ``CustomRCNN.inference`` + ``_postprocess``
(``DiverGen/divergen/modeling/meta_arch/custom_rcnn.py:87-115,249-332``)
built through detectron2's real config/registry path and loaded into our
model via ``convert_d2_detector``. Small semantic mismatches in NMS
tie-breaks or paste rounding are exactly what SURVEY §7 warns swings APr —
this is the APr guard that runs without LVIS data (VERDICT r2 missing #3).
"""
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).parent))
import ref_loader  # noqa: E402

NUM_CLASSES = 4
IMG = 128


@pytest.fixture(scope="module", autouse=True)
def _install():
    ref_loader.install()
    # torch>=2 compat for the read-only reference: predict_single_level
    # calls .view on a non-contiguous candidate mask (centernet.py:659).
    # channels-last input makes the permute+reshape chain contiguous;
    # values are untouched.
    from centernet.modeling.dense_heads.centernet import CenterNet

    if not getattr(CenterNet, "_contig_patched", False):
        orig = CenterNet.predict_single_level

        def patched(self, grids, heatmap, reg_pred, image_sizes, agn_hm,
                    level, is_proposal=False):
            heatmap = heatmap.contiguous(memory_format=torch.channels_last)
            if agn_hm is not None:
                agn_hm = agn_hm.contiguous()
            return orig(self, grids, heatmap, reg_pred.contiguous(),
                        image_sizes, agn_hm, level, is_proposal=is_proposal)

        CenterNet.predict_single_level = patched
        CenterNet._contig_patched = True


def _ref_cfg():
    from centernet.config import add_centernet_config
    from detectron2.config import get_cfg
    from divergen.config import add_divergen_config

    cfg = get_cfg()
    add_centernet_config(cfg)
    add_divergen_config(cfg)
    m = cfg.MODEL
    m.META_ARCHITECTURE = "CustomRCNN"
    m.DEVICE = "cpu"
    m.PIXEL_MEAN = [123.675, 116.28, 103.53]
    m.PIXEL_STD = [58.395, 57.12, 57.375]
    m.BACKBONE.NAME = "build_p67_resnet_fpn_backbone"
    m.RESNETS.DEPTH = 50
    m.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    m.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    m.PROPOSAL_GENERATOR.NAME = "CenterNet"
    m.CENTERNET.ONLY_PROPOSAL = True
    m.CENTERNET.WITH_AGN_HM = True
    m.CENTERNET.NUM_CLASSES = NUM_CLASSES
    m.CENTERNET.INFERENCE_TH = 0.01
    m.CENTERNET.PRE_NMS_TOPK_TEST = 256
    m.CENTERNET.POST_NMS_TOPK_TEST = 64
    m.CENTERNET.NMS_TH_TEST = 0.7
    m.ROI_HEADS.NAME = "DeticCascadeROIHeads"
    m.ROI_HEADS.NUM_CLASSES = NUM_CLASSES
    m.ROI_HEADS.IN_FEATURES = ["p3", "p4", "p5"]
    m.ROI_HEADS.SCORE_THRESH_TEST = 0.02
    m.ROI_HEADS.NMS_THRESH_TEST = 0.5
    m.ROI_BOX_HEAD.NAME = "FastRCNNConvFCHead"
    m.ROI_BOX_HEAD.NUM_FC = 2
    m.ROI_BOX_HEAD.FC_DIM = 64
    m.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    m.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG = True
    m.ROI_BOX_HEAD.MULT_PROPOSAL_SCORE = True
    m.ROI_BOX_HEAD.USE_SIGMOID_CE = True
    m.MASK_ON = True
    m.ROI_MASK_HEAD.NAME = "MaskRCNNConvUpsampleHead"
    m.ROI_MASK_HEAD.CLS_AGNOSTIC_MASK = True
    m.ROI_MASK_HEAD.NUM_CONV = 2
    m.ROI_MASK_HEAD.CONV_DIM = 32
    m.ROI_MASK_HEAD.POOLER_RESOLUTION = 14
    cfg.TEST.DETECTIONS_PER_IMAGE = 16
    return cfg


def _our_cfg():
    from divergen_tpu.config import get_cfg

    cfg = get_cfg()
    m = cfg.MODEL
    m.RESNETS.DEPTH = 50
    m.CENTERNET.NUM_CLASSES = NUM_CLASSES
    m.CENTERNET.INFERENCE_TH = 0.01
    m.CENTERNET.PRE_NMS_TOPK_TEST = 256
    m.CENTERNET.POST_NMS_TOPK_TEST = 64
    m.CENTERNET.NMS_TH_TEST = 0.7
    m.ROI_HEADS.NUM_CLASSES = NUM_CLASSES
    m.ROI_HEADS.SCORE_THRESH_TEST = 0.02
    m.ROI_HEADS.NMS_THRESH_TEST = 0.5
    m.ROI_BOX_HEAD.NUM_FC = 2
    m.ROI_BOX_HEAD.FC_DIM = 64
    m.ROI_BOX_HEAD.POOLER_RESOLUTION = 7
    m.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG = True
    m.ROI_BOX_HEAD.MULT_PROPOSAL_SCORE = True
    m.ROI_BOX_HEAD.USE_SIGMOID_CE = True
    m.MASK_ON = True
    m.ROI_MASK_HEAD.CLS_AGNOSTIC_MASK = True
    m.ROI_MASK_HEAD.NUM_CONV = 2
    m.ROI_MASK_HEAD.CONV_DIM = 32
    m.ROI_MASK_HEAD.POOLER_RESOLUTION = 14
    cfg.TEST.DETECTIONS_PER_IMAGE = 16
    # cover every above-threshold candidate (64 proposals x 4 classes) so
    # the static pre-NMS cap can't drop the tail the reference keeps
    cfg.TEST.NMS_CANDIDATES = 256
    cfg.FP16 = False
    return cfg


def _mask_iou(a, b):
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return inter / max(union, 1)


@pytest.mark.slow
def test_full_graph_inference_parity():
    import jax
    import jax.numpy as jnp
    from detectron2.modeling import build_model as ref_build

    import divergen.modeling.meta_arch.custom_rcnn  # noqa: F401 (registers)
    import divergen.modeling.roi_heads.detic_roi_heads  # noqa: F401
    from divergen_tpu.evaluation.lvis_evaluator import paste_mask_np
    from divergen_tpu.modeling.meta_arch.rcnn import build_model
    from divergen_tpu.utils.torch_weights import load_d2_detector_into

    torch.manual_seed(0)
    ref = ref_build(_ref_cfg())
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    rng = np.random.RandomState(7)
    img_np = (rng.rand(IMG, IMG, 3) * 255).astype(np.float32)

    with torch.no_grad():
        out = ref.inference([{
            "image": torch.from_numpy(img_np.transpose(2, 0, 1)),
            "file_name": "parity.jpg", "height": IMG, "width": IMG,
        }])
    inst = out[0]["instances"]
    ref_boxes = inst.pred_boxes.tensor.numpy()
    ref_scores = inst.scores.numpy()
    ref_classes = inst.pred_classes.numpy()
    ref_masks = inst.pred_masks.numpy().astype(bool)
    assert len(ref_scores) >= 3, "degenerate reference output — reseed"

    cfg = _our_cfg()
    model = build_model(cfg)
    images = jnp.asarray(img_np[None])
    sizes = jnp.asarray([[IMG, IMG]], jnp.int32)
    gt = {
        "boxes": jnp.asarray([[[4.0, 4, 30, 30]] * 4]),
        "classes": jnp.zeros((1, 4), jnp.int32),
        "valid": jnp.asarray([[True] + [False] * 3]),
        "masks": jnp.ones((1, 4, cfg.MODEL.ROI_MASK_HEAD.GT_SIDE,
                           cfg.MODEL.ROI_MASK_HEAD.GT_SIDE), jnp.float32),
        "instance_source": jnp.zeros((1, 4), jnp.int32),
    }
    key = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda: model.init(key, images, sizes, gt=gt, rng=key, training=True)
    )()
    params = jax.tree.map(jnp.asarray, load_d2_detector_into(params, sd, cfg=cfg))

    dets = jax.jit(
        lambda p, im, sz: model.apply(p, im, sz, training=False)
    )(params, images, sizes)
    dets = {k: np.asarray(v[0]) for k, v in dets.items()}
    keep = dets["valid"] & (dets["scores"] > 0)
    got_boxes = dets["boxes"][keep]
    got_scores = dets["scores"][keep]
    got_classes = dets["classes"][keep]
    probs = 1.0 / (1.0 + np.exp(-dets["mask_logits"][keep]))
    got_masks = np.stack(
        [paste_mask_np(p, b, IMG, IMG) for p, b in zip(probs, got_boxes)]
    ).astype(bool)

    # same detections, score-ordered; every reference detection must have an
    # exact counterpart (class equal, box < 1px, score < 1e-3, mask IoU).
    assert len(got_scores) == len(ref_scores), (
        f"count mismatch ours={len(got_scores)} ref={len(ref_scores)}"
    )
    order_ref = np.argsort(-ref_scores)
    order_got = np.argsort(-got_scores)
    for i, (ri, gi) in enumerate(zip(order_ref, order_got)):
        assert ref_classes[ri] == got_classes[gi], f"det {i} class"
        np.testing.assert_allclose(got_scores[gi], ref_scores[ri], atol=1e-3,
                                   err_msg=f"det {i} score")
        np.testing.assert_allclose(got_boxes[gi], ref_boxes[ri], atol=1.0,
                                   err_msg=f"det {i} box")
        iou = _mask_iou(got_masks[gi], ref_masks[ri])
        assert iou > 0.97, f"det {i} mask IoU {iou:.3f}"
