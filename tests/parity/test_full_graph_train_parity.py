"""Whole-detector TRAINING loss parity vs the reference torch model.

Same composed harness as test_full_graph_parity (real detectron2
config/registry build + convert_d2_detector), but in training mode: one
batch with ground truth through the reference ``CustomRCNN.forward``
(custom_rcnn.py:118-247) and through our ``model.apply(training=True)``;
every shared loss component must match. The randomized pieces are made
set-deterministic (BATCH_SIZE_PER_IMAGE ≥ all candidates with
POSITIVE_FRACTION=1 keeps every proposal — losses are mean-reductions, so
the reference's random permutation is irrelevant), fed loss and masks off.

This is the training-side APr guard: CenterNet GT assignment + heatmap/reg
losses and the 3-stage cascade matching/refinement/classification losses
all composed, not module-by-module.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).parent))
import ref_loader  # noqa: E402
from test_full_graph_parity import IMG, NUM_CLASSES, _our_cfg, _ref_cfg  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _install():
    ref_loader.install()
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


def _train_cfg_overrides(cfg, ours: bool):
    m = cfg.MODEL
    # MASK_ON stays True (the reference roi_heads are built with the mask
    # branch); loss_mask itself is excluded from the strict comparison —
    # the fg sets its two samplers draw differ by design
    m.ROI_BOX_HEAD.USE_FED_LOSS = False
    m.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 512  # >= every candidate: keep all
    m.ROI_HEADS.POSITIVE_FRACTION = 1.0
    m.CENTERNET.PRE_NMS_TOPK_TRAIN = 256
    m.CENTERNET.POST_NMS_TOPK_TRAIN = 64
    m.CENTERNET.NMS_TH_TRAIN = 0.7
    return cfg


@pytest.mark.slow
def test_full_graph_training_loss_parity():
    import jax
    import jax.numpy as jnp
    from detectron2.modeling import build_model as ref_build
    from detectron2.structures import Boxes, Instances

    import divergen.modeling.meta_arch.custom_rcnn  # noqa: F401
    import divergen.modeling.roi_heads.detic_roi_heads  # noqa: F401
    from divergen_tpu.modeling.meta_arch.rcnn import build_model
    from divergen_tpu.utils.torch_weights import load_d2_detector_into

    torch.manual_seed(0)
    ref = ref_build(_train_cfg_overrides(_ref_cfg(), ours=False))
    ref.train()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    rng = np.random.RandomState(11)
    img_np = (rng.rand(IMG, IMG, 3) * 255).astype(np.float32)
    gt_boxes = np.array(
        [[12.0, 20, 70, 90], [50, 40, 120, 110], [4, 80, 40, 126]], np.float32
    )
    gt_classes = np.array([0, 2, 3], np.int64)

    from detectron2.structures import BitMasks

    inst = Instances((IMG, IMG))
    inst.gt_boxes = Boxes(torch.from_numpy(gt_boxes))
    inst.gt_classes = torch.from_numpy(gt_classes)
    bm = np.zeros((3, IMG, IMG), bool)
    for i, (x1, y1, x2, y2) in enumerate(gt_boxes.astype(int)):
        bm[i, y1:y2, x1:x2] = True
    inst.gt_masks = BitMasks(torch.from_numpy(bm))
    from detectron2.utils.events import EventStorage

    with torch.no_grad(), EventStorage():
        ref_losses = ref([{
            "image": torch.from_numpy(img_np.transpose(2, 0, 1)),
            "instances": inst, "file_name": "t.jpg",
            "height": IMG, "width": IMG, "ann_type": "box",
        }])
    ref_losses = {k: float(v) for k, v in ref_losses.items()}

    cfg = _train_cfg_overrides(_our_cfg(), ours=True)
    model = build_model(cfg)
    images = jnp.asarray(img_np[None])
    sizes = jnp.asarray([[IMG, IMG]], jnp.int32)
    n_pad = 4
    gt = {
        "boxes": jnp.asarray(
            np.concatenate([gt_boxes, np.zeros((n_pad - 3, 4), np.float32)])[None]
        ),
        "classes": jnp.asarray(
            np.concatenate([gt_classes, np.zeros(n_pad - 3, np.int64)]).astype(np.int32)[None]
        ),
        "valid": jnp.asarray([[True, True, True, False]]),
        "masks": jnp.ones((1, n_pad, cfg.MODEL.ROI_MASK_HEAD.GT_SIDE,
                           cfg.MODEL.ROI_MASK_HEAD.GT_SIDE), jnp.float32),
        "instance_source": jnp.zeros((1, n_pad), jnp.int32),
    }
    key = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda: model.init(key, images, sizes, gt=gt, rng=key, training=True)
    )()
    params = jax.tree.map(jnp.asarray, load_d2_detector_into(params, sd, cfg=cfg))
    ours = jax.jit(
        lambda p: model.apply(p, images, sizes, gt=gt, rng=key, training=True)
    )(params)
    ours = {k: float(v) for k, v in ours.items()}

    shared = sorted((set(ref_losses) & set(ours)) - {"loss_mask"})
    assert {"loss_centernet_loc", "loss_centernet_agn_pos",
            "loss_centernet_agn_neg", "loss_cls_stage0", "loss_cls_stage1",
            "loss_cls_stage2", "loss_box_reg_stage0", "loss_box_reg_stage1",
            "loss_box_reg_stage2"} <= set(shared), (ref_losses, ours)
    for k in shared:
        np.testing.assert_allclose(
            ours[k], ref_losses[k], rtol=2e-3, atol=2e-4,
            err_msg=f"{k}: ours={ours[k]:.6f} ref={ref_losses[k]:.6f} "
                    f"(all ref={ref_losses}, ours={ours})",
        )
