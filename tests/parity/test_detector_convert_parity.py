"""Detector-checkpoint converter parity vs the reference torch modules.

Builds real reference modules (CenterNetHead, FastRCNNConvFCHead,
ZeroShotClassifier, MaskRCNNConvUpsampleHead), takes their state_dicts in
the exact key layout a DiverGen/Detic checkpoint uses, runs them through
``convert_d2_detector``, and asserts forward parity of our flax modules on
random inputs. This is the load-a-published-checkpoint path
(DetectionCheckpointer, ``detectron2/checkpoint/``)."""
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))
import ref_loader  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _install():
    ref_loader.install()


def _prefix(sd, pfx):
    return {f"{pfx}{k}": v.detach().numpy() for k, v in sd.items()}


@pytest.mark.parametrize("only_proposal", [True, False])
def test_centernet_head_forward_parity(only_proposal):
    import jax
    import jax.numpy as jnp
    import torch

    from centernet.modeling.dense_heads.centernet_head import (
        CenterNetHead as RefHead,
    )
    from divergen_tpu.modeling.centernet.centernet import (
        CenterNetConfig,
        CenterNetHead,
    )
    from divergen_tpu.utils.torch_weights import convert_d2_detector

    torch.manual_seed(0)
    ch, levels = 64, 3
    ref = RefHead(
        in_channels=ch, num_levels=levels, num_classes=4, with_agn_hm=True,
        only_proposal=only_proposal, norm="GN", num_cls_convs=2,
        num_box_convs=2, num_share_convs=1,
    ).eval()
    sd = _prefix(ref.state_dict(), "proposal_generator.centernet_head.")
    conv = convert_d2_detector(sd, fpn_in_features=())
    assert not conv["_stats"]["unmapped"], conv["_stats"]["unmapped"]

    cfg = CenterNetConfig(
        num_share_convs=1, num_box_convs=2, num_cls_convs=2, norm="GN",
        only_proposal=only_proposal, with_agn_hm=True, num_classes=4,
    )
    head = CenterNetHead(cfg)
    rng = np.random.RandomState(1)
    feats_nhwc = [
        jnp.asarray(rng.randn(1, 16 // (2 ** l), 16 // (2 ** l), ch), jnp.float32)
        for l in range(levels)
    ]
    params = head.init(jax.random.PRNGKey(0), feats_nhwc)
    import flax

    params = flax.core.unfreeze(params)
    params["params"] = conv["centernet_head"]
    agn, reg, clss = head.apply(params, feats_nhwc)

    with torch.no_grad():
        ref_cls, ref_reg, ref_agn = ref(
            [torch.tensor(np.asarray(f).transpose(0, 3, 1, 2)) for f in feats_nhwc]
        )
    if not only_proposal:
        for l in range(levels):
            np.testing.assert_allclose(
                np.asarray(clss[l]), ref_cls[l].numpy().transpose(0, 2, 3, 1),
                rtol=2e-4, atol=2e-4, err_msg=f"cls level {l}",
            )
    for l in range(levels):
        np.testing.assert_allclose(
            np.asarray(agn[l]), ref_agn[l].numpy()[:, 0], rtol=2e-4, atol=2e-4,
            err_msg=f"agn level {l}",
        )
        np.testing.assert_allclose(
            np.asarray(reg[l]), ref_reg[l].numpy().transpose(0, 2, 3, 1),
            rtol=2e-4, atol=2e-4, err_msg=f"reg level {l}",
        )


def test_box_and_mask_head_forward_parity():
    import jax
    import jax.numpy as jnp
    import torch

    from detectron2.layers import ShapeSpec
    from detectron2.modeling.roi_heads.box_head import FastRCNNConvFCHead as RefBox
    from detectron2.modeling.roi_heads.mask_head import (
        MaskRCNNConvUpsampleHead as RefMask,
    )
    from divergen.modeling.roi_heads.zero_shot_classifier import ZeroShotClassifier
    from divergen_tpu.modeling.roi_heads.cascade_heads import (
        DeticOutputLayers,
        FastRCNNConvFCHead,
        MaskRCNNConvUpsampleHead,
    )
    from divergen_tpu.utils.torch_weights import convert_d2_detector

    torch.manual_seed(1)
    in_ch, res, fc_dim, zs_dim, n_cls = 16, 7, 32, 24, 5
    ref_boxes = [
        RefBox(input_shape=ShapeSpec(channels=in_ch, height=res, width=res),
               conv_dims=[], fc_dims=[fc_dim, fc_dim]).eval()
        for _ in range(3)
    ]
    ref_zs = [
        ZeroShotClassifier(
            input_shape=ShapeSpec(channels=fc_dim), num_classes=n_cls,
            zs_weight_path="rand", zs_weight_dim=zs_dim, use_bias=0.0,
            norm_weight=True, norm_temperature=50.0,
        ).eval()
        for _ in range(3)
    ]
    ref_bbox_pred = [torch.nn.Linear(fc_dim, 4) for _ in range(3)]
    ref_mask = RefMask(
        input_shape=ShapeSpec(channels=in_ch, height=14, width=14),
        num_classes=1, conv_dims=[24, 24, 24, 24, 24],
    ).eval()

    sd = {}
    for k in range(3):
        sd.update(_prefix(ref_boxes[k].state_dict(), f"roi_heads.box_head.{k}."))
        sd.update(_prefix(ref_zs[k].state_dict(), f"roi_heads.box_predictor.{k}.cls_score."))
        sd.update(_prefix(ref_bbox_pred[k].state_dict(), f"roi_heads.box_predictor.{k}.bbox_pred."))
    sd.update(_prefix(ref_mask.state_dict(), "roi_heads.mask_head."))
    conv = convert_d2_detector(sd, fpn_in_features=(), use_zeroshot=True)
    assert not conv["_stats"]["unmapped"], conv["_stats"]["unmapped"]

    rng = np.random.RandomState(2)
    x = rng.randn(6, res, res, in_ch).astype(np.float32)

    # stage 0 box head + zs predictor
    bh = FastRCNNConvFCHead(fc_dim=fc_dim, num_fc=2)
    bparams = {"params": conv["roi_heads"]["box_head0"]}
    # NHWC in, NCHW-flatten reference: the converter permutes fc1's input
    # axis (torch flattens c·H·W+y·W+x, we flatten y·W·C+x·C+c) — feeding
    # both sides their NATIVE layout is the honest test (a round-2 version
    # flattened identically on both sides and masked a converter bug)
    with torch.no_grad():
        ref_feat = ref_boxes[0](torch.tensor(x.transpose(0, 3, 1, 2)))
    ours_feat = np.asarray(bh.apply(bparams, jnp.asarray(x)))
    np.testing.assert_allclose(ours_feat, ref_feat.numpy(), rtol=2e-4, atol=2e-4)

    pred = DeticOutputLayers(num_classes=n_cls, use_zeroshot_cls=True, zs_dim=zs_dim)
    pparams = pred.init(jax.random.PRNGKey(3), jnp.asarray(ref_feat.numpy()))
    import flax

    pparams = flax.core.unfreeze(pparams)
    for key, val in conv["roi_heads"]["box_predictor0"].items():
        pparams["params"][key] = val
    scores, deltas, _ = pred.apply(pparams, jnp.asarray(ref_feat.numpy()))
    with torch.no_grad():
        ref_scores = ref_zs[0](ref_feat)
        ref_deltas = ref_bbox_pred[0](ref_feat)
    np.testing.assert_allclose(
        np.asarray(scores)[:, :n_cls], ref_scores.numpy()[:, :n_cls],
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_allclose(np.asarray(deltas), ref_deltas.numpy(),
                               rtol=2e-4, atol=2e-4)

    # mask head
    mh = MaskRCNNConvUpsampleHead(num_conv=4, conv_dim=24)
    xm = rng.randn(2, 14, 14, in_ch).astype(np.float32)
    mparams = {"params": conv["roi_heads"]["mask_head"]}
    ours_m = np.asarray(mh.apply(mparams, jnp.asarray(xm)))
    with torch.no_grad():
        ref_m = ref_mask.layers(torch.tensor(xm.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours_m, ref_m[:, 0], rtol=2e-4, atol=2e-4)


def test_fpn_and_full_coverage():
    """FPN lateral/output/top-block mapping + nothing left unmapped on a
    composite checkpoint."""
    import torch

    from divergen_tpu.utils.torch_weights import convert_d2_detector

    torch.manual_seed(2)
    sd = {}
    for s, f in zip((3, 4, 5), ("res3", "res4", "res5")):
        lat = torch.nn.Conv2d(32, 16, 1)
        out = torch.nn.Conv2d(16, 16, 3, padding=1)
        sd.update(_prefix(lat.state_dict(), f"backbone.fpn_lateral{s}."))
        sd.update(_prefix(out.state_dict(), f"backbone.fpn_output{s}."))
    for p in ("p6", "p7"):
        blk = torch.nn.Conv2d(16, 16, 3, stride=2, padding=1)
        sd.update(_prefix(blk.state_dict(), f"backbone.top_block.{p}."))
    sd["pixel_mean"] = np.zeros(3, np.float32)  # ignorable buffer
    conv = convert_d2_detector(sd, fpn_in_features=("res3", "res4", "res5"))
    assert not conv["_stats"]["unmapped"], conv["_stats"]["unmapped"]
    fpn = conv["fpn"]
    assert set(fpn) == {
        "lateral_res3", "lateral_res4", "lateral_res5",
        "output_res3", "output_res4", "output_res5", "top_p6", "top_p7",
    }
    assert fpn["lateral_res3"]["conv"]["kernel"].shape == (1, 1, 32, 16)
    assert fpn["top_p6"]["conv"]["kernel"].shape == (3, 3, 16, 16)


@pytest.mark.slow
def test_converted_tree_mounts_into_real_params():
    """Every path convert_d2_detector emits must exist in a real
    CustomRCNN init tree — otherwise load_d2_detector_into would silently
    skip it as 'unknown' (DetectionCheckpointer semantics hide typos)."""
    import jax
    import jax.numpy as jnp
    import torch

    from centernet.modeling.dense_heads.centernet_head import (
        CenterNetHead as RefHead,
    )
    from detectron2.layers import ShapeSpec
    from detectron2.modeling.backbone.resnet import BasicStem, ResNet as RefResNet
    from detectron2.modeling.roi_heads.box_head import FastRCNNConvFCHead as RefBox
    from detectron2.modeling.roi_heads.mask_head import (
        MaskRCNNConvUpsampleHead as RefMask,
    )
    from divergen_tpu.config import get_cfg
    from divergen_tpu.modeling.meta_arch.rcnn import build_model
    from divergen_tpu.utils.torch_weights import convert_d2_detector

    torch.manual_seed(11)
    sd = {}
    resnet = RefResNet(
        BasicStem(norm="FrozenBN"),
        RefResNet.make_default_stages(50, norm="FrozenBN", stride_in_1x1=True),
        out_features=["res3", "res4", "res5"],
    )
    sd.update(_prefix(resnet.state_dict(), "backbone.bottom_up."))
    for s in (3, 4, 5):
        sd.update(_prefix(torch.nn.Conv2d(8, 8, 1).state_dict(), f"backbone.fpn_lateral{s}."))
        sd.update(_prefix(torch.nn.Conv2d(8, 8, 3).state_dict(), f"backbone.fpn_output{s}."))
    for p in ("p6", "p7"):
        sd.update(_prefix(torch.nn.Conv2d(8, 8, 3).state_dict(), f"backbone.top_block.{p}."))
    head = RefHead(in_channels=32, num_levels=5, num_classes=3, with_agn_hm=True,
                   only_proposal=True, norm="GN", num_cls_convs=0,
                   num_box_convs=2, num_share_convs=0)
    sd.update(_prefix(head.state_dict(), "proposal_generator.centernet_head."))
    for k in range(3):
        sd.update(_prefix(
            RefBox(input_shape=ShapeSpec(channels=8, height=7, width=7),
                   conv_dims=[], fc_dims=[8, 8]).state_dict(),
            f"roi_heads.box_head.{k}."))
        sd.update(_prefix(torch.nn.Linear(8, 4).state_dict(),
                          f"roi_heads.box_predictor.{k}.cls_score."))
        sd.update(_prefix(torch.nn.Linear(8, 4).state_dict(),
                          f"roi_heads.box_predictor.{k}.bbox_pred."))
    sd.update(_prefix(
        RefMask(input_shape=ShapeSpec(channels=8, height=14, width=14),
                num_classes=1, conv_dims=[8, 8, 8, 8, 8]).state_dict(),
        "roi_heads.mask_head."))
    conv = convert_d2_detector(sd, fpn_in_features=("res3", "res4", "res5"))
    conv.pop("_stats")

    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 50
    cfg.MODEL.CENTERNET.NUM_CLASSES = 4
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.CENTERNET.PRE_NMS_TOPK_TRAIN = 32
    cfg.MODEL.CENTERNET.POST_NMS_TOPK_TRAIN = 16
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_MASK_HEAD.GT_SIDE = 16
    model = build_model(cfg)
    B, H, N = 1, 64, 4
    imgs = jnp.zeros((B, H, H, 3), jnp.float32)
    sizes = jnp.asarray([[H, H]], jnp.int32)
    gt = {"boxes": jnp.asarray([[[4.0, 4, 30, 30]] * N]),
          "classes": jnp.zeros((B, N), jnp.int32),
          "valid": jnp.asarray([[True] + [False] * (N - 1)]),
          "masks": jnp.ones((B, N, 16, 16), jnp.float32),
          "instance_source": jnp.zeros((B, N), jnp.int32)}
    key = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda: model.init(key, imgs, sizes, gt=gt, rng=key, training=True)
    )()["params"]

    missing = []

    def walk(conv_node, params_node, path):
        if not isinstance(conv_node, dict):
            if params_node is None:
                missing.append(path)
            return
        for k, v in conv_node.items():
            walk(v, params_node.get(k) if isinstance(params_node, dict) else None,
                 f"{path}/{k}")

    walk(conv, params, "")
    assert not missing, f"converted paths not in the real tree: {missing[:10]}"
