"""Swin backbone shape/gradient tests (pattern: detectron2 tests/modeling
random-input no-weights tests, SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from divergen_tpu.modeling.backbone.swin import SwinTransformer, _shift_attn_mask


def test_swin_shapes():
    m = SwinTransformer.from_size("T")
    x = jnp.zeros((2, 96, 128, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = jax.jit(lambda p, x: m.apply(p, x))(params, x)
    assert out["s2"].shape == (2, 24, 32, 96)
    assert out["s3"].shape == (2, 12, 16, 192)
    assert out["s4"].shape == (2, 6, 8, 384)
    assert out["s5"].shape == (2, 3, 4, 768)


def test_swin_nonmultiple_input_padding():
    # H,W not multiples of window*patch: internal padding must keep shapes
    m = SwinTransformer.from_size("T")
    x = jnp.zeros((1, 100, 130, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out["s2"].shape[1:3] == (25, 33)


def test_swin_grads_finite():
    m = SwinTransformer.from_size("T")
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)

    def loss(p):
        out = m.apply(p, x)
        return sum(jnp.sum(v**2) for v in out.values())

    g = jax.grad(loss)(params)
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()


def test_shift_mask_blocks_cross_region():
    mask = _shift_attn_mask(14, 14, 7, 3)
    assert mask.shape == (4, 49, 49)
    # the first (interior) window has no region boundary → all-zero mask
    assert np.all(mask[0] == 0)
    # boundary windows must mask something
    assert np.any(mask[-1] < 0)


def test_droppath_deterministic_by_default():
    sw = SwinTransformer(embed_dim=32, depths=(2,), num_heads=(2,), window=4, drop_path_rate=0.5)
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 16, 3))
    p = sw.init(jax.random.PRNGKey(0), x)
    a = sw.apply(p, x, deterministic=True)
    b = sw.apply(p, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(a["s2"]), np.asarray(b["s2"]))
    # stochastic path requires dropout rng and differs across keys
    c = sw.apply(p, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)})
    d = sw.apply(p, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(c["s2"]), np.asarray(d["s2"]))


def test_convnext_backbone_shapes():
    from divergen_tpu.modeling.backbone.convnext import ConvNeXt

    m = ConvNeXt(depths=(1, 1, 1, 1), dims=(16, 32, 64, 128))
    x = jnp.zeros((1, 64, 64, 3))
    p = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(p, x)
    assert out["c2"].shape == (1, 16, 16, 16)
    assert out["c5"].shape == (1, 2, 2, 128)


def test_vitdet_backbone_pyramid():
    from divergen_tpu.modeling.backbone.vit import ViT, ViTDet

    m = ViTDet(vit=ViT(dim=32, layers=2, heads=2, window=2, global_layers=(1,)), out_channels=32)
    x = jnp.zeros((1, 64, 64, 3))
    p = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(p, x)
    assert out["p2"].shape == (1, 16, 16, 32)
    assert out["p4"].shape == (1, 4, 4, 32)
    assert out["p7"].shape == (1, 1, 1, 32)


def test_build_model_vitdet_and_convnext_e2e():
    from divergen_tpu.config import get_cfg
    from divergen_tpu.modeling.meta_arch.rcnn import build_model

    for name, size_field in [("build_vit_fpn_backbone", None), ("build_convnext_fpn_backbone", None)]:
        cfg = get_cfg()
        cfg.MODEL.BACKBONE.NAME = name
        cfg.MODEL.VIT_SIZE = "T"
        cfg.MODEL.CENTERNET.NUM_CLASSES = 4
        cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
        cfg.MODEL.CENTERNET.PRE_NMS_TOPK_TEST = 32
        cfg.MODEL.CENTERNET.POST_NMS_TOPK_TEST = 16
        cfg.TEST.DETECTIONS_PER_IMAGE = 8
        cfg.FP16 = False
        model = build_model(cfg)
        x = jnp.zeros((1, 128, 128, 3))
        sizes = jnp.array([[128, 128]])
        params = model.init(jax.random.PRNGKey(0), x, sizes, training=False)
        dets = model.apply(params, x, sizes, training=False)
        assert dets["boxes"].shape == (1, 8, 4), name
