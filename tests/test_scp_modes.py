"""Class-conditioned self-copy source modes + blank-ratio rescale + RFS
source weighting (custom_build_copypaste_mapper.py:783-854,
custom_copypaste.py:343-391) and the DINOv2 filtration tower option
(get_image_feature.py:34-53)."""
import numpy as np
import pytest

from divergen_tpu.config import get_cfg
from divergen_tpu.data.copy_paste_mapper import CopyPasteMapper
from divergen_tpu.data.dataset_mapper import DatasetMapper
from tests.test_mapper_loader import image_dataset, small_cfg  # noqa: F401


def make_mapper(cfg, dataset):
    cfg.INPUT.COPY_METHOD = "self_copy"
    cfg.INPUT.INST_POOL = False
    m = CopyPasteMapper(DatasetMapper(cfg, True), cfg)
    m.set_dataset(dataset)
    return m


@pytest.mark.parametrize("mode", ["in_domain", "cas", "the_cls"])
def test_class_conditioned_source_modes(image_dataset, mode):  # noqa: F811
    cfg = small_cfg()
    cfg.INPUT.SELF_COPY_MODE = mode
    if mode == "the_cls":
        cfg.INPUT.SELF_COPY_CLS = [1]
    m = make_mapper(cfg, image_dataset)
    assert m.per_cat_map, "per-category source index must be built"
    s = m(image_dataset[0], np.random.default_rng(5))
    if s["patch_valid"].any():
        pasted_cls = set(s["patch_classes"][s["patch_valid"]].tolist())
        if mode == "the_cls":
            assert pasted_cls <= {1}
        elif mode == "in_domain":
            # dst image 0 contains classes {0, 1}
            assert pasted_cls <= {0, 1}


def test_blank_ratio_rescales_sources(image_dataset):  # noqa: F811
    cfg = small_cfg()
    cfg.INPUT.BLANK_RATIO = 1e-6  # force the rescale branch
    m = make_mapper(cfg, image_dataset)
    rng = np.random.default_rng(6)
    # dst_size tiny vs the 128-canvas source boxes → ratio exceeds threshold
    out = m._self_copy_patches(rng, 3, 32, dst_gt=None, dst_size=(10, 10))
    if out["patch_valid"].any():
        k = np.where(out["patch_valid"])[0][0]
        x1, y1, x2, y2 = out["patch_boxes"][k]
        # boxes were scaled towards the tiny destination
        assert (x2 - x1) <= 12 and (y2 - y1) <= 12


def test_rfs_v0_source_probs(image_dataset):  # noqa: F811
    cfg = small_cfg()
    cfg.INPUT.USE_RFS = True
    cfg.INPUT.RFS_VERSION = 0
    m = make_mapper(cfg, image_dataset)
    assert m.repeat_probs is not None
    assert abs(m.repeat_probs.sum() - 1.0) < 1e-6


def test_rfs_v1_expands_dataset(image_dataset):  # noqa: F811
    cfg = small_cfg()
    cfg.INPUT.USE_RFS = True
    cfg.INPUT.RFS_VERSION = 1
    cfg.DATALOADER.REPEAT_THRESHOLD = 0.9  # aggressive repeats on 3 images
    m = make_mapper(cfg, image_dataset)
    assert len(m.dataset) >= len(image_dataset)
    assert m.repeat_probs is None


def test_dinov2_tower_shapes():
    import jax
    import jax.numpy as jnp

    from divergen_tpu.modeling.backbone.dinov2 import DinoV2, dinov2_preprocess

    model = DinoV2(dim=32, depth=2, heads=4, swiglu=True, patch=14)
    imgs = jnp.zeros((2, 56, 56, 3))
    params = model.init(jax.random.PRNGKey(0), dinov2_preprocess(imgs))
    out = model.apply(params, dinov2_preprocess(imgs))
    assert out.shape == (2, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_res2net_backbone_shapes():
    import jax
    import jax.numpy as jnp

    from divergen_tpu.modeling.backbone.resnet import Res2Net

    model = Res2Net(depth=50, width=8, scale=4, out_features=("res3", "res4", "res5"))
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out["res3"].shape == (1, 8, 8, 512)
    assert out["res5"].shape == (1, 2, 2, 2048)


def test_lvis_to_cityscapes_dump(tmp_path):
    import json

    from divergen_tpu.evaluation.cityscapes_eval import LVISToCityscapesInstanceEvaluator

    mapping = {"0": 26, "2": 24}  # lvis 0 -> car, lvis 2 -> person
    mp = tmp_path / "map.json"
    mp.write_text(json.dumps(mapping))
    ev = LVISToCityscapesInstanceEvaluator(str(mp), str(tmp_path / "preds"))
    outputs = {
        "valid": np.array([[True, True, True]]),
        "boxes": np.array([[[1, 1, 8, 8], [2, 2, 9, 9], [0, 0, 4, 4]]], np.float32),
        "scores": np.array([[0.9, 0.8, 0.7]], np.float32),
        "classes": np.array([[0, 1, 2]], np.int32),  # class 1 unmapped -> dropped
        "mask_logits": np.ones((1, 3, 4, 4), np.float32) * 5,
    }
    inputs = [{"image_id": 1, "file_name": "frankfurt_000000_000294_leftImg8bit.png",
               "height": 16, "width": 16}]
    ev.process(inputs, outputs)
    txt = (tmp_path / "preds" / "frankfurt_000000_000294_leftImg8bit_pred.txt").read_text()
    lines = txt.strip().split("\n")
    assert len(lines) == 2
    assert "26" in lines[0] and "car" in lines[0]
    assert "24" in lines[1] and "person" in lines[1]
    res = ev.evaluate()
    assert "segm" in res  # scoring gated on cityscapesscripts
