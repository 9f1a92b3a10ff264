"""tools/ CLI tests: prompt generator, pool merger, classifier truncation."""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.generate_prompt import main as gen_prompt
from tools.merge_inst_pool_json import main as merge_pools
from tools.convert_imgnet_model_to_lvis import truncate_tree


def test_generate_prompt(tmp_path):
    cats = [
        {"id": 1, "name": "aerosol_can", "def": "a dispenser that forces a liquid out"},
        {"id": 2, "name": "air_conditioner", "def": "a machine"},
    ]
    (tmp_path / "cats.json").write_text(json.dumps(cats))
    assert gen_prompt(["--in_json_path", str(tmp_path / "cats.json"),
                       "--out_txt_dir", str(tmp_path / "prompts")]) == 0
    txt = (tmp_path / "prompts" / "1.txt").read_text()
    assert txt == "a photo of a single aerosol can, a dispenser that forces a liquid out, in a white background\n"


def test_merge_pools(tmp_path):
    (tmp_path / "a.json").write_text(json.dumps({"1": ["/old/x.png"], "2": ["/old/y.png"]}))
    (tmp_path / "b.json").write_text(json.dumps({"1": ["/p/z.png"]}))
    out = tmp_path / "merged.json"
    assert merge_pools([
        "--inst_pool_path", str(tmp_path / "a.json"), str(tmp_path / "b.json"),
        "--out_inst_pool_path", str(out),
        "--enable_replace", "--before_prefix", "/old", "/p",
        "--after_prefix", "/new", "/q",
    ]) == 0
    merged = json.load(open(out))
    assert merged["1"] == ["/new/x.png", "/q/z.png"]
    assert merged["2"] == ["/new/y.png"]


def test_truncate_tree():
    tree = {
        "roi_heads": {
            "box_predictor0": {
                "cls_score": {
                    "kernel": np.arange(8 * 6, dtype=np.float32).reshape(8, 6),
                    "bias": np.arange(6, dtype=np.float32),
                }
            },
            "mask_head": {"kernel": np.ones((4, 6), np.float32)},
        }
    }
    out = truncate_tree(tree, n_in=5, n_out=3)
    k = out["roi_heads"]["box_predictor0"]["cls_score"]["kernel"]
    b = out["roi_heads"]["box_predictor0"]["cls_score"]["bias"]
    assert k.shape == (8, 4) and b.shape == (4,)
    np.testing.assert_array_equal(b, [0, 1, 2, 5])  # first 3 classes + bg
    # unrelated heads untouched
    assert out["roi_heads"]["mask_head"]["kernel"].shape == (4, 6)


def test_lvis_to_coco_results(tmp_path):
    import json

    from tools.lvis_to_coco_results import main as convert

    (tmp_path / "lvis.json").write_text(json.dumps({
        "categories": [
            {"id": 1, "name": "banana", "synonyms": ["banana"]},
            {"id": 2, "name": "weird_thing", "synonyms": ["weird_thing"]},
        ]
    }))
    (tmp_path / "coco.json").write_text(json.dumps({
        "categories": [{"id": 52, "name": "banana"}]
    }))
    (tmp_path / "res.json").write_text(json.dumps([
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 5, 5], "score": 0.9},
        {"image_id": 1, "category_id": 2, "bbox": [0, 0, 5, 5], "score": 0.8},
    ]))
    assert convert(["--lvis_json", str(tmp_path / "lvis.json"),
                    "--coco_json", str(tmp_path / "coco.json"),
                    "--results", str(tmp_path / "res.json"),
                    "--out", str(tmp_path / "out.json")]) == 0
    out = json.load(open(tmp_path / "out.json"))
    assert len(out) == 1 and out[0]["category_id"] == 52


def test_reset_cls_test():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from divergen_tpu.modeling.meta_arch.rcnn import reset_cls_test

    params = {"params": {"roi_heads": {"box_predictor0": {"zs_weight": jnp.zeros((4, 3))},
                                       "box_head0": {"fc1": {"kernel": jnp.ones((2, 2))}}}}}
    new_w = np.arange(12, dtype=np.float32).reshape(4, 3)
    out = reset_cls_test(params, new_w)
    np.testing.assert_array_equal(
        np.asarray(out["params"]["roi_heads"]["box_predictor0"]["zs_weight"]), new_w
    )
    np.testing.assert_array_equal(
        np.asarray(out["params"]["roi_heads"]["box_head0"]["fc1"]["kernel"]), 1
    )


def test_reset_cls_test_new_vocab_size():
    """Per-test-set vocabulary swap may change the class count (ref
    train_net.py:89-93 + MODEL.TEST_NUM_CLASSES); only zs_dim must match."""
    import jax.numpy as jnp
    import numpy as np

    from divergen_tpu.modeling.meta_arch.rcnn import reset_cls_test

    params = {"params": {"p": {"zs_weight": jnp.zeros((4, 3))}}}
    new_w = np.ones((4, 7), np.float32)  # 3 -> 7 classes
    out = reset_cls_test(params, new_w)
    assert np.asarray(out["params"]["p"]["zs_weight"]).shape == (4, 7)
    with np.testing.assert_raises(AssertionError):
        reset_cls_test(params, np.ones((5, 3), np.float32))  # zs_dim mismatch


@pytest.mark.slow
def test_import_reference_checkpoint_cli(tmp_path):
    """Reference .pth → orbax TrainState checkpoint → do_test can restore it
    (the DetectionCheckpointer torch-loading analog, made explicit)."""
    import subprocess
    import sys as _sys

    import torch

    _sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent / "parity"))
    import ref_loader

    ref_loader.install()
    from detectron2.layers import ShapeSpec
    from detectron2.modeling.backbone.resnet import BasicStem, ResNet as RefResNet
    from detectron2.modeling.roi_heads.box_head import FastRCNNConvFCHead as RefBox
    from detectron2.modeling.roi_heads.mask_head import (
        MaskRCNNConvUpsampleHead as RefMask,
    )
    from centernet.modeling.dense_heads.centernet_head import CenterNetHead as RefHead

    torch.manual_seed(12)
    sd = {}
    resnet = RefResNet(
        BasicStem(norm="FrozenBN"),
        RefResNet.make_default_stages(50, norm="FrozenBN", stride_in_1x1=True),
        out_features=["res3", "res4", "res5"],
    )
    for k, v in resnet.state_dict().items():
        sd[f"backbone.bottom_up.{k}"] = v
    for s in (3, 4, 5):
        for k, v in torch.nn.Conv2d({3: 512, 4: 1024, 5: 2048}[s], 256, 1).state_dict().items():
            sd[f"backbone.fpn_lateral{s}.{k}"] = v
        for k, v in torch.nn.Conv2d(256, 256, 3, padding=1).state_dict().items():
            sd[f"backbone.fpn_output{s}.{k}"] = v
    for p in ("p6", "p7"):
        for k, v in torch.nn.Conv2d(256, 256, 3, stride=2, padding=1).state_dict().items():
            sd[f"backbone.top_block.{p}.{k}"] = v
    head = RefHead(in_channels=256, num_levels=5, num_classes=4, with_agn_hm=True,
                   only_proposal=True, norm="GN", num_cls_convs=0,
                   num_box_convs=4, num_share_convs=0)
    for k, v in head.state_dict().items():
        sd[f"proposal_generator.centernet_head.{k}"] = v
    for st in range(3):
        bh = RefBox(input_shape=ShapeSpec(channels=256, height=7, width=7),
                    conv_dims=[], fc_dims=[1024, 1024])
        for k, v in bh.state_dict().items():
            sd[f"roi_heads.box_head.{st}.{k}"] = v
        for k, v in torch.nn.Linear(1024, 5).state_dict().items():
            sd[f"roi_heads.box_predictor.{st}.cls_score.{k}"] = v
        for k, v in torch.nn.Linear(1024, 4).state_dict().items():
            sd[f"roi_heads.box_predictor.{st}.bbox_pred.{k}"] = v
    mh = RefMask(input_shape=ShapeSpec(channels=256, height=14, width=14),
                 num_classes=1, conv_dims=[256] * 5)
    for k, v in mh.state_dict().items():
        sd[f"roi_heads.mask_head.{k}"] = v
    pth = tmp_path / "ref_model.pth"
    torch.save({"model": sd}, pth)

    cfg_file = tmp_path / "cfg.yaml"
    cfg_file.write_text(
        "MODEL:\n"
        "  RESNETS:\n    DEPTH: 50\n"
        "  CENTERNET:\n    NUM_CLASSES: 4\n"
        "  ROI_HEADS:\n    NUM_CLASSES: 4\n"
        f"OUTPUT_DIR: {tmp_path / 'out'}\n"
    )
    r = subprocess.run(
        [_sys.executable, "tools/import_reference_checkpoint.py",
         "--config-file", str(cfg_file), "--checkpoint", str(pth),
         "--output", str(tmp_path / "out")],
        capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "imported" in r.stdout

    # the orbax checkpoint restores with params present
    from divergen_tpu.engine.checkpoint import Checkpointer

    ckpt = Checkpointer(str(tmp_path / "out"))
    assert ckpt.latest_step() == 0
    raw = ckpt._mgr.restore(0)
    assert "params" in raw and "bottom_up" in raw["params"]["params"]
