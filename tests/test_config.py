"""Config-system tests (pattern: detectron2 tests/config/test_yacs_config.py)."""
import os

import pytest

from divergen_tpu.config import get_cfg


def test_defaults_load():
    cfg = get_cfg()
    assert cfg.MODEL.META_ARCHITECTURE == "CustomRCNN"
    assert cfg.MODEL.CENTERNET.ONLY_PROPOSAL is True


def test_merge_from_list_types():
    cfg = get_cfg()
    cfg.merge_from_list(
        ["SOLVER.MAX_ITER", "180000", "MODEL.MASK_ON", "False", "SOLVER.BASE_LR", "2"]
    )
    assert cfg.SOLVER.MAX_ITER == 180000
    assert cfg.MODEL.MASK_ON is False
    assert cfg.SOLVER.BASE_LR == 2.0 and isinstance(cfg.SOLVER.BASE_LR, float)


def test_freeze():
    cfg = get_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.SOLVER.MAX_ITER = 1
    cfg.defrost()
    cfg.SOLVER.MAX_ITER = 1


def test_base_inheritance(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("MODEL:\n  MASK_ON: false\nSOLVER:\n  MAX_ITER: 111\n")
    child = tmp_path / "child.yaml"
    child.write_text(f"_BASE_: base.yaml\nSOLVER:\n  MAX_ITER: 222\n")
    cfg = get_cfg()
    cfg.merge_from_file(str(child))
    assert cfg.MODEL.MASK_ON is False
    assert cfg.SOLVER.MAX_ITER == 222


def test_clone_independent():
    cfg = get_cfg()
    c2 = cfg.clone()
    c2.SOLVER.MAX_ITER = 5
    assert cfg.SOLVER.MAX_ITER != 5
