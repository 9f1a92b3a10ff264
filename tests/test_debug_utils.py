"""Debug dump helpers (modeling/debug.py vs reference debug.py:11-333)."""
import numpy as np
import jax.numpy as jnp

from divergen_tpu.modeling.centernet.centernet import CenterNetConfig, level_geometry
from divergen_tpu.modeling.debug import (
    debug_second_stage,
    debug_test,
    debug_train,
    save_heatmap,
)


def _geom():
    cfg = CenterNetConfig(strides=(8, 16), sizes_of_interest=((0, 64), (64, 256)))
    return level_geometry(cfg, [(8, 8), (4, 4)])


def test_debug_train_writes_levels_and_blend(tmp_path):
    rng = np.random.RandomState(0)
    geom = _geom()
    m = 8 * 8 + 4 * 4
    images = rng.rand(2, 64, 64, 3) * 255
    gt = {
        "boxes": np.array([[[4, 4, 30, 30], [0, 0, 0, 0]]] * 2, np.float32),
        "valid": np.array([[True, False]] * 2),
    }
    hm = np.clip(rng.rand(2, m), 0, 1)
    reg = rng.rand(2, m, 4) * 2 - 1
    pos = (rng.rand(2, m) < 0.05).astype(np.int32)
    files = debug_train(str(tmp_path), images, gt, hm, reg, pos, geom)
    names = [f.split("/")[-1] for f in files]
    assert "train_0_hm0.jpg" in names and "train_0_hm1.jpg" in names
    assert "train_1_blend.jpg" in names
    import os

    assert all(os.path.getsize(f) > 0 for f in files)


def test_debug_test_and_second_stage(tmp_path):
    rng = np.random.RandomState(1)
    geom = _geom()
    m = 8 * 8 + 4 * 4
    images = rng.rand(1, 64, 64, 3) * 255
    logits = np.clip(rng.rand(1, m, 3), 0, 1)
    agn = np.clip(rng.rand(1, m), 0, 1)
    preds = {
        "boxes": np.array([[[5, 5, 40, 40], [10, 10, 20, 20]]], np.float32),
        "scores": np.array([[0.9, 0.1]], np.float32),
        "classes": np.array([[2, 1]], np.int32),
        "valid": np.array([[True, True]]),
        "mask_logits": rng.randn(1, 2, 14, 14).astype(np.float32),
    }
    files = debug_test(
        str(tmp_path), images, logits, agn, preds, geom,
        class_names=["a", "b", "c"], mult_agn=True,
    )
    names = [f.split("/")[-1] for f in files]
    assert "test_0_predhm0.jpg" in names and "test_0_agnhm1.jpg" in names
    assert "test_0_preds.jpg" in names and "test_0_blend.jpg" in names

    files2 = debug_second_stage(str(tmp_path), images, preds,
                                class_names=["a", "b", "c"])
    assert files2 and files2[0].endswith("stage2_0.jpg")

    save_heatmap(str(tmp_path / "hm.jpg"), np.clip(rng.rand(8, 8), 0, 1),
                 image=images[0])
    assert (tmp_path / "hm.jpg").exists()
