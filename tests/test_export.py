"""StableHLO deployment export (divergen_tpu/export.py).

Counterpart of the reference's deployment-export checks
(``CenterNet2/tools/deploy/export_model.py:35-101`` traces + re-runs the
model): export the inference graph, reload it WITHOUT the model object,
and require identical detections.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from divergen_tpu.config import get_cfg
from divergen_tpu.export import export_inference, load_exported, save_exported
from divergen_tpu.modeling.meta_arch.rcnn import build_model

IMG = 128


@pytest.fixture(scope="module")
def model_params():
    cfg = get_cfg()
    cfg.MODEL.CENTERNET.NUM_CLASSES = 8
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 8
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 64
    cfg.MODEL.CENTERNET.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.CENTERNET.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.TEST.DETECTIONS_PER_IMAGE = 16
    cfg.FP16 = False
    model = build_model(cfg)
    rng = np.random.RandomState(3)
    images = jnp.asarray(rng.rand(1, IMG, IMG, 3).astype(np.float32) * 255)
    sizes = jnp.asarray([[IMG, IMG]], jnp.int32)
    gt = {
        "boxes": jnp.asarray([[[10.0, 10, 60, 70]] * 4]),
        "classes": jnp.zeros((1, 4), jnp.int32),
        "valid": jnp.asarray([[True] + [False] * 3]),
        "masks": jnp.ones((1, 4, 28, 28), jnp.float32),
        "instance_source": jnp.zeros((1, 4), jnp.int32),
    }
    key = jax.random.PRNGKey(0)
    params = model.init(key, images, sizes, gt=gt, rng=key, training=True)
    return model, params, images, sizes


def test_export_roundtrip_weights_separate(model_params, tmp_path):
    model, params, images, sizes = model_params
    direct = jax.jit(
        lambda p, x, s: model.apply(p, x, s, training=False)
    )(params, images, sizes)

    exp = export_inference(model, params, batch=1, height=IMG, width=IMG)
    path = save_exported(exp, str(tmp_path / "det.stablehlo"))
    loaded = load_exported(path)  # no model/config needed from here on
    assert loaded.platforms == tuple(exp.platforms)
    out = loaded(params, images, sizes)

    assert set(out) == set(direct)
    for k in direct:
        np.testing.assert_allclose(
            np.asarray(out[k]), np.asarray(direct[k]), rtol=1e-5, atol=1e-5,
            err_msg=k,
        )


def test_export_baked_params(model_params, tmp_path):
    model, params, images, sizes = model_params
    exp = export_inference(
        model, params, batch=1, height=IMG, width=IMG, bake_params=True
    )
    loaded = load_exported(exp.serialize())
    out = loaded(images, sizes)  # params are constants in the module
    direct = model.apply(params, images, sizes, training=False)
    np.testing.assert_allclose(
        np.asarray(out["scores"]), np.asarray(direct["scores"]),
        rtol=1e-5, atol=1e-5,
    )


def test_export_rejects_wrong_shape(model_params):
    model, params, images, sizes = model_params
    exp = export_inference(model, params, batch=1, height=IMG, width=IMG)
    loaded = load_exported(exp.serialize())
    bad = jnp.zeros((1, IMG * 2, IMG * 2, 3), jnp.float32)
    with pytest.raises(Exception):
        jax.block_until_ready(loaded(params, bad, sizes))
