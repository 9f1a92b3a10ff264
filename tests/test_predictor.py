"""Predictor surfaces: Predictor, BatchPredictor ordering, AsyncPredictor
(divergen/predictor.py:17-253 parity)."""
import numpy as np
import pytest

from divergen_tpu.config import get_cfg


def _tiny_cfg():
    cfg = get_cfg()
    cfg.MODEL.CENTERNET.NUM_CLASSES = 4
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.MODEL.CENTERNET.PRE_NMS_TOPK_TEST = 64
    cfg.MODEL.CENTERNET.POST_NMS_TOPK_TEST = 32
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.TEST.DETECTIONS_PER_IMAGE = 8
    cfg.INPUT.TEST_SIZE = 96
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 96
    cfg.FP16 = False
    return cfg


@pytest.mark.slow
def test_async_predictor_ordering_and_parity():
    import jax

    from divergen_tpu.modeling.meta_arch.rcnn import build_model
    from divergen_tpu.predictor import AsyncPredictor, Predictor

    cfg = _tiny_cfg()
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    import jax.numpy as jnp

    imgs = [(rng.rand(80, 72, 3) * 255).astype(np.uint8) for _ in range(5)]
    init_img = jnp.asarray(rng.rand(1, 96, 96, 3).astype(np.float32))
    params = model.init(
        jax.random.PRNGKey(0), init_img, jnp.asarray([[96, 96]]), training=False
    )

    sync = Predictor(cfg, params, score_thresh=0.0)
    want = [sync(im) for im in imgs]

    ap = AsyncPredictor(cfg, params, num_workers=2, score_thresh=0.0)
    try:
        for im in imgs:
            ap.put(im)
        assert len(ap) == 5
        got = [ap.get() for _ in imgs]
        assert len(ap) == 0
        # results return in request order and match the synchronous path
        for g, w in zip(got, want):
            np.testing.assert_allclose(g["boxes"], w["boxes"], atol=1e-4)
            np.testing.assert_allclose(g["scores"], w["scores"], atol=1e-5)
            np.testing.assert_array_equal(g["classes"], w["classes"])
        # __call__ round-trip
        one = ap(imgs[0])
        np.testing.assert_allclose(one["scores"], want[0]["scores"], atol=1e-5)
        assert ap.default_buffer_size == 10
    finally:
        ap.shutdown()
