"""do_test: timed inference over the test sets → LVIS/COCO metrics.

Counterpart of ``DiverGen/train_net.py:62-126`` (do_test: EMA-eval, per-set
evaluator choice, print_csv_format) + ``divergen/evaluation/evaluator.py:
106-216`` (inference_on_dataset with data/compute timing, warmup excluded).
"""
from __future__ import annotations

import logging
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data import DatasetCatalog, MetadataCatalog
from ..data.dataset_mapper import DatasetMapper
from ..evaluation.lvis_evaluator import CustomCOCOEvaluator, LVISEvaluator, OIDEvaluator
from ..modeling.meta_arch.rcnn import build_model
from .checkpoint import Checkpointer
from .train_loop import TrainState

logger = logging.getLogger(__name__)


def build_evaluator(cfg, dataset_name: str):
    etype = MetadataCatalog.get(dataset_name).evaluator_type
    if etype == "lvis":
        return LVISEvaluator(dataset_name)
    if etype in ("coco", "coco_generalized"):
        return CustomCOCOEvaluator(dataset_name)
    if etype == "oid":
        return OIDEvaluator(dataset_name)
    if etype == "lvis_to_coco":
        from ..evaluation.lvis_evaluator import LVISToCOCOEvaluator

        meta = MetadataCatalog.get(dataset_name)
        return LVISToCOCOEvaluator(
            dataset_name,
            mapper_json=getattr(meta, "lvis_to_coco_mapper", None),
            lvis_json=getattr(meta, "lvis_json", None),
        )
    raise NotImplementedError(etype)


def inference_on_dataset(model, params, cfg, dataset_name: str, evaluator,
                         batch_size: int = 8, max_images: Optional[int] = None,
                         mesh=None) -> Dict:
    """Timed eval loop (divergen/evaluation/evaluator.py:106-216), sharded
    over the data axis: the batch is split across chips with ``pmap`` (the
    reference shards the 19.8k-image LVIS val pass across ranks with
    InferenceSampler + per-rank loops). pmap rather than a GSPMD mesh on
    purpose: the per-device program is the plain single-chip inference graph
    (the NMS fixpoint / top-k control flow partitions trivially along the
    mapped batch axis; spmd-partitioning the same graph was observed to
    blow up compile time)."""
    dataset = DatasetCatalog.get(dataset_name)
    if max_images:
        dataset = dataset[:max_images]
    mapper = DatasetMapper(cfg, is_train=False)
    canvas = mapper.canvas

    dp = cfg.PARALLEL.DATA_PARALLEL if mesh is None else mesh.shape["data"]
    n_dev = len(jax.devices())
    if dp in (-1, 0) or dp > n_dev:
        dp = n_dev
    # batch divisible by the data axis so the shard is even
    batch_size = max(batch_size, dp)
    batch_size += (-batch_size) % dp

    if dp > 1:
        devices = jax.devices()[:dp]
        _pinfer = jax.pmap(
            lambda p, im, sz: model.apply(p, im, sz, training=False),
            devices=devices,
        )
        p_rep = jax.device_put_replicated(params, devices)

        def infer(params_unused, images, sizes):
            b = images.shape[0]
            out = _pinfer(
                p_rep,
                images.reshape((dp, b // dp) + images.shape[1:]),
                sizes.reshape((dp, b // dp) + sizes.shape[1:]),
            )
            return jax.tree.map(lambda x: x.reshape((b,) + x.shape[2:]), out)

    else:

        @jax.jit
        def infer(params, images, sizes):
            return model.apply(params, images, sizes, training=False)

    evaluator.reset()
    n = len(dataset)
    t_data = t_comp = 0.0
    rng = np.random.default_rng(0)
    warmup = min(5, n)
    start = time.perf_counter()
    for ofs in range(0, n, batch_size):
        recs = dataset[ofs : ofs + batch_size]
        t0 = time.perf_counter()
        samples = []
        for r in recs:
            s = mapper(r, rng)
            s["orig_height"] = r.get("height")
            s["orig_width"] = r.get("width")
            samples.append(s)
        pad = batch_size - len(samples)
        images = np.stack([s["image"] for s in samples] + [samples[-1]["image"]] * pad)
        sizes = np.stack([s["image_size"] for s in samples] + [samples[-1]["image_size"]] * pad)
        t_data += time.perf_counter() - t0
        t0 = time.perf_counter()
        out = infer(params, jnp.asarray(images), jnp.asarray(sizes))
        out = jax.device_get(out)
        if ofs >= warmup:
            t_comp += time.perf_counter() - t0
        evaluator.process(samples, out)
    total = time.perf_counter() - start
    logger.info(
        "inference on %s: %d imgs, %.4f s/img total (data %.4f, compute %.4f)",
        dataset_name, n, total / max(n, 1), t_data / max(n, 1), t_comp / max(n - warmup, 1),
    )
    return evaluator.evaluate()


def do_test(cfg, model=None, state: Optional[TrainState] = None, resume: bool = True,
            max_images: Optional[int] = None) -> Dict:
    if model is None:
        model = build_model(cfg)
    if state is None:
        ckpt = Checkpointer(cfg.OUTPUT_DIR)
        step = ckpt.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {cfg.OUTPUT_DIR}")
        raw = ckpt._mgr.restore(step)
        params = raw.get("ema_params") or raw["params"]  # EMA-eval (train_net.py:63-64)
    else:
        params = state.ema_params if state.ema_params is not None else state.params
    params = jax.tree.map(jnp.asarray, params)

    results = {}
    for d, name in enumerate(cfg.DATASETS.TEST):
        eval_model, eval_params = model, params
        if cfg.MODEL.RESET_CLS_TESTS:
            # swap the zero-shot classifier vocabulary per test set
            # (ref train_net.py:89-93 reset_cls_test): in zero-shot mode
            # every other head param is class-agnostic, so a rebuilt module
            # with the new class count reuses the same params
            from ..modeling.meta_arch.rcnn import load_zs_weight, reset_cls_test

            # reference files are (C, zs_dim) on disk, transposed on load
            # (modeling/utils.py:40-43)
            w = load_zs_weight(
                cfg.MODEL.TEST_CLASSIFIERS[d],
                zs_dim=cfg.MODEL.ROI_BOX_HEAD.ZEROSHOT_WEIGHT_DIM,
            )
            n_cls = int(cfg.MODEL.TEST_NUM_CLASSES[d]) if cfg.MODEL.TEST_NUM_CLASSES else w.shape[1]
            assert w.shape[1] == n_cls, (w.shape, n_cls)
            test_cfg = cfg.clone().defrost()
            test_cfg.MODEL.ROI_HEADS.NUM_CLASSES = n_cls
            eval_model = build_model(test_cfg)
            eval_params = reset_cls_test(params, w)
        evaluator = build_evaluator(cfg, name)
        results[name] = inference_on_dataset(
            eval_model, eval_params, cfg, name, evaluator, max_images=max_images
        )
        logger.info("results[%s] = %s", name, results[name])
    return results


def inference_on_dataset_exp(model, params, cfg, dataset_name: str, out_dir: str,
                             batch_size: int = 8, max_images: Optional[int] = None) -> Dict:
    """Experimental-analysis variant (divergen/evaluation/evaluator.py:221-380
    inference_on_dataset_exp: enables roi_heads.save_feature and dumps
    per-image ROI outputs): runs with return_logits and writes per-image
    .npz (boxes/scores/classes/logits) next to the metrics."""
    import os

    from ..evaluation.lvis_evaluator import LVISEvaluatorWithLogits

    os.makedirs(out_dir, exist_ok=True)
    dataset = DatasetCatalog.get(dataset_name)
    if max_images:
        dataset = dataset[:max_images]
    mapper = DatasetMapper(cfg, is_train=False)

    @jax.jit
    def infer(params, images, sizes):
        return model.apply(params, images, sizes, training=False, return_logits=True)

    evaluator = LVISEvaluatorWithLogits(dataset_name, logits_dir=out_dir)
    rng = np.random.default_rng(0)
    for ofs in range(0, len(dataset), batch_size):
        recs = dataset[ofs : ofs + batch_size]
        samples = []
        for r in recs:
            s = mapper(r, rng)
            s["orig_height"] = r.get("height")
            s["orig_width"] = r.get("width")
            samples.append(s)
        pad = batch_size - len(samples)
        images = np.stack([s["image"] for s in samples] + [samples[-1]["image"]] * pad)
        sizes = np.stack([s["image_size"] for s in samples] + [samples[-1]["image_size"]] * pad)
        out = jax.device_get(infer(params, jnp.asarray(images), jnp.asarray(sizes)))
        evaluator.process(samples, out)
        for b, s in enumerate(samples):
            valid = np.asarray(out["valid"][b])
            arrays = {
                "boxes": np.asarray(out["boxes"][b])[valid],
                "scores": np.asarray(out["scores"][b])[valid],
                "classes": np.asarray(out["classes"][b])[valid],
            }
            if "logits" in out:  # per-box class-score vectors, as documented
                arrays["logits"] = np.asarray(out["logits"][b])[valid]
            np.savez_compressed(
                os.path.join(out_dir, f"det_{int(s['image_id'])}.npz"), **arrays
            )
    return evaluator.evaluate()
