"""do_train / do_test: the training entry (replaces
``DiverGen/train_net.py:62-304``).

One fused XLA step: on-device copy-paste compositing (box-frame) → forward →
backward → optax → EMA. The host loader only decodes and assembles patch
stacks (data/loader.py); batches stream through a device-prefetch queue so
the chip never waits on PIL/numpy work (the reference's throughput wall,
SURVEY.md §3.1). DDP wrapping (train_net.py:357-362) is replaced by batch
sharding on the mesh's data axis.
"""
from __future__ import annotations

import logging
import os
import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data import DatasetCatalog, MetadataCatalog
from ..data.copy_paste_mapper import CopyPasteMapper
from ..data.dataset_mapper import DatasetMapper
from ..data.loader import TrainLoader, device_prefetch
from ..data.samplers import (
    RepeatFactorTrainingSampler,
    TrainingSampler,
    repeat_factors_from_category_frequency,
)
from ..modeling.meta_arch.rcnn import build_model
from ..ops.copy_paste import normalize_cp_method, paste_instances_boxframe
from ..parallel.mesh import batch_sharding, create_mesh, param_sharding_rules, shard_pytree
from ..solver.build import build_optimizer, ema_update
from .checkpoint import Checkpointer, PeriodicCheckpointer
from .events import CommonMetricPrinter, EventStorage, JSONWriter
from .train_loop import TrainState, create_train_state

logger = logging.getLogger(__name__)


def load_fed_weight(cfg):
    """freq_weight = image_count ** FED_LOSS_FREQ_WEIGHT per class
    (divergen/modeling/utils.py:7-14 load_class_freq)."""
    import json

    path = cfg.MODEL.ROI_BOX_HEAD.CAT_FREQ_PATH
    if not (cfg.MODEL.ROI_BOX_HEAD.USE_FED_LOSS and path and os.path.exists(path)):
        return None
    with open(path) as f:
        info = sorted(json.load(f), key=lambda c: c["id"])
    counts = np.array([c["image_count"] for c in info], np.float32)
    w = counts ** cfg.MODEL.ROI_BOX_HEAD.FED_LOSS_FREQ_WEIGHT
    n = cfg.MODEL.ROI_HEADS.NUM_CLASSES
    if len(w) < n:
        w = np.concatenate([w, np.ones(n - len(w), np.float32)])
    return jnp.asarray(w[:n])


def make_paste_train_step(model, optimizer, cfg):
    """step(state, batch, rng) with in-graph compositing before the fwd/bwd."""
    ema_decay = cfg.MODEL.MODEL_EMA
    mode = normalize_cp_method(cfg.INPUT.CP_METHOD)
    use_paste = cfg.INPUT.USE_COPY_PASTE
    fed_weight = load_fed_weight(cfg)

    def composite(batch):
        def one(s):
            return paste_instances_boxframe(
                s["image"], s["gt"]["masks"], s["gt"]["boxes"], s["gt"]["classes"],
                s["gt"]["valid"], s["gt"]["instance_source"],
                s["patches"], s["patch_boxes"], s["patch_classes"],
                s["patch_valid"], s["patch_flip"], mode=mode,
                patch_angle=s.get("patch_angle"),
            )

        out = jax.vmap(one)(batch)
        gt = {
            "boxes": out["boxes"],
            "classes": out["classes"],
            "valid": out["valid"],
            "masks": out["masks"],
            "instance_source": out["instance_source"],
        }
        return out["image"], gt

    def loss_fn(params, images, image_sizes, gt, rng, fed_weight):
        losses = model.apply(
            params, images, image_sizes, gt=gt, rng=rng,
            fed_weight=fed_weight, training=True,
        )
        total = sum(v.astype(jnp.float32) for v in losses.values())
        return total, losses

    def step_fn(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        if use_paste:
            images, gt = composite(batch)
        else:
            images, gt = batch["image"], batch["gt"]
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, images, batch["image_size"], gt, rng,
            batch.get("fed_weight", fed_weight),
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = state.ema_params
        if ema_params is not None:
            ema_params = ema_update(ema_params, params, ema_decay)
        metrics = {"total_loss": total, **{k: v.astype(jnp.float32) for k, v in losses.items()}}
        return TrainState(state.step + 1, params, opt_state, ema_params), metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def build_train_loader(cfg, mapper=None):
    names = list(cfg.DATASETS.TRAIN)
    dataset = []
    for n in names:
        dataset += DatasetCatalog.get(n)
    if mapper is None:
        base = DatasetMapper(cfg, is_train=True)
        mapper = CopyPasteMapper(base, cfg) if cfg.INPUT.USE_COPY_PASTE else base
        if isinstance(mapper, CopyPasteMapper):
            mapper.set_dataset(dataset)
    rank = jax.process_index()
    world = jax.process_count()
    use_rfs = cfg.INPUT.USE_RFS or (cfg.DATALOADER.SAMPLER_TRAIN == "RepeatFactorTrainingSampler")
    if len(names) > 1:
        # MultiDatasetSampler path (custom_dataset_dataloader.py:88-127):
        # per-dataset ratio x optional per-dataset RFS
        from ..data.samplers import MultiDatasetSampler

        sizes = [len(DatasetCatalog.get(n)) for n in names]
        ratios = list(cfg.DATALOADER.DATASET_RATIO)
        if len(ratios) != len(names):
            ratios = [1.0] * len(names)
        rfs_flags = list(cfg.DATALOADER.USE_RFS)
        if len(rfs_flags) != len(names):
            rfs_flags = [False] * len(names)
        rfs_all = []
        ofs = 0
        for n, sz, flag in zip(names, sizes, rfs_flags):
            part = (
                repeat_factors_from_category_frequency(
                    dataset[ofs : ofs + sz], cfg.DATALOADER.REPEAT_THRESHOLD
                )
                if flag
                else np.ones(sz)
            )
            rfs_all.append(part)
            ofs += sz
        sampler = MultiDatasetSampler(
            sizes, ratios, np.concatenate(rfs_all), seed=cfg.SEED,
            rank=rank, world_size=world,
        )
    elif use_rfs:
        rfs = repeat_factors_from_category_frequency(
            dataset, cfg.DATALOADER.REPEAT_THRESHOLD
        )
        sampler = RepeatFactorTrainingSampler(rfs, seed=cfg.SEED, rank=rank, world_size=world)
    else:
        sampler = TrainingSampler(len(dataset), seed=cfg.SEED, rank=rank, world_size=world)
    return TrainLoader(
        dataset, mapper, sampler,
        batch_size=cfg.SOLVER.IMS_PER_BATCH,
        num_workers=cfg.DATALOADER.NUM_WORKERS,
        seed=cfg.SEED,
    )


def _init_params(cfg, model, batch):
    rng = jax.random.PRNGKey(cfg.SEED)
    b = jax.tree.map(
        jnp.asarray,
        {
            k: v
            for k, v in batch.items()
            if k != "tfms"
            and not (isinstance(v, np.ndarray) and v.dtype.kind in "USO")
        },
    )
    images = b["image"]
    gt = b["gt"]
    # jit the flax init: eager init runs the whole forward op-by-op, paying
    # one XLA compile per primitive (minutes on a 1-core host)
    return jax.jit(
        lambda: model.init(rng, images, b["image_size"], gt=gt, rng=rng, training=True)
    )()


def do_train(cfg, resume: bool = False, max_steps: Optional[int] = None) -> TrainState:
    out_dir = cfg.OUTPUT_DIR
    os.makedirs(out_dir, exist_ok=True)
    model = build_model(cfg)
    loader = build_train_loader(cfg)

    mesh = create_mesh(cfg.PARALLEL.DATA_PARALLEL, cfg.PARALLEL.MODEL_PARALLEL)
    batches = iter(loader)
    first = next(batches)
    params = _init_params(cfg, model, first)
    zs_path = cfg.MODEL.ROI_BOX_HEAD.ZEROSHOT_WEIGHT_PATH
    if cfg.MODEL.ROI_BOX_HEAD.USE_ZEROSHOT_CLS and zs_path and zs_path != "rand":
        # load the CLIP-text classifier into the zs_weight params
        # (ZeroShotClassifier init, detic_fast_rcnn.py / zero_shot_classifier)
        from ..modeling.meta_arch.rcnn import load_zs_weight, reset_cls_test

        # reference files are (C, zs_dim) on disk (modeling/utils.py:40-43)
        params = reset_cls_test(
            params,
            load_zs_weight(zs_path, zs_dim=cfg.MODEL.ROI_BOX_HEAD.ZEROSHOT_WEIGHT_DIM),
        )
    n_params = sum(p.size for p in jax.tree.leaves(params))
    logger.info("model parameters: %.2fM", n_params / 1e6)

    optimizer = build_optimizer(cfg, params)
    state = create_train_state(
        shard_pytree(params, param_sharding_rules(params, mesh)),
        optimizer,
        ema=cfg.MODEL.MODEL_EMA > 0,
    )
    ckpt = Checkpointer(out_dir)
    state_host, start_iter = ckpt.resume_or_load(jax.device_get(state), resume=resume)
    if start_iter > 0:
        state = jax.tree.map(jnp.asarray, state_host)

    def pin_to_mesh(tree):
        """Give every leaf a mesh-aware sharding. Leaves created on the host
        (step counter, optax counts, resumed arrays) otherwise carry
        single-device avals, while the jitted step's OUTPUTS carry the mesh —
        the aval mismatch silently RETRACED AND RECOMPILED the ~10-minute
        train step on the second iteration."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        return jax.tree.map(
            lambda x: x
            if isinstance(x, jax.Array)
            and isinstance(x.sharding, NamedSharding)
            and x.sharding.mesh == mesh
            else jax.device_put(x, rep),
            tree,
        )

    state = pin_to_mesh(state)
    periodic = PeriodicCheckpointer(ckpt, cfg.SOLVER.CHECKPOINT_PERIOD, cfg.SOLVER.MAX_ITER)

    active = cfg.MODEL.ACTIVE.ENABLED
    astate = None
    decision_log = None
    if active:
        from ..active.bsgal import init_active_state, make_active_train_step

        astate = init_active_state(params, queue_size=cfg.MODEL.ACTIVE.QUEUE_SIZE)
        a_ckpt = Checkpointer(os.path.join(out_dir, "grad_bank"), max_to_keep=2)
        a_host, a_it = a_ckpt.resume_or_load(jax.device_get(astate), resume=resume)
        if a_it > 0:
            astate = jax.tree.map(jnp.asarray, a_host)
        astate = pin_to_mesh(astate)
        step = make_active_train_step(model, optimizer, cfg)
        # per-rank decision logs in the reference layout
        # (custom_rcnn.py:610-686: paste_source/rank_*/N0000.txt +
        # paste_ins_loss/rank_*/N0000.txt)
        from ..active.bsgal import DecisionLogger, paste_ins_rows

        decision_log = DecisionLogger(out_dir, jax.process_index())
    else:
        step = make_paste_train_step(model, optimizer, cfg)
    storage = EventStorage(start_iter)
    writers = [CommonMetricPrinter(cfg.SOLVER.MAX_ITER), JSONWriter(os.path.join(out_dir, "metrics.json"))]
    rng = jax.random.PRNGKey(cfg.SEED + 1)
    bs = batch_sharding(mesh)

    max_iter = cfg.SOLVER.MAX_ITER if max_steps is None else min(cfg.SOLVER.MAX_ITER, start_iter + max_steps)
    data_iter = device_prefetch(
        _chain(first, batches), size=cfg.DATALOADER.PREFETCH_TO_DEVICE
    )
    # jax.profiler trace window (SURVEY §5: the reference only has fvcore
    # Timer pairs; on TPU a real profile is one cfg knob away). Traces
    # iterations [PROFILE_START_ITER, +PROFILE_NUM_ITERS) into
    # OUTPUT_DIR/profile, viewable with tensorboard / xprof.
    prof_start = cfg.get("PROFILE_START_ITER", -1)
    prof_n = cfg.get("PROFILE_NUM_ITERS", 5)
    t_data = time.perf_counter()
    with mesh:
        for it in range(start_iter, max_iter):
            if prof_start >= 0 and it == prof_start:
                jax.profiler.start_trace(os.path.join(out_dir, "profile"))
            if prof_start >= 0 and it == prof_start + prof_n:
                jax.profiler.stop_trace()
            batch = next(data_iter)
            batch.pop("tfms", None)
            batch = {k: v for k, v in batch.items() if k != "image_ids"}
            # host-side provenance (string arrays never reach the device)
            paste_filenames = batch.pop("patch_filenames", None)
            storage.put_scalar("data_time", time.perf_counter() - t_data)
            if active:
                # probe = the next real batch (ACTIVE_TEST 'select' pairing
                # is the mapper's job; any real batch works as the default)
                probe = next(data_iter)
                probe.pop("tfms", None)
                probe.pop("patch_filenames", None)
                # ACTIVE_TEST_BATCHSIZE (ref config.py:79): the probe uses
                # the first PROBE_BATCH images of a real batch
                pb = min(cfg.MODEL.ACTIVE.PROBE_BATCH, probe["image"].shape[0])
                batch["probe"] = {
                    "image": probe["image"][:pb],
                    "image_size": probe["image_size"][:pb],
                    "gt": jax.tree.map(lambda x: x[:pb], probe["gt"]),
                }
                state, astate, metrics = step(state, astate, batch, rng)
                aux_rows = metrics.pop("aux_paste_rows", None)
                if decision_log is not None and ((it + 1) % max(cfg.MODEL.ACTIVE.LOG_PERIOD, 1) == 0 or it == start_iter):
                    h = jax.device_get(
                        {"sim": metrics["grad_sim"], "use": metrics["paste_used"],
                         "thr": metrics["threshold"], "num": metrics["paste_num"]}
                    )
                    names, sel_classes = [], []
                    if paste_filenames is not None and "patch_classes" in batch:
                        fn_flat = np.asarray(paste_filenames).reshape(-1).tolist()
                        cls_flat = jax.device_get(batch["patch_classes"]).reshape(-1).tolist()
                        for f, c in zip(fn_flat, cls_flat):
                            if f:
                                names.append(f)
                                sel_classes.append(int(c))
                    decision_log.log_decision(
                        it, names or ["<none>"], sel_classes or [-1],
                        int(h["use"]), float(h["sim"]), float(h["thr"]),
                        int(h["num"]),
                    )
                    if aux_rows is not None:
                        rows = paste_ins_rows(jax.device_get(aux_rows), paste_filenames)
                        if rows:
                            decision_log.log_paste_ins(
                                it, rows, int(h["use"]), int(h["num"])
                            )
                if (it + 1) % cfg.MODEL.ACTIVE.BANK_CKPT_PERIOD == 0:
                    a_ckpt.save(it + 1, jax.device_get(astate))
            else:
                state, metrics = step(state, batch, rng)
            if (it + 1) % 20 == 0 or it == start_iter:
                host = jax.device_get(metrics)
                if not np.isfinite(host["total_loss"]):
                    raise FloatingPointError(f"non-finite loss at iter {it}: {host}")
                storage.put_scalars(**{k: float(v) for k, v in host.items()})
                for w in writers:
                    w.write(storage)
            periodic.step(it, state)
            if cfg.TEST.EVAL_PERIOD > 0 and (it + 1) % cfg.TEST.EVAL_PERIOD == 0:
                from .eval_loop import do_test

                do_test(cfg, model=model, state=jax.device_get(state))
            storage.step()
            t_data = time.perf_counter()
    if prof_start >= 0 and prof_start <= max_iter - 1 < prof_start + prof_n:
        jax.profiler.stop_trace()  # window extended past the last iteration
    ckpt.wait()  # orbax saves are async; make the final checkpoint durable
    if active:
        a_ckpt.wait()
        if decision_log is not None:
            decision_log.close()
    loader.stop()
    return state


def _chain(first, rest):
    yield first
    yield from rest
