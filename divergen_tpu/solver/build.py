"""Optimizer / LR-schedule builders (optax).

Counterpart of ``DiverGen/divergen/custom_solver.py:19-77``
(``build_custom_optimizer``: per-param LR groups — backbone multiplier,
custom keyword multipliers — SGD/ADAMW + full-model grad clip) and
detectron2's ``solver/build.py`` (``WarmupCosineLR``/``WarmupMultiStepLR``).

The torch version builds per-param-group LR lists at construction; here the
same grouping is an ``optax.multi_transform`` over a label pytree derived
from parameter paths, so one jitted update handles every group.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


def warmup_cosine_lr(base_lr: float, max_iter: int, warmup_iters: int, warmup_factor: float = 1e-3):
    """WarmupCosineLR (detectron2 solver/lr_scheduler.py semantics): linear
    warmup from base_lr*warmup_factor, then cosine decay to 0 over max_iter."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.asarray(max(warmup_iters, 1), jnp.float32)
        alpha = step / warm
        warmup = base_lr * (warmup_factor * (1 - alpha) + alpha)
        cos = base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * step / max(max_iter, 1)))
        return jnp.where(step < warmup_iters, warmup, cos)

    return schedule


def warmup_multistep_lr(
    base_lr: float,
    steps: Sequence[int],
    gamma: float = 0.1,
    warmup_iters: int = 1000,
    warmup_factor: float = 1e-3,
):
    """WarmupMultiStepLR: staircase decay by gamma at each milestone."""

    milestones = tuple(steps)

    def schedule(step):
        step_f = jnp.asarray(step, jnp.float32)
        warm = jnp.asarray(max(warmup_iters, 1), jnp.float32)
        alpha = step_f / warm
        warmup = warmup_factor * (1 - alpha) + alpha
        decay = gamma ** sum(jnp.asarray(step >= m, jnp.float32) for m in milestones)
        return base_lr * jnp.where(step_f < warmup_iters, warmup, 1.0) * decay

    return schedule


def build_lr_schedule(cfg):
    name = cfg.SOLVER.LR_SCHEDULER_NAME
    if name == "WarmupCosineLR":
        return warmup_cosine_lr(
            cfg.SOLVER.BASE_LR,
            cfg.SOLVER.MAX_ITER,
            cfg.SOLVER.WARMUP_ITERS,
            cfg.SOLVER.WARMUP_FACTOR,
        )
    if name == "WarmupMultiStepLR":
        return warmup_multistep_lr(
            cfg.SOLVER.BASE_LR,
            cfg.SOLVER.STEPS,
            cfg.SOLVER.GAMMA,
            cfg.SOLVER.WARMUP_ITERS,
            cfg.SOLVER.WARMUP_FACTOR,
        )
    raise ValueError(f"unknown LR scheduler {name}")


def _lr_multiplier_labels(params, backbone_prefix: str, custom_multipliers: Dict[str, float]):
    """Label each leaf with its LR-group name (custom_solver.py:29-50:
    'backbone' keyword → BACKBONE_MULTIPLIER; CUSTOM_MULTIPLIER_NAME
    keywords → CUSTOM_MULTIPLIER)."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label_for(path) -> str:
        keys = "/".join(str(getattr(p, "key", p)) for p in path)
        for kw in custom_multipliers:
            if kw in keys:
                return f"custom:{kw}"
        if backbone_prefix and backbone_prefix in keys:
            return "backbone"
        return "default"

    labels = [label_for(path) for path, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, labels)


def build_optimizer(cfg, params) -> optax.GradientTransformation:
    """AdamW / SGD(momentum) with schedule, per-group LR multipliers, and
    full-model grad clipping (custom_solver.py:52-77)."""

    schedule = build_lr_schedule(cfg)
    wd = cfg.SOLVER.WEIGHT_DECAY
    opt_name = cfg.SOLVER.OPTIMIZER.upper()

    def make(mult: float) -> optax.GradientTransformation:
        scaled = lambda step: schedule(step) * mult
        if opt_name == "ADAMW":
            return optax.adamw(scaled, b1=0.9, b2=0.999, weight_decay=wd)
        if opt_name == "SGD":
            return optax.chain(
                optax.add_decayed_weights(wd) if wd else optax.identity(),
                optax.sgd(scaled, momentum=cfg.SOLVER.MOMENTUM),
            )
        raise ValueError(f"unknown optimizer {opt_name}")

    custom = {
        name: mult
        for name, mult in zip(
            cfg.SOLVER.CUSTOM_MULTIPLIER_NAME, [cfg.SOLVER.CUSTOM_MULTIPLIER] * len(cfg.SOLVER.CUSTOM_MULTIPLIER_NAME)
        )
    }
    bb_mult = cfg.SOLVER.BACKBONE_MULTIPLIER
    transforms = {"default": make(1.0), "backbone": make(bb_mult)}
    for name, mult in custom.items():
        transforms[f"custom:{name}"] = make(mult)
    labels = _lr_multiplier_labels(params, "bottom_up", custom)
    opt = optax.multi_transform(transforms, labels)

    if cfg.SOLVER.CLIP_GRADIENTS.ENABLED:
        clip = optax.clip_by_global_norm(cfg.SOLVER.CLIP_GRADIENTS.CLIP_VALUE)
        opt = optax.chain(clip, opt)
    return opt


def ema_update(ema_params, params, decay: float):
    """ModelEma.update (divergen/ema.py:6-59): ema = decay*ema + (1-decay)*p."""
    return jax.tree.map(lambda e, p: e * decay + p.astype(e.dtype) * (1.0 - decay), ema_params, params)
