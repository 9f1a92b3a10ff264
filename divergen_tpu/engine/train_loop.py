"""Jitted train step + TrainState (replaces detectron2 SimpleTrainer/
AMPTrainer + the do_train loop, ``DiverGen/train_net.py:128-304``).

One fused XLA program per step: forward → loss-dict sum → grad → optax
update → EMA update. Data parallelism comes from sharding the batch on the
mesh's ``data`` axis — gradients reduce automatically under GSPMD (the
reference needed DDP all-reduce, train_net.py:357-362). bf16 autocast is in
the model (compute_dtype); there is no GradScaler because bf16 needs none
(the torch path needs one for fp16, train_net.py:277-284).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax import Array

from ..solver.build import build_optimizer, ema_update


class TrainState(flax.struct.PyTreeNode):
    step: Array
    params: Any
    opt_state: Any
    ema_params: Any = None  # None disables EMA


def create_train_state(params, optimizer: optax.GradientTransformation, ema: bool) -> TrainState:
    # jit the optax/EMA init: eager execution dispatches thousands of tiny
    # zeros/copy programs (one XLA compile each — minutes of wall time on a
    # 1-core host); one compiled program instead
    @jax.jit
    def _init(params):
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=optimizer.init(params),
            # copy=True: astype on an already-f32 leaf would alias the params
            # buffer and break donation (same buffer donated twice)
            ema_params=(
                jax.tree.map(lambda x: jnp.array(x, jnp.float32, copy=True), params)
                if ema
                else None
            ),
        )

    return _init(params)


def make_train_step(
    model,
    optimizer: optax.GradientTransformation,
    ema_decay: float = 0.0,
    loss_weights: Optional[Dict[str, float]] = None,
    donate: bool = True,
) -> Callable:
    """Returns step(state, batch, rng) -> (state, metrics).

    batch: {"images": (B,H,W,3), "image_sizes": (B,2), "gt": {...},
            optional "fed_weight"}.
    """

    def loss_fn(params, batch, rng):
        losses = model.apply(
            params,
            batch["images"],
            batch["image_sizes"],
            gt=batch["gt"],
            rng=rng,
            fed_weight=batch.get("fed_weight"),
            training=True,
        )
        total = jnp.zeros((), jnp.float32)
        for k, v in losses.items():
            w = (loss_weights or {}).get(k, 1.0)
            total = total + w * v.astype(jnp.float32)
        return total, losses

    def step_fn(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = state.ema_params
        if ema_params is not None:
            ema_params = ema_update(ema_params, params, ema_decay)
        metrics = {"total_loss": total, **{k: v.astype(jnp.float32) for k, v in losses.items()}}
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, ema_params=ema_params
        )
        return new_state, metrics

    if donate:
        return jax.jit(step_fn, donate_argnums=(0,))
    return jax.jit(step_fn)
