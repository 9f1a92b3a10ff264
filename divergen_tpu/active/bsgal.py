"""BSGAL online active selection of pasted instances (ICML 2024).

Counterpart of ``BSGAL/bsgal/modeling/meta_arch/custom_rcnn.py:49-1354``
(§3.4 of SURVEY.md): per-step estimation of the *contribution* of pasted
synthetic instances via gradient-cosine against an EMA bank of real-data
gradients, deciding paste-vs-discard.

Idiomatic JAX redesign (SURVEY.md §7 item 7):
- the probe gradient ``g_test`` is one ``jax.grad`` on the probe batch with
  GT-as-proposals (the reference's ``no_grad_loss``/``only_gt_proposals``
  fwd, :780-939);
- the candidate gradient ``g_paste`` is ``jax.grad`` of only the
  ``loss_paste_ins*`` keys from ONE forward on the pasted batch — the
  ``ACTIVE_FORWARD_ONCE`` fast path (:480-549) without the reference's
  param cloning: JAX grads never mutate params, so the slow
  ``deepcopy(state_dict)``+inner-SGD+restore machinery (:341-399,941-971)
  disappears by construction;
- the gradient bank is an optimizer-state-like pytree (not a frozen
  ``nn.Embedding(n_params, 1)``, :1031-1072), EMA-updated on device and
  checkpointed with the train state;
- the decision swaps pasted↔original tensors with ``jnp.where`` (the
  reference mutates the input list, :565-605);
- ``DynamicThreshold`` (:29-48) is a fixed-size device ring buffer +
  quantile.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax
from jax import Array

from ..ops.copy_paste import paste_instances_boxframe
from ..solver.build import ema_update


class ActiveState(flax.struct.PyTreeNode):
    """Carried alongside TrainState: gradient bank + threshold queue +
    decision counters (paste/not-paste, :688-689)."""

    grad_bank: Any  # pytree like params
    bank_initialized: Array  # () bool
    sim_queue: Array  # (Q,)
    queue_pos: Array  # () int32
    queue_filled: Array  # () int32
    n_paste: Array  # () int32
    n_discard: Array  # () int32


def init_active_state(params, queue_size: int = 1000) -> ActiveState:
    return ActiveState(
        grad_bank=jax.tree.map(lambda x: jnp.zeros_like(x, jnp.float32), params),
        bank_initialized=jnp.zeros((), bool),
        sim_queue=jnp.zeros((queue_size,), jnp.float32),
        queue_pos=jnp.zeros((), jnp.int32),
        queue_filled=jnp.zeros((), jnp.int32),
        n_paste=jnp.zeros((), jnp.int32),
        n_discard=jnp.zeros((), jnp.int32),
    )


def tree_cosine(a, b) -> Array:
    """cos(flat(a), flat(b)) without materializing flat vectors
    (compute_grad_sim, :1074-1086)."""
    dot = sum(
        jnp.vdot(x.astype(jnp.float32), y.astype(jnp.float32))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b))
    )
    na = jnp.sqrt(sum(jnp.vdot(x, x) for x in map(lambda t: t.astype(jnp.float32), jax.tree.leaves(a))))
    nb = jnp.sqrt(sum(jnp.vdot(x, x) for x in map(lambda t: t.astype(jnp.float32), jax.tree.leaves(b))))
    return dot / jnp.maximum(na * nb, 1e-12)


def update_bank(state: ActiveState, g_test, momentum: float) -> ActiveState:
    """EMA of the real-data gradient (update_grad_bank, :1046-1072);
    first update copies."""
    new_bank = jax.tree.map(
        lambda bank, g: jnp.where(
            state.bank_initialized,
            (1.0 - momentum) * bank + momentum * g.astype(jnp.float32),
            g.astype(jnp.float32),
        ),
        state.grad_bank,
        g_test,
    )
    return state.replace(grad_bank=new_bank, bank_initialized=jnp.ones((), bool))


def dynamic_threshold(state: ActiveState, percent: float) -> Array:
    """Percentile of the sims seen so far (DynamicThreshold, :29-48)."""
    q = state.sim_queue
    n = jnp.maximum(state.queue_filled, 1)
    # mask unfilled slots to +inf so they never lower the percentile
    masked = jnp.where(jnp.arange(q.shape[0]) < n, q, jnp.inf)
    s = jnp.sort(masked)
    idx = jnp.clip((percent * (n - 1)).astype(jnp.int32), 0, q.shape[0] - 1)
    return s[idx]


def push_sim(state: ActiveState, sim: Array) -> ActiveState:
    q = state.sim_queue.at[state.queue_pos].set(sim)
    pos = (state.queue_pos + 1) % state.sim_queue.shape[0]
    filled = jnp.minimum(state.queue_filled + 1, state.sim_queue.shape[0])
    return state.replace(sim_queue=q, queue_pos=pos, queue_filled=filled)


@dataclasses.dataclass(frozen=True)
class ActiveConfig:
    mode: str = "paste_or_ori"  # paste_or_zero | paste_or_ori | paste_only
    loss_keys: Tuple[str, ...] = ("loss_cls_stage0", "loss_cls_stage1", "loss_cls_stage2")
    momentum: float = 0.1
    threshold: float = -0.05
    dynamic: bool = False
    dynamic_percent: float = 0.5
    cp_mode: str = "basic"

    @staticmethod
    def from_cfg(cfg) -> "ActiveConfig":
        a = cfg.MODEL.ACTIVE
        return ActiveConfig(
            mode=a.MODE,
            loss_keys=tuple(a.LOSS),
            momentum=a.MOMENTUM,
            threshold=a.THRESHOLD,
            dynamic=a.DYNAMIC_THRESHOLD,
            dynamic_percent=a.DYNAMIC_PERCENT,
            cp_mode=cfg.INPUT.CP_METHOD,
        )


def make_active_train_step(model, optimizer, cfg) -> Callable:
    """step(state, active_state, batch, rng) → (state, active_state, metrics).

    batch: the pasted-batch inputs (image + gt + patch stack, trainer
    format) plus ``probe`` — a real-data batch {"image", "image_size",
    "gt"} for the test gradient (ACTIVE_TEST_BATCHSIZE images).
    """
    from ..engine.train_loop import TrainState

    acfg = ActiveConfig.from_cfg(cfg)
    ema_decay = cfg.MODEL.MODEL_EMA

    def composite(batch):
        def one(s):
            return paste_instances_boxframe(
                s["image"], s["gt"]["masks"], s["gt"]["boxes"], s["gt"]["classes"],
                s["gt"]["valid"], s["gt"]["instance_source"],
                s["patches"], s["patch_boxes"], s["patch_classes"],
                s["patch_valid"], s["patch_flip"], mode=acfg.cp_mode,
                patch_angle=s.get("patch_angle"),
            )

        out = jax.vmap(one)({k: v for k, v in batch.items() if k != "probe"})
        gt = {k: out[k] for k in ("boxes", "classes", "valid", "masks", "instance_source")}
        return out["image"], gt

    def probe_loss(params, probe, rng):
        losses = model.apply(
            params, probe["image"], probe["image_size"], gt=probe["gt"], rng=rng,
            training=True, gt_as_proposals=True,
        )
        sel = [losses[k] for k in acfg.loss_keys if k in losses]
        if not sel:  # fall back to every non-split loss (ACTIVE_LOSS 'all')
            sel = [v for k, v in losses.items() if "paste_ins" not in k]
        return sum(v.astype(jnp.float32) for v in sel)

    def paste_part_loss(params, images, sizes, gt, rng):
        losses = model.apply(params, images, sizes, gt=gt, rng=rng, training=True)
        paste_keys = [k for k in losses if "loss_paste_ins" in k]
        return sum(losses[k].astype(jnp.float32) for k in paste_keys), losses

    def final_loss(params, images, sizes, gt, rng):
        losses = model.apply(params, images, sizes, gt=gt, rng=rng, training=True)
        total = sum(
            v.astype(jnp.float32) for k, v in losses.items() if "paste_ins" not in k
        )
        return total, losses

    def step_fn(state: TrainState, astate: ActiveState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        k_probe, k_paste, k_final = jax.random.split(rng, 3)

        # A. real-data probe gradient → EMA bank (:347-354,445-447)
        g_test = jax.grad(probe_loss)(state.params, batch["probe"], k_probe)
        astate = update_bank(astate, g_test, acfg.momentum)

        # B. paste-part gradient from ONE pasted forward (:480-549)
        images_pasted, gt_pasted = composite(batch)
        sizes = batch["image_size"]
        (_, _losses), g_paste = jax.value_and_grad(
            paste_part_loss, has_aux=True
        )(state.params, images_pasted, sizes, gt_pasted, k_paste)

        # C. decision (:536-605)
        sim = tree_cosine(g_paste, astate.grad_bank)
        thr = (
            dynamic_threshold(astate, acfg.dynamic_percent)
            if acfg.dynamic
            else jnp.float32(acfg.threshold)
        )
        use_paste = (sim > thr) | jnp.asarray(acfg.mode == "paste_only")
        astate = push_sim(astate, sim)
        astate = astate.replace(
            n_paste=astate.n_paste + use_paste.astype(jnp.int32),
            n_discard=astate.n_discard + (~use_paste).astype(jnp.int32),
        )

        # choose batch: pasted vs original (paste_or_ori) / zero-loss
        n = batch["gt"]["boxes"].shape[1]
        images = jnp.where(use_paste, images_pasted, batch["image"])
        gt_orig_padded = {
            "boxes": jnp.pad(batch["gt"]["boxes"], ((0, 0), (0, gt_pasted["boxes"].shape[1] - n), (0, 0))),
            "classes": jnp.pad(batch["gt"]["classes"], ((0, 0), (0, gt_pasted["classes"].shape[1] - n))),
            "valid": jnp.pad(batch["gt"]["valid"], ((0, 0), (0, gt_pasted["valid"].shape[1] - n))),
            "masks": jnp.pad(
                batch["gt"]["masks"],
                ((0, 0), (0, gt_pasted["masks"].shape[1] - n), (0, 0), (0, 0)),
            ),
            "instance_source": jnp.pad(
                batch["gt"]["instance_source"],
                ((0, 0), (0, gt_pasted["instance_source"].shape[1] - n)),
            ),
        }
        gt = jax.tree.map(
            lambda a, b: jnp.where(
                use_paste.reshape((1,) * a.ndim), a, b
            ),
            gt_pasted,
            gt_orig_padded,
        )

        # E. final supervised step on the chosen batch (:701-778)
        (total, losses), grads = jax.value_and_grad(final_loss, has_aux=True)(
            state.params, images, sizes, gt, k_final
        )
        zero_out = jnp.asarray(acfg.mode == "paste_or_zero") & ~use_paste
        grads = jax.tree.map(lambda g: jnp.where(zero_out, jnp.zeros_like(g), g), grads)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = state.ema_params
        if ema_params is not None:
            ema_params = ema_update(ema_params, params, ema_decay)
        metrics = {
            "total_loss": total,
            "grad_sim": sim,
            "paste_used": use_paste.astype(jnp.float32),
            "threshold": thr,
            **{k: v.astype(jnp.float32) for k, v in losses.items()},
        }
        new_state = TrainState(state.step + 1, params, opt_state, ema_params)
        return new_state, astate, metrics

    return jax.jit(step_fn, donate_argnums=(0, 1))
