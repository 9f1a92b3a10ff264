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

from ..ops.copy_paste import normalize_cp_method, paste_instances_boxframe
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


def unique_paste_ids(instance_source: Array, valid: Array) -> Array:
    """[0,0,1,1],[0,1,..] → [0,0,1,2],[0,3,..]: pasted instances numbered
    1..P sequentially across the whole batch (reset_instance_source,
    custom_rcnn.py:317-329), so per-paste loss columns identify individual
    pastes."""
    is_paste = (instance_source > 0) & valid
    flat = is_paste.reshape(-1)
    ids = jnp.cumsum(flat.astype(jnp.int32))
    return jnp.where(flat, ids, 0).reshape(instance_source.shape)


def apply_compare_baseline(
    compare: str,
    decision: Array,  # () bool — the grad-sim decision
    key: Array,
    step: Array,
    schedule_iters: int,
) -> Array:
    """ACTIVE_COMPARE ablation baselines (compare_loss, custom_rcnn.py:
    1097-1169; '>' = paste). The reference compares probe losses; in the
    grad framework the comparison outcome is ``decision`` (sim > thr).

    default  — follow the decision.
    contra   — invert the decision (ref :1137-1141 flips the '<'/'>').
    all      — always paste.
    random   — paste w.p. 0.5; random_<p> — paste w.p. p.
    prob     — follow the decision w.p. 0.8, inverted otherwise.
    schedule — paste unconditionally w.p. step/schedule_iters, else follow.
    """
    if compare == "default":
        return decision
    if compare == "contra":
        return ~decision
    if compare == "all":
        return jnp.ones((), bool)
    if compare.startswith("random"):
        p = float(compare.split("_")[1]) if "_" in compare else 0.5
        return jax.random.bernoulli(key, p)
    if compare == "prob":
        follow = jax.random.bernoulli(key, 0.8)
        return jnp.where(follow, decision, ~decision)
    if compare == "schedule":
        ramp = jnp.clip(step.astype(jnp.float32) / float(schedule_iters), 0.0, 1.0)
        force = jax.random.bernoulli(key, ramp)
        return force | decision
    raise NotImplementedError(f"ACTIVE.COMPARE={compare}")


class DecisionLogger:
    """Per-decision txt logs in the reference's layout (custom_rcnn.py:
    610-686): ``OUTPUT/paste_source/rank_<r>/<iter//10000+1>0000.txt`` one
    line per pasted file, and ``OUTPUT/paste_ins_loss/...`` per-instance
    loss columns when the per-paste rows are enabled."""

    def __init__(self, out_dir: str, rank: int):
        import os

        self.out_dir = out_dir
        self.rank = rank
        self._os = os

    def _open(self, sub: str, it: int):
        path = self._os.path.join(
            self.out_dir, sub, f"rank_{self.rank}", f"{it // 10000 + 1}0000.txt"
        )
        self._os.makedirs(self._os.path.dirname(path), exist_ok=True)
        return open(path, "a")

    def log_decision(self, it, filenames, select_classes, paste, sim, thr,
                     paste_num):
        with self._open("paste_source", it) as f:
            for fn, cls in zip(filenames, select_classes):
                f.write(
                    f"{fn} select_class: {cls} paste: {int(paste)} iter: {it}"
                    f" loss_dif: {round(float(sim) - float(thr), 4)}"
                    f" paste_num: {paste_num}"
                    f" sim_paste_init: {round(float(sim), 4)}"
                    f" threshold: {round(float(thr), 4)}\n"
                )

    def close(self) -> None:
        """Files are opened per-write; nothing held open."""

    def log_paste_ins(self, it, rows, paste, paste_num):
        """rows: iterable of (filename, select_class, ins_loss, max_error_class,
        max_error_loss)."""
        with self._open("paste_ins_loss", it) as f:
            for fn, cls, loss, mec, mel in rows:
                f.write(
                    f"{fn} select_class: {cls} paste: {int(paste)} iter: {it}"
                    f" paste_num: {paste_num}"
                    f" paste_ins_loss: {round(float(loss), 4)}"
                    f" max_error_class: {int(mec)}"
                    f" max_error_loss: {round(float(mel), 4)}\n"
                )


def paste_ins_rows(aux: Dict[str, Any], filenames) -> list:
    """Join the per-paste loss columns (segment-mean over proposal rows by
    unique paste id) with host-side filename provenance.

    ``aux``: device_get of metrics['aux_paste_rows'].
    ``filenames``: (B, MP) string array from the mapper (device-skipped).
    Returns rows for DecisionLogger.log_paste_ins.
    """
    import numpy as np

    ids_gt = np.asarray(aux["gt_ids"])  # (B, N)
    valid = np.asarray(aux["gt_valid"])
    classes = np.asarray(aux["gt_classes"])
    row_loss = np.asarray(aux["loss"]).reshape(-1)
    row_id = np.asarray(aux["id"]).reshape(-1)
    row_mec = np.asarray(aux["max_class"]).reshape(-1)
    row_mel = np.asarray(aux["max_loss"]).reshape(-1)

    fn_flat = np.asarray(filenames).reshape(-1) if filenames is not None else None
    rows = []
    b, n = ids_gt.shape
    # paste slots come after the base instances: the j-th pasted instance of
    # image i corresponds to filenames[i, j]
    for i in range(b):
        slot = 0
        for j in range(n):
            if not valid[i, j] or ids_gt[i, j] <= 0:
                continue
            uid = ids_gt[i, j]
            sel = row_id == uid
            if sel.any():
                loss = float(row_loss[sel].mean())
                mec = int(row_mec[sel][0])
                mel = float(row_mel[sel].max())
            else:
                loss, mec, mel = 0.0, -1, 0.0
            if fn_flat is not None:
                fn = np.asarray(filenames)[i, slot] if slot < np.asarray(filenames).shape[1] else ""
            else:
                fn = ""
            rows.append((fn, int(classes[i, j]), loss, mec, mel))
            slot += 1
    return rows


@dataclasses.dataclass(frozen=True)
class ActiveConfig:
    mode: str = "paste_or_ori"  # paste_or_zero | paste_or_ori | paste_only
    loss_keys: Tuple[str, ...] = ("loss_cls_stage0", "loss_cls_stage1", "loss_cls_stage2")
    momentum: float = 0.1
    threshold: float = -0.05
    dynamic: bool = False
    dynamic_percent: float = 0.5
    cp_mode: str = "basic"
    compare: str = "default"
    schedule_iters: int = 90000
    per_instance: bool = False
    per_instance_percent: float = 0.9
    per_paste_rows: bool = False
    # --- decision machinery selection (ref ACTIVE_GRAD_COMPARE /
    # ACTIVE_FORWARD_ONCE / ACTIVE_ONCE_MODE, custom_rcnn.py:341-605) ---
    grad_compare: bool = True  # False → inner-SGD probe-loss comparison
    forward_once: bool = True  # grad path: paste-keys-only grad from ONE fwd
    gt_compare: bool = False  # ONCE_MODE 'only_gt': sim(paste) vs sim(nopaste)
    # ONCE_MODE 'only_paste_dynamic_linear_<s>_<e>': keep-rate annealed
    # s→e over max_iter, queue percentile = 1-rate (ref :132-136,544-548)
    dynamic_linear: Optional[Tuple[float, float]] = None
    max_iter: int = 90000
    inner_lr: float = 0.01  # loss-compare probe update (ref ACTIVE_LR)
    bank_update_period: int = 1
    probe_batch: int = 4  # ACTIVE_TEST_BATCHSIZE (trainer slices the probe)

    @staticmethod
    def from_cfg(cfg) -> "ActiveConfig":
        a = cfg.MODEL.ACTIVE
        threshold = a.THRESHOLD
        dynamic = a.DYNAMIC_THRESHOLD
        dynamic_percent = a.DYNAMIC_PERCENT
        gt_compare = False
        dynamic_linear = None
        if a.FORWARD_ONCE and a.GRAD_COMPARE and a.ONCE_MODE:
            # the reference encodes the once-forward decision in a mode
            # string (custom_rcnn.py:127-136, 523-548); parse it so BSGAL
            # YAMLs drive the same behavior here
            om = a.ONCE_MODE
            if om == "only_gt":
                gt_compare = True
            elif om.startswith("only_paste"):
                parts = om.split("_")
                if "dynamic" in parts:
                    dynamic = True
                    if "linear" in parts:
                        dynamic_linear = (float(parts[-2]), float(parts[-1]))
                    else:
                        dynamic_percent = 1.0 - float(parts[-1])
                else:
                    threshold = float(parts[-1])
                    dynamic = False
            else:
                raise NotImplementedError(f"ACTIVE.ONCE_MODE={om}")
        if a.OPTIMIZER.lower() != "sgd":
            raise NotImplementedError(
                f"ACTIVE.OPTIMIZER={a.OPTIMIZER} (loss-compare inner update "
                "implements the reference default 'SGD', custom_rcnn.py:150-156)"
            )
        return ActiveConfig(
            mode=a.MODE,
            loss_keys=tuple(a.LOSS),
            momentum=a.MOMENTUM,
            threshold=threshold,
            dynamic=dynamic,
            dynamic_percent=dynamic_percent,
            cp_mode=normalize_cp_method(cfg.INPUT.CP_METHOD),
            compare=a.COMPARE,
            schedule_iters=a.SCHEDULE_ITERS,
            per_instance=a.PER_INSTANCE,
            per_instance_percent=a.PER_INSTANCE_PERCENT,
            per_paste_rows=a.ONLY_GT_TRAIN or a.PER_INSTANCE,
            grad_compare=a.GRAD_COMPARE,
            forward_once=a.FORWARD_ONCE,
            gt_compare=gt_compare,
            dynamic_linear=dynamic_linear,
            max_iter=cfg.SOLVER.MAX_ITER,
            inner_lr=a.INNER_LR,
            bank_update_period=a.BANK_UPDATE_PERIOD,
            probe_batch=a.PROBE_BATCH,
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

    def _scalar_keys(losses):
        return [k for k in losses if "paste_ins" not in k and not k.startswith("aux_")]

    def probe_loss(params, probe, rng):
        losses = model.apply(
            params, probe["image"], probe["image_size"], gt=probe["gt"], rng=rng,
            training=True, gt_as_proposals=True,
        )
        sel = [losses[k] for k in acfg.loss_keys if k in losses]
        if not sel:  # fall back to every non-split loss (ACTIVE_LOSS 'all')
            sel = [losses[k] for k in _scalar_keys(losses)]
        return sum(v.astype(jnp.float32) for v in sel)

    def paste_part_loss(params, images, sizes, gt, rng):
        losses = model.apply(params, images, sizes, gt=gt, rng=rng, training=True)
        paste_keys = [k for k in losses if "loss_paste_ins" in k]
        return sum(losses[k].astype(jnp.float32) for k in paste_keys), losses

    def nopaste_part_loss(params, images, sizes, gt, rng):
        # the non-pasted columns of the SAME forward (ONCE_MODE 'only_gt'
        # splits one forward's losses into paste vs ori, ref :505-529)
        losses = model.apply(params, images, sizes, gt=gt, rng=rng, training=True)
        keys = [k for k in losses if "loss_nopaste_ins" in k]
        return sum(losses[k].astype(jnp.float32) for k in keys)

    def final_loss(params, images, sizes, gt, rng):
        losses = model.apply(params, images, sizes, gt=gt, rng=rng, training=True)
        total = sum(losses[k].astype(jnp.float32) for k in _scalar_keys(losses))
        return total, losses

    def step_fn(state: TrainState, astate: ActiveState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        k_probe, k_paste, k_final, k_cmp = jax.random.split(rng, 4)

        images_pasted, gt_pasted = composite(batch)
        if acfg.per_paste_rows:
            # unique ids 1..P (reset_instance_source, :317-329) so stage-0
            # per-paste loss columns identify individual pasted instances
            gt_pasted["instance_source"] = unique_paste_ids(
                gt_pasted["instance_source"], gt_pasted["valid"]
            )
        sizes = batch["image_size"]
        # original batch padded to the pasted gt width (candidate B of the
        # decision, and the loss-compare probe's 'ori' side)
        n = batch["gt"]["boxes"].shape[1]
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

        if acfg.grad_compare:
            # A. real-data probe gradient → EMA bank (:347-354,445-447),
            # refreshed every BANK_UPDATE_PERIOD steps
            g_test = jax.grad(probe_loss)(state.params, batch["probe"], k_probe)
            astate_new = update_bank(astate, g_test, acfg.momentum)
            if acfg.bank_update_period > 1:
                do = (state.step % acfg.bank_update_period) == 0
                astate = jax.tree.map(
                    lambda nw, od: jnp.where(do, nw, od), astate_new, astate
                )
            else:
                astate = astate_new

            # B. candidate gradient + C. similarity decision (:480-605)
            if acfg.forward_once:
                # paste-keys-only grad from ONE pasted forward
                (_, paste_losses), g_paste = jax.value_and_grad(
                    paste_part_loss, has_aux=True
                )(state.params, images_pasted, sizes, gt_pasted, k_paste)
                sim = tree_cosine(g_paste, astate.grad_bank)
                if acfg.gt_compare:  # ONCE_MODE 'only_gt' (:523-529)
                    g_nopaste = jax.grad(nopaste_part_loss)(
                        state.params, images_pasted, sizes, gt_pasted, k_paste
                    )
                    thr = tree_cosine(g_nopaste, astate.grad_bank)
                elif acfg.dynamic_linear is not None:
                    s_r, e_r = acfg.dynamic_linear
                    rate = s_r + (e_r - s_r) * jnp.clip(
                        state.step.astype(jnp.float32) / float(acfg.max_iter), 0.0, 1.0
                    )
                    thr = dynamic_threshold(astate, 1.0 - rate)
                elif acfg.dynamic:
                    thr = dynamic_threshold(astate, acfg.dynamic_percent)
                else:
                    thr = jnp.float32(acfg.threshold)
            else:
                # two-forward grad compare (:366-383, :555-560): full-batch
                # grads of both candidates against the bank
                (_, paste_losses), g_paste_full = jax.value_and_grad(
                    final_loss, has_aux=True
                )(state.params, images_pasted, sizes, gt_pasted, k_paste)
                sim = tree_cosine(g_paste_full, astate.grad_bank)
                g_ori_full, _ = jax.grad(final_loss, has_aux=True)(
                    state.params, batch["image"], sizes, gt_orig_padded, k_paste
                )
                thr = tree_cosine(g_ori_full, astate.grad_bank)
        else:
            # loss-compare (ref ACTIVE_GRAD_COMPARE=False default,
            # :341-399,555-575): virtual inner-SGD step on each candidate,
            # compare the probe loss afterwards. JAX version needs no
            # state_dict deepcopy/restore — candidate params are fresh trees.
            (_, paste_losses), g_paste_full = jax.value_and_grad(
                final_loss, has_aux=True
            )(state.params, images_pasted, sizes, gt_pasted, k_paste)
            params_p = jax.tree.map(
                lambda p, g: p - acfg.inner_lr * g.astype(p.dtype),
                state.params, g_paste_full,
            )
            loss_paste_test = probe_loss(params_p, batch["probe"], k_probe)
            g_ori_full, _ = jax.grad(final_loss, has_aux=True)(
                state.params, batch["image"], sizes, gt_orig_padded, k_paste
            )
            params_o = jax.tree.map(
                lambda p, g: p - acfg.inner_lr * g.astype(p.dtype),
                state.params, g_ori_full,
            )
            loss_ori_test = probe_loss(params_o, batch["probe"], k_probe)
            # loss_dif > 0 ⇔ paste probe loss lower ⇔ paste better
            # (compare_loss 'default': '>' when new < old, :1155-1159)
            sim = loss_ori_test - loss_paste_test
            thr = jnp.float32(0.0)

        decision = apply_compare_baseline(
            acfg.compare, sim > thr, k_cmp, state.step, acfg.schedule_iters
        )
        use_paste = decision | jnp.asarray(acfg.mode == "paste_only")
        astate = push_sim(astate, sim)
        astate = astate.replace(
            n_paste=astate.n_paste + use_paste.astype(jnp.int32),
            n_discard=astate.n_discard + (~use_paste).astype(jnp.int32),
        )

        if acfg.per_instance:
            # Per-INSTANCE decision (TPU redesign; reference logs per-paste
            # losses, custom_rcnn.py:385-387 + :671-686, but decides per
            # batch): drop pasted instances whose stage-0 per-paste CE sits
            # above the per_instance_percent quantile of this batch's pastes.
            row_loss = paste_losses["aux_paste_row_loss_stage0"].reshape(-1)
            row_id = paste_losses["aux_paste_row_id_stage0"].reshape(-1)
            n_ids = gt_pasted["instance_source"].size + 1  # static id cap
            seg = jax.ops.segment_sum(row_loss, row_id, num_segments=n_ids)
            cnt = jax.ops.segment_sum(
                (row_id > 0).astype(jnp.float32), row_id, num_segments=n_ids
            )
            per_id = seg / jnp.maximum(cnt, 1.0)
            present = (cnt > 0).at[0].set(False)
            n_present = jnp.maximum(jnp.sum(present), 1)
            s = jnp.sort(jnp.where(present, per_id, jnp.inf))
            qidx = jnp.clip(
                (acfg.per_instance_percent * (n_present - 1)).astype(jnp.int32),
                0, n_ids - 1,
            )
            keep_id = per_id <= s[qidx]
            ids_gt = gt_pasted["instance_source"]
            drop = (ids_gt > 0) & present[ids_gt] & ~keep_id[ids_gt]
            gt_pasted = dict(gt_pasted)
            gt_pasted["valid"] = gt_pasted["valid"] & ~drop

        # choose batch: pasted vs original (paste_or_ori) / zero-loss
        images = jnp.where(use_paste, images_pasted, batch["image"])
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
        paste_num = jnp.sum(
            (gt_pasted["instance_source"] > 0) & gt_pasted["valid"]
        ).astype(jnp.int32)
        metrics = {
            "total_loss": total,
            "grad_sim": sim,
            "paste_used": use_paste.astype(jnp.float32),
            "threshold": thr,
            "paste_num": paste_num.astype(jnp.float32),
            **{
                k: v.astype(jnp.float32)
                for k, v in losses.items()
                if not k.startswith("aux_")
            },
        }
        if acfg.per_paste_rows:
            # per-paste loss columns for the paste_ins_loss decision log
            # (custom_rcnn.py:671-686); trainer pops this nested entry
            metrics["aux_paste_rows"] = {
                "loss": paste_losses["aux_paste_row_loss_stage0"],
                "max_class": paste_losses["aux_paste_row_max_class_stage0"],
                "max_loss": paste_losses["aux_paste_row_max_loss_stage0"],
                "id": paste_losses["aux_paste_row_id_stage0"],
                "gt_ids": gt_pasted["instance_source"],
                "gt_valid": gt_pasted["valid"],
                "gt_classes": gt_pasted["classes"],
            }
        new_state = TrainState(state.step + 1, params, opt_state, ema_params)
        return new_state, astate, metrics

    return jax.jit(step_fn, donate_argnums=(0, 1))
