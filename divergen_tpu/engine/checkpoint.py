"""Orbax checkpointing: params / opt_state / EMA / step (+ grad bank).

Counterpart of detectron2's ``DetectionCheckpointer`` + ``PeriodicCheckpointer``
(``detectron2/checkpoint/``; used at ``DiverGen/train_net.py:140-152,304``).
``resume_or_load`` keeps the reference semantics: if a checkpoint exists in
output_dir, resume (restoring the iteration); otherwise start from
``cfg.MODEL.WEIGHTS`` (a pretrained-params file) at iteration 0.

Torch ``.pkl``/``.pth`` are replaced by orbax's tensorstore format; pretrained
torch backbones come in through the converters in
``divergen_tpu/utils/torch_weights.py`` instead of pickle loading.
"""
from __future__ import annotations

import logging
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


class Checkpointer:
    def __init__(self, output_dir: str, max_to_keep: int = 5):
        self.dir = os.path.abspath(os.path.join(output_dir, "checkpoints"))
        os.makedirs(self.dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any, force: bool = False) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state), force=force)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.dir}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(state_template))

    def resume_or_load(self, state_template: Any, resume: bool = True):
        """(state, start_iter): resume from latest if present, else the
        template unchanged at iter 0 (DetectionCheckpointer.resume_or_load)."""
        step = self._mgr.latest_step()
        if resume and step is not None:
            logger.info("resuming from checkpoint step %d", step)
            return self.restore(state_template, step), step
        return state_template, 0


class PeriodicCheckpointer:
    """Save every ``period`` iters + at max_iter (detectron2 semantics)."""

    def __init__(self, checkpointer: Checkpointer, period: int, max_iter: int):
        self.ckpt = checkpointer
        self.period = max(int(period), 1)
        self.max_iter = max_iter

    def step(self, iteration: int, state: Any) -> None:
        it = int(iteration)
        if (it + 1) % self.period == 0 or (it + 1) >= self.max_iter:
            self.ckpt.save(it + 1, jax.device_get(state))
