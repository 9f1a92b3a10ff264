#!/usr/bin/env python
"""Training/eval entry point.

Counterpart of ``DiverGen/train_net.py:1-390`` / ``BSGAL/train_net.py``:
``setup`` (cfg merge + freeze), ``do_train``, ``do_test``, launched CLI.
The reference's ``launch``/mp.spawn/NCCL process bootstrap
(detectron2/engine/launch.py:27-122) is replaced by
``jax.distributed.initialize()`` (one process per host) and an in-config
device mesh — no --num-gpus / --machine-rank plumbing needed.
"""
from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def default_argument_parser():
    p = argparse.ArgumentParser(description="divergen_tpu training")
    p.add_argument("--config-file", default="", metavar="FILE")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--eval-only", action="store_true")
    p.add_argument("--max-steps", type=int, default=None, help="cap iterations (smoke runs)")
    p.add_argument("--multi-host", action="store_true", help="jax.distributed.initialize()")
    p.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return p


def setup(args):
    from divergen_tpu.config import get_cfg

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    # '/auto' OUTPUT_DIR templating (train_net.py:320-327)
    if cfg.OUTPUT_DIR.endswith("/auto") and args.config_file:
        name = os.path.splitext(os.path.basename(args.config_file))[0]
        cfg.OUTPUT_DIR = cfg.OUTPUT_DIR[: -len("auto")] + name
    cfg.freeze()
    os.makedirs(cfg.OUTPUT_DIR, exist_ok=True)
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s: %(message)s",
    )
    return cfg


def main(args):
    cfg = setup(args)
    if args.multi_host:
        import jax

        jax.distributed.initialize()

    from divergen_tpu.data.datasets.lvis import register_builtin

    register_builtin()

    if args.eval_only:
        from divergen_tpu.engine.eval_loop import do_test

        return do_test(cfg, resume=args.resume)

    from divergen_tpu.engine.trainer import do_train

    do_train(cfg, resume=args.resume, max_steps=args.max_steps)


if __name__ == "__main__":
    main(default_argument_parser().parse_args())
