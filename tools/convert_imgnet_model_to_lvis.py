#!/usr/bin/env python
"""Truncate a 1453-way (1203 LVIS + 250 ImageNet, GDDE mode) classifier back
to 1203 + background (↔ DiverGen/tools/convert_imgnet_model_to_lvis.py:62-117,
which slices cls_score weight/bias and freq_weight in model + model_ema).

Operates on this framework's orbax checkpoints: every ``cls_score`` kernel/
bias under ``box_predictor*`` has its CLASS axis (last dim here — flax Dense
kernels are (in, out), torch linear weights are (out, in)) cut to the first
``output_num_category`` classes plus the trailing background slot, in both
``params`` and ``ema_params``.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def truncate_tree(tree, n_in: int, n_out: int, path=()):
    import jax

    def visit(p, leaf):
        keys = "/".join(str(getattr(k, "key", k)) for k in p)
        if "box_predictor" in keys and "cls_score" in keys:
            if leaf.shape[-1] == n_in + 1:
                return np.concatenate([leaf[..., :n_out], leaf[..., -1:]], axis=-1)
            if leaf.shape[-1] == n_in:  # freq-style buffers
                return leaf[..., :n_out]
        return leaf

    return jax.tree_util.tree_map_with_path(visit, tree)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input_dir", required=True, help="orbax checkpoint root (OUTPUT_DIR)")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--input_num_category", type=int, default=1453)
    p.add_argument("--output_num_category", type=int, default=1203)
    args = p.parse_args(argv)

    import jax
    from divergen_tpu.engine.checkpoint import Checkpointer

    src = Checkpointer(args.input_dir)
    step = src.latest_step()
    assert step is not None, f"no checkpoint in {args.input_dir}"
    state = src._mgr.restore(step)
    for key in ("params", "ema_params"):
        if state.get(key) is not None:
            state[key] = truncate_tree(state[key], args.input_num_category, args.output_num_category)
    dst = Checkpointer(args.output_dir)
    dst.save(step, state)
    dst.wait()
    print(f"truncated {args.input_num_category}->{args.output_num_category} @ step {step}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
