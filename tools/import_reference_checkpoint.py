"""Convert a reference detector checkpoint (.pth/.pkl) into an orbax
checkpoint that ``train_net.py --eval-only`` / ``--resume`` consumes.

Counterpart of DetectionCheckpointer's transparent torch loading
(detectron2/checkpoint/): the reference evaluates published DiverGen/BSGAL
.pth files directly; here the conversion is one explicit offline step.

Usage:
  python tools/import_reference_checkpoint.py \
      --config-file configs/DiverGen_swinL.yaml \
      --checkpoint models/divergen_swinL_1200k_gdde.pth \
      --output output/divergen_swinL  [--step 0] [--ema]

Writes OUTPUT/checkpoints/<step>/ holding a full TrainState (params +
fresh optimizer state [+ EMA copy]) so both eval and fine-tune resumes work.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")

# conversion is pure host work (name mapping + a tiny-shape init); run on
# CPU so importing a checkpoint never requires a live TPU
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--output", default=None, help="default: cfg.OUTPUT_DIR")
    ap.add_argument("--step", type=int, default=0)
    ap.add_argument("--ema", action="store_true",
                    help="also seed the EMA slot with the loaded weights")
    ap.add_argument("opts", nargs="*")
    args = ap.parse_args()

    import jax.numpy as jnp

    from divergen_tpu.config import get_cfg
    from divergen_tpu.engine.checkpoint import Checkpointer
    from divergen_tpu.engine.train_loop import create_train_state
    from divergen_tpu.modeling.meta_arch.rcnn import build_model
    from divergen_tpu.solver import build_optimizer
    from divergen_tpu.utils.torch_weights import load_d2_detector_into

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    model = build_model(cfg)

    # tiny-shape init: param shapes don't depend on the image size
    s = 64
    imgs = jnp.zeros((1, s, s, 3), jnp.float32)
    sizes = jnp.asarray([[s, s]], jnp.int32)
    n = 4
    gt = {
        "boxes": jnp.asarray([[[4.0, 4.0, 30.0, 30.0]] * n]),
        "classes": jnp.zeros((1, n), jnp.int32),
        "valid": jnp.asarray([[True] + [False] * (n - 1)]),
        "masks": jnp.ones((1, n, cfg.MODEL.ROI_MASK_HEAD.GT_SIDE,
                           cfg.MODEL.ROI_MASK_HEAD.GT_SIDE), jnp.float32),
        "instance_source": jnp.zeros((1, n), jnp.int32),
    }
    key = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda: model.init(key, imgs, sizes, gt=gt, rng=key, training=True)
    )()

    params = load_d2_detector_into(
        params, args.checkpoint, cfg,
        fpn_in_features=model.fpn_in_features,
    )
    params = jax.tree.map(jnp.asarray, params)

    optimizer = build_optimizer(cfg, params)
    state = create_train_state(params, optimizer, ema=args.ema or cfg.MODEL.MODEL_EMA > 0)
    state = state.replace(step=jnp.asarray(args.step, jnp.int32))
    out_dir = args.output or cfg.OUTPUT_DIR
    ckpt = Checkpointer(out_dir)
    ckpt.save(args.step, jax.device_get(state), force=True)
    ckpt.wait()
    n_params = sum(np.asarray(p).size for p in jax.tree.leaves(params))
    print(f"imported {args.checkpoint} -> {out_dir}/checkpoints/{args.step} "
          f"({n_params/1e6:.1f}M params)")


if __name__ == "__main__":
    main()
