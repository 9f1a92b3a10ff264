"""Export a trained detector as a serialized StableHLO deployment artifact.

TPU-native counterpart of the reference deployment tool
(``BSGAL/third_party/CenterNet2/tools/deploy/export_model.py:24-101`` —
TorchScript/Caffe2/ONNX tracing): here the artifact is a ``jax.export``
StableHLO module (see divergen_tpu/export.py for the format notes).

Usage:
  python tools/export_model.py --config-file configs/... \
      --output /tmp/model.stablehlo [--height 896 --width 896] [--batch 1] \
      [--bake-params] [--checkpoint-dir OUT_DIR] [--ema] \
      [--platforms tpu cpu] [--run-sample]
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-file", default="")
    p.add_argument("--output", required=True)
    p.add_argument("opts", nargs=argparse.REMAINDER, default=[])
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--height", type=int, default=0,
                   help="input canvas height (default: cfg INPUT.TEST_SIZE)")
    p.add_argument("--width", type=int, default=0)
    p.add_argument("--checkpoint-dir", default="",
                   help="orbax checkpoint dir (default: cfg.OUTPUT_DIR); "
                        "random init when absent (shape/compile check)")
    p.add_argument("--ema", action="store_true",
                   help="export the EMA params (the eval default, "
                        "train_net.py do_test)")
    p.add_argument("--bake-params", action="store_true")
    p.add_argument("--platforms", nargs="*", default=None)
    p.add_argument("--run-sample", action="store_true",
                   help="deserialize the artifact and run one zero-image "
                        "batch through it as a smoke check")
    return p.parse_args()


def main():
    import jax
    import jax.numpy as jnp

    from divergen_tpu.config import get_cfg
    from divergen_tpu.export import export_inference, load_exported, save_exported
    from divergen_tpu.modeling.meta_arch.rcnn import build_model

    args = parse_args()
    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    size = int(cfg.INPUT.get("TEST_SIZE", 0) or cfg.INPUT.MIN_SIZE_TEST or 896)
    h = args.height or size
    w = args.width or size

    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    im0 = jnp.zeros((1, h, w, 3), jnp.float32)
    sz0 = jnp.asarray([[h, w]], jnp.int32)
    gt_side = cfg.MODEL.ROI_MASK_HEAD.get("GT_SIDE", 28)
    gt0 = {
        "boxes": jnp.asarray([[[4.0, 4, 30, 30]] * 4]),
        "classes": jnp.zeros((1, 4), jnp.int32),
        "valid": jnp.asarray([[True] + [False] * 3]),
        "masks": jnp.ones((1, 4, gt_side, gt_side), jnp.float32),
        "instance_source": jnp.zeros((1, 4), jnp.int32),
    }
    params = jax.jit(
        lambda: model.init(rng, im0, sz0, gt=gt0, rng=rng, training=True)
    )()

    ckpt_dir = args.checkpoint_dir or cfg.OUTPUT_DIR
    if ckpt_dir:
        from divergen_tpu.engine.checkpoint import Checkpointer
        from divergen_tpu.engine.train_loop import create_train_state
        from divergen_tpu.solver.build import build_optimizer

        ck = Checkpointer(ckpt_dir)
        if ck.latest_step() is not None:
            state = ck.resume_or_load(
                create_train_state(params, build_optimizer(cfg, params), ema=True)
            )[0]
            params = state.ema_params if args.ema else state.params
            print(f"loaded step-{int(state.step)} "
                  f"{'EMA ' if args.ema else ''}params from {ckpt_dir}")
        else:
            print(f"no checkpoint under {ckpt_dir!r}; exporting random init")

    exp = export_inference(
        model, params, batch=args.batch, height=h, width=w,
        platforms=args.platforms, bake_params=args.bake_params,
    )
    path = save_exported(exp, args.output)
    print(f"exported {path} platforms={exp.platforms} "
          f"inputs={[str(a) for a in exp.in_avals]}")

    if args.run_sample:
        loaded = load_exported(path)
        imgs = jnp.zeros((args.batch, h, w, 3), jnp.float32)
        sizes = jnp.tile(jnp.asarray([[h, w]], jnp.int32), (args.batch, 1))
        out = loaded(imgs, sizes) if args.bake_params else loaded(params, imgs, sizes)
        print("sample run OK:", {k: v.shape for k, v in out.items()})


if __name__ == "__main__":
    main()
