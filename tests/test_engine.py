"""Solver / train-step / mesh / checkpoint tests (pattern: detectron2
tests/test_scheduler.py, test_solver.py, test_checkpoint.py, test_engine.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from divergen_tpu.config import get_cfg
from divergen_tpu.solver import build_optimizer, ema_update, warmup_cosine_lr, warmup_multistep_lr
from divergen_tpu.engine import EventStorage, JSONWriter, TrainState, create_train_state, make_train_step
from divergen_tpu.parallel import batch_sharding, create_mesh, param_sharding_rules, shard_pytree


def test_warmup_cosine_schedule():
    sched = warmup_cosine_lr(1e-4, max_iter=1000, warmup_iters=100, warmup_factor=1e-3)
    assert float(sched(0)) == pytest.approx(1e-7, rel=1e-3)
    assert float(sched(100)) == pytest.approx(1e-4 * 0.5 * (1 + np.cos(np.pi * 0.1)), rel=1e-4)
    assert float(sched(1000)) == pytest.approx(0.0, abs=1e-9)


def test_warmup_multistep_schedule():
    sched = warmup_multistep_lr(0.1, steps=(60, 80), gamma=0.1, warmup_iters=10)
    assert float(sched(50)) == pytest.approx(0.1)
    assert float(sched(70)) == pytest.approx(0.01)
    assert float(sched(90)) == pytest.approx(0.001)


def test_optimizer_backbone_multiplier():
    cfg = get_cfg()
    cfg.SOLVER.BACKBONE_MULTIPLIER = 0.0  # freeze backbone group
    cfg.SOLVER.WARMUP_ITERS = 0
    params = {
        "params": {
            "bottom_up": {"w": jnp.ones((4, 4))},
            "roi_heads": {"w": jnp.ones((4, 4))},
        }
    }
    opt = build_optimizer(cfg, params)
    state = opt.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = opt.update(grads, state, params)
    assert float(jnp.abs(updates["params"]["bottom_up"]["w"]).sum()) == 0.0
    assert float(jnp.abs(updates["params"]["roi_heads"]["w"]).sum()) > 0.0


def test_ema_update():
    ema = {"w": jnp.zeros((2,))}
    p = {"w": jnp.ones((2,))}
    out = ema_update(ema, p, 0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.1, rtol=1e-6)


class _ToyModel:
    """Duck-typed .apply matching the train-step contract."""

    def apply(self, params, images, image_sizes, gt=None, rng=None, fed_weight=None, training=True):
        pred = jnp.mean(images.astype(jnp.float32)) * params["params"]["w"]
        return {"loss_toy": (pred - 1.0) ** 2}


def test_train_step_runs_and_decreases_loss():
    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = 0.1
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.LR_SCHEDULER_NAME = "WarmupMultiStepLR"
    cfg.SOLVER.STEPS = (10**9,)
    model = _ToyModel()
    params = {"params": {"w": jnp.asarray(5.0)}}
    opt = build_optimizer(cfg, params)
    state = create_train_state(params, opt, ema=True)
    step = make_train_step(model, opt, ema_decay=0.5, donate=False)
    batch = {
        "images": jnp.ones((4, 8, 8, 3)),
        "image_sizes": jnp.array([[8, 8]] * 4),
        "gt": {},
    }
    losses = []
    rng = jax.random.PRNGKey(0)
    for _ in range(20):
        state, metrics = step(state, batch, rng)
        losses.append(float(metrics["total_loss"]))
    assert int(state.step) == 20
    assert losses[-1] < losses[0]
    assert state.ema_params is not None


def test_mesh_and_param_sharding():
    mesh = create_mesh(data=-1, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    params = {"big": jnp.zeros((64, 128)), "small": jnp.zeros((4,))}
    rules = param_sharding_rules(params, mesh, min_size=128)
    sharded = shard_pytree(params, rules)
    assert sharded["big"].sharding.spec == jax.sharding.PartitionSpec(None, "model")
    assert sharded["small"].sharding.spec == jax.sharding.PartitionSpec()


def test_event_storage_and_json_writer(tmp_path):
    s = EventStorage()
    for i in range(5):
        s.put_scalar("loss", float(i))
        s.step()
    w = JSONWriter(str(tmp_path / "metrics.json"))
    w.write(s)
    w.close()
    import json

    rows = [json.loads(l) for l in open(tmp_path / "metrics.json")]
    assert rows[0]["iteration"] == 5
    assert rows[0]["loss"] == 2.0  # median of 0..4


def test_checkpoint_roundtrip(tmp_path):
    from divergen_tpu.engine.checkpoint import Checkpointer

    state = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}, "step": np.int32(7)}
    ck = Checkpointer(str(tmp_path))
    ck.save(7, state)
    ck.wait()
    template = jax.tree.map(lambda x: np.zeros_like(x), state)
    restored, it = ck.resume_or_load(template)
    assert it == 7
    np.testing.assert_array_equal(restored["params"]["w"], state["params"]["w"])
    # resume=False keeps the template
    same, it0 = ck.resume_or_load(template, resume=False)
    assert it0 == 0 and float(np.sum(same["params"]["w"])) == 0.0


def test_load_fed_weight(tmp_path):
    import json

    from divergen_tpu.engine.trainer import load_fed_weight

    info = [{"id": 1, "image_count": 100}, {"id": 2, "image_count": 4}]
    p = tmp_path / "cat_info.json"
    p.write_text(json.dumps(info))
    cfg = get_cfg()
    cfg.MODEL.ROI_BOX_HEAD.CAT_FREQ_PATH = str(p)
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 3  # padded with ones
    w = load_fed_weight(cfg)
    np.testing.assert_allclose(np.asarray(w), [10.0, 2.0, 1.0])
    cfg.MODEL.ROI_BOX_HEAD.CAT_FREQ_PATH = ""
    assert load_fed_weight(cfg) is None
