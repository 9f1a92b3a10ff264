"""BSGAL active-selection tests: bank EMA, cosine, dynamic threshold, and
the full active train step on a tiny detector."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from divergen_tpu.active.bsgal import (
    ActiveState,
    DecisionLogger,
    apply_compare_baseline,
    dynamic_threshold,
    init_active_state,
    make_active_train_step,
    paste_ins_rows,
    push_sim,
    tree_cosine,
    unique_paste_ids,
    update_bank,
)
from divergen_tpu.config import get_cfg
from divergen_tpu.engine.train_loop import create_train_state
from divergen_tpu.modeling.meta_arch.rcnn import build_model
from divergen_tpu.solver import build_optimizer


def test_tree_cosine():
    a = {"x": jnp.array([1.0, 0.0]), "y": jnp.array([[2.0]])}
    b = {"x": jnp.array([1.0, 0.0]), "y": jnp.array([[2.0]])}
    assert float(tree_cosine(a, b)) == pytest.approx(1.0)
    c = {"x": jnp.array([-1.0, 0.0]), "y": jnp.array([[-2.0]])}
    assert float(tree_cosine(a, c)) == pytest.approx(-1.0)


def test_bank_first_update_copies_then_ema():
    params = {"w": jnp.zeros((3,))}
    st = init_active_state(params, queue_size=4)
    g1 = {"w": jnp.ones((3,))}
    st = update_bank(st, g1, momentum=0.1)
    np.testing.assert_allclose(np.asarray(st.grad_bank["w"]), 1.0)
    g2 = {"w": jnp.full((3,), 2.0)}
    st = update_bank(st, g2, momentum=0.1)
    np.testing.assert_allclose(np.asarray(st.grad_bank["w"]), 0.9 * 1.0 + 0.1 * 2.0)


def test_dynamic_threshold_percentile():
    st = init_active_state({"w": jnp.zeros(1)}, queue_size=8)
    for v in [0.1, 0.5, 0.9, 0.3]:
        st = push_sim(st, jnp.float32(v))
    thr = float(dynamic_threshold(st, 0.5))
    assert thr == pytest.approx(0.3)  # idx floor(0.5*3)=1 of sorted [.1,.3,.5,.9]


def test_unique_paste_ids():
    """reset_instance_source parity (BSGAL custom_rcnn.py:317-329):
    [0,0,1,1] / [0,1] → [0,0,1,2] / [0,3]."""
    src = jnp.array([[0, 0, 1, 1], [0, 1, 0, 0]], jnp.int32)
    valid = jnp.array([[True, True, True, True], [True, True, False, False]])
    ids = np.asarray(unique_paste_ids(src, valid))
    np.testing.assert_array_equal(ids, [[0, 0, 1, 2], [0, 3, 0, 0]])
    # invalid pasted slots get no id
    ids2 = np.asarray(unique_paste_ids(src, jnp.zeros_like(valid)))
    assert ids2.sum() == 0


def test_apply_compare_baseline_modes():
    """ACTIVE_COMPARE ablations (custom_rcnn.py:1097-1169)."""
    k = jax.random.PRNGKey(0)
    dec_t = jnp.asarray(True)
    dec_f = jnp.asarray(False)
    step = jnp.asarray(1000, jnp.int32)
    # default follows the decision
    assert bool(apply_compare_baseline("default", dec_f, k, step, 90000)) is False
    assert bool(apply_compare_baseline("default", dec_t, k, step, 90000)) is True
    # all always pastes
    assert bool(apply_compare_baseline("all", dec_f, k, step, 90000)) is True
    # random_<p>: p=1 always, p=0 never
    assert bool(apply_compare_baseline("random_1.0", dec_f, k, step, 90000)) is True
    assert bool(apply_compare_baseline("random_0.0", dec_t, k, step, 90000)) is False
    # random ~ p=0.5: both outcomes occur over many keys
    vals = {
        bool(apply_compare_baseline("random", dec_f, jax.random.PRNGKey(i), step, 90000))
        for i in range(32)
    }
    assert vals == {True, False}
    # prob: follows the decision ~80% of the time
    follows = [
        bool(apply_compare_baseline("prob", dec_t, jax.random.PRNGKey(i), step, 90000))
        for i in range(200)
    ]
    assert 0.65 < np.mean(follows) < 0.95
    # schedule: at step >= schedule_iters, always paste
    assert bool(
        apply_compare_baseline("schedule", dec_f, k, jnp.asarray(90000), 90000)
    ) is True
    # at step 0, never forced: follows the decision
    assert bool(
        apply_compare_baseline("schedule", dec_f, k, jnp.asarray(0), 90000)
    ) is False
    with pytest.raises(NotImplementedError):
        apply_compare_baseline("nope", dec_t, k, step, 90000)


def test_decision_logger_reference_layout(tmp_path):
    """paste_source/rank_*/N0000.txt + paste_ins_loss files
    (custom_rcnn.py:610-686)."""
    import os

    lg = DecisionLogger(str(tmp_path), rank=0)
    lg.log_decision(12345, ["a.png", "b.png"], [3, 7], 1, 0.12, -0.05, 2)
    path = tmp_path / "paste_source" / "rank_0" / "20000.txt"
    assert path.exists()
    lines = path.read_text().strip().split("\n")
    assert len(lines) == 2
    assert lines[0].startswith("a.png select_class: 3 paste: 1 iter: 12345")
    assert "loss_dif:" in lines[0] and "paste_num: 2" in lines[0]
    lg.log_paste_ins(5, [("a.png", 3, 0.5, 10, 0.3)], 1, 1)
    p2 = tmp_path / "paste_ins_loss" / "rank_0" / "10000.txt"
    assert p2.exists()
    assert "paste_ins_loss: 0.5" in p2.read_text()
    assert "max_error_class: 10" in p2.read_text()


def test_paste_ins_rows_join():
    aux = {
        "gt_ids": np.array([[0, 1, 2], [0, 0, 3]]),
        "gt_valid": np.array([[True, True, True], [True, False, True]]),
        "gt_classes": np.array([[5, 6, 7], [5, 6, 8]]),
        # proposal rows: two rows matched paste id 1, one matched id 3
        "loss": np.array([[0.0, 2.0, 4.0], [0.0, 0.0, 6.0]]),
        "id": np.array([[0, 1, 1], [0, 0, 3]]),
        "max_class": np.array([[0, 9, 9], [0, 0, 11]]),
        "max_loss": np.array([[0.0, 1.0, 3.0], [0.0, 0.0, 5.0]]),
    }
    fns = np.array([["p0.png", "p1.png"], ["p2.png", ""]])
    rows = paste_ins_rows(aux, fns)
    # image 0: ids 1, 2 (id 2 matched no proposal rows); image 1: id 3
    assert len(rows) == 3
    by_fn = {r[0]: r for r in rows}
    assert by_fn["p0.png"][2] == pytest.approx(3.0)  # mean of rows 2.0, 4.0
    assert by_fn["p0.png"][4] == pytest.approx(3.0)  # max of max_loss
    assert by_fn["p2.png"][2] == pytest.approx(6.0)
    assert by_fn["p1.png"][2] == 0.0  # no matched rows


def _tiny_batch(rng, b=2, n=4, p=2, size=64, ps=16, n_classes=4):
    def gt(nn):
        return {
            "boxes": jnp.array(rng.rand(b, nn, 4).astype(np.float32) * 20 + np.array([5, 5, 25, 25], np.float32)),
            "classes": jnp.array(rng.randint(0, n_classes, (b, nn)), jnp.int32),
            "valid": jnp.array(np.broadcast_to(np.arange(nn) < 2, (b, nn))),
            "masks": jnp.ones((b, nn, 16, 16), jnp.float32),
            "instance_source": jnp.zeros((b, nn), jnp.int32),
        }

    patches = np.zeros((b, p, ps, ps, 4), np.float32)
    patches[..., :3] = rng.rand(b, p, ps, ps, 3) * 255
    patches[..., 3] = 1.0
    return {
        "image": jnp.array(rng.rand(b, size, size, 3).astype(np.float32) * 255),
        "image_size": jnp.array([[size, size]] * b),
        "gt": gt(n),
        "patches": jnp.array(patches),
        "patch_boxes": jnp.array(np.tile([10.0, 10.0, 40.0, 40.0], (b, p, 1)).astype(np.float32)),
        "patch_classes": jnp.array(rng.randint(0, n_classes, (b, p)), jnp.int32),
        "patch_valid": jnp.ones((b, p), bool),
        "patch_flip": jnp.zeros((b, p), bool),
        "probe": {
            "image": jnp.array(rng.rand(b, size, size, 3).astype(np.float32) * 255),
            "image_size": jnp.array([[size, size]] * b),
            "gt": gt(n),
        },
    }


@pytest.mark.slow
def test_active_step_runs_and_decides():
    cfg = get_cfg()
    cfg.MODEL.ACTIVE.ENABLED = True
    cfg.MODEL.ACTIVE.THRESHOLD = -1e9  # always paste
    cfg.MODEL.CENTERNET.NUM_CLASSES = 4
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.CENTERNET.PRE_NMS_TOPK_TRAIN = 32
    cfg.MODEL.CENTERNET.POST_NMS_TOPK_TRAIN = 16
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.MODEL.ROI_MASK_HEAD.GT_SIDE = 16
    cfg.MODEL.MODEL_EMA = 0.9
    cfg.FP16 = False
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    batch = _tiny_batch(rng)

    params = model.init(
        jax.random.PRNGKey(0), batch["image"], batch["image_size"],
        gt=batch["gt"], rng=jax.random.PRNGKey(1), training=True,
    )
    # split keys present in the loss dict
    losses = model.apply(
        params, batch["image"], batch["image_size"], gt=batch["gt"],
        rng=jax.random.PRNGKey(1), training=True,
    )
    assert any("loss_paste_ins" in k for k in losses)
    # probe path: gt-as-proposals returns roi losses only
    probe_losses = model.apply(
        params, batch["image"], batch["image_size"], gt=batch["gt"],
        rng=jax.random.PRNGKey(1), training=True, gt_as_proposals=True,
    )
    assert not any("centernet" in k for k in probe_losses)

    opt = build_optimizer(cfg, params)
    # keep an undonated copy for the second half of the test
    params2 = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
    state = create_train_state(params, opt, ema=True)
    astate = init_active_state(params2, queue_size=16)
    step = make_active_train_step(model, opt, cfg)
    state, astate, metrics = step(state, astate, batch, jax.random.PRNGKey(2))
    assert int(state.step) == 1
    assert bool(astate.bank_initialized)
    assert float(metrics["paste_used"]) == 1.0
    assert int(astate.n_paste) == 1 and int(astate.n_discard) == 0
    assert np.isfinite(float(metrics["grad_sim"]))
    assert np.isfinite(float(metrics["total_loss"]))

    # force-discard threshold → paste rejected, counter moves
    cfg2 = get_cfg()
    for k in ("ENABLED",):
        cfg2.MODEL.ACTIVE.ENABLED = True
    cfg2.MODEL.ACTIVE.THRESHOLD = 1e9
    cfg2.MODEL.CENTERNET.NUM_CLASSES = 4
    cfg2.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg2.MODEL.RESNETS.DEPTH = 18
    cfg2.MODEL.CENTERNET.PRE_NMS_TOPK_TRAIN = 32
    cfg2.MODEL.CENTERNET.POST_NMS_TOPK_TRAIN = 16
    cfg2.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg2.MODEL.ROI_MASK_HEAD.GT_SIDE = 16
    cfg2.FP16 = False
    step2 = make_active_train_step(model, opt, cfg2)
    # params buffers were donated into the first step; use fresh copies
    state2 = create_train_state(params2, opt, ema=False)
    astate2 = init_active_state(params2, queue_size=16)
    state2, astate2, m2 = step2(state2, astate2, batch, jax.random.PRNGKey(2))
    assert float(m2["paste_used"]) == 0.0
    assert int(astate2.n_discard) == 1


@pytest.mark.slow
def test_active_step_per_instance_rows():
    """ONLY_GT_TRAIN/PER_INSTANCE path: unique paste ids flow into the
    stage-0 per-paste loss columns, metrics carry the aux rows, and the
    per-instance drop keeps shapes static."""
    cfg = get_cfg()
    cfg.MODEL.ACTIVE.ENABLED = True
    cfg.MODEL.ACTIVE.THRESHOLD = -1e9
    cfg.MODEL.ACTIVE.ONLY_GT_TRAIN = True
    cfg.MODEL.ACTIVE.PER_INSTANCE = True
    cfg.MODEL.ACTIVE.PER_INSTANCE_PERCENT = 0.5
    cfg.MODEL.CENTERNET.NUM_CLASSES = 4
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.CENTERNET.PRE_NMS_TOPK_TRAIN = 32
    cfg.MODEL.CENTERNET.POST_NMS_TOPK_TRAIN = 16
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.MODEL.ROI_MASK_HEAD.GT_SIDE = 16
    cfg.FP16 = False
    model = build_model(cfg)
    rng = np.random.RandomState(1)
    batch = _tiny_batch(rng)
    params = model.init(
        jax.random.PRNGKey(0), batch["image"], batch["image_size"],
        gt=batch["gt"], rng=jax.random.PRNGKey(1), training=True,
    )
    opt = build_optimizer(cfg, params)
    state = create_train_state(params, opt, ema=False)
    astate = init_active_state(
        jax.tree.map(lambda x: jnp.array(x, copy=True), params), queue_size=8
    )
    step = make_active_train_step(model, opt, cfg)
    state, astate, metrics = step(state, astate, batch, jax.random.PRNGKey(3))
    assert int(state.step) == 1
    aux = jax.device_get(metrics["aux_paste_rows"])
    assert aux["loss"].ndim == 2 and aux["id"].shape == aux["loss"].shape
    # unique ids were assigned to pasted gt slots
    ids = np.asarray(aux["gt_ids"])
    pasted = ids[ids > 0]
    assert len(pasted) > 0 and len(set(pasted.tolist())) == len(pasted)
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["paste_num"]) <= pasted.size


def test_once_mode_parsing():
    """ACTIVE_ONCE_MODE strings drive the decision config the way the
    reference parses them (custom_rcnn.py:127-136, 523-548)."""
    from divergen_tpu.active.bsgal import ActiveConfig

    def parse(om, **extra):
        cfg = get_cfg()
        cfg.MODEL.ACTIVE.ONCE_MODE = om
        for k, v in extra.items():
            cfg.MODEL.ACTIVE[k] = v
        return ActiveConfig.from_cfg(cfg)

    a = parse("only_paste_-0.05")
    assert a.threshold == pytest.approx(-0.05) and not a.dynamic
    a = parse("only_paste_0.1")
    assert a.threshold == pytest.approx(0.1)
    a = parse("only_gt")
    assert a.gt_compare and not a.dynamic
    a = parse("only_paste_dynamic_0.3")
    assert a.dynamic and a.dynamic_percent == pytest.approx(0.7)
    a = parse("only_paste_dynamic_linear_0.3_0.5")
    assert a.dynamic and a.dynamic_linear == (0.3, 0.5)
    with pytest.raises(NotImplementedError):
        parse("some_unknown_mode")
    # FORWARD_ONCE off → the string is not parsed, plain flags win
    a = parse("only_paste_0.9", FORWARD_ONCE=False)
    assert a.threshold == pytest.approx(-0.05) and not a.forward_once
    # loss-compare path selected by GRAD_COMPARE=false (reference default)
    a = parse("", GRAD_COMPARE=False)
    assert not a.grad_compare and a.inner_lr == pytest.approx(0.01)
    with pytest.raises(NotImplementedError):
        parse("", OPTIMIZER="adam")


def _tiny_active_cfg(**active):
    cfg = get_cfg()
    cfg.MODEL.ACTIVE.ENABLED = True
    cfg.MODEL.CENTERNET.NUM_CLASSES = 4
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.CENTERNET.PRE_NMS_TOPK_TRAIN = 32
    cfg.MODEL.CENTERNET.POST_NMS_TOPK_TRAIN = 16
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.MODEL.ROI_MASK_HEAD.GT_SIDE = 16
    cfg.FP16 = False
    for k, v in active.items():
        cfg.MODEL.ACTIVE[k] = v
    return cfg


@pytest.mark.slow
@pytest.mark.parametrize(
    "active",
    [
        {"GRAD_COMPARE": False},  # reference-default loss-compare path
        {"ONCE_MODE": "only_gt"},  # paste-vs-nopaste grad similarity
        {"FORWARD_ONCE": False},  # two-forward full-grad compare
    ],
    ids=["loss_compare", "only_gt", "two_forward"],
)
def test_active_step_decision_paths(active):
    """The three decision machineries beyond the default once-forward
    threshold path all run end-to-end and produce a finite decision."""
    cfg = _tiny_active_cfg(**active)
    model = build_model(cfg)
    rng = np.random.RandomState(2)
    batch = _tiny_batch(rng)
    params = model.init(
        jax.random.PRNGKey(0), batch["image"], batch["image_size"],
        gt=batch["gt"], rng=jax.random.PRNGKey(1), training=True,
    )
    opt = build_optimizer(cfg, params)
    state = create_train_state(params, opt, ema=False)
    astate = init_active_state(
        jax.tree.map(lambda x: jnp.array(x, copy=True), params), queue_size=8
    )
    step = make_active_train_step(model, opt, cfg)
    state, astate, metrics = step(state, astate, batch, jax.random.PRNGKey(3))
    assert int(state.step) == 1
    assert np.isfinite(float(metrics["grad_sim"]))
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["paste_used"]) in (0.0, 1.0)
    assert int(astate.n_paste) + int(astate.n_discard) == 1
