"""comm helpers, Poisson blend, BiFPN."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_comm_world1_degradation():
    from divergen_tpu.utils import comm

    assert comm.get_world_size() == 1
    assert comm.is_main_process()
    comm.synchronize()  # no-op
    assert comm.all_gather({"a": 1}) == [{"a": 1}]
    assert comm.gather([1, 2]) == [[1, 2]]
    assert isinstance(comm.shared_random_seed(), int)
    assert comm.reduce_dict({"x": 2.0}) == {"x": 2.0}


def test_poisson_blend_preserves_boundary():
    from divergen_tpu.data.poisson_blend import blend_image_host, poisson_edit

    rng = np.random.RandomState(0)
    tgt = np.full((24, 24, 3), 100.0, np.float32)
    src = np.full((24, 24, 3), 200.0, np.float32)
    mask = np.zeros((24, 24), np.uint8)
    mask[8:16, 8:16] = 1
    out = poisson_edit(src, tgt, mask)
    # outside mask untouched
    np.testing.assert_array_equal(out[0, 0], tgt[0, 0])
    # constant-gradient source on constant target → region stays near target
    # (Poisson transfers gradients, not absolute colors)
    assert abs(float(out[11, 11, 0]) - 100.0) < 2.0
    # basic mode pastes absolute colors
    basic = blend_image_host(tgt, src, mask, "basic")
    assert basic[11, 11, 0] == 200.0


def test_bifpn_shapes():
    from divergen_tpu.modeling.backbone.bifpn import BiFPN

    feats = {
        "res3": jnp.zeros((1, 32, 32, 24)),
        "res4": jnp.zeros((1, 16, 16, 48)),
        "res5": jnp.zeros((1, 8, 8, 96)),
    }
    m = BiFPN(out_channels=32, num_layers=2)
    params = m.init(jax.random.PRNGKey(0), feats)
    out = m.apply(params, feats)
    assert sorted(out) == ["p3", "p4", "p5", "p6", "p7"]
    assert out["p3"].shape == (1, 32, 32, 32)
    assert out["p7"].shape == (1, 2, 2, 32)
    assert all(np.isfinite(np.asarray(v)).all() for v in out.values())


def test_dla34_shapes():
    from divergen_tpu.modeling.backbone.dla import DLA34

    m = DLA34(out_features=("dla2", "dla3", "dla4", "dla5"))
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out["dla2"].shape == (1, 16, 16, 64)
    assert out["dla5"].shape == (1, 2, 2, 512)


def test_load_zs_weight_orientation(tmp_path):
    """Reference-published classifier .npy files are (C, zs_dim) on disk and
    transposed on load (modeling/utils.py:40-43); files already stored
    (zs_dim, C) pass through when zs_dim disambiguates (ADVICE r2)."""
    from divergen_tpu.modeling.meta_arch.rcnn import load_zs_weight

    zs_dim, n_cls = 512, 37
    w = np.random.RandomState(0).randn(n_cls, zs_dim).astype(np.float32)

    ref_layout = tmp_path / "ref.npy"
    np.save(ref_layout, w)
    out = load_zs_weight(str(ref_layout), zs_dim=zs_dim)
    assert out.shape == (zs_dim, n_cls)
    np.testing.assert_array_equal(out, w.T)

    ours = tmp_path / "ours.npy"
    np.save(ours, w.T)  # already (zs_dim, C)
    out2 = load_zs_weight(str(ours), zs_dim=zs_dim)
    assert out2.shape == (zs_dim, n_cls)
    np.testing.assert_array_equal(out2, w.T)
