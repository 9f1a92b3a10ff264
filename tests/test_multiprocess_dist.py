"""Real 2-process jax.distributed validation of the launch glue.

The driver's dryrun covers the 8-device single-process GSPMD path; this
covers the MULTI-PROCESS path the reference reaches through DDP/launch.py:
``jax.distributed.initialize`` (launch.sh), ``parallel.mesh.create_mesh``
over global devices, ``utils.comm`` collectives (world size, all_gather,
reduce_dict, shared_random_seed), and a batch-sharded psum across hosts.
Runs two CPU subprocesses with 4 virtual devices each.
"""
import os
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    pid = int(sys.argv[1])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(sys.argv[2], num_processes=2, process_id=pid)
    sys.path.insert(0, %(repo)r)
    import numpy as np
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from divergen_tpu.parallel.mesh import batch_sharding, create_mesh
    from divergen_tpu.utils import comm

    assert comm.get_world_size() == 2
    assert comm.get_rank() == pid
    assert comm.is_main_process() == (pid == 0)

    mesh = create_mesh(data=-1, model=2)
    assert mesh.devices.size == 8 and mesh.axis_names == ("data", "model")

    # cross-process object gather + scalar reduction + shared seed
    gathered = comm.all_gather({"rank": pid})
    assert [g["rank"] for g in gathered] == [0, 1]
    red = comm.reduce_dict({"loss": float(pid + 1)})  # mean(1, 2) = 1.5
    assert abs(red["loss"] - 1.5) < 1e-6, red
    s0 = comm.shared_random_seed()

    # batch-sharded global psum across both hosts
    x = jnp.full((4, 8), float(pid + 1))
    xg = multihost_utils.host_local_array_to_global_array(
        x, mesh, P(("data", "model"))
    )
    f = jax.jit(shard_map(
        lambda t: jax.lax.psum(jnp.sum(t), ("data", "model")),
        mesh=mesh, in_specs=P(("data", "model")), out_specs=P(),
    ))
    total = float(jax.device_get(f(xg).addressable_data(0)))
    assert abs(total - (32.0 + 64.0)) < 1e-6, total
    print(f"OK pid={pid} seed={s0} psum={total}", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER % {"repo": os.getcwd()})
    addr = "127.0.0.1:49733"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), addr],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]
    seeds = set()
    for pid, out in enumerate(outs):
        assert f"OK pid={pid}" in out, out[-2000:]
        seeds.add(out.split("seed=")[1].split()[0])
    assert len(seeds) == 1  # shared_random_seed agrees across processes


_TRAIN_WORKER = textwrap.dedent(
    """
    import os, sys
    pid = int(sys.argv[1])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_pytest_cache")
    jax.distributed.initialize(sys.argv[2], num_processes=2, process_id=pid)
    sys.path.insert(0, %(repo)r)
    import numpy as np
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from divergen_tpu.engine.train_loop import create_train_state, make_train_step
    from divergen_tpu.modeling.meta_arch.rcnn import build_model
    from divergen_tpu.parallel.mesh import batch_sharding, create_mesh, param_sharding_rules
    from divergen_tpu.solver.build import build_optimizer
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = create_mesh(data=-1, model=2)  # 4x2 over 2 processes
    dp = mesh.shape["data"]

    cfg = ge._small_cfg()
    model = build_model(cfg)
    rng = np.random.RandomState(0)  # same on both hosts -> identical init
    b = 2 * dp
    images = jnp.array(rng.rand(b, 64, 64, 3).astype(np.float32) * 255)
    image_sizes = jnp.array([[64, 64]] * b)
    gt = ge._synth_gt(rng, b, 8, 8, img=64)

    params = model.init(
        jax.random.PRNGKey(0), images, image_sizes, gt=gt,
        rng=jax.random.PRNGKey(1), training=True,
    )
    optimizer = build_optimizer(cfg, params)

    # each process holds the FULL host-local value; provide the
    # addressable shards for global arrays (multi-process device_put
    # can't target non-addressable devices)
    rules = param_sharding_rules(params, mesh, min_size=2 ** 12)
    params_g = jax.tree.map(
        lambda x, s: jax.make_array_from_callback(
            np.asarray(x).shape, s, lambda idx, _x=np.asarray(x): _x[idx]
        ),
        params, rules,
    )
    state = create_train_state(params_g, optimizer, ema=True)
    bs = batch_sharding(mesh)
    batch = {
        "images": jax.make_array_from_callback(
            images.shape, bs, lambda idx, _x=np.asarray(images): _x[idx]),
        "image_sizes": jax.make_array_from_callback(
            image_sizes.shape, bs, lambda idx, _x=np.asarray(image_sizes): _x[idx]),
        "gt": jax.tree.map(
            lambda x: jax.make_array_from_callback(
                np.asarray(x).shape, bs, lambda idx, _x=np.asarray(x): _x[idx]),
            gt,
        ),
    }
    step = make_train_step(model, optimizer, ema_decay=0.999, donate=False)
    with mesh:
        new_state, metrics = step(state, batch, jax.random.PRNGKey(2))
    jax.block_until_ready(metrics)
    total = float(np.asarray(jax.device_get(metrics["total_loss"].addressable_data(0))))
    assert np.isfinite(total)
    print(f"TRAIN OK pid={pid} loss={total:.4f}", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_sharded_train_step(tmp_path):
    """One REAL sharded train step over a 2-process (4x2) mesh: identical
    per-host init, model-axis param sharding, data-axis batch sharding,
    GSPMD gradient sync — the multi-host analog of dryrun_multichip."""
    worker = tmp_path / "train_worker.py"
    worker.write_text(_TRAIN_WORKER % {"repo": os.getcwd()})
    addr = "127.0.0.1:49737"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), addr],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    losses = []
    for p in procs:
        out, _ = p.communicate(timeout=3000)
        assert p.returncode == 0, out[-3000:]
        losses.append(float(out.split("loss=")[1].split()[0]))
    assert abs(losses[0] - losses[1]) < 1e-5  # same global computation
