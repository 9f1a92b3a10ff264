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
