"""Device mesh + sharding rules (TPU-native replacement for DDP/NCCL).

The reference's only parallelism is data-parallel DDP
(``DiverGen/train_net.py:357-362``, ``detectron2/engine/launch.py:27-122``,
NCCL collectives in ``detectron2/utils/comm.py``). Here the same (and more)
falls out of GSPMD: one 2D mesh ``("data", "model")``, batches sharded on
``data``, and the big classifier/backbone kernels optionally sharded on
``model`` — XLA inserts the all-reduce/all-gather collectives on ICI, so
there is no NCCL analog to manage.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    data: int = -1,
    model: int = 1,
    devices=None,
) -> Mesh:
    """2D mesh. ``data=-1`` consumes all remaining devices on the data axis."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    return Mesh(devices.reshape(data, model), ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis data sharding for every array in a batch pytree."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding_rules(params, mesh: Mesh, min_size: int = 2**18):
    """Tensor-parallel layout for the model axis.

    Large 2D kernels (classifier heads, MLPs, attention projections) are
    sharded on their output dim over ``model`` when divisible; everything
    else is replicated. With model=1 this is pure DP. XLA/GSPMD turns the
    annotations into all-gather/reduce-scatter on ICI.
    """
    model_size = mesh.shape["model"]

    def rule(x):
        if (
            model_size > 1
            and hasattr(x, "ndim")
            and x.ndim >= 2
            and x.size >= min_size
            and x.shape[-1] % model_size == 0
        ):
            spec = [None] * (x.ndim - 1) + ["model"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def shard_pytree(tree, shardings):
    """Place a host pytree onto the mesh with the given shardings."""
    return jax.tree.map(lambda x, s: jax.device_put(x, s), tree, shardings)
