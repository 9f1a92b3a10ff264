"""Cross-host communication helpers.

Counterpart of detectron2 ``utils/comm.py:19-170`` (get_world_size /
synchronize / all_gather / gather / shared_random_seed / reduce_dict over
torch.distributed NCCL+gloo). On TPU, in-graph collectives are XLA's job
(psum/all_gather inside jit); these helpers cover the *host-side* uses —
gathering evaluation predictions, seed agreement, barriers — via
``jax.experimental.multihost_utils``. Every function degrades to a no-op at
world size 1 exactly like the reference.
"""
from __future__ import annotations

import pickle
from typing import Any, Dict, List

import numpy as np


def get_world_size() -> int:
    import jax

    return jax.process_count()


def get_rank() -> int:
    import jax

    return jax.process_index()


def is_main_process() -> bool:
    return get_rank() == 0


def synchronize() -> None:
    """Barrier across hosts (comm.synchronize)."""
    if get_world_size() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("divergen_tpu.comm.synchronize")


def all_gather(data: Any) -> List[Any]:
    """Gather arbitrary picklable data from every host (comm.all_gather)."""
    world = get_world_size()
    if world == 1:
        return [data]
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    buf = np.frombuffer(pickle.dumps(data), np.uint8)
    sizes = multihost_utils.process_allgather(jnp.asarray([buf.size]))
    max_size = int(np.max(sizes))
    padded = np.zeros(max_size, np.uint8)
    padded[: buf.size] = buf
    gathered = multihost_utils.process_allgather(jnp.asarray(padded))
    out = []
    for rank in range(world):
        n = int(sizes[rank][0]) if sizes.ndim > 1 else int(sizes[rank])
        out.append(pickle.loads(bytes(np.asarray(gathered[rank][:n]))))
    return out


def gather(data: Any, dst: int = 0) -> List[Any]:
    """comm.gather semantics on top of all_gather (host payloads are small)."""
    result = all_gather(data)
    return result if get_rank() == dst else []


def shared_random_seed() -> int:
    """All hosts agree on one seed (comm.shared_random_seed)."""
    seed = int(np.random.randint(2**31))
    return int(all_gather(seed)[0])


def reduce_dict(d: Dict[str, float], average: bool = True) -> Dict[str, float]:
    """Mean/sum of scalar dicts across hosts (comm.reduce_dict)."""
    world = get_world_size()
    if world == 1:
        return dict(d)
    gathered = all_gather(d)
    keys = sorted(d)
    out = {}
    for k in keys:
        vals = [g[k] for g in gathered]
        out[k] = float(np.sum(vals)) / (world if average else 1)
    return out
