"""Device mesh + sharding helpers.

Replaces the reference's NCCL DDP / DeepSpeed plumbing (SURVEY.md §2.8:
``misc.init_distributed_mode``, Lightning ``strategy='ddp'|'deepspeed'``)
with a single ``jax.sharding.Mesh``: data parallelism = batch-axis
sharding + pjit-inserted psum of grads; ZeRO-style optimizer-state
sharding = sharding opt state along ``data``; model/tensor parallelism =
the ``model`` axis. Multi-host init is ``jax.distributed.initialize``
(not needed single-process).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1, model: int = 1, devices=None
) -> Mesh:
    """(data, model) mesh over available devices; data=-1 = all/model."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """Device-put a host batch with batch-axis sharding."""
    s = batch_sharding(mesh)
    return {
        k: jax.device_put(v, s) if hasattr(v, "shape") else v
        for k, v in batch.items()
    }
