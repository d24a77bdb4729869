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


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Multi-host bootstrap — the ``jax.distributed.initialize`` analog
    of the reference's env:// NCCL rendezvous (``misc.py:211-235``).

    Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID
    (or the torchrun-style MASTER_ADDR+MASTER_PORT / WORLD_SIZE / RANK)
    when arguments are omitted; returns False (no-op) for single-process
    runs so all recipes work unchanged on one host.
    """
    import os

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None and os.environ.get("MASTER_ADDR"):
        coordinator_address = (
            os.environ["MASTER_ADDR"]
            + ":"
            + os.environ.get("MASTER_PORT", "1234")
        )
    num_processes = num_processes or int(
        os.environ.get("JAX_NUM_PROCESSES", os.environ.get("WORLD_SIZE", 1))
    )
    process_id = (
        process_id
        if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", os.environ.get("RANK", 0)))
    )
    if coordinator_address is None or num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_hybrid_mesh(data: int = -1, model: int = 1) -> Mesh:
    """(data, model) mesh laid out so the ``model`` axis rides ICI
    within a slice and ``data`` spans hosts/DCN — collectives for TP
    stay on-chip-interconnect (SURVEY.md §2.8 TPU-native mapping).

    Falls back to :func:`make_mesh` in single-host runs.
    """
    n_local = jax.local_device_count()
    n = len(jax.devices())
    if n == n_local:
        return make_mesh(data=data, model=model)
    from jax.experimental import mesh_utils

    if data == -1:
        assert n % model == 0
        data = n // model
    assert data * model == n, f"{data}x{model} != {n} devices"
    # Multi-slice TPU pods expose distinct slice_index values (DCN
    # granule = slice); multi-process CPU and single-slice multi-host
    # runs report one slice for every device — there the process is
    # the DCN granule.
    n_slices = len({getattr(d, "slice_index", 0) for d in jax.devices()})
    devs = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(max(data // (n // n_local), 1), model),
        dcn_mesh_shape=(min(data, n // n_local), 1),
        process_is_granule=n_slices < 2,
    )
    return Mesh(devs.reshape(data, model), ("data", "model"))
