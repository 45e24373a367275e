"""Multi-host execution: jax.distributed bootstrap + process-spanning mesh.

SURVEY.md section 2.10 comm-backend slot: single-host scaling rides ICI
through `jax.sharding` (see sharding.py); this module extends the SAME
mesh abstraction across hosts over DCN.  Axis convention: the LEADING
mesh axis spans processes (DCN -- keep low-frequency collectives like
data-parallel gradient psums here), trailing axes stay within a process
(ICI -- submap/spatial collectives).

Usage (one call per process, before any jax computation):

    from miso_tpu.parallel import distributed as dist
    dist.initialize()                       # env-driven, or pass args
    mesh = dist.global_mesh(("data",))
    batch = dist.make_global_batch(local_batch, mesh, axis="data")
    step = sharding.data_parallel_train_step(loss_fn, mesh)

Environment variables (used when arguments are omitted):
  MISO_COORDINATOR   host:port of process 0 (e.g. "10.0.0.1:8476")
  MISO_NUM_PROCESSES total process count
  MISO_PROCESS_ID    this process's rank

On TPU pods with standard launchers, calling ``initialize()`` with no
arguments lets jax auto-detect everything from the TPU metadata.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids: Optional[Sequence[int]] = None) -> None:
    """jax.distributed.initialize with env-variable fallbacks.

    Safe to call once per process; raises if jax was already used for
    computation (jax requirement).
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("MISO_COORDINATOR")
    if num_processes is None and "MISO_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["MISO_NUM_PROCESSES"])
    if process_id is None and "MISO_PROCESS_ID" in os.environ:
        process_id = int(os.environ["MISO_PROCESS_ID"])
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)


def process_info() -> Tuple[int, int]:
    """(process_id, process_count)."""
    import jax

    return jax.process_index(), jax.process_count()


def global_mesh(axes: Sequence[str] = ("data",),
                shape: Optional[Tuple[int, ...]] = None):
    """Mesh over ALL processes' devices.

    1D: one axis over every global device (row-major by process, so
    contiguous blocks stay within a host).  2D default shape:
    (process_count, local_device_count) -- leading axis over DCN,
    trailing over ICI.
    """
    import jax
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices())
    n_proc = jax.process_count()
    local = len(devs) // max(n_proc, 1)
    if shape is None:
        if len(axes) == 1:
            shape = (len(devs),)
        elif len(axes) == 2:
            shape = (n_proc, local)
        else:
            raise ValueError("pass an explicit shape for >2 axes")
    return Mesh(devs.reshape(shape), tuple(axes))


def make_global_batch(local_batch: Dict, mesh, axis="data") -> Dict:
    """Assemble process-spanning global arrays from per-process batches.

    Each process passes ITS shard of the batch (local N rows); the
    returned arrays are global jax.Arrays sharded over ``axis`` (a mesh
    axis name or tuple of names -- the leading dim shards over their
    product).

    IMPORTANT: when ``axis`` does not include the process-spanning mesh
    axis, the arrays are replicated across processes and every process
    MUST pass identical values; on a multi-axis mesh pass e.g.
    ``axis=("submap", "data")`` so per-rank batch shards are legal.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    out = {}
    for k, v in local_batch.items():
        arr = np.asarray(v)
        if arr.ndim >= 1:
            spec = P(axis, *([None] * (arr.ndim - 1)))
            out[k] = jax.make_array_from_process_local_data(
                NamedSharding(mesh, spec), arr)
        else:
            out[k] = jax.make_array_from_process_local_data(
                NamedSharding(mesh, P()), arr)
    return out


def replicate_global(tree, mesh):
    """Replicate a pytree (model/opt state) across all processes' devices.

    Every process must hold identical values (same seed / broadcast).
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P())

    def place(x):
        arr = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, arr)

    return jax.tree_util.tree_map(place, tree)
