"""Multi-host (multi-slice) runtime helpers.

The reference's distributed surface is HF Accelerate over torch.distributed/NCCL,
shipped disabled (`/root/reference/DiFashion/config.yaml:2` `distributed_type: 'NO'`).
The TPU-native equivalent: `jax.distributed` for multi-host process groups (ICI within
a slice, DCN across slices), deterministic per-host data sharding instead of a
DistributedSampler, and global-view jit for the collectives (SURVEY.md §2c / §5).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host runtime. No-op for single-process runs.

    Uses the standard env vars when args are omitted (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID, or the TPU-pod auto-detection baked into
    jax.distributed.initialize)."""
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def host_shard(batch: dict, process_index: Optional[int] = None,
               process_count: Optional[int] = None) -> dict:
    """Deterministically slice a *global* host batch to this process's share.

    Replaces torch's DistributedSampler: every host materializes the same global
    permutation (it's a pure function of (seed, epoch), see `data.TrainLoader`) and
    takes its contiguous shard, so global-batch semantics are identical to single-host.
    """
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    if process_count == 1:
        return batch

    def slice_one(x):
        n = len(x)
        if n % process_count != 0:
            raise ValueError(
                f"global batch {n} not divisible by process count {process_count}"
            )
        per = n // process_count
        return x[process_index * per:(process_index + 1) * per]

    return {k: slice_one(np.asarray(v)) for k, v in batch.items()}


def make_global_batch(batch, mesh, spec=None):
    """Assemble per-process local shards into global jax.Arrays over a multi-host
    mesh (the device plane of `host_shard`: each process contributes its contiguous
    slice of the global batch, and jit sees one global array sharded on 'dp').

    Single-process: equivalent to `device_put(x, NamedSharding(mesh, P('dp')))`.
    `batch` may be any pytree of host arrays (None leaves pass through).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    if spec is None:
        spec = P("dp")
    sh = NamedSharding(mesh, spec)

    def place(x):
        if x is None:
            return None
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree_util.tree_map(place, batch)


def assert_same_across_hosts_note() -> str:
    """Documentation hook: params/conditions must be identical on every host (same
    seed -> same init; checkpoints restore identically). Verified in single-host CI by
    construction; multi-host runs should assert a params-checksum psum at startup."""
    return "see docstring"
