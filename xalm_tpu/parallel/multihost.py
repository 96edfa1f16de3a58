"""Multi-process (multi-host) execution support.

The reference is single-process (SURVEY.md §2.4); this is the target-
platform extension: ``jax.distributed`` initialization, per-host batch
feeding for the dp axis, and global-array construction that works whether
one process owns all devices or each host owns a slice.

Model: every process runs the SAME program (SPMD). ``init_distributed``
wires the processes into one JAX runtime; after it, ``jax.devices()``
returns the *global* device list, so ``make_mesh`` builds the same global
mesh everywhere and jit dispatches collectives over ICI/DCN. Host-local
inputs become global arrays with ``make_global`` (full value on every host,
e.g. positions) or ``host_local_to_global`` (each host contributes its dp
shard of the batch — per-host data feeding).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = [
    "init_distributed",
    "make_global",
    "host_local_to_global",
    "all_hosts",
]


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join this process into a multi-process JAX runtime.

    Arguments default to the ``XALM_COORDINATOR`` / ``XALM_NUM_PROCESSES`` /
    ``XALM_PROCESS_ID`` environment variables, falling back to jax's own
    cluster auto-detection (TPU pods detect all three automatically).
    Call before any other jax API touches devices.
    """
    coordinator_address = coordinator_address or os.environ.get("XALM_COORDINATOR")
    if num_processes is None and "XALM_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["XALM_NUM_PROCESSES"])
    if process_id is None and "XALM_PROCESS_ID" in os.environ:
        process_id = int(os.environ["XALM_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_global(mesh: Mesh, spec: PartitionSpec, arr) -> jax.Array:
    """Full host value -> global array sharded by ``spec``.

    Every process passes the SAME full array (cheap host-replicated inputs:
    tokens, positions, valid masks); only the addressable shards are
    materialized on each host's devices. Single-process: a plain put.
    """
    arr = np.asarray(arr)
    if jax.process_count() == 1:
        return jax.device_put(arr, NamedSharding(mesh, spec))
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])


def host_local_to_global(mesh: Mesh, spec: PartitionSpec, local_arr) -> jax.Array:
    """Per-host batch shard -> global array (dp data feeding).

    Each process passes only ITS rows of the global batch (the dp shard its
    devices own); jax assembles the global array without any host ever
    holding the full batch.
    """
    local_arr = np.asarray(local_arr)
    if jax.process_count() == 1:
        return jax.device_put(local_arr, NamedSharding(mesh, spec))
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), local_arr
    )


def all_hosts(x) -> np.ndarray:
    """Gather a (possibly non-fully-addressable) array to every host."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
