"""Multi-host orchestration (v5e-16 and beyond; BASELINE.json config 5).

The reference is strictly single-process (SURVEY.md §2.5); this is the
TPU-native multi-host story. JAX's runtime model: every host runs the
SAME program; jax.distributed.initialize() wires the hosts into one
global device set over DCN, pjit/GSPMD handles cross-host collectives.
For inference we shard the batch over `data` (no cross-host traffic in
the forward at all — each host computes its local shard; ICI collectives
appear only when `model` sharding crosses chips).

Usage (same script on every host):

    from simpleinfer_tpu.parallel import multihost
    multihost.initialize()                      # reads cluster env
    mesh = multihost.make_mesh(model=1)         # data = all chips
    eng = Engine(EngineConfig(mesh=None))       # mesh passed explicitly
    ...
    batch = multihost.host_local_batch(global_batch, mesh)

Host-local input feeding follows the standard JAX idiom: each host
stages only its slice and `jax.make_array_from_process_local_data`
assembles the global sharded array.

This layer runs for real in CI: `parallel.multiproc.launch` executes it
as separate OS processes (localhost coordinator, Gloo collectives) and
tests/test_multiproc.py compares against single-process runs.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import AXIS_DATA, AXIS_MODEL, AXIS_SPATIAL


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var defaults; no-op when the
    cluster has a single process and no coordinator is configured."""
    import os

    if (coordinator_address is None
            and "JAX_COORDINATOR_ADDRESS" not in os.environ
            and "COORDINATOR_ADDRESS" not in os.environ
            and num_processes is None):
        return  # single-host run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)


def make_mesh(model: int = 1, spatial: int = 1) -> Mesh:
    """(data, spatial, model) mesh over ALL global devices; `model` and
    `spatial` stay within a host (ICI) by construction of jax.devices()
    ordering, `data` spans hosts (DCN — free for inference DP)."""
    n = len(jax.devices())
    if n % (model * spatial) != 0:
        raise ValueError(f"{n} devices not divisible by "
                         f"model*spatial={model * spatial}")
    devices = np.asarray(jax.devices()).reshape(
        n // (model * spatial), spatial, model)
    return Mesh(devices, (AXIS_DATA, AXIS_SPATIAL, AXIS_MODEL))


def host_local_batch(global_batch: np.ndarray, mesh: Mesh) -> jax.Array:
    """Assemble a globally-sharded batch from per-host local data.

    Every host passes ITS OWN rows (global batch size / process_count);
    returns a global jax.Array sharded batch-over-`data`."""
    sharding = NamedSharding(
        mesh, P(AXIS_DATA, *([None] * (global_batch.ndim - 1))))
    return jax.make_array_from_process_local_data(sharding, global_batch)


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """True on the host that should do logging/saving."""
    return jax.process_index() == 0
