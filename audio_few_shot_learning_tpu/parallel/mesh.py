"""Mesh construction and episode-axis sharding.

The unit of data parallelism is the *episode*: a train step takes a batch of
E independent N-way-K-shot episodes and shards them across the ``episode``
mesh axis. Parameters/optimizer state are replicated (the models are ~1e5
params — SURVEY.md §2.2 rules out TP/PP); XLA inserts the psum for the
gradient mean over ICI automatically from the shardings.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

EPISODE_AXIS = "episode"

_distributed_initialized = False


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Guarded multi-host (DCN) initialization. Returns True if initialized.

    Single-host multi-chip needs nothing: one process sees all local chips and
    the ``episode`` mesh rides ICI only. On a multi-host pod slice, call this
    once per process before any backend query; it wires the processes into one
    global JAX runtime so ``jax.devices()`` returns the *global* device list
    and ``make_mesh`` spans hosts. Gradient psums then ride ICI within each
    slice and DCN across hosts — placement chosen by XLA from the same
    shardings, no code changes in the engine.

    Explicit args win; otherwise a multi-host launch is signalled by the
    ``JAX_COORDINATOR_ADDRESS``/``COORDINATOR_ADDRESS`` env var. Without a
    coordinator address, this is a no-op so single-host users never pay for or
    see the distributed runtime — an *explicit* opt-in is required because
    TPU-pod metadata vars (e.g. ``TPU_WORKER_HOSTNAMES``) also appear on
    single-host setups like tunneled chips, where auto-firing
    ``jax.distributed.initialize()`` would crash the run.
    """
    global _distributed_initialized
    if _distributed_initialized:
        return True
    env_coord = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    coord = coordinator_address or env_coord
    if coord is None:
        return False
    kwargs = {"coordinator_address": coord}
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    elif "JAX_NUM_PROCESSES" in os.environ:
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None:
        kwargs["process_id"] = process_id
    elif "JAX_PROCESS_ID" in os.environ:
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    _distributed_initialized = True
    return True


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (EPISODE_AXIS,))


def episode_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (episode) axis; everything else replicated."""
    return NamedSharding(mesh, P(EPISODE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_episode_keys(key: jax.Array, batch: int, mesh: Mesh) -> jax.Array:
    """Per-episode PRNG keys laid out along the episode axis."""
    keys = jax.random.split(key, batch)
    return jax.device_put(keys, episode_sharding(mesh))


def from_process_local(batch, mesh: Mesh):
    """Assemble a global episode-sharded array from per-host local shards.

    Multi-host data path: each host samples ``E / num_processes`` episodes from
    its own store copy and contributes them as its slice of the global batch
    (episodes are i.i.d., so host-local sampling is statistically identical to
    global sampling). Single-process, this is just a sharded device_put.
    """
    sharding = episode_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )
