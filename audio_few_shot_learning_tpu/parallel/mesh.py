"""Mesh construction and episode-axis sharding.

The unit of data parallelism is the *episode*: a train step takes a batch of
E independent N-way-K-shot episodes and shards them across the ``episode``
mesh axis. Parameters/optimizer state are replicated (the models are ~1e5
params — SURVEY.md §2.2 rules out TP/PP); XLA inserts the psum for the
gradient mean over ICI automatically from the shardings.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

EPISODE_AXIS = "episode"


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
