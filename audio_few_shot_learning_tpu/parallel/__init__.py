"""Multi-chip scaling: episode-axis data parallelism over a jax.sharding.Mesh
(SURVEY.md §2.2 — the reference is single-device; here DP over episodes is a
first-class mesh axis with XLA collectives over ICI)."""

from audio_few_shot_learning_tpu.parallel.mesh import (  # noqa: F401
    episode_sharding,
    make_mesh,
    replicated,
    shard_episode_keys,
)
