"""audio_few_shot_learning_tpu — TPU-native few-shot audio classification framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
magcil/audio-few-shot-learning (Prototypical Networks for few-shot audio
classification on the MetaAudio datasets, with SpecAugment / waveform
multi-view augmentation, self-attention view fusion, CPL and angular
contrastive losses, and variable-length multi-segment majority-vote
evaluation).

Design principles (TPU-first, not a port):
  * Episodes are *data*, not Python control flow: one jitted train step
    consumes a batch of episodes shaped ``[E, ...]``; everything the
    reference does per-task in Python (sample -> augment -> encode ->
    prototypes -> losses -> step) is a single ``vmap``-over-episodes,
    sharding-over-chips XLA program.
  * The dataset lives in HBM as one packed, padded array; episode assembly
    is pure ``jnp.take`` — the accelerator never waits on the host.
  * Hot bandwidth/MXU ops (log-mel filterbank, SpecAugment view expansion,
    prototype-distance head) have fused Pallas TPU kernels with pure-XLA
    fallbacks for CPU testing.
  * Multi-chip scaling is an ``episode`` mesh axis via ``jax.sharding``;
    collectives are XLA ``psum``s over ICI (the reference is single-device).
"""

__version__ = "0.1.0"

from audio_few_shot_learning_tpu.config import (  # noqa: F401
    ExperimentConfig,
    ModelConfig,
    load_configs,
)
