"""Few-shot utility functions (reference models/util_functions.py:6-81).

``compute_prototypes`` lives in ops/protohead.py (fused head); this module
completes the inventory: entropy, k-nearest-neighbours, power transform —
plus cosine scoring (reference few_shot_classifier.py:118-126).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from audio_few_shot_learning_tpu.ops.protohead import pairwise_sqeuclidean


def entropy(logits: jnp.ndarray) -> jnp.ndarray:
    """Mean prediction entropy from logits (util_functions.py:22-32)."""
    probs = jax.nn.softmax(logits, axis=1)
    return jnp.mean(-jnp.sum(probs * jnp.log(probs + 1e-12), axis=1))


def k_nearest_neighbours(features: jnp.ndarray, k: int) -> jnp.ndarray:
    """Indices of the k nearest neighbours of each row, self excluded
    (util_functions.py:35-48). Returns [n, k]."""
    d = jnp.sqrt(pairwise_sqeuclidean(features, features) + 1e-24)
    # smallest k+1 distances include self at distance ~0; drop column 0
    _, idx = jax.lax.top_k(-d, k + 1)
    return idx[:, 1:]


def power_transform(features: jnp.ndarray, power_factor: float) -> jnp.ndarray:
    """(relu(x) + 1e-6) ** power (util_functions.py:51-61)."""
    return (jax.nn.relu(features) + 1e-6) ** power_factor


def cosine_scores(samples: jnp.ndarray, prototypes: jnp.ndarray) -> jnp.ndarray:
    """Cosine-similarity logits (few_shot_classifier.py:118-126):
    normalize(samples) @ normalize(prototypes).T"""

    def _norm(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12)

    return _norm(samples) @ _norm(prototypes).T
