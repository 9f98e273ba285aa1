"""Few-shot classification loss (prototypical cross-entropy).

Reference loops/loss.py:12-37: ``-cdist(queries, prototypes)`` -> log-softmax
-> NLL(mean). Here the distance matrix comes in precomputed as ``scores``
(the episode model's fused head) so the loss is just a masked log-softmax.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fsl_loss(scores: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """scores: [Q, N] = -euclidean distances; labels: [Q] ints. Returns scalar."""
    logp = jax.nn.log_softmax(scores, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))
