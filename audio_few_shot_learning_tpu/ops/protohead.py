"""Prototype head: class-mean prototypes + query-to-prototype distances.

The reference computes prototypes with a Python list-comprehension mean
(models/util_functions.py:6-19) and scores with ``-torch.cdist``
(models/few_shot_classifier.py:108-116). Here both collapse into matmuls so
the MXU does the work, and a fused Pallas kernel runs the whole episode head
(one-hot mean -> squared-euclidean -> -sqrt) for a *batch* of episodes in one
launch with no HBM intermediates.

All shapes are static: an episode has ``n_way`` classes, support features
``[S, D]``, query features ``[Q, D]``.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from audio_few_shot_learning_tpu.ops.pallas_utils import pallas_enabled, round_up


def compute_prototypes(features: jnp.ndarray, labels: jnp.ndarray, n_way: int) -> jnp.ndarray:
    """Per-class mean of support features.

    features: [S, D]; labels: [S] ints in [0, n_way). Returns [n_way, D].
    Matches reference models/util_functions.py:6-19 (label-indexed mean) but
    as a one-hot matmul instead of a Python loop.
    """
    onehot = jax.nn.one_hot(labels, n_way, dtype=features.dtype)  # [S, N]
    counts = jnp.maximum(onehot.sum(axis=0), 1.0)  # [N]
    return (onehot.T @ features) / counts[:, None]


def pairwise_sqeuclidean(queries: jnp.ndarray, prototypes: jnp.ndarray) -> jnp.ndarray:
    """[Q, D] x [N, D] -> [Q, N] squared euclidean distances (matmul form)."""
    q2 = jnp.sum(queries * queries, axis=-1, keepdims=True)  # [Q, 1]
    p2 = jnp.sum(prototypes * prototypes, axis=-1)  # [N]
    cross = queries @ prototypes.T  # [Q, N] — MXU
    return jnp.maximum(q2 + p2[None, :] - 2.0 * cross, 0.0)


def prototype_scores(queries: jnp.ndarray, prototypes: jnp.ndarray) -> jnp.ndarray:
    """Classification logits = -euclidean distance (reference
    few_shot_classifier.py:108-116: ``-torch.cdist(samples, prototypes)``)."""
    return -jnp.sqrt(pairwise_sqeuclidean(queries, prototypes) + 1e-24)


def batched_episode_scores(
    support: jnp.ndarray,
    support_labels: jnp.ndarray,
    queries: jnp.ndarray,
    n_way: int,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused episode head for a batch of episodes.

    support: [E, S, D]; support_labels: [E, S]; queries: [E, Q, D]
    -> scores [E, Q, n_way] = -||q - proto||.
    """
    if use_pallas is None:
        use_pallas = pallas_enabled()
    if not use_pallas:
        return _batched_episode_scores_xla(support, support_labels, queries, n_way)
    return _fused_scores(support, support_labels, queries, n_way)


def _batched_episode_scores_xla(support, support_labels, queries, n_way):
    def one(sup, lab, qry):
        protos = compute_prototypes(sup, lab, n_way)
        return prototype_scores(qry, protos)

    return jax.vmap(one)(support, support_labels, queries)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_scores(support, support_labels, queries, n_way):
    """Differentiable wrapper: Pallas forward, XLA-derived backward (the
    training path takes grads through the scores into the features)."""
    return _batched_episode_scores_pallas(support, support_labels, queries, n_way)


def _fused_scores_fwd(support, support_labels, queries, n_way):
    out = _batched_episode_scores_pallas(support, support_labels, queries, n_way)
    return out, (support, support_labels, queries)


def _fused_scores_bwd(n_way, residuals, g):
    support, support_labels, queries = residuals
    _, vjp = jax.vjp(
        lambda s, q: _batched_episode_scores_xla(s, support_labels, q, n_way),
        support,
        queries,
    )
    g_sup, g_qry = vjp(g)
    g_lab = np.zeros(support_labels.shape, dtype=jax.dtypes.float0)
    return g_sup, g_lab, g_qry


_fused_scores.defvjp(_fused_scores_fwd, _fused_scores_bwd)


def _batched_episode_scores_pallas(support, support_labels, queries, n_way):
    """One Pallas program per episode: prototypes + distances fused in VMEM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    e, s, d = support.shape
    q = queries.shape[1]
    dp = round_up(d, 128)
    sp = round_up(s, 8)
    qp = round_up(q, 8)
    npad = round_up(n_way, 128)  # lane axis of the output

    sup = jnp.pad(support.astype(jnp.float32), ((0, 0), (0, sp - s), (0, dp - d)))
    qry = jnp.pad(queries.astype(jnp.float32), ((0, 0), (0, qp - q), (0, dp - d)))
    # One-hot computed outside (tiny); padded support rows get all-zero rows.
    onehot = jax.nn.one_hot(support_labels, npad, dtype=jnp.float32)  # [E, S, npad]
    onehot = jnp.pad(onehot, ((0, 0), (0, sp - s), (0, 0)))
    inv_counts = 1.0 / jnp.maximum(onehot.sum(axis=1), 1.0)  # [E, npad]
    inv_counts = inv_counts[:, None, :]  # [E, 1, npad] — trailing dims match block

    def kernel(sup_ref, oh_ref, ic_ref, q_ref, out_ref):
        protos = jnp.dot(
            oh_ref[0].T, sup_ref[0], preferred_element_type=jnp.float32
        ) * ic_ref[0, 0][:, None]  # [npad, dp]
        cross = jnp.dot(q_ref[0], protos.T, preferred_element_type=jnp.float32)
        q2 = jnp.sum(q_ref[0] * q_ref[0], axis=-1, keepdims=True)
        p2 = jnp.sum(protos * protos, axis=-1)
        d2 = jnp.maximum(q2 + p2[None, :] - 2.0 * cross, 0.0)
        out_ref[0] = -jnp.sqrt(d2 + 1e-24)

    out = pl.pallas_call(
        kernel,
        grid=(e,),
        in_specs=[
            pl.BlockSpec((1, sp, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, npad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, npad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qp, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, qp, npad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e, qp, npad), jnp.float32),
    )(sup, onehot, inv_counts, qry)
    return out[:, :q, :n_way]
