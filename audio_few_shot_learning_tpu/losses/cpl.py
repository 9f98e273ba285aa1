"""Contrastive Prototypical Loss (CPL), vectorized.

Reference loops/loss.py:99-165 loops over queries in Python, sampling M
queries from each of the other N-1 classes, then computes cosine similarity
of the query's *own-class prototype* against [negatives..., query] / T and an
NLL whose target is the final (self) position, scaled by 1/n_queries on top
of the NLL mean.

TPU re-derivation: per-(query, class) Gumbel-top-M sampling over a masked
class-membership matrix replaces ``randperm`` (without-replacement semantics
preserved); own-class sample slots are masked to -inf inside the softmax,
which is exactly equivalent to excluding them, so every query's logit row has
static length N*M + 1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _cosine(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """cos sim along the last axis, torch F.cosine_similarity semantics:
    a·b / max(||a||*||b||, eps)."""
    dot = jnp.sum(a * b, axis=-1)
    na = jnp.linalg.norm(a, axis=-1)
    nb = jnp.linalg.norm(b, axis=-1)
    return dot / jnp.maximum(na * nb, eps)


def cpl_loss(
    prototypes: jnp.ndarray,  # [N, D]
    queries: jnp.ndarray,  # [B, D]
    labels: jnp.ndarray,  # [B] ints in [0, N)
    key: jax.Array,
    m_param: int,
    t_param: float,
) -> jnp.ndarray:
    n_way, _ = prototypes.shape
    b = queries.shape[0]
    m = m_param

    # membership[c, j] = 1 if query j belongs to class c
    member = jax.nn.one_hot(labels, n_way, dtype=jnp.float32).T  # [N, B]

    # Gumbel-top-M per (query, class): without-replacement sample of M members
    g = jax.random.gumbel(key, (b, n_way, b))
    g = jnp.where(member[None, :, :] > 0, g, -jnp.inf)
    _, idx = jax.lax.top_k(g, m)  # [B, N, M] indices into queries
    valid = jnp.take_along_axis(
        jnp.broadcast_to(member[None, :, :], (b, n_way, b)), idx, axis=-1
    )  # 1 where the sampled slot is a real member (class smaller than M -> 0s)

    sampled = queries[idx]  # [B, N, M, D]
    own_proto = prototypes[labels]  # [B, D]

    sims = _cosine(own_proto[:, None, None, :], sampled) / t_param  # [B, N, M]
    self_sim = _cosine(own_proto, queries) / t_param  # [B]

    # mask own-class slots and invalid slots out of the softmax
    not_own = (jnp.arange(n_way)[None, :] != labels[:, None]).astype(jnp.float32)
    keep = valid * not_own[:, :, None]  # [B, N, M]
    neg_logits = jnp.where(keep > 0, sims, -jnp.inf).reshape(b, n_way * m)
    logits = jnp.concatenate([neg_logits, self_sim[:, None]], axis=-1)  # [B, N*M+1]

    logp_self = logits[:, -1] - jax.nn.logsumexp(logits, axis=-1)
    # reference: (1/B) * NLLLoss(mean) -> mean / B (loops/loss.py:131)
    return -jnp.mean(logp_self) / b
