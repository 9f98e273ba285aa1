"""On-device episodic sampling.

Replaces reference datasets/batch_creation.py:21-170 (host Python: random
class choice, per-item disk reads, segment picks) with a fully jittable
sampler: class choice and per-class item splits are Gumbel-top-k draws over
masked tables, segment picks are bounded randints, and the episode tensors
are gathers from the packed store. ``vmap`` over keys yields a *batch* of
episodes in one XLA program.

Reference semantics preserved:
  * classes sampled without replacement, remapped to 0..N-1 in sorted order
    (batch_creation.py:25-26);
  * per class, items shuffled then split support|query without replacement
    (batch_creation.py:38-48);
  * multi-segment items: random single segment for support and train queries;
    **all** segments for test queries, with ``audio_ids`` tagging each segment
    with its query index (batch_creation.py:53-72). Here all-segments are
    padded to S_max with a validity mask instead of a ragged list.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from audio_few_shot_learning_tpu.data.store import PackedStore


@struct.dataclass
class EpisodeBatch:
    """A batch of E episodes, fixed shapes.

    Train/val (single segment): query is [E, Q, F, T], query_seg_mask all-ones
    [E, Q]. Test multi-segment: query is [E, Q*S_max, F, T] with audio_ids and
    a validity mask over padded segments.
    """

    support: jnp.ndarray  # [E, S, F, T]
    support_labels: jnp.ndarray  # [E, S]
    query: jnp.ndarray  # [E, Qtot, F, T]
    query_labels: jnp.ndarray  # [E, Qtot]
    audio_ids: jnp.ndarray  # [E, Qtot] query-index per row
    query_mask: jnp.ndarray  # [E, Qtot] 1 = real segment, 0 = padding


def _choose_without_replacement(key: jax.Array, scores_mask: jnp.ndarray, k: int):
    """Gumbel-top-k indices over entries where mask>0. Returns [k] indices.

    O(M log M) in the table width — fine for the class axis (<= ~1000
    classes), NOT for item picks inside a class row padded to M_max (29k for
    an NSynth-scale long-tail split); use :func:`_floyd_sample` there."""
    g = jax.random.gumbel(key, scores_mask.shape)
    g = jnp.where(scores_mask > 0, g, -jnp.inf)
    _, idx = jax.lax.top_k(g, k)
    return idx


def _floyd_sample(key: jax.Array, count: jnp.ndarray, k: int) -> jnp.ndarray:
    """k distinct uniform positions in [0, count), in uniformly random order —
    the distribution of ``random.sample(range(count), k)``
    (reference batch_creation.py:38-48) — in O(k^2) ops.

    Unlike gumbel-top-k over the count-masked padded row, cost is independent
    of the class-table width M_max: at NSynth scale (M_max ~29k) the per-class
    top_k sort dominated episode sampling (measured ~128 ms vs ~3 ms per
    8-episode batch, scripts/stress_nsynth_scale.py). Floyd's subset
    algorithm gives a uniform k-subset; the final k-element shuffle lifts it
    to a uniform ordered sample. ``count`` is a traced scalar >= k (callers
    pre-mask classes with fewer than k items)."""
    k_fl, k_perm = jax.random.split(key)
    u = jax.random.uniform(k_fl, (k,))
    chosen = jnp.full((k,), -1, jnp.int32)
    for i in range(k):  # static unroll; k = K_support + K_query is small
        j = count.astype(jnp.int32) - k + i
        t = jnp.minimum((u[i] * (j + 1).astype(jnp.float32)).astype(jnp.int32), j)
        hit = jnp.any(chosen == t)
        chosen = chosen.at[i].set(jnp.where(hit, j, t))
    perm = jnp.argsort(jax.random.uniform(k_perm, (k,)))
    return chosen[perm]


def sample_episode(
    key: jax.Array,
    store: PackedStore,
    n_way: int,
    k_support: int,
    k_query: int,
    is_test: bool,
) -> EpisodeBatch:
    """One episode (leading axes sized for E=1 via vmap in the batch API)."""
    k_cls, k_items, k_seg_s, k_seg_q = jax.random.split(key, 4)

    # --- classes, sorted ascending like sorted(random.sample(...)) ---
    cls_mask = (store.class_counts >= (k_support + k_query)).astype(jnp.float32)
    classes = _choose_without_replacement(k_cls, cls_mask, n_way)
    classes = jnp.sort(classes)  # remap = position in sorted order

    # --- per-class item split: Floyd k-subset + shuffle over [0, count) ---
    def per_class(kc, c):
        idx = _floyd_sample(kc, store.class_counts[c], k_support + k_query)
        items = store.class_table[c, idx]  # k-element gather, not a row read
        return items[:k_support], items[k_support:]

    cls_keys = jax.random.split(k_items, n_way)
    sup_items, qry_items = jax.vmap(per_class)(cls_keys, classes)  # [N,K], [N,Q]
    sup_items = sup_items.reshape(-1)  # [S]
    qry_items = qry_items.reshape(-1)  # [Qn]

    s = n_way * k_support
    qn = n_way * k_query
    support_labels = jnp.repeat(jnp.arange(n_way), k_support)
    query_labels_base = jnp.repeat(jnp.arange(n_way), k_query)

    # --- support: one random segment per item ---
    def pick_segment(k, item):
        u = jax.random.uniform(k, ())
        seg = jnp.floor(u * store.seg_counts[item].astype(jnp.float32)).astype(jnp.int32)
        return jnp.minimum(seg, store.seg_counts[item] - 1)

    sup_seg = jax.vmap(pick_segment)(jax.random.split(k_seg_s, s), sup_items)
    support = jax.vmap(store.get_segment)(sup_items, sup_seg)  # [S, F, T]

    if not is_test or not store.multi_segm:
        qry_seg = jax.vmap(pick_segment)(jax.random.split(k_seg_q, qn), qry_items)
        query = jax.vmap(store.get_segment)(qry_items, qry_seg)  # [Qn, F, T]
        return EpisodeBatch(
            support=support,
            support_labels=support_labels,
            query=query,
            query_labels=query_labels_base,
            audio_ids=jnp.arange(qn),
            query_mask=jnp.ones((qn,), jnp.float32),
        )

    # --- test multi-segment: all segments, padded to S_max, masked ---
    smax = store.s_max
    rows = jax.vmap(lambda it: store.item_segment_rows(it, smax))(qry_items)  # [Qn, S_max]
    query = store.segments[rows.reshape(-1)]  # [Qn*S_max, F, T]
    seg_valid = (
        jnp.arange(smax)[None, :] < store.seg_counts[qry_items][:, None]
    )  # [Qn, S_max]
    # padded rows are clipped duplicates of the last real segment; zero them
    # to keep the old padded-layout invariant (tests rely on zero padding)
    query = query * seg_valid.reshape(-1)[:, None, None].astype(query.dtype)
    return EpisodeBatch(
        support=support,
        support_labels=support_labels,
        query=query,
        query_labels=jnp.repeat(query_labels_base, smax),
        audio_ids=jnp.repeat(jnp.arange(qn), smax),
        query_mask=seg_valid.reshape(-1).astype(jnp.float32),
    )


def sample_wav_episode(
    key: jax.Array,
    store,
    n_way: int,
    k_support: int,
    k_query: int,
    is_test: bool,
) -> EpisodeBatch:
    """Wav-store episode: same class/item sampling, segments extracted from
    packed waveforms by index arithmetic (reference batch_creation.py:74-106).
    Episode arrays hold raw waveforms [.., L]; mel happens downstream."""
    k_cls, k_items, k_seg_s, k_seg_q = jax.random.split(key, 4)

    cls_mask = (store.class_counts >= (k_support + k_query)).astype(jnp.float32)
    classes = jnp.sort(_choose_without_replacement(k_cls, cls_mask, n_way))

    def per_class(kc, c):
        idx = _floyd_sample(kc, store.class_counts[c], k_support + k_query)
        items = store.class_table[c, idx]
        return items[:k_support], items[k_support:]

    cls_keys = jax.random.split(k_items, n_way)
    sup_items, qry_items = jax.vmap(per_class)(cls_keys, classes)
    sup_items = sup_items.reshape(-1)
    qry_items = qry_items.reshape(-1)

    s = n_way * k_support
    qn = n_way * k_query
    support_labels = jnp.repeat(jnp.arange(n_way), k_support)
    query_labels_base = jnp.repeat(jnp.arange(n_way), k_query)

    def pick_segment(k, item):
        u = jax.random.uniform(k, ())
        seg = jnp.floor(u * store.seg_counts[item].astype(jnp.float32)).astype(jnp.int32)
        return jnp.minimum(seg, store.seg_counts[item] - 1)

    sup_seg = jax.vmap(pick_segment)(jax.random.split(k_seg_s, s), sup_items)
    support = jax.vmap(store.extract_segment)(sup_items, sup_seg)  # [S, L]

    if not is_test or not store.multi_segm:
        qry_seg = jax.vmap(pick_segment)(jax.random.split(k_seg_q, qn), qry_items)
        query = jax.vmap(store.extract_segment)(qry_items, qry_seg)
        return EpisodeBatch(
            support=support,
            support_labels=support_labels,
            query=query,
            query_labels=query_labels_base,
            audio_ids=jnp.arange(qn),
            query_mask=jnp.ones((qn,), jnp.float32),
        )

    smax = store.s_max
    item_rep = jnp.repeat(qry_items, smax)
    seg_rep = jnp.tile(jnp.arange(smax), qn)
    query = jax.vmap(store.extract_segment)(item_rep, jnp.minimum(seg_rep, store.seg_counts[item_rep] - 1))
    seg_valid = seg_rep < store.seg_counts[item_rep]
    return EpisodeBatch(
        support=support,
        support_labels=support_labels,
        query=query,
        query_labels=jnp.repeat(query_labels_base, smax),
        audio_ids=jnp.repeat(jnp.arange(qn), smax),
        query_mask=seg_valid.astype(jnp.float32),
    )


def sample_episode_batch(
    key: jax.Array,
    store: PackedStore,
    n_way: int,
    k_support: int,
    k_query: int,
    is_test: bool = False,
    batch: int = 1,
) -> EpisodeBatch:
    """Batch of E independent episodes: vmap over per-episode keys."""
    keys = jax.random.split(key, batch)
    return jax.vmap(
        lambda k: sample_episode(k, store, n_way, k_support, k_query, is_test)
    )(keys)
