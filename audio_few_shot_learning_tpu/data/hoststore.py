"""Host-resident packed store + host-side episodic sampler.

The device-resident :class:`~audio_few_shot_learning_tpu.data.store.PackedStore`
is the fast path: the whole split lives in HBM and episode assembly is a
gather inside the scanned epoch program. That caps the dataset at what fits
beside the training program — fine for all five MetaAudio datasets in bf16
(NSynth, the largest at 306k items / ~9.9 GB, is the tight case), but a
production framework must also train on splits that do NOT fit.

This module is that path, playing the role the reference's host loop plays
for every dataset (datasets/batch_creation.py:21-72: per-episode
``random.sample`` class/item picks + per-item ``np.load``): the packed split
stays in host RAM as numpy arrays, episodes are sampled and gathered on the
host — with the reference's own ``random.sample`` semantics, which are
directly expressible here, unlike in XLA where the device sampler uses
Gumbel-top-k/Floyd draws — and only the assembled episode batch (a few MB)
moves to the device per step. The engine runs its per-step jitted program
(identical math to one scan step; see ``Trainer._apply_train_step``) and JAX's
async dispatch overlaps the next batch's host gather with the device step.

Selection is automatic: ``load_packed_split`` keeps the split on the host
when it would not fit beside the program (or when ``tpu.host_store`` forces
it). RNG note: host sampling uses a numpy Generator seeded from the
checkpointed run key, so resumed runs replay the same episode stream; draws
are not bit-identical to the device sampler's (documented RNG deviation,
PARITY.md).
"""

from __future__ import annotations

from typing import Sequence, Union

import numpy as np

from audio_few_shot_learning_tpu.data.episodes import EpisodeBatch
from audio_few_shot_learning_tpu.data.store import resolve_store_dtype


class HostStore:
    """Packed split in host RAM — same flat/ragged layout as PackedStore
    (segments [G,F,T], per-item offsets/counts, class table), numpy-backed,
    with a host episode sampler instead of the jittable one."""

    is_host_resident = True

    def __init__(
        self,
        segments: np.ndarray,
        seg_counts: np.ndarray,
        labels: np.ndarray,
        n_classes: int,
    ):
        self.segments = segments  # [G, F, T]
        self.seg_counts = np.asarray(seg_counts, np.int32)
        self.labels = np.asarray(labels, np.int32)
        self.n_classes = int(n_classes)
        self.seg_offsets = np.zeros(len(self.seg_counts), np.int32)
        if len(self.seg_counts):
            self.seg_offsets[1:] = np.cumsum(self.seg_counts)[:-1]
        self.s_max = int(self.seg_counts.max()) if len(self.seg_counts) else 1
        self.multi_segm = self.s_max > 1
        # items per class, reference dataset order (datasets/datasets.py:84-91)
        self.class_items = [
            np.nonzero(self.labels == c)[0].astype(np.int32)
            for c in range(self.n_classes)
        ]
        self.class_counts = np.asarray(
            [len(ci) for ci in self.class_items], np.int32
        )

    # --- PackedStore-compatible metadata surface (engine/eval budget) ---

    @property
    def num_items(self) -> int:
        return len(self.seg_counts)

    @property
    def feat_shape(self):
        return self.segments.shape[1:]

    def nbytes(self) -> int:
        return int(self.segments.size) * self.segments.dtype.itemsize

    @staticmethod
    def from_flat_arrays(
        segments: np.ndarray,
        seg_counts: np.ndarray,
        labels: Sequence[int],
        n_classes: int,
    ) -> "HostStore":
        return HostStore(segments, seg_counts, np.asarray(labels), n_classes)

    @staticmethod
    def pack(
        items: Sequence[np.ndarray],
        labels: Sequence[int],
        n_classes: int = None,
        mean: float = 0.0,
        std: float = 1.0,
        dtype: Union[str, np.dtype] = np.float32,
    ) -> "HostStore":
        """Python pack path, mirroring PackedStore.pack (z-norm at pack time,
        datasets/datasets.py:96-132)."""
        dtype = resolve_store_dtype(dtype)
        labels_np = np.asarray(labels, np.int32)
        if n_classes is None:
            n_classes = int(labels_np.max()) + 1 if len(labels_np) else 0
        norm, counts = [], []
        for x in items:
            x = np.asarray(x, np.float32)
            if x.ndim == 2:
                x = x[None]
            norm.append(((x - mean) / std).astype(dtype))
            counts.append(x.shape[0])
        segments = (
            np.concatenate(norm, axis=0) if norm else np.zeros((0, 1, 1), dtype)
        )
        return HostStore(segments, np.asarray(counts, np.int32), labels_np, n_classes)

    # ------------------------------------------------------------------
    # host episodic sampling — reference batch_creation.py:21-72 semantics
    # ------------------------------------------------------------------

    def sample_episode_batch(
        self,
        rng: np.random.Generator,
        n_way: int,
        k_support: int,
        k_query: int,
        is_test: bool = False,
        batch: int = 1,
    ) -> EpisodeBatch:
        """E independent episodes as one numpy EpisodeBatch (the engine
        device_puts it and feeds the per-step jitted program).

        Matches the device sampler's (and the reference's) semantics:
        classes without replacement, remapped in sorted order
        (batch_creation.py:25-26); per-class items shuffled then split
        support|query without replacement (:38-48); one random segment for
        support/train queries, ALL segments padded to s_max for test queries
        of a multi-segment store (:53-72).
        """
        eps = [
            self._sample_one(rng, n_way, k_support, k_query, is_test)
            for _ in range(batch)
        ]
        return EpisodeBatch(
            support=np.stack([e[0] for e in eps]),
            support_labels=np.stack([e[1] for e in eps]),
            query=np.stack([e[2] for e in eps]),
            query_labels=np.stack([e[3] for e in eps]),
            audio_ids=np.stack([e[4] for e in eps]),
            query_mask=np.stack([e[5] for e in eps]),
        )

    def _gather(self, items: np.ndarray, segs: np.ndarray) -> np.ndarray:
        return self.segments[self.seg_offsets[items] + segs]

    def _sample_one(self, rng, n_way, k_support, k_query, is_test):
        need = k_support + k_query
        eligible = np.nonzero(self.class_counts >= need)[0]
        classes = np.sort(rng.choice(eligible, size=n_way, replace=False))

        sup_items, qry_items = [], []
        for c in classes:
            pick = rng.permutation(self.class_counts[c])[:need]
            row = self.class_items[c][pick]
            sup_items.append(row[:k_support])
            qry_items.append(row[k_support:])
        sup_items = np.concatenate(sup_items)
        qry_items = np.concatenate(qry_items)

        qn = n_way * k_query
        support_labels = np.repeat(np.arange(n_way, dtype=np.int32), k_support)
        query_labels = np.repeat(np.arange(n_way, dtype=np.int32), k_query)

        sup_seg = (rng.random(len(sup_items)) * self.seg_counts[sup_items]).astype(
            np.int32
        )
        support = self._gather(sup_items, sup_seg)

        if not is_test or not self.multi_segm:
            qry_seg = (rng.random(qn) * self.seg_counts[qry_items]).astype(np.int32)
            query = self._gather(qry_items, qry_seg)
            return (
                support,
                support_labels,
                query,
                query_labels,
                np.arange(qn, dtype=np.int32),
                np.ones(qn, np.float32),
            )

        smax = self.s_max
        item_rep = np.repeat(qry_items, smax)
        seg_rep = np.tile(np.arange(smax, dtype=np.int32), qn)
        valid = seg_rep < self.seg_counts[item_rep]
        query = self._gather(item_rep, np.minimum(seg_rep, self.seg_counts[item_rep] - 1))
        # zero padded rows — same invariant as the device sampler
        query = query * valid[:, None, None].astype(query.dtype)
        return (
            support,
            support_labels,
            query,
            np.repeat(query_labels, smax),
            np.repeat(np.arange(qn, dtype=np.int32), smax),
            valid.astype(np.float32),
        )
