"""Packed waveform store for ``input_type='wav'`` configs.

The reference's wav branch (datasets/batch_creation.py:74-106) loads raw
waveforms per item, segments 5 s chunks in Python (``variable_wav_splits``),
augments on GPU and extracts mel on device. Here waveforms are packed once
into a device-resident **ragged** layout; segment extraction is contiguous
``dynamic_slice`` arithmetic inside jit, including the reference's
segmentation semantics:

  * len < 5 s      -> 1 segment = tile(sample)[:5 s]
  * tail remainder -> segment = tile(whole sample)[:5 s]
    (batch_creation.py:201-208 repeats the WHOLE sample for the tail)

Layout — flat/ragged, no padding waste (mirrors store.py's spec layout):
  waveforms [total]  all samples of all items, concatenated
  offsets   [I]      start sample of item i
  lengths   [I]      true length of item i

A padded ``[I, L_max]`` layout (rounds 1-4) multiplies the footprint by
L_max/mean(L) — for long-tailed duration distributions like BirdClef
(pruned to <=180 s, to_var_spec.py semantics) that is ~6x, putting the
split at ~750 GB padded vs ~120 GB ragged. Splits whose RAGGED size still
exceeds HBM stream from host RAM instead (data/wavhoststore.py), selected
automatically by ``load_packed_split``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from audio_few_shot_learning_tpu.config import SAMPLE_RATE, SEGMENT_SECONDS


def pack_wav_ragged(
    waveforms: Sequence[np.ndarray],
    multi_segm: bool,
    segment_seconds: int = SEGMENT_SECONDS,
    sr: int = SAMPLE_RATE,
):
    """Host-side ragged pack shared by the device and host wav stores.

    Returns ``(flat [total] f32, offsets [I] i64, lengths [I] i32,
    tails [T, seg_len] f32, tail_index [I] i32, seg_counts [I] i32,
    seg_len)`` with the reference's segmentation semantics baked into the
    precomputed tail rows (see module doc).
    """
    lengths = np.asarray([w.shape[0] for w in waveforms], dtype=np.int64)
    l_max = int(lengths.max()) if len(lengths) else segment_seconds * sr
    # non-multi-segment wav datasets use the whole (fixed-length) waveform
    # (batch_creation.py:83-84: reshape(1,-1), no segmentation)
    seg_len = segment_seconds * sr if multi_segm else l_max

    offsets = np.zeros(len(lengths), dtype=np.int64)
    if len(lengths):
        offsets[1:] = np.cumsum(lengths)[:-1]
    # keep the flat array >= one segment so a seg_len dynamic_slice is
    # always traceable (tiny all-short splits)
    flat = np.zeros(max(int(lengths.sum()), seg_len), dtype=np.float32)
    # Tail segments precomputed host-side: the reference's repeat/tail
    # semantics (tile the WHOLE sample, batch_creation.py:201-208) only
    # ever apply to an item's LAST segment, so one [seg_len] row per
    # short item lets on-device extraction be a contiguous dynamic_slice
    # + select instead of an 80k-element general gather (which runs
    # ~100 ms/episode on TPU — the gather is the whole wav-path
    # bottleneck). Items with len >= seg_len need no stored row: their
    # tail is sample[:seg_len] == the item's flat prefix.
    tail_rows = []
    tail_index = np.zeros(len(lengths), dtype=np.int32)
    for i, w in enumerate(waveforms):
        w = np.asarray(w, dtype=np.float32)
        flat[offsets[i] : offsets[i] + w.shape[0]] = w
        if w.shape[0] == 0:
            # degenerate empty item: its own silent row (defaulting to
            # tail_index 0 would alias another short item's audio)
            tail_index[i] = len(tail_rows)
            tail_rows.append(np.zeros(seg_len, dtype=np.float32))
        elif w.shape[0] < seg_len:
            reps = -(-seg_len // w.shape[0])  # ceil
            tail_index[i] = len(tail_rows)
            tail_rows.append(np.tile(w, reps)[:seg_len])
    tails = (
        np.stack(tail_rows) if tail_rows else np.zeros((1, seg_len), dtype=np.float32)
    )

    if multi_segm:
        # ceil(len/seg_len); short samples get exactly 1 (repeat-padded)
        seg_counts = np.maximum(-(-lengths // seg_len), 1).astype(np.int32)
    else:
        seg_counts = np.ones(len(lengths), dtype=np.int32)
    return flat, offsets, lengths.astype(np.int32), tails, tail_index, seg_counts, seg_len


def build_class_table(labels_np: np.ndarray, n_classes: int):
    """[C, M_max] item-index table + [C] counts (reference dataset order,
    datasets/datasets.py:84-91)."""
    counts = np.bincount(labels_np, minlength=n_classes).astype(np.int32)
    m_max = int(counts.max()) if len(counts) else 1
    table = np.zeros((n_classes, m_max), dtype=np.int32)
    fill = np.zeros(n_classes, dtype=np.int32)
    for idx, lab in enumerate(labels_np):
        table[lab, fill[lab]] = idx
        fill[lab] += 1
    return table, counts


@struct.dataclass
class PackedWavStore:
    waveforms: jnp.ndarray  # [total] flat ragged samples
    offsets: jnp.ndarray  # [I] int32 start sample of item i
    # Tail rows tile(sample)[:seg_len], stored ONLY for items shorter than
    # seg_len — for any item with len >= seg_len the reference's tail
    # semantics reduce to sample[:seg_len] (batch_creation.py:201-208 repeats
    # the WHOLE sample, so one repetition already covers seg_len), which is
    # exactly the item's flat prefix.
    tails: jnp.ndarray  # [T, seg_len], T = #short items (>=1 placeholder row)
    tail_index: jnp.ndarray  # [I] int32 row in ``tails`` (0 when unused)
    lengths: jnp.ndarray  # [I] int32 true lengths
    seg_counts: jnp.ndarray  # [I] int32 (1 for single-segment stores)
    labels: jnp.ndarray  # [I] int32
    class_table: jnp.ndarray  # [C, M_max]
    class_counts: jnp.ndarray  # [C]
    mean: jnp.ndarray  # scalar — glob_norm stats applied AFTER mel
    std: jnp.ndarray  # scalar
    n_classes: int = struct.field(pytree_node=False)
    s_max: int = struct.field(pytree_node=False)
    multi_segm: bool = struct.field(pytree_node=False)
    seg_len: int = struct.field(pytree_node=False)

    @property
    def num_items(self) -> int:
        return self.offsets.shape[0]

    @property
    def feat_shape(self):
        return (self.seg_len,)

    def nbytes(self) -> int:
        return int(self.waveforms.size) * 4 + int(self.tails.size) * 4

    @staticmethod
    def pack(
        waveforms: Sequence[np.ndarray],
        labels: Sequence[int],
        n_classes: Optional[int] = None,
        mean: float = 0.0,
        std: float = 1.0,
        multi_segm: bool = False,
        segment_seconds: int = SEGMENT_SECONDS,
        sr: int = SAMPLE_RATE,
        device: Optional[jax.Device] = None,
    ) -> "PackedWavStore":
        labels_np = np.asarray(labels, dtype=np.int32)
        if n_classes is None:
            n_classes = int(labels_np.max()) + 1 if len(labels_np) else 0

        flat, offsets, lengths, tails, tail_index, seg_counts, seg_len = (
            pack_wav_ragged(waveforms, multi_segm, segment_seconds, sr)
        )
        if flat.shape[0] >= np.iinfo(np.int32).max - seg_len:
            # int32 offsets address <2^31 samples (~8.6 GB f32) — anything
            # bigger cannot be device-resident anyway; the auto-selection in
            # load_packed_split routes such splits to WavHostStore (int64).
            raise ValueError(
                f"split has {flat.shape[0]} samples (> int32 addressing); "
                "use the host-resident WavHostStore for splits this large"
            )
        s_max = int(seg_counts.max()) if len(lengths) else 1
        table, counts = build_class_table(labels_np, n_classes)

        put = (lambda a: jax.device_put(a, device)) if device else jnp.asarray
        return PackedWavStore(
            waveforms=put(flat),
            offsets=put(offsets.astype(np.int32)),
            tails=put(tails),
            tail_index=put(tail_index),
            lengths=put(lengths),
            seg_counts=put(seg_counts),
            labels=put(labels_np),
            class_table=put(table),
            class_counts=put(counts),
            mean=jnp.asarray(mean, jnp.float32),
            std=jnp.asarray(std, jnp.float32),
            n_classes=n_classes,
            s_max=s_max,
            multi_segm=multi_segm,
            seg_len=seg_len,
        )

    def extract_segment(self, item: jnp.ndarray, seg: jnp.ndarray) -> jnp.ndarray:
        """Segment ``seg`` of item ``item`` -> [seg_len] with the reference's
        repeat/tail semantics (jit-friendly, TPU-fast: contiguous slices only).

        Full segments are a ``dynamic_slice`` of the flat array at
        ``offsets[item] + seg*seg_len`` — in-bounds within the item by the
        ``full`` predicate, so it never reads a neighbour. The tail case
        tiles the WHOLE sample (batch_creation.py:201-208): for items with
        len >= seg_len that is just the item's flat prefix; only short items
        need their precomputed ``tails`` row. Out-of-range reads in the
        unselected branches are clamped and discarded by the selects.
        """
        length = self.lengths[item]
        start = seg * self.seg_len
        off = self.offsets[item]
        full = (length - start) >= self.seg_len
        limit = self.waveforms.shape[0] - self.seg_len
        sliced = jax.lax.dynamic_slice(
            self.waveforms, (jnp.clip(off + start, 0, limit),), (self.seg_len,)
        )
        prefix = jax.lax.dynamic_slice(
            self.waveforms, (jnp.clip(off, 0, limit),), (self.seg_len,)
        )
        short = jax.lax.dynamic_index_in_dim(
            self.tails, self.tail_index[item], keepdims=False
        )
        tail = jnp.where(length < self.seg_len, short, prefix)
        return jnp.where(full, sliced, tail)
