"""Host-resident ragged waveform store + host episodic sampler.

The device-resident :class:`~audio_few_shot_learning_tpu.data.wavstore.PackedWavStore`
keeps the whole wav split in HBM (ragged, no padding) — fine for ESC-50 /
FSD2018 / NSynth-scale splits, but BirdClef (~65k items, up to 180 s each
after pruning, ~120 GB ragged f32) and VoxCeleb (~29 GB) cannot live beside
the training program on a 16 GB chip.

This class is the wav twin of :class:`~..data.hoststore.HostStore`, playing
the role the reference's host loop plays (datasets/batch_creation.py:74-106,
173-209: per-episode ``random.sample`` picks + per-item ``np.load`` +
``variable_wav_splits`` segmentation in Python): the ragged flat sample
array stays in host RAM (int64 offsets — no 2^31 cap), episodes are sampled
and segment-sliced on the host with the reference's own semantics (full
segments = contiguous slice; tail/short = tile the WHOLE sample,
batch_creation.py:201-208), and only the assembled raw-wav episode batch
moves to the device per step, where the jitted program runs WaveAugment +
online mel + z-norm + model exactly like the device-store path.

Selection is automatic: ``load_packed_split`` keeps a wav split on the host
when its RAGGED size would not fit beside the program (or when
``tpu.host_store`` forces it). RNG note: same documented deviation as
HostStore — numpy Generator seeded from the checkpointed run key.

Storage dtype: ``float32`` (default, bit-exact with the on-disk .npy) or
``float16`` — halves host RAM (BirdClef: ~120 GB -> ~60 GB). float16 is the
right half precision for RAW AUDIO: its 11-bit mantissa keeps samples from
16-bit PCM sources within 2^-11 relative error, whereas bfloat16 (the spec
stores' half dtype) has only an 8-bit mantissa — spec values are log-mel
magnitudes where that is fine, raw samples are not. ``tpu.store_dtype:
'bfloat16'`` therefore maps to float16 here. Extraction upcasts to float32
per episode batch; mel/augment math is unchanged.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from audio_few_shot_learning_tpu.config import SAMPLE_RATE, SEGMENT_SECONDS
from audio_few_shot_learning_tpu.data.episodes import EpisodeBatch
from audio_few_shot_learning_tpu.data.wavstore import pack_wav_ragged


class WavHostStore:
    """Ragged wav split in host RAM — same flat layout as PackedWavStore
    (int64 offsets), numpy-backed, with a host episode sampler that emits
    raw-wav EpisodeBatches for the engine's streaming per-step program."""

    is_host_resident = True

    def __init__(
        self,
        flat: np.ndarray,
        offsets: np.ndarray,
        lengths: np.ndarray,
        tails: np.ndarray,
        tail_index: np.ndarray,
        seg_counts: np.ndarray,
        seg_len: int,
        labels: np.ndarray,
        n_classes: int,
        mean: float = 0.0,
        std: float = 1.0,
    ):
        self.flat = flat  # [total] ragged samples (f32 or f16, module doc)
        self.offsets = np.asarray(offsets, np.int64)
        self.lengths = np.asarray(lengths, np.int64)
        self.tails = tails  # [T, seg_len]
        self.tail_index = np.asarray(tail_index, np.int32)
        self.seg_counts = np.asarray(seg_counts, np.int32)
        self.seg_len = int(seg_len)
        self.labels = np.asarray(labels, np.int32)
        self.n_classes = int(n_classes)
        self.mean = float(mean)  # post-mel glob_norm stats
        self.std = float(std)
        self.s_max = int(self.seg_counts.max()) if len(self.seg_counts) else 1
        self.multi_segm = self.s_max > 1
        self.class_items = [
            np.nonzero(self.labels == c)[0].astype(np.int32)
            for c in range(self.n_classes)
        ]
        self.class_counts = np.asarray(
            [len(ci) for ci in self.class_items], np.int32
        )

    # --- PackedWavStore-compatible metadata surface ---

    @property
    def num_items(self) -> int:
        return len(self.lengths)

    @property
    def feat_shape(self):
        return (self.seg_len,)

    def nbytes(self) -> int:
        itemsize = self.flat.dtype.itemsize
        return int(self.flat.size) * itemsize + int(self.tails.size) * itemsize

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
        dtype=np.float32,
    ) -> "WavHostStore":
        labels_np = np.asarray(labels, np.int32)
        if n_classes is None:
            n_classes = int(labels_np.max()) + 1 if len(labels_np) else 0
        flat, offsets, lengths, tails, tail_index, seg_counts, seg_len = (
            pack_wav_ragged(waveforms, multi_segm, segment_seconds, sr)
        )
        dtype = resolve_wav_host_dtype(dtype)
        return WavHostStore(
            flat.astype(dtype, copy=False), offsets, lengths,
            tails.astype(dtype, copy=False), tail_index, seg_counts, seg_len,
            labels_np, n_classes, mean=mean, std=std,
        )

    @staticmethod
    def pack_from_files(
        filepaths,
        labels: Sequence[int],
        n_classes: Optional[int] = None,
        mean: float = 0.0,
        std: float = 1.0,
        multi_segm: bool = False,
        segment_seconds: int = SEGMENT_SECONDS,
        sr: int = SAMPLE_RATE,
        dtype=np.float32,
    ) -> "WavHostStore":
        """Two-pass file pack: sizes from headers first, then stream each
        .npy straight into its flat slot — peak memory = one flat array +
        one file, never a Python list of all waveforms (the list would
        double peak RAM at BirdClef scale)."""
        dtype = resolve_wav_host_dtype(dtype)
        labels_np = np.asarray(labels, np.int32)
        if n_classes is None:
            n_classes = int(labels_np.max()) + 1 if len(labels_np) else 0
        heads = [_npy_1d_length(p) for p in filepaths]
        if any(h is None for h in heads):
            # irregular file(s): fall back to the list path
            return WavHostStore.pack(
                [np.load(p, allow_pickle=True) for p in filepaths],
                labels_np, n_classes, mean, std, multi_segm, segment_seconds,
                sr, dtype,
            )
        lengths = np.asarray(heads, np.int64)
        l_max = int(lengths.max()) if len(lengths) else segment_seconds * sr
        seg_len = segment_seconds * sr if multi_segm else l_max
        offsets = np.zeros(len(lengths), np.int64)
        if len(lengths):
            offsets[1:] = np.cumsum(lengths)[:-1]
        flat = np.zeros(max(int(lengths.sum()), seg_len), dtype)
        tail_rows, tail_index = [], np.zeros(len(lengths), np.int32)
        for i, p in enumerate(filepaths):
            w = np.load(p).astype(np.float32, copy=False).ravel()
            flat[offsets[i] : offsets[i] + w.shape[0]] = w
            if w.shape[0] == 0:
                tail_index[i] = len(tail_rows)
                tail_rows.append(np.zeros(seg_len, dtype))
            elif w.shape[0] < seg_len:
                reps = -(-seg_len // w.shape[0])
                tail_index[i] = len(tail_rows)
                tail_rows.append(np.tile(w, reps)[:seg_len].astype(dtype, copy=False))
        tails = (
            np.stack(tail_rows) if tail_rows else np.zeros((1, seg_len), dtype)
        )
        if multi_segm:
            seg_counts = np.maximum(-(-lengths // seg_len), 1).astype(np.int32)
        else:
            seg_counts = np.ones(len(lengths), np.int32)
        return WavHostStore(
            flat, offsets, lengths, tails, tail_index, seg_counts, seg_len,
            labels_np, n_classes, mean=mean, std=std,
        )

    # ------------------------------------------------------------------
    # host segment extraction — PackedWavStore.extract_segment semantics
    # ------------------------------------------------------------------

    def _extract_into(self, out: np.ndarray, items: np.ndarray, segs: np.ndarray):
        """Fill out[r] with segment segs[r] of items[r] (reference
        repeat/tail semantics, batch_creation.py:173-209)."""
        L = self.seg_len
        for r, (i, s) in enumerate(zip(items, segs)):
            length = self.lengths[i]
            start = s * L
            off = self.offsets[i]
            if length - start >= L:  # full segment: contiguous slice
                out[r] = self.flat[off + start : off + start + L]
            elif length < L:  # short item: precomputed tiled row
                out[r] = self.tails[self.tail_index[i]]
            else:  # tail of a long item: tile(whole)[:L] == prefix
                out[r] = self.flat[off : off + L]

    # ------------------------------------------------------------------
    # host episodic sampling — reference batch_creation.py:74-106 semantics
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
        """E independent episodes as one numpy EpisodeBatch of raw wav rows
        ([E, S, L] support / [E, Q(*S_max), L] query); augmentation, mel and
        z-norm run on device in the engine's per-step program."""
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
        support = np.empty((len(sup_items), self.seg_len), np.float32)
        self._extract_into(support, sup_items, sup_seg)

        if not is_test or not self.multi_segm:
            qry_seg = (rng.random(qn) * self.seg_counts[qry_items]).astype(np.int32)
            query = np.empty((qn, self.seg_len), np.float32)
            self._extract_into(query, qry_items, qry_seg)
            return (
                support,
                support_labels,
                query,
                query_labels,
                np.arange(qn, dtype=np.int32),
                np.ones(qn, np.float32),
            )

        # test queries of a multi-segment store: ALL segments padded to
        # s_max. Padded rows carry the clamped last segment and are
        # discarded by query_mask in the vote — same invariant as the
        # device wav sampler (data/episodes.py sample_wav_episode).
        smax = self.s_max
        item_rep = np.repeat(qry_items, smax)
        seg_rep = np.tile(np.arange(smax, dtype=np.int32), qn)
        valid = seg_rep < self.seg_counts[item_rep]
        query = np.empty((qn * smax, self.seg_len), np.float32)
        self._extract_into(
            query, item_rep, np.minimum(seg_rep, self.seg_counts[item_rep] - 1)
        )
        return (
            support,
            support_labels,
            query,
            np.repeat(query_labels, smax),
            np.repeat(np.arange(qn, dtype=np.int32), smax),
            valid.astype(np.float32),
        )


def resolve_wav_host_dtype(dtype) -> np.dtype:
    """Map the config's store dtype to a wav host dtype: 'bfloat16' (the
    spec stores' half-precision knob) means float16 here — bf16's 8-bit
    mantissa is wrong for raw samples, f16's 11 bits cover 16-bit PCM."""
    if isinstance(dtype, str) and dtype == "bfloat16":
        return np.dtype(np.float16)
    dtype = np.dtype(dtype)
    if dtype.name == "bfloat16":
        return np.dtype(np.float16)
    if dtype not in (np.dtype(np.float32), np.dtype(np.float16)):
        raise ValueError(f"wav host store dtype must be float32/float16, got {dtype}")
    return dtype


def _npy_1d_length(path) -> Optional[int]:
    """Element count of a 1-D float32/float64 .npy from its header alone
    (no body read); None for anything irregular."""
    try:
        with open(path, "rb") as f:
            version = np.lib.format.read_magic(f)
            shape, fortran, dtype = np.lib.format._read_array_header(f, version)
    except Exception:
        return None
    if len(shape) != 1 or dtype not in (np.dtype(np.float32), np.dtype(np.float64)):
        return None
    return int(shape[0])
