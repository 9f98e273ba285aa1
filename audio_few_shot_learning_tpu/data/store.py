"""Packed spectrogram store.

The reference reads one ``.npy`` file per episode item from disk inside the
hot loop (datasets/datasets.py:48-58 — SURVEY.md §3.1 calls it the
bottleneck). Here a whole split is packed **once** into device-resident
arrays; episode assembly is pure ``jnp.take`` and the accelerator never
waits on the host.

Layout — flat/ragged, no padding waste:
  segments    [G, F, T]   all segments of all items, concatenated
  seg_offsets [I]         start row of item i's segments
  seg_counts  [I]         segments per item (>=1)
  labels      [I]         class ids 0..C-1
  class_table [C, M_max]  item indices per class (padded)
  class_counts[C]         real items per class

The flat layout matters for the variable-length datasets: BirdClef items
carry 1..36 five-second segments, so the naive padded [I, S_max, F, T]
array would be ~10x larger than the data. ``store_dtype='bfloat16'`` halves
the footprint again (NSynth's 306k items fit a 16 GB chip).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
from flax import struct


def resolve_store_dtype(dtype: Union[str, np.dtype]) -> np.dtype:
    """'bfloat16' halves the HBM footprint of the packed split. Compute
    upcasts per-op; accuracy impact is below augmentation noise."""
    if isinstance(dtype, str) and dtype == "bfloat16":
        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(dtype)


@struct.dataclass
class PackedStore:
    segments: jnp.ndarray  # [G, F, T] flat segment rows
    seg_offsets: jnp.ndarray  # [I] int32
    seg_counts: jnp.ndarray  # [I] int32
    labels: jnp.ndarray  # [I] int32
    class_table: jnp.ndarray  # [C, M_max] int32
    class_counts: jnp.ndarray  # [C] int32
    n_classes: int = struct.field(pytree_node=False)
    s_max: int = struct.field(pytree_node=False)
    multi_segm: bool = struct.field(pytree_node=False)

    @property
    def num_items(self) -> int:
        return self.seg_offsets.shape[0]

    @property
    def feat_shape(self):
        return self.segments.shape[1:]

    def get_segment(self, item: jnp.ndarray, seg: jnp.ndarray) -> jnp.ndarray:
        """Segment ``seg`` of item ``item`` -> [F, T] (jit-friendly gather)."""
        return self.segments[self.seg_offsets[item] + seg]

    def item_segment_rows(self, item: jnp.ndarray, s_max: int) -> jnp.ndarray:
        """Row indices of an item's first ``s_max`` segments (clipped to the
        item's real range; mask with seg_counts downstream). Returns [s_max]."""
        base = self.seg_offsets[item]
        idx = base + jnp.minimum(jnp.arange(s_max), self.seg_counts[item] - 1)
        return idx

    @staticmethod
    def from_flat_arrays(
        segments: np.ndarray,
        seg_counts: np.ndarray,
        labels: np.ndarray,
        n_classes: int,
        device: Optional[jax.Device] = None,
    ) -> "PackedStore":
        """Build a store from a flat [G, F, T] segment array + per-item
        counts (used by the native C++ packer path)."""
        labels_np = np.asarray(labels, dtype=np.int32)
        seg_counts_np = np.asarray(seg_counts, dtype=np.int32)
        offsets = np.zeros(len(seg_counts_np), dtype=np.int32)
        if len(seg_counts_np):
            offsets[1:] = np.cumsum(seg_counts_np)[:-1]

        counts = np.bincount(labels_np, minlength=n_classes).astype(np.int32)
        m_max = int(counts.max()) if len(counts) else 1
        table = np.zeros((n_classes, m_max), dtype=np.int32)
        fill = np.zeros(n_classes, dtype=np.int32)
        for idx, lab in enumerate(labels_np):
            table[lab, fill[lab]] = idx
            fill[lab] += 1

        put = (lambda a: jax.device_put(a, device)) if device else jnp.asarray
        s_max = int(seg_counts_np.max()) if len(seg_counts_np) else 1
        return PackedStore(
            segments=put(segments),
            seg_offsets=put(offsets),
            seg_counts=put(seg_counts_np),
            labels=put(labels_np),
            class_table=put(table),
            class_counts=put(counts),
            n_classes=n_classes,
            s_max=s_max,
            multi_segm=s_max > 1,
        )

    @staticmethod
    def pack(
        items: Sequence[np.ndarray],
        labels: Sequence[int],
        n_classes: Optional[int] = None,
        mean: float = 0.0,
        std: float = 1.0,
        dtype: Union[str, np.dtype] = np.float32,
        device: Optional[jax.Device] = None,
    ) -> "PackedStore":
        """Pack per-item arrays ([F,T] or [S,F,T]) into one flat store.

        Normalization (x - mean)/std with the dataset's global stats happens
        here once, mirroring datasets/datasets.py:96-132's z-score branch.
        """
        dtype = resolve_store_dtype(dtype)
        labels_np = np.asarray(labels, dtype=np.int32)
        if n_classes is None:
            n_classes = int(labels_np.max()) + 1 if len(labels_np) else 0

        norm_items = []
        seg_counts = []
        for x in items:
            x = np.asarray(x, dtype=np.float32)
            if x.ndim == 2:
                x = x[None]
            norm_items.append(((x - mean) / std).astype(dtype))
            seg_counts.append(x.shape[0])
        segments = (
            np.concatenate(norm_items, axis=0)
            if norm_items
            else np.zeros((0, 1, 1), dtype)
        )
        return PackedStore.from_flat_arrays(
            segments, np.asarray(seg_counts, np.int32), labels_np, n_classes, device=device
        )

    def nbytes(self) -> int:
        return int(self.segments.size) * self.segments.dtype.itemsize
