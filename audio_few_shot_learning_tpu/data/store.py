"""Packed spectrogram store.

The reference reads one ``.npy`` file per episode item from disk inside the
hot loop (datasets/datasets.py:48-58 — SURVEY.md §3.1 calls it the
bottleneck). Here a whole split is packed **once** into padded arrays that
live in device HBM; episode assembly becomes pure ``jnp.take`` and the
accelerator never waits on the host.

Layout:
  segments   [num_items, S_max, F, T]  z-normalized log-mel segments
  seg_counts [num_items]               real segment count per item (>=1)
  labels     [num_items]               class ids 0..C-1
  class_table[C, M_max]                item indices per class (padded)
  class_counts[C]                      real items per class

Variable-length datasets (multi_segm) pad the segment axis to the split's
S_max; fixed-length sets have S_max == 1 and the padding cost is zero.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
from flax import struct


def resolve_store_dtype(dtype: Union[str, np.dtype]) -> np.dtype:
    """'bfloat16' halves the HBM footprint of the packed split — required for
    NSynth-scale stores (306k items ~= 20 GB in f32 vs 10 GB bf16 on a 16 GB
    chip). Compute upcasts per-op; accuracy impact is below augmentation
    noise."""
    if isinstance(dtype, str) and dtype == "bfloat16":
        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(dtype)


@struct.dataclass
class PackedStore:
    segments: jnp.ndarray  # [I, S_max, F, T]
    seg_counts: jnp.ndarray  # [I] int32
    labels: jnp.ndarray  # [I] int32
    class_table: jnp.ndarray  # [C, M_max] int32
    class_counts: jnp.ndarray  # [C] int32
    n_classes: int = struct.field(pytree_node=False)
    s_max: int = struct.field(pytree_node=False)
    multi_segm: bool = struct.field(pytree_node=False)

    @property
    def num_items(self) -> int:
        return self.segments.shape[0]

    @property
    def feat_shape(self):
        return self.segments.shape[2:]

    @staticmethod
    def from_arrays(
        segments: np.ndarray,
        seg_counts: np.ndarray,
        labels: np.ndarray,
        n_classes: int,
        device: Optional[jax.Device] = None,
    ) -> "PackedStore":
        """Build a store from pre-packed host arrays (used by the native
        C++ packer path, data/native_pack.py)."""
        labels_np = np.asarray(labels, dtype=np.int32)
        counts = np.bincount(labels_np, minlength=n_classes).astype(np.int32)
        m_max = int(counts.max()) if len(counts) else 1
        table = np.zeros((n_classes, m_max), dtype=np.int32)
        fill = np.zeros(n_classes, dtype=np.int32)
        for idx, lab in enumerate(labels_np):
            table[lab, fill[lab]] = idx
            fill[lab] += 1
        put = (lambda a: jax.device_put(a, device)) if device else jnp.asarray
        s_max = segments.shape[1]
        return PackedStore(
            segments=put(segments),
            seg_counts=put(np.asarray(seg_counts, np.int32)),
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
        """Pack per-item arrays ([F,T] or [S,F,T]) into one padded store.

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
        seg_counts_np = np.asarray(seg_counts, dtype=np.int32)
        s_max = int(seg_counts_np.max()) if len(seg_counts) else 1
        f, t = norm_items[0].shape[1:]

        segments = np.zeros((len(norm_items), s_max, f, t), dtype=dtype)
        for i, x in enumerate(norm_items):
            segments[i, : x.shape[0]] = x

        counts = np.bincount(labels_np, minlength=n_classes).astype(np.int32)
        m_max = int(counts.max()) if len(counts) else 1
        table = np.zeros((n_classes, m_max), dtype=np.int32)
        fill = np.zeros(n_classes, dtype=np.int32)
        for idx, lab in enumerate(labels_np):
            table[lab, fill[lab]] = idx
            fill[lab] += 1

        put = (lambda a: jax.device_put(a, device)) if device else jnp.asarray
        return PackedStore(
            segments=put(segments),
            seg_counts=put(seg_counts_np),
            labels=put(labels_np),
            class_table=put(table),
            class_counts=put(counts),
            n_classes=n_classes,
            s_max=s_max,
            multi_segm=s_max > 1,
        )

    def nbytes(self) -> int:
        return int(self.segments.size) * self.segments.dtype.itemsize
