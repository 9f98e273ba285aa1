"""Directory-backed dataset loading, reference layout compatible.

Consumes the exact on-disk layout the reference uses
(datasets/datasets.py:66-91): ``<root>/features/<class>/*.npy`` (or
``waveforms_npy`` for wav input), ``<root>/splits.npy`` (list of 3 class-name
arrays) and ``<root>/norm_stats/glob_norm.npy`` (global [mean],[std] of the
log-mel values, shape (2,1,1)).

Also provides a synthetic dataset generator in the same layout for tests and
benchmarks (the reference ships no test data).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional, Tuple, Union

import numpy as np

from audio_few_shot_learning_tpu.config import ExperimentConfig
from audio_few_shot_learning_tpu.data.store import PackedStore, resolve_store_dtype

_SPLIT_IDX = {"train": 0, "valid": 1, "test": 2}


class MetaAudioDataset:
    """File-backed view of one split (API parity with reference
    datasets/datasets.py:19-132), plus ``.to_packed_store()`` which is what
    the TPU pipeline actually consumes."""

    def __init__(
        self,
        experiment_config: ExperimentConfig,
        root: Union[str, Path],
        split: str,
    ):
        self.experiment_config = experiment_config
        self.root = Path(root)
        self.split = split
        self.multi_segm = experiment_config.multi_segm
        self.input_type = experiment_config.input_type

        sub = "waveforms_npy" if self.input_type == "wav" else "features"
        data_dir = self.root / sub
        splits_file = np.load(self.root / "splits.npy", allow_pickle=True)
        class_names = [str(c) for c in splits_file[_SPLIT_IDX[split]]]

        self.class_names = class_names
        self.class_to_label = {name: i for i, name in enumerate(class_names)}
        self.filepaths: List[Path] = []
        self.labels: List[int] = []
        for name in class_names:
            cdir = data_dir / name
            for fname in sorted(os.listdir(cdir)):
                if fname.endswith(".npy"):
                    self.filepaths.append(cdir / fname)
                    self.labels.append(self.class_to_label[name])

        self.mean, self.std = self.get_normalization_stats()

    def get_normalization_stats(self) -> Tuple[float, float]:
        norm_stats = np.load(self.root / "norm_stats" / "glob_norm.npy")
        return float(np.ravel(norm_stats[0])[0]), float(np.ravel(norm_stats[1])[0])

    def __len__(self) -> int:
        return len(self.filepaths)

    def __getitem__(self, item: int):
        x = np.load(self.filepaths[item], allow_pickle=True)
        if self.input_type == "spec":
            if x.ndim == 2:
                x = x[None]
            x = (x - self.mean) / self.std
        return x, self.labels[item]

    def _pack_flat_native(self, dtype=np.float32):
        """Fast path: the C++ packer (native/npy_pack.cc) parses/streams/
        normalizes every .npy on a thread pool straight into the packed
        buffer (float32 or bfloat16). Returns ``(segments, seg_counts)``
        host arrays, or None when unavailable or shapes are irregular."""
        from audio_few_shot_learning_tpu.data import native_pack

        if self.input_type != "spec" or not native_pack.native_available():
            return None
        import ml_dtypes

        if np.dtype(dtype) not in (np.dtype(np.float32), np.dtype(ml_dtypes.bfloat16)):
            # unsupported store dtype: bail BEFORE probing every file and
            # allocating the full-store buffer pack_files_flat would reject
            return None
        probes = [native_pack.probe(p) for p in self.filepaths]
        if any(p is None for p in probes):
            return None
        first = np.load(self.filepaths[0], allow_pickle=True)
        if first.ndim == 2:
            f_dim, t_dim = first.shape
        else:
            f_dim, t_dim = first.shape[1:]
        seg_counts = np.asarray([p[1] for p in probes], dtype=np.int32)
        if any(p[0] != c * f_dim * t_dim for p, c in zip(probes, seg_counts)):
            return None  # inhomogeneous feature shapes
        # flat/ragged pack: file i lands at its cumulative segment offset
        seg_elems = f_dim * t_dim
        offsets = np.zeros(len(seg_counts) + 1, dtype=np.int64)
        offsets[1:] = np.cumsum(seg_counts.astype(np.int64) * seg_elems)
        out = np.zeros((int(seg_counts.sum()), f_dim, t_dim), dtype=dtype)
        ok = native_pack.pack_files_flat(
            [str(p) for p in self.filepaths], out, offsets, self.mean, self.std
        )
        if not ok:
            return None
        return out, seg_counts

    def _to_packed_store_native(self, device=None, dtype=np.float32):
        flat = self._pack_flat_native(dtype)
        if flat is None:
            return None
        return PackedStore.from_flat_arrays(
            flat[0], flat[1], self.labels, len(self.class_names), device=device
        )

    def _segment_seconds(self) -> int:
        # NSynth's 4 s notes vs the 5 s window everywhere else
        # (reference src/train_test.py NSynth special-case)
        return 4 if "nsynth" in self.experiment_config.dataset_name.lower() else 5

    def to_host_store(self, dtype=np.float32, use_native: bool = True):
        """Pack the split into host RAM (data/hoststore.py for spec,
        data/wavhoststore.py for wav) — for splits that do not fit HBM
        beside the training program; episodes stream per step."""
        from audio_few_shot_learning_tpu.data.hoststore import HostStore

        if self.input_type == "wav":
            from audio_few_shot_learning_tpu.data.wavhoststore import WavHostStore

            return WavHostStore.pack_from_files(
                self.filepaths,
                self.labels,
                n_classes=len(self.class_names),
                mean=self.mean,
                std=self.std,
                multi_segm=self.multi_segm,
                segment_seconds=self._segment_seconds(),
                dtype=dtype,  # 'bfloat16' maps to float16 (wavhoststore doc)
            )
        dtype = resolve_store_dtype(dtype)
        if use_native:
            flat = self._pack_flat_native(dtype)
            if flat is not None:
                return HostStore.from_flat_arrays(
                    flat[0], flat[1], self.labels, len(self.class_names)
                )
        items = [np.load(p, allow_pickle=True) for p in self.filepaths]
        return HostStore.pack(
            items,
            self.labels,
            n_classes=len(self.class_names),
            mean=self.mean,
            std=self.std,
            dtype=dtype,
        )

    def estimated_packed_bytes(self, dtype=np.float32) -> int:
        """Cheap packed-split size estimate from on-disk payload sizes (spec
        .npy files are float32; scale to the store dtype) — lets the
        host/device auto-selection run without reading any file bodies."""
        itemsize = resolve_store_dtype(dtype).itemsize
        total = sum(p.stat().st_size for p in self.filepaths)
        return int(total * (itemsize / 4.0))

    def to_packed_store(self, dtype=np.float32, device=None, use_native: bool = True):
        from audio_few_shot_learning_tpu.data.store import resolve_store_dtype

        dtype = resolve_store_dtype(dtype)
        if use_native and self.input_type == "spec":
            store = self._to_packed_store_native(device=device, dtype=dtype)
            if store is not None:
                return store
        items = [np.load(p, allow_pickle=True) for p in self.filepaths]
        if self.input_type == "wav":
            from audio_few_shot_learning_tpu.data.wavstore import PackedWavStore

            return PackedWavStore.pack(
                items,
                self.labels,
                n_classes=len(self.class_names),
                mean=self.mean,
                std=self.std,
                multi_segm=self.multi_segm,
                segment_seconds=self._segment_seconds(),
                device=device,
            )
        return PackedStore.pack(
            items,
            self.labels,
            n_classes=len(self.class_names),
            mean=self.mean,
            std=self.std,
            dtype=dtype,
            device=device,
        )


# Auto host/device selection: keep the split on the host when the packed
# array would take more than this fraction of the device's reported HBM —
# the rest must hold the model, optimizer, activations and the double-
# buffered scan (the measured flagship residency anchor lives in
# Trainer._eval_segment_budget; 0.6 leaves it ~2x headroom).
HOST_STORE_HBM_FRACTION = 0.6


def _device_hbm_bytes(device=None) -> Optional[int]:
    """The device's reported memory limit, or None (CPU backend)."""
    import jax

    try:
        dev = device if device is not None else jax.local_devices()[0]
        stats = dev.memory_stats() or {}
        limit = stats.get("bytes_limit")
        return int(limit) if limit else None
    except Exception:
        return None


def load_packed_split(
    exp: ExperimentConfig, root: Union[str, Path], split: str, dtype=None, device=None
):
    """Load one split as a device-resident PackedStore/PackedWavStore or —
    for splits that would not fit HBM beside the training program — a
    host-resident HostStore/WavHostStore streaming episodes per step.
    ``exp.tpu.host_store`` forces either way; None = size-based auto.

    Both wav layouts are ragged (no [I, L_max] padding), so the on-disk
    payload size IS the packed size; the estimate is exact for wav and
    exact-to-dtype for spec."""
    if dtype is None:
        dtype = exp.tpu.store_dtype  # 'float32' | 'bfloat16' (TPUConfig)
    ds = MetaAudioDataset(exp, root, split)
    force = exp.tpu.host_store
    if force is True:
        return ds.to_host_store(dtype=dtype)
    if force is None:
        est_dtype = np.float32 if ds.input_type == "wav" else dtype
        limit = _device_hbm_bytes(device)
        if (
            limit is not None
            and ds.estimated_packed_bytes(est_dtype) > HOST_STORE_HBM_FRACTION * limit
        ):
            return ds.to_host_store(dtype=dtype)
    return ds.to_packed_store(dtype=dtype, device=device)


def make_synthetic_wav_dataset(
    root: Union[str, Path],
    n_classes: int = 12,
    items_per_class: int = 12,
    sr: int = 16000,
    seconds: float = 2.0,
    variable_length: bool = False,
    split_fractions: Tuple[int, int, int] = (8, 2, 2),
    seed: int = 0,
) -> Path:
    """Synthetic raw-waveform dataset (``waveforms_npy/`` layout) with
    class-identifying tones; ``norm_stats`` holds post-mel global stats as the
    wav pipeline expects (batch_creation.py:139-143)."""
    from audio_few_shot_learning_tpu.ops.mel import MelSpec

    root = Path(root)
    rng = np.random.default_rng(seed)
    wav_dir = root / "waveforms_npy"
    wav_dir.mkdir(parents=True, exist_ok=True)
    (root / "norm_stats").mkdir(exist_ok=True)
    assert sum(split_fractions) == n_classes

    class_names = [f"class_{i:03d}" for i in range(n_classes)]
    mel = MelSpec(flavor="online", use_pallas=False)
    mel_vals = []
    for ci, name in enumerate(class_names):
        cdir = wav_dir / name
        cdir.mkdir(exist_ok=True)
        freq = 200.0 + 300.0 * ci
        for ii in range(items_per_class):
            dur = seconds * (0.5 + rng.random() * 1.5) if variable_length else seconds
            n = int(sr * dur)
            t = np.arange(n) / sr
            x = np.sin(2 * np.pi * freq * t) + 0.3 * rng.standard_normal(n)
            x = (x / max(np.abs(x).max(), 1e-6)).astype(np.float32)
            np.save(cdir / f"item_{ii:04d}.npy", x)
            if ii < 2:  # subsample for stats
                mel_vals.append(np.asarray(mel(x[: sr])).ravel())

    flat = np.concatenate(mel_vals)
    glob_norm = np.array([[[flat.mean()]], [[flat.std()]]], dtype=np.float32)
    np.save(root / "norm_stats" / "glob_norm.npy", glob_norm)

    tr, va, te = split_fractions
    splits = np.array(
        [
            np.array(class_names[:tr], dtype=object),
            np.array(class_names[tr : tr + va], dtype=object),
            np.array(class_names[tr + va :], dtype=object),
        ],
        dtype=object,
    )
    np.save(root / "splits.npy", splits, allow_pickle=True)
    return root


def make_synthetic_dataset(
    root: Union[str, Path],
    n_classes: int = 12,
    items_per_class: int = 15,
    n_mels: int = 128,
    n_frames: int = 157,
    multi_segm: bool = False,
    max_segments: int = 4,
    split_fractions: Tuple[int, int, int] = (8, 2, 2),
    seed: int = 0,
    band_gain: float = 4.0,
) -> Path:
    """Write a learnable synthetic dataset in the reference's on-disk layout.

    Each class gets a distinctive mel-band bump so few-shot accuracy well
    above chance is achievable within a few epochs. ``band_gain`` scales the
    bump: 4.0 saturates 5-way accuracy in a few epochs (e2e smoke tests);
    ~0.3-0.6 lands mid-range, where accuracy A/Bs have discriminating power.
    """
    root = Path(root)
    rng = np.random.default_rng(seed)
    feat_dir = root / "features"
    feat_dir.mkdir(parents=True, exist_ok=True)
    (root / "norm_stats").mkdir(exist_ok=True)

    assert sum(split_fractions) == n_classes, "split fractions must sum to n_classes"
    class_names = [f"class_{i:03d}" for i in range(n_classes)]

    all_vals = []
    for ci, name in enumerate(class_names):
        cdir = feat_dir / name
        cdir.mkdir(exist_ok=True)
        band = 4 + (ci * (n_mels - 20)) // max(n_classes - 1, 1)
        for ii in range(items_per_class):
            segs = rng.integers(1, max_segments + 1) if multi_segm else 1
            x = rng.standard_normal((segs, n_mels, n_frames)).astype(np.float32)
            x[:, band : band + 8, :] += band_gain  # class-identifying energy band
            x += rng.standard_normal((segs, 1, 1)).astype(np.float32)  # item offset
            arr = x if multi_segm else x[0]
            np.save(cdir / f"item_{ii:04d}.npy", arr)
            all_vals.append(arr)

    flat = np.concatenate([a.ravel() for a in all_vals])
    glob_norm = np.array([[[flat.mean()]], [[flat.std()]]], dtype=np.float32)
    np.save(root / "norm_stats" / "glob_norm.npy", glob_norm)

    tr, va, te = split_fractions
    splits = np.array(
        [
            np.array(class_names[:tr], dtype=object),
            np.array(class_names[tr : tr + va], dtype=object),
            np.array(class_names[tr + va :], dtype=object),
        ],
        dtype=object,
    )
    np.save(root / "splits.npy", splits, allow_pickle=True)
    return root
