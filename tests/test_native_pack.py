"""Native C++ .npy packer vs the pure-Python path (bit-identical stores)."""

import numpy as np
import pytest

from audio_few_shot_learning_tpu.config import ExperimentConfig
from audio_few_shot_learning_tpu.data import MetaAudioDataset, make_synthetic_dataset
from audio_few_shot_learning_tpu.data import native_pack

pytestmark = pytest.mark.skipif(
    not native_pack.native_available(), reason="g++ / native build unavailable"
)


def test_probe(tmp_path):
    x = np.random.default_rng(0).standard_normal((3, 8, 5)).astype(np.float32)
    np.save(tmp_path / "a.npy", x)
    elems, shape0 = native_pack.probe(tmp_path / "a.npy")
    assert elems == 120 and shape0 == 3
    y = np.random.default_rng(0).standard_normal(77).astype(np.float64)
    np.save(tmp_path / "b.npy", y)
    elems, shape0 = native_pack.probe(tmp_path / "b.npy")
    assert elems == 77 and shape0 == 1


def test_pack_files_matches_numpy(tmp_path):
    rng = np.random.default_rng(1)
    paths, arrays = [], []
    for i in range(5):
        a = rng.standard_normal((2, 4, 6)).astype(np.float32 if i % 2 else np.float64)
        p = tmp_path / f"f{i}.npy"
        np.save(p, a)
        paths.append(str(p))
        arrays.append(a)
    mean, std = 0.5, 2.0
    out = np.zeros((5, 2, 4, 6), dtype=np.float32)
    assert native_pack.pack_files(paths, out, mean, std)
    for i, a in enumerate(arrays):
        np.testing.assert_allclose(out[i], (a - mean) / std, rtol=1e-6, atol=1e-6)


def test_store_native_matches_python(tmp_path):
    root = make_synthetic_dataset(
        tmp_path / "ds", n_classes=6, items_per_class=6, n_mels=16, n_frames=12,
        multi_segm=True, max_segments=3, split_fractions=(2, 2, 2),
    )
    exp = ExperimentConfig.from_dict({"multi_segm": True})
    ds = MetaAudioDataset(exp, root, "train")
    native = ds.to_packed_store(use_native=True)
    python = ds.to_packed_store(use_native=False)
    np.testing.assert_allclose(
        np.asarray(native.segments), np.asarray(python.segments), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(native.seg_counts), np.asarray(python.seg_counts))
    np.testing.assert_array_equal(np.asarray(native.class_table), np.asarray(python.class_table))
    assert native.s_max == python.s_max


def test_pack_failure_falls_back(tmp_path):
    """Corrupt file -> native path returns None, Python path raises clearly."""
    root = make_synthetic_dataset(
        tmp_path / "ds", n_classes=6, items_per_class=3, n_mels=8, n_frames=8,
        split_fractions=(2, 2, 2),
    )
    # corrupt one training file
    exp = ExperimentConfig.from_dict({})
    ds = MetaAudioDataset(exp, root, "train")
    with open(ds.filepaths[0], "wb") as f:
        f.write(b"not an npy")
    assert ds._to_packed_store_native() is None
