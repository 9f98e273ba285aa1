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
    # 2-D [F, T] = ONE segment (the offline to_spec layout). Reporting the
    # leading dim here made every fixed-length spec dataset silently skip
    # the native packer (caught by the NSynth-scale stress run).
    z = np.random.default_rng(0).standard_normal((8, 5)).astype(np.float32)
    np.save(tmp_path / "c.npy", z)
    elems, shape0 = native_pack.probe(tmp_path / "c.npy")
    assert elems == 40 and shape0 == 1


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


def test_pack_flat_bf16_bit_identical_to_ml_dtypes(tmp_path):
    """The C++ f32->bf16 conversion (afsl_pack_bf16_var) must round-to-
    nearest-even exactly like ml_dtypes, including mantissa ties, subnormals,
    +-max, Inf and NaN. std=1/mean=0 isolates the conversion itself."""
    import ml_dtypes

    rng = np.random.default_rng(0)
    bits = np.array(
        [0x3F800080, 0x3F800180, 0x40490FDB, 0x00000001, 0x80000000,
         0x7F7FFFFF, 0xFF7FFFFF, 0x3F7FFFFF, 0x7F800000, 0xFF800000,
         0x7FC00001, 0x7F800001],
        dtype=np.uint32,
    ).view(np.float32)
    x = np.concatenate([rng.standard_normal(4096).astype(np.float32) * 37.5, bits])
    p = tmp_path / "x.npy"
    np.save(p, x.reshape(1, -1))
    out = np.zeros((1, x.size), dtype=ml_dtypes.bfloat16)
    offs = np.array([0, x.size], dtype=np.int64)
    assert native_pack.pack_files_flat([str(p)], out, offs, 0.0, 1.0)
    ref = x.astype(ml_dtypes.bfloat16)
    got_bits = out.ravel().view(np.uint16)
    ref_bits = ref.view(np.uint16)
    # NaNs: payload may differ across libs; require NaN-ness, not bits
    nan = np.isnan(x)
    np.testing.assert_array_equal(got_bits[~nan], ref_bits[~nan])
    assert np.isnan(out.ravel().astype(np.float32)[nan]).all()


def test_store_native_bf16_matches_python(tmp_path):
    """dtype='bfloat16' flows through the native packer (the NSynth-scale
    case where both bf16 HBM and packer speed matter); matches the Python
    path to one bf16 ULP (native normalizes by *1/std, Python by /std)."""
    import ml_dtypes

    root = make_synthetic_dataset(
        tmp_path / "ds", n_classes=6, items_per_class=6, n_mels=16, n_frames=12,
        multi_segm=True, max_segments=3, split_fractions=(2, 2, 2),
    )
    exp = ExperimentConfig.from_dict({"multi_segm": True})
    ds = MetaAudioDataset(exp, root, "train")
    native = ds.to_packed_store(dtype="bfloat16", use_native=True)
    python = ds.to_packed_store(dtype="bfloat16", use_native=False)
    assert np.asarray(native.segments).dtype == ml_dtypes.bfloat16
    a = np.asarray(native.segments).astype(np.float32)
    b = np.asarray(python.segments).astype(np.float32)
    np.testing.assert_allclose(a, b, rtol=2 ** -8, atol=1e-6)
    exact = (a == b).mean()
    assert exact > 0.99, f"only {exact:.4f} bit-identical"


def test_store_native_engages_on_2d_files(tmp_path):
    """Single-segment datasets (2-D [F, T] .npy files — the layout
    preprocessing/to_spec.py writes and make_synthetic_dataset's default)
    must take the native fast path, not silently fall back to Python."""
    root = make_synthetic_dataset(
        tmp_path / "ds", n_classes=6, items_per_class=6, n_mels=16, n_frames=12,
        split_fractions=(2, 2, 2),
    )
    exp = ExperimentConfig.from_dict({})
    ds = MetaAudioDataset(exp, root, "train")
    native = ds._to_packed_store_native()
    assert native is not None, "native packer must engage on 2-D spec files"
    python = ds.to_packed_store(use_native=False)
    np.testing.assert_allclose(
        np.asarray(native.segments), np.asarray(python.segments), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(native.seg_counts), np.asarray(python.seg_counts)
    )
    assert native.s_max == python.s_max == 1


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
