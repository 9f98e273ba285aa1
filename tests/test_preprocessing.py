"""Offline preprocessing tests: segmentation semantics, skip rules,
normalization stats, end-to-end dataset build from synthetic WAVs."""

import numpy as np
import pytest
import scipy.io.wavfile

from audio_few_shot_learning_tpu.config import SAMPLE_RATE
from audio_few_shot_learning_tpu.ops.mel import MelSpec
from audio_few_shot_learning_tpu.preprocessing import (
    compute_global_norm,
    load_audio,
    normalise,
    npy_dir_to_spec,
    npy_dir_to_var_spec,
    stacked_spec,
    variable_splits,
    wav_dir_to_npy,
)

SR = SAMPLE_RATE
SEG = 5 * SR


def test_variable_splits_short_sample_repeats():
    """< 5 s -> one segment, repeat-padded (batch_creation.py:181-188)."""
    x = np.arange(1000, dtype=np.float32)
    splits = variable_splits(x)
    assert len(splits) == 1
    assert splits[0].shape == (SEG,)
    np.testing.assert_array_equal(splits[0][:1000], x)
    np.testing.assert_array_equal(splits[0][1000:2000], x)  # repeated


def test_variable_splits_exact_multiple():
    x = np.random.default_rng(0).standard_normal(2 * SEG).astype(np.float32)
    splits = variable_splits(x)
    assert len(splits) == 2
    np.testing.assert_array_equal(splits[0], x[:SEG])
    np.testing.assert_array_equal(splits[1], x[SEG:])


def test_variable_splits_tail_repeats_whole_sample():
    """Tail shorter than 5 s: the reference repeats the WHOLE sample from the
    start and clips (batch_creation.py:201-208) — not the remainder."""
    n = SEG + 1000
    x = np.arange(n, dtype=np.float32)
    splits = variable_splits(x)
    assert len(splits) == 2
    np.testing.assert_array_equal(splits[0], x[:SEG])
    # tail = tile(whole x, ceil(SEG/to_end))[:SEG] -> starts at x[0]
    reps = int(np.ceil(SEG / 1000))
    np.testing.assert_array_equal(splits[1], np.tile(x, reps)[:SEG])


def test_stacked_spec_shape():
    mel = MelSpec(flavor="offline", use_pallas=False)
    x = np.random.default_rng(1).standard_normal(2 * SEG + 500).astype(np.float32)
    out = stacked_spec(x, mel)
    assert out.shape == (3, 128, 157)
    assert np.isfinite(out).all()


def test_normalise():
    x = np.random.default_rng(2).standard_normal(1000) * 7 + 3
    y = normalise(x)
    assert abs(y.mean()) < 1e-9 and abs(y.std() - 1) < 1e-9


def test_wav_pipeline_end_to_end(tmp_path):
    """WAV tree -> npy -> spec -> glob_norm, reference layout."""
    rng = np.random.default_rng(3)
    for cls in ("dog", "rain"):
        d = tmp_path / "Sorted" / cls
        d.mkdir(parents=True)
        for i in range(3):
            wav = (rng.standard_normal(5 * SR) * 0.2 * 32767).astype(np.int16)
            scipy.io.wavfile.write(d / f"s{i}.wav", SR, wav)

    n = wav_dir_to_npy(tmp_path / "Sorted", tmp_path / "Sorted_npy", sr=SR)
    assert n == 6
    x = np.load(tmp_path / "Sorted_npy" / "dog" / "s0.npy")
    assert x.shape == (5 * SR,)
    assert abs(x.mean()) < 1e-5 and abs(x.std() - 1) < 1e-4  # per-sample z-norm

    w = npy_dir_to_spec(tmp_path / "Sorted_npy", tmp_path / "features", sample_length=5)
    assert w == 6
    spec = np.load(tmp_path / "features" / "dog" / "s0.npy")
    assert spec.shape == (128, 157)

    glob = compute_global_norm(tmp_path / "features", tmp_path / "norm_stats" / "glob_norm.npy")
    assert glob.shape == (2, 1, 1)
    vals = np.concatenate(
        [
            np.load(tmp_path / "features" / c / f"s{i}.npy").ravel()
            for c in ("dog", "rain")
            for i in range(3)
        ]
    )
    np.testing.assert_allclose(glob[0, 0, 0], vals.mean(), rtol=1e-4)
    np.testing.assert_allclose(glob[1, 0, 0], vals.std(), rtol=1e-3)


def test_spec_skip_rules(tmp_path):
    d = tmp_path / "npy" / "c"
    d.mkdir(parents=True)
    np.save(d / "zero_std.npy", np.zeros(5 * SR, np.float32))
    np.save(d / "too_short.npy", np.random.default_rng(0).standard_normal(SR // 2).astype(np.float32))
    nan = np.random.default_rng(0).standard_normal(5 * SR).astype(np.float32)
    nan[0] = np.nan
    np.save(d / "has_nan.npy", nan)
    np.save(d / "wrong_len.npy", np.random.default_rng(0).standard_normal(3 * SR).astype(np.float32))
    np.save(d / "good.npy", np.random.default_rng(0).standard_normal(5 * SR).astype(np.float32))
    logs = []
    w = npy_dir_to_spec(tmp_path / "npy", tmp_path / "spec", sample_length=5, log_fn=logs.append)
    assert w == 1
    import os
    assert os.listdir(tmp_path / "spec" / "c") == ["good.npy"]


def test_var_spec_dir(tmp_path):
    d = tmp_path / "npy" / "c"
    d.mkdir(parents=True)
    rng = np.random.default_rng(4)
    np.save(d / "long.npy", rng.standard_normal(2 * SEG + 100).astype(np.float32))
    np.save(d / "short.npy", rng.standard_normal(SR).astype(np.float32))
    w = npy_dir_to_var_spec(tmp_path / "npy", tmp_path / "spec")
    assert w == 2
    long_spec = np.load(tmp_path / "spec" / "c" / "long.npy")
    short_spec = np.load(tmp_path / "spec" / "c" / "short.npy")
    assert long_spec.shape == (3, 128, 157)
    assert short_spec.shape == (1, 128, 157)


def test_load_audio_wav_resample(tmp_path):
    rng = np.random.default_rng(5)
    wav = (rng.standard_normal(44100) * 0.2 * 32767).astype(np.int16)
    scipy.io.wavfile.write(tmp_path / "x.wav", 44100, wav)
    out = load_audio(tmp_path / "x.wav", sr=16000)
    assert abs(out.shape[0] - 16000) <= 1
    assert out.dtype == np.float32
