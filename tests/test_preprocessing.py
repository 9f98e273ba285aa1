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


def test_make_splits_reference_counts(tmp_path):
    """splits.npy: object array of 3 class-name arrays, seeded-deterministic."""
    from audio_few_shot_learning_tpu.preprocessing import make_splits

    feat = tmp_path / "features"
    for i in range(50):  # ESC-50 census
        (feat / f"class_{i:02}").mkdir(parents=True)

    s1 = make_splits(feat, tmp_path / "splits.npy", dataset="esc", seed=7)
    s2 = np.load(tmp_path / "splits.npy", allow_pickle=True)
    assert len(s2) == 3
    assert [len(a) for a in s2] == [35, 5, 10]
    for a, b in zip(s1, s2):
        np.testing.assert_array_equal(a, b)
    # no class in two splits, all classes covered
    names = np.concatenate(s2)
    assert len(set(names)) == 50
    # same seed -> same partition
    s3 = make_splits(feat, tmp_path / "splits2.npy", dataset="esc", seed=7)
    np.testing.assert_array_equal(s3[0], s1[0])


def test_make_splits_proportional_fallback(tmp_path):
    """Non-reference class census: reference proportions, >=1 per split."""
    from audio_few_shot_learning_tpu.preprocessing import make_splits

    feat = tmp_path / "features"
    for i in range(8):
        (feat / f"c{i}").mkdir(parents=True)
    s = make_splits(feat, tmp_path / "splits.npy", dataset="esc", seed=0)
    assert sum(len(a) for a in s) == 8
    assert all(len(a) >= 1 for a in s)


def test_full_stack_zero_manual_steps(tmp_path):
    """full_stack on a synthetic raw-audio tree -> a directory that
    load_packed_split consumes with no manual steps (VERDICT.md item 4)."""
    from audio_few_shot_learning_tpu.config import ExperimentConfig
    from audio_few_shot_learning_tpu.data.datasets import load_packed_split
    from audio_few_shot_learning_tpu.preprocessing.full_stack import full_stack_voxceleb

    rng = np.random.default_rng(6)
    main = tmp_path / "ds"
    for c in range(6):
        d = main / "audio" / f"spk{c}"
        d.mkdir(parents=True)
        for i in range(3):
            wav = (rng.standard_normal(5 * SR + c * 1000) * 0.2 * 32767).astype(np.int16)
            scipy.io.wavfile.write(d / f"u{i}.wav", SR, wav)

    full_stack_voxceleb(main)

    assert (main / "splits.npy").exists()
    assert (main / "norm_stats" / "glob_norm.npy").exists()
    wf = np.load(main / "norm_stats" / "waveform_norm.npy")
    assert wf.shape == (2,)
    assert abs(wf[0]) < 0.05 and abs(wf[1] - 1.0) < 0.05  # per-sample z-norm

    exp = ExperimentConfig.from_dict({"multi_segm": True})
    stores = {s: load_packed_split(exp, main, s) for s in ("train", "valid", "test")}
    total_items = sum(st.num_items for st in stores.values())
    assert total_items == 18
    assert stores["train"].feat_shape == (128, 157)
