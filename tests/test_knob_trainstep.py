"""Config knobs driven through a REAL jitted train epoch.

Unit tests exercise ops eagerly, where trace-time bugs are invisible: the
phase-vocoder pitch shift passed all its eager tests and crashed the first
actual training run (np.asarray on a jnp constant is a
TracerArrayConversionError under jit+remat — fixed 2026-08-18). Every opt-in
knob that changes what the train step traces therefore gets one tiny
end-to-end train epoch here. Reference counterpart: none — the reference has
no tests; the knob list is the deviation/A-B surface in MIGRATION.md §7.
"""

import numpy as np
import pytest

from audio_few_shot_learning_tpu.config import ExperimentConfig, ModelConfig
from audio_few_shot_learning_tpu.data.datasets import (
    MetaAudioDataset,
    make_synthetic_dataset,
    make_synthetic_wav_dataset,
)
from audio_few_shot_learning_tpu.train.engine import Trainer

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def wav_root(tmp_path_factory):
    return make_synthetic_wav_dataset(
        tmp_path_factory.mktemp("knobwav"), n_classes=12, items_per_class=8,
        seconds=1.0, split_fractions=(6, 3, 3), seed=11,
    )


@pytest.fixture(scope="module")
def spec_root(tmp_path_factory):
    return make_synthetic_dataset(
        tmp_path_factory.mktemp("knobspec"), n_classes=12, items_per_class=8,
        n_mels=20, n_frames=24, split_fractions=(6, 3, 3), seed=12,
    )


def _run_one_epoch(exp, mdl, root):
    load = lambda s: MetaAudioDataset(exp, root, s).to_packed_store()
    tr = Trainer(exp, mdl, load("train"), load("valid"), load("test"))
    m = tr.train_epoch()
    assert np.isfinite(m["loss"]), m
    mean, _ = tr.validate()
    assert 0.0 <= mean <= 1.0
    return m


def _wav_exp(waveaug_overrides):
    waveaug = {
        "use": True, "aug_num": 1,
        "min_gain_in_db": -6, "max_gain_in_db": 6, "gain_p": 0.5,
        "min_snr_in_db": 10, "max_snr_in_db": 25,
        "noise_min_f_decay": -2, "noise_max_f_decay": 2, "noise_p": 0.5,
        "lowpass_p": 0.5, "highpass_p": 0.3, "bandstop_p": 0.3,
        "pitchshift_p": 0.0, "shift_p": 0.0, "timeinversion_p": 0.0,
        "spliceout_p": 0.0, "timestretch_p": 0.0, "timemasking_p": 0.0,
        "pitchshift_min_transpose_semitones": -2,
        "pitchshift_max_transpose_semitones": 2,
        "min_stretch_ratio": 0.9, "max_stretch_ratio": 1.1,
    }
    waveaug.update(waveaug_overrides)
    exp = ExperimentConfig.from_dict({
        "encoder_name": "CNN", "use_attention": False, "use_contrastive": False,
        "input_type": "wav",
        "n_way_train": 3, "n_way_validation": 3, "n_way_test": 3,
        "n_shot_train": 2, "n_shot_validation": 2, "n_shot_test": 2,
        "n_query_train": 2, "n_query_validation": 2, "n_query_test": 2,
        "n_training_tasks": 2, "n_testing_tasks": 2,
        "lr": 2e-3, "num_epochs": 1,
        "train_query_augmentations": False,
        "specaug_params": {"use": False},
        "waveaug_params": waveaug,
        "tpu": {"episode_batch": 2, "eval_episode_batch": 2, "mesh_shape": 1},
    })
    mdl = ModelConfig.from_dict(
        {"CNN": {"pool_dim": [2, 2], "hidden_channels": 8, "out_dim": 16},
         "Projection": {"input_dim": 16, "hidden_dim": 16, "output_dim": 16}}
    )
    return exp, mdl


def test_trainstep_fuse_lowpass_stretch_inversion(wav_root):
    """fuse_lowpass + time_stretch + time_inversion in one training chain —
    none of these were previously traced inside a train step anywhere."""
    exp, mdl = _wav_exp({
        "fuse_lowpass": True, "timestretch_p": 0.7, "timeinversion_p": 0.5,
    })
    _run_one_epoch(exp, mdl, wav_root)


def test_trainstep_pitchshift_pv(wav_root):
    """pitchshift_mode='pv' inside the jitted+remat train step (the exact
    context that exposed the np.asarray-on-tracer crash)."""
    exp, mdl = _wav_exp({"pitchshift_mode": "pv", "pitchshift_p": 1.0})
    _run_one_epoch(exp, mdl, wav_root)


def test_trainstep_bn_per_view_group(spec_root):
    """tpu.bn_per_view_group=True with V>1 specaug views through a train
    epoch (the A/B arm previously had forward-only coverage)."""
    exp = ExperimentConfig.from_dict({
        "encoder_name": "CNN", "use_attention": False, "use_contrastive": False,
        "n_way_train": 3, "n_way_validation": 3, "n_way_test": 3,
        "n_shot_train": 2, "n_shot_validation": 2, "n_shot_test": 2,
        "n_query_train": 2, "n_query_validation": 2, "n_query_test": 2,
        "n_training_tasks": 2, "n_testing_tasks": 2,
        "lr": 1e-3, "num_epochs": 1,
        "train_query_augmentations": True,
        "specaug_params": {"use": True, "mask_param": 4, "W": 4,
                           "num_mask": 1, "mask_value": 0.0, "p": 0.5},
        "tpu": {"episode_batch": 2, "eval_episode_batch": 2, "mesh_shape": 1,
                "bn_per_view_group": True},
    })
    mdl = ModelConfig.from_dict(
        {"CNN": {"pool_dim": [2, 2], "hidden_channels": 8, "out_dim": 16},
         "Projection": {"input_dim": 16, "hidden_dim": 16, "output_dim": 16}}
    )
    _run_one_epoch(exp, mdl, spec_root)
