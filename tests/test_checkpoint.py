"""Checkpoint/resume, early stopping, experiment driver, and utils tests."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_few_shot_learning_tpu.config import ExperimentConfig, ModelConfig
from audio_few_shot_learning_tpu.train import checkpoint as ckpt
from audio_few_shot_learning_tpu.train.early_stopping import EarlyStopping
from audio_few_shot_learning_tpu.train.state import TrainState, create_train_state, make_optimizer
from audio_few_shot_learning_tpu.utils import EpisodeThroughput, MetricsLogger


def _tiny_state():
    exp = ExperimentConfig.from_dict(
        {"encoder_name": "CNN", "use_attention": False,
         "tpu": {"compute_dtype": "float32"}}
    )
    mdl = ModelConfig.from_dict(
        {"CNN": {"pool_dim": [2, 2], "hidden_channels": 8, "out_dim": 16},
         "Projection": {"input_dim": 16, "hidden_dim": 16, "output_dim": 16}}
    )
    opt = make_optimizer(1e-3, [10], 0.5, 4)
    model, state = create_train_state(
        jax.random.PRNGKey(0), exp, mdl, feat_shape=(32, 24), optimizer=opt, n_way=3
    )
    return model, state, opt


def test_model_checkpoint_roundtrip(tmp_path):
    _, state, _ = _tiny_state()
    path = str(tmp_path / "model.ckpt")
    ckpt.save_model(path, state.params, state.batch_stats)
    zeroed = jax.tree.map(jnp.zeros_like, state.params)
    params, stats = ckpt.load_model(path, zeroed, state.batch_stats)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_checkpoint_roundtrip(tmp_path):
    _, state, _ = _tiny_state()
    path = str(tmp_path / "resume.ckpt")
    key = jax.random.PRNGKey(42)
    ckpt.save_resume(path, state, epoch=7, rng_key=key, extra={"note": "x"})
    template = jax.tree.map(jnp.zeros_like, state)
    state2, key2, meta = ckpt.load_resume(path, template)
    assert meta["epoch"] == 7 and meta["note"] == "x"
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(key2)), np.asarray(jax.random.key_data(key))
    )
    for a, b in zip(jax.tree.leaves(state2), jax.tree.leaves(state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_early_stopping_semantics():
    saves = []
    es = EarlyStopping(patience=5, save_fn=lambda: saves.append(1), trace_func=lambda *a: None)
    es(0.5, epoch=1)  # first -> save
    es(0.6, epoch=2)  # improve -> save
    for e in range(3, 8):
        es(0.55, epoch=e)  # 5 non-improving -> stop
    assert len(saves) == 2
    assert es.early_stop
    assert es.val_accuracy_max == 0.6


def test_early_stopping_reset_on_improvement():
    es = EarlyStopping(patience=3, trace_func=lambda *a: None)
    es(0.5, 1)
    es(0.4, 2)
    es(0.4, 3)
    es(0.7, 4)  # improvement resets counter
    assert es.counter == 0 and not es.early_stop


@pytest.mark.slow
def test_experiment_driver_end_to_end(tmp_path):
    """run_experiment: full reference flow on a synthetic dataset, 1 run."""
    from audio_few_shot_learning_tpu.data.datasets import make_synthetic_dataset
    from audio_few_shot_learning_tpu.train.experiment import run_experiment

    root = make_synthetic_dataset(
        tmp_path / "ds", n_classes=9, items_per_class=10, n_mels=32, n_frames=24,
        split_fractions=(3, 3, 3),
    )
    exp = ExperimentConfig.from_dict(
        {
            "encoder_name": "CNN", "use_attention": False, "use_contrastive": False,
            "dataset_name": "ds", "data_root": str(tmp_path),
            "n_way_train": 3, "n_way_validation": 3, "n_way_test": 3,
            "n_shot_train": 3, "n_shot_validation": 3, "n_shot_test": 3,
            "n_query_train": 2, "n_query_validation": 2, "n_query_test": 2,
            "n_training_tasks": 4, "n_testing_tasks": 4, "num_epochs": 2,
            "experiment_folder": "exp1", "patience": 10,
            "train_query_augmentations": False, "validation_query_augmentations": False,
            "test_query_augmentations": False, "specaug_params": {"use": False},
            "tpu": {"episode_batch": 2, "eval_episode_batch": 4, "mesh_shape": 1, "num_runs": 1},
        }
    )
    mdl = ModelConfig.from_dict({"CNN": {"pool_dim": [2, 2], "hidden_channels": 8, "out_dim": 16}})
    logs = []
    results = run_experiment(exp, mdl, experiments_root=str(tmp_path / "experiments"), log_fn=logs.append)
    assert len(results) == 1
    assert 0.0 <= results[0]["mean_accuracy"] <= 1.0
    rd = tmp_path / "experiments" / "exp1"
    assert (rd / "model.ckpt").exists()
    assert (rd / "resume_run0.ckpt").exists()
    assert (rd / "result_run0.json").exists()
    rows = [json.loads(l) for l in open(rd / "metrics_run0.jsonl")]
    assert len(rows) == 2 and rows[0]["epoch"] == 1
    assert "episodes_per_sec" in rows[0]


def test_metrics_logger(tmp_path):
    path = str(tmp_path / "m.jsonl")
    lg = MetricsLogger(path, stdout=False)
    lg.log(1, {"loss": 1.5})
    lg.log(2, {"loss": 1.0})
    lg.close()
    rows = [json.loads(l) for l in open(path)]
    assert rows[1]["loss"] == 1.0 and rows[1]["step"] == 2


def test_episode_throughput():
    tp = EpisodeThroughput()
    v1 = tp.update(100, 1.0)
    v2 = tp.update(300, 1.0)
    assert v1 == 100.0
    assert 100 < v2 < 300
    assert tp.total_episodes == 400
