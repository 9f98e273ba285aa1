"""Serving path: cli/predict.py + Trainer.predict_episode.

The reference has no inference entry point (train/test only); these tests
pin the new serving surface: fixed-episode classification from a checkpoint
against a user-supplied support directory.
"""

import json

import jax
import numpy as np
import pytest

from audio_few_shot_learning_tpu.config import ExperimentConfig, ModelConfig
from audio_few_shot_learning_tpu.data.datasets import (
    MetaAudioDataset,
    make_synthetic_dataset,
)
from audio_few_shot_learning_tpu.data.store import PackedStore
from audio_few_shot_learning_tpu.train import checkpoint as ckpt
from audio_few_shot_learning_tpu.train.engine import Trainer

N_MELS, N_FRAMES = 40, 24


def _mini_exp(**over):
    base = {
        "encoder_name": "CNN", "use_attention": False, "use_contrastive": False,
        "n_way_train": 3, "n_way_validation": 3, "n_way_test": 3,
        "n_shot_train": 2, "n_shot_validation": 2, "n_shot_test": 2,
        "n_query_train": 2, "n_query_validation": 2, "n_query_test": 2,
        "n_training_tasks": 2, "n_testing_tasks": 2,
        "num_epochs": 1, "lr": 1e-2,
        "specaug_params": {"use": False},
        "tpu": {"episode_batch": 1, "eval_episode_batch": 2, "mesh_shape": 1},
    }
    base.update(over)
    exp = ExperimentConfig.from_dict(base)
    mdl = ModelConfig.from_dict(
        {"CNN": {"pool_dim": [2, 2], "hidden_channels": 8, "out_dim": 16},
         "Projection": {"input_dim": 16, "hidden_dim": 16, "output_dim": 16}}
    )
    return exp, mdl


def _class_feature(rng, ci):
    """Strongly separable per-class pattern."""
    x = rng.standard_normal((N_MELS, N_FRAMES)).astype(np.float32) * 0.05
    x[ci * 4:(ci + 1) * 4] += 3.0
    return x


@pytest.fixture(scope="module")
def serving_setup(tmp_path_factory):
    """Support dir (3 classes x 3 items), query files, config files, ckpt."""
    tmp = tmp_path_factory.mktemp("serve")
    rng = np.random.default_rng(0)
    sup_dir = tmp / "support"
    queries, truth = [], []
    sup_items, sup_labels = [], []
    for ci, name in enumerate(["alpha", "beta", "gamma"]):
        d = sup_dir / name
        d.mkdir(parents=True)
        for ii in range(3):
            x = _class_feature(rng, ci)
            np.save(d / f"s{ii}.npy", x)
            sup_items.append(x)
            sup_labels.append(ci)
        q = tmp / f"query_{name}.npy"
        np.save(q, _class_feature(rng, ci))
        queries.append(q)
        truth.append(name)

    exp, mdl = _mini_exp()
    ej, mj = tmp / "e.json", tmp / "m.json"
    ej.write_text(json.dumps({
        "encoder_name": "CNN", "use_attention": False, "use_contrastive": False,
        "specaug_params": {"use": False},
        "tpu": {"episode_batch": 1, "eval_episode_batch": 2, "mesh_shape": 1},
    }))
    mj.write_text(json.dumps(
        {"CNN": {"pool_dim": [2, 2], "hidden_channels": 8, "out_dim": 16},
         "Projection": {"input_dim": 16, "hidden_dim": 16, "output_dim": 16}}
    ))
    store = PackedStore.pack(sup_items, sup_labels, 3)
    tr = Trainer(exp, mdl, store)
    ck = tmp / "model.ckpt"
    ckpt.save_model(str(ck), tr.state.params, tr.state.batch_stats)
    return dict(tmp=tmp, sup_dir=sup_dir, queries=queries, truth=truth,
                e=ej, m=mj, ckpt=ck, exp=exp, mdl=mdl, store=store)


def test_predict_episode_shapes_and_determinism(serving_setup):
    s = serving_setup
    tr = Trainer(s["exp"], s["mdl"], s["store"])
    sup = np.stack([np.load(p) for p in sorted(s["sup_dir"].rglob("*.npy"))])
    labels = np.repeat(np.arange(3), 3)
    qry = np.stack([np.load(p) for p in s["queries"]])
    pred1, sc1 = tr.predict_episode(sup, labels, qry)
    pred2, sc2 = tr.predict_episode(sup, labels, qry)
    assert pred1.shape == (3,) and sc1.shape == (3, 3)
    np.testing.assert_array_equal(pred1, pred2)
    np.testing.assert_allclose(sc1, sc2)
    assert np.isfinite(sc1).all()
    # scores rank consistently with argmax
    np.testing.assert_array_equal(pred1, sc1.argmax(-1))


def test_predict_episode_attention_specaug_model(serving_setup):
    """Flagship-shaped serving: attention + SpecAugment models REQUIRE
    matched support/query view counts, so predict must augment queries per
    ``test_query_augmentations`` (regression: predict hardcoded V=1 queries
    and crashed on every attention+specaug model)."""
    s = serving_setup
    exp, _ = _mini_exp(
        use_attention=True,
        specaug_params={"use": True, "mask_param": 5, "W": 5,
                        "num_mask": 1, "mask_value": 0, "p": 0.5},
    )
    mdl = ModelConfig.from_dict(
        {"CNN": {"pool_dim": [2, 2], "hidden_channels": 8, "out_dim": 16},
         "Attention": {"embed_dim": 16, "num_heads": 1, "ffn_dim": 16, "dropout": 0.1},
         "Projection": {"input_dim": 64, "hidden_dim": 16, "output_dim": 16}}
    )
    tr = Trainer(exp, mdl, s["store"])
    sup = np.stack([np.load(p) for p in sorted(s["sup_dir"].rglob("*.npy"))])
    labels = np.repeat(np.arange(3), 3)
    qry = np.stack([np.load(p) for p in s["queries"]])
    pred, sc = tr.predict_episode(sup, labels, qry)
    assert pred.shape == (3,) and sc.shape == (3, 3)
    assert np.isfinite(sc).all()
    np.testing.assert_array_equal(pred, sc.argmax(-1))


def test_predict_episode_no_attention_augmented_queries(serving_setup):
    """No-attention + augmented queries: scores must be the original-view
    block ([Q, n_way]), not the tiled Q*V rows."""
    s = serving_setup
    exp, mdl = _mini_exp(
        specaug_params={"use": True, "mask_param": 5, "W": 5,
                        "num_mask": 1, "mask_value": 0, "p": 0.5},
    )
    tr = Trainer(exp, mdl, s["store"])
    sup = np.stack([np.load(p) for p in sorted(s["sup_dir"].rglob("*.npy"))])
    labels = np.repeat(np.arange(3), 3)
    qry = np.stack([np.load(p) for p in s["queries"]])
    pred, sc = tr.predict_episode(sup, labels, qry)
    assert pred.shape == (3,) and sc.shape == (3, 3)


def test_predict_cli_end_to_end(serving_setup, tmp_path, capsys):
    s = serving_setup
    from audio_few_shot_learning_tpu.cli.predict import main

    out = tmp_path / "pred.json"
    main([
        "-e", str(s["e"]), "-m", str(s["m"]),
        "--checkpoint", str(s["ckpt"]),
        "--support", str(s["sup_dir"]),
        "--query", *[str(q) for q in s["queries"]],
        "--output", str(out),
    ])
    payload = json.loads(out.read_text())
    assert payload["classes"] == ["alpha", "beta", "gamma"]
    assert len(payload["predictions"]) == 3
    for rec in payload["predictions"]:
        assert rec["predicted_class"] in payload["classes"]
        assert set(rec["scores"]) == set(payload["classes"])


def test_predict_cli_wav_model(tmp_path):
    """Wav-input models: raw waveforms through the predict CLI (mel +
    z-norm on device via the eval pipeline)."""
    from audio_few_shot_learning_tpu.cli.predict import main
    from audio_few_shot_learning_tpu.config import SAMPLE_RATE
    from audio_few_shot_learning_tpu.data.wavstore import PackedWavStore

    rng = np.random.default_rng(3)
    sr = SAMPLE_RATE
    t = np.arange(sr) / sr

    def tone(f):
        return (np.sin(2 * np.pi * f * t) + 0.05 * rng.standard_normal(sr)).astype(
            np.float32
        )

    sup_dir = tmp_path / "support"
    wavs, labels = [], []
    for ci, (name, f0) in enumerate([("low", 220.0), ("high", 1200.0)]):
        d = sup_dir / name
        d.mkdir(parents=True)
        for ii in range(2):
            w = tone(f0)
            np.save(d / f"s{ii}.npy", w)  # 1-D npy == raw waveform
            wavs.append(w)
            labels.append(ci)
    q = tmp_path / "q_low.npy"
    np.save(q, tone(220.0))

    ej, mj = tmp_path / "e.json", tmp_path / "m.json"
    ej.write_text(json.dumps({
        "encoder_name": "CNN", "use_attention": False, "use_contrastive": False,
        "input_type": "wav",
        "specaug_params": {"use": False},
        "waveaug_params": {"use": True, "aug_num": 1,
                           "min_gain_in_db": -3, "max_gain_in_db": 3, "gain_p": 1.0},
        "tpu": {"episode_batch": 1, "eval_episode_batch": 2, "mesh_shape": 1},
    }))
    mj.write_text(json.dumps(
        {"CNN": {"pool_dim": [2, 2], "hidden_channels": 8, "out_dim": 16},
         "Projection": {"input_dim": 16, "hidden_dim": 16, "output_dim": 16}}
    ))
    g = tmp_path / "glob_norm.npy"
    np.save(g, np.array([[[0.0]], [[1.0]]], dtype=np.float32))

    # checkpoint template from the same store geometry the CLI will build
    from audio_few_shot_learning_tpu.config import load_configs

    exp2, mdl2 = load_configs(str(ej), str(mj))
    store = PackedWavStore.pack(wavs, labels, 2)
    tr = Trainer(exp2, mdl2, store)
    ck = tmp_path / "model.ckpt"
    ckpt.save_model(str(ck), tr.state.params, tr.state.batch_stats)

    out = tmp_path / "pred.json"
    main([
        "-e", str(ej), "-m", str(mj), "--checkpoint", str(ck),
        "--support", str(sup_dir), "--query", str(q),
        "--norm-stats", str(g), "--output", str(out),
    ])
    payload = json.loads(out.read_text())
    assert payload["classes"] == ["high", "low"]
    assert payload["predictions"][0]["predicted_class"] in ("high", "low")
    assert set(payload["predictions"][0]["scores"]) == {"high", "low"}


@pytest.mark.slow
def test_predict_accuracy_after_training(tmp_path):
    """Train briefly on the learnable synthetic dataset, then serve held-out
    items through the CLI path: predictions must beat chance decisively."""
    root = make_synthetic_dataset(
        tmp_path / "ds", n_classes=9, items_per_class=10,
        n_mels=N_MELS, n_frames=N_FRAMES, split_fractions=(3, 3, 3), seed=5,
    )
    # n_mels must exceed 20: the generator's class band is
    # 4 + ci*(n_mels-20)//(n_classes-1), so at 20 every class collides.
    exp, mdl = _mini_exp(num_epochs=5, n_training_tasks=8, lr=3e-3,
                         dataset_name="ds", data_root=str(tmp_path))
    # bigger encoder: 16ch/32d converges in ~20 s
    mdl = ModelConfig.from_dict(
        {"CNN": {"pool_dim": [2, 2], "hidden_channels": 16, "out_dim": 32},
         "Projection": {"input_dim": 32, "hidden_dim": 32, "output_dim": 32}})
    load = lambda sp: MetaAudioDataset(exp, root, sp).to_packed_store()
    tr = Trainer(exp, mdl, load("train"), load("valid"), load("test"))
    for _ in range(3):
        tr.train_epoch()

    # build a fixed episode from the TEST split on the host
    test_ds = MetaAudioDataset(exp, root, "test")
    by_class = {}
    for i in range(len(test_ds)):
        x, y = test_ds[i]
        x = np.asarray(x, np.float32)
        if x.ndim == 3:  # __getitem__ returns [S, F, T]; single-segment here
            x = x[0]
        by_class.setdefault(int(y), []).append(x)
    classes = sorted(by_class)[:3]
    sup = np.stack([by_class[c][k] for c in classes for k in range(3)])
    labels = np.repeat(np.arange(3), 3)
    qry = np.stack([by_class[c][k] for c in classes for k in range(3, 6)])
    truth = np.repeat(np.arange(3), 3)
    pred, _ = tr.predict_episode(sup, labels, qry)
    acc = float((pred == truth).mean())
    assert acc >= 0.7, f"serving accuracy {acc} barely above chance"

