"""Host-resident store (data/hoststore.py): pack parity with PackedStore,
host sampler semantics vs the reference's batch_creation.py:21-72, the
engine's streaming train/eval path, deterministic replay from the run key,
and load_packed_split's host/device auto-selection."""

import numpy as np
import pytest

from audio_few_shot_learning_tpu.config import ExperimentConfig, ModelConfig
from audio_few_shot_learning_tpu.data import datasets as datasets_mod
from audio_few_shot_learning_tpu.data.datasets import (
    MetaAudioDataset,
    load_packed_split,
    make_synthetic_dataset,
)
from audio_few_shot_learning_tpu.data.hoststore import HostStore
from audio_few_shot_learning_tpu.data.store import PackedStore
from audio_few_shot_learning_tpu.train.engine import Trainer


def _tagged_store(n_classes=6, items_per_class=8, multi=False, f=8, t=5):
    """HostStore whose every segment is constant-valued item_idx + seg/100 —
    sampled rows identify exactly which (item, segment) was gathered."""
    items, labels = [], []
    rng = np.random.default_rng(0)
    idx = 0
    for c in range(n_classes):
        for _ in range(items_per_class):
            segs = int(rng.integers(1, 4)) if multi else 1
            x = np.zeros((segs, f, t), np.float32)
            for s in range(segs):
                x[s] = idx + s / 100.0
            items.append(x if multi else x[0])
            labels.append(c)
            idx += 1
    return HostStore.pack(items, labels, n_classes=n_classes)


def test_pack_matches_packedstore():
    rng = np.random.default_rng(1)
    items = [rng.standard_normal((int(rng.integers(1, 4)), 6, 4)).astype(np.float32) for _ in range(10)]
    labels = [i % 3 for i in range(10)]
    hs = HostStore.pack(items, labels, n_classes=3, mean=0.5, std=2.0)
    ps = PackedStore.pack(items, labels, n_classes=3, mean=0.5, std=2.0)
    np.testing.assert_allclose(hs.segments, np.asarray(ps.segments), atol=1e-6)
    np.testing.assert_array_equal(hs.seg_counts, np.asarray(ps.seg_counts))
    np.testing.assert_array_equal(hs.seg_offsets, np.asarray(ps.seg_offsets))
    assert hs.s_max == ps.s_max and hs.multi_segm == ps.multi_segm
    assert hs.feat_shape == tuple(ps.feat_shape) and hs.num_items == ps.num_items


def test_sampler_semantics_single_segment():
    hs = _tagged_store()
    rng = np.random.default_rng(7)
    n_way, ks, kq, batch = 4, 2, 3, 3
    ep = hs.sample_episode_batch(rng, n_way, ks, kq, is_test=False, batch=batch)
    assert ep.support.shape == (batch, n_way * ks, 8, 5)
    assert ep.query.shape == (batch, n_way * kq, 8, 5)
    np.testing.assert_array_equal(ep.query_mask, np.ones((batch, n_way * kq)))
    np.testing.assert_array_equal(
        ep.audio_ids, np.tile(np.arange(n_way * kq), (batch, 1))
    )
    for e in range(batch):
        sup_items = np.round(ep.support[e, :, 0, 0]).astype(int)
        qry_items = np.round(ep.query[e, :, 0, 0]).astype(int)
        # remapped labels follow the episode's sorted class order; every
        # gathered item's true class matches its remapped label
        sup_classes = hs.labels[sup_items]
        qry_classes = hs.labels[qry_items]
        classes = np.unique(sup_classes)
        assert len(classes) == n_way
        np.testing.assert_array_equal(sup_classes, classes[ep.support_labels[e]])
        np.testing.assert_array_equal(qry_classes, classes[ep.query_labels[e]])
        # support/query drawn without replacement from the same per-class pool
        assert not set(sup_items) & set(qry_items)
        assert len(set(sup_items)) == n_way * ks
        assert len(set(qry_items)) == n_way * kq


def test_sampler_multisegment_test_padding():
    hs = _tagged_store(multi=True)
    assert hs.multi_segm and hs.s_max >= 2
    rng = np.random.default_rng(3)
    n_way, ks, kq = 3, 2, 2
    ep = hs.sample_episode_batch(rng, n_way, ks, kq, is_test=True, batch=2)
    qn, smax = n_way * kq, hs.s_max
    assert ep.query.shape == (2, qn * smax, 8, 5)
    np.testing.assert_array_equal(
        ep.audio_ids, np.tile(np.repeat(np.arange(qn), smax), (2, 1))
    )
    for e in range(2):
        vals = ep.query[e, :, 0, 0].reshape(qn, smax)
        mask = ep.query_mask[e].reshape(qn, smax)
        for q in range(qn):
            item = int(round(vals[q, 0]))
            segs = int(hs.seg_counts[item])
            np.testing.assert_array_equal(mask[q], np.arange(smax) < segs)
            # real rows carry the item's successive segments; padded rows zero
            np.testing.assert_allclose(
                vals[q, :segs], item + np.arange(segs) / 100.0, atol=1e-5
            )
            np.testing.assert_array_equal(vals[q, segs:], np.zeros(smax - segs))
        # labels tile across segment rows
        np.testing.assert_array_equal(
            ep.query_labels[e].reshape(qn, smax)[:, 0],
            np.repeat(np.arange(n_way), kq),
        )


@pytest.fixture(scope="module")
def host_env(tmp_path_factory):
    root = make_synthetic_dataset(
        tmp_path_factory.mktemp("hds"),
        n_classes=12,
        items_per_class=12,
        n_mels=64,
        n_frames=50,
        multi_segm=True,
        max_segments=3,
        split_fractions=(6, 3, 3),
        seed=4,
    )
    base = {
        "encoder_name": "CNN",
        "use_attention": False,
        "use_contrastive": False,
        "multi_segm": True,
        "n_way_train": 4,
        "n_way_validation": 3,
        "n_way_test": 3,
        "n_shot_train": 3,
        "n_shot_validation": 3,
        "n_shot_test": 3,
        "n_query_train": 3,
        "n_query_validation": 3,
        "n_query_test": 3,
        "n_training_tasks": 8,
        "n_testing_tasks": 8,
        "lr": 2e-3,
        "num_epochs": 3,
        "specaug_params": {"use": False},
        "loss": {"l_param": 1.0, "cpl": {"use": False}, "angular": {"use": False}},
        "tpu": {"episode_batch": 4, "eval_episode_batch": 4, "mesh_shape": 1},
        "train_query_augmentations": False,
        "validation_query_augmentations": False,
        "test_query_augmentations": False,
    }
    exp = ExperimentConfig.from_dict(base)
    mdl = ModelConfig.from_dict(
        {
            "CNN": {"pool_dim": [2, 2], "hidden_channels": 32, "out_dim": 32},
            "Hybrid": {"pool_dim": [2, 2], "hidden_channels": 32, "out_dim": 32, "seq_type": "GRU"},
            "Attention": {"embed_dim": 32, "num_heads": 1, "ffn_dim": 64, "dropout": 0.1},
            "Projection": {"input_dim": 128, "hidden_dim": 64, "output_dim": 64},
        }
    )
    return root, exp, mdl


def _host_trainer(root, exp, mdl, seed=0):
    import dataclasses

    exp = dataclasses.replace(exp, tpu=dataclasses.replace(exp.tpu, seed=seed))
    stores = {
        s: MetaAudioDataset(exp, root, s).to_host_store() for s in ("train", "valid", "test")
    }
    return Trainer(exp, mdl, stores["train"], stores["valid"], stores["test"])


@pytest.mark.slow
def test_engine_host_mode_trains_and_evals(host_env):
    """Streaming epochs over a HostStore learn the synthetic task and both
    eval paths (single-segment val, multi-segment majority-vote test) run."""
    root, exp, mdl = host_env
    tr = _host_trainer(root, exp, mdl)
    assert tr.host_mode
    first = tr.train_epoch()
    for _ in range(2):
        last = tr.train_epoch()
    assert np.isfinite(first["loss"]) and np.isfinite(last["loss"])
    assert last["loss"] < first["loss"]
    mean, _ = tr.validate()
    assert mean > 0.5  # 3-way chance = 0.33; band_gain 4.0 saturates fast
    mean_ms, _ = tr.evaluate(
        tr.test_store, 8, 3, 3, 3, augment_query=False,
        multisegment=True, tie_strategy="",
    )
    assert 0.0 <= mean_ms <= 1.0 and mean_ms > 0.5


@pytest.mark.slow
def test_host_mode_deterministic_replay(host_env):
    """Same run key -> identical episode stream and metrics (the property
    checkpoint/resume relies on, since the host RNG derives from the
    checkpointed run key)."""
    root, exp, mdl = host_env
    a = _host_trainer(root, exp, mdl, seed=11)
    b = _host_trainer(root, exp, mdl, seed=11)
    ma = a.train_epoch()
    mb = b.train_epoch()
    assert ma["loss"] == pytest.approx(mb["loss"], abs=1e-6)
    va, _ = a.validate()
    vb, _ = b.validate()
    assert va == pytest.approx(vb, abs=1e-9)


def test_load_packed_split_selection(host_env, monkeypatch):
    root, exp, _ = host_env
    import dataclasses

    def with_host(v):
        return dataclasses.replace(exp, tpu=dataclasses.replace(exp.tpu, host_store=v))

    assert isinstance(load_packed_split(with_host(True), root, "valid"), HostStore)
    assert isinstance(load_packed_split(with_host(False), root, "valid"), PackedStore)
    # auto: host only when the packed split would crowd the device's HBM
    monkeypatch.setattr(datasets_mod, "_device_hbm_bytes", lambda device=None: 10_000)
    assert isinstance(load_packed_split(with_host(None), root, "valid"), HostStore)
    monkeypatch.setattr(datasets_mod, "_device_hbm_bytes", lambda device=None: 1 << 40)
    assert isinstance(load_packed_split(with_host(None), root, "valid"), PackedStore)
    monkeypatch.setattr(datasets_mod, "_device_hbm_bytes", lambda device=None: None)
    assert isinstance(load_packed_split(with_host(None), root, "valid"), PackedStore)


def test_estimated_packed_bytes_tracks_actual(host_env):
    root, exp, _ = host_env
    ds = MetaAudioDataset(exp, root, "valid")
    est = ds.estimated_packed_bytes(np.float32)
    actual = ds.to_host_store().nbytes()
    assert actual <= est <= int(actual * 1.05)  # headers only add a sliver
