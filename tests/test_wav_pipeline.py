"""End-to-end wav-input pipeline: packed wav store, segment extraction
semantics, and a training epoch through WaveAugment + on-device mel."""

import jax
import numpy as np
import pytest

from audio_few_shot_learning_tpu.config import ExperimentConfig, ModelConfig
from audio_few_shot_learning_tpu.data.datasets import (
    MetaAudioDataset,
    make_synthetic_wav_dataset,
)
from audio_few_shot_learning_tpu.data.episodes import sample_wav_episode
from audio_few_shot_learning_tpu.data.wavstore import PackedWavStore
from audio_few_shot_learning_tpu.train.engine import Trainer

SR = 16000


def test_wavstore_segment_extraction_semantics():
    """extract_segment matches the reference's variable_wav_splits
    (batch_creation.py:173-209) including the whole-sample tail repeat."""
    seg_s = 1  # 1-second segments for a fast test
    rng = np.random.default_rng(0)
    short = rng.standard_normal(600).astype(np.float32)  # < 1 s
    exact = rng.standard_normal(2 * SR * seg_s).astype(np.float32)
    tail = rng.standard_normal(SR + 500).astype(np.float32)  # 1 seg + tail
    store = PackedWavStore.pack(
        [short, exact, tail], [0, 1, 2], n_classes=3, multi_segm=True, segment_seconds=seg_s
    )
    assert np.asarray(store.seg_counts).tolist() == [1, 2, 2]
    L = SR * seg_s

    # short: tile(sample)[:L]
    got = np.asarray(store.extract_segment(0, 0))
    want = np.tile(short, int(np.ceil(L / 600)))[:L]
    np.testing.assert_allclose(got, want, atol=1e-6)

    # exact: two clean slices
    np.testing.assert_allclose(np.asarray(store.extract_segment(1, 0)), exact[:L], atol=1e-6)
    np.testing.assert_allclose(np.asarray(store.extract_segment(1, 1)), exact[L:], atol=1e-6)

    # tail: first slice clean; second = tile(whole sample)[:L]
    np.testing.assert_allclose(np.asarray(store.extract_segment(2, 0)), tail[:L], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(store.extract_segment(2, 1)), np.tile(tail, 2)[:L], atol=1e-6
    )

    # tails rows are stored only for the one short item (ADVICE r01: a full
    # [I, seg_len] tails array doubled device memory for all-full stores)
    assert store.tails.shape == (1, L)


def test_wavstore_empty_item_extracts_silence():
    """A zero-length waveform must extract silence, not alias another short
    item's tail row (tail_index defaults to 0; packing previously skipped
    empty items, leaving them pointed at the first short item's audio)."""
    rng = np.random.default_rng(5)
    empty = np.zeros(0, np.float32)
    short = rng.standard_normal(600).astype(np.float32)
    full = rng.standard_normal(SR).astype(np.float32)
    store = PackedWavStore.pack(
        [empty, short, full], [0, 1, 2], n_classes=3, multi_segm=True, segment_seconds=1
    )
    got = np.asarray(store.extract_segment(0, 0))
    np.testing.assert_array_equal(got, np.zeros(SR, np.float32))
    # the real short item still gets its tiled tail
    want = np.tile(short, int(np.ceil(SR / 600)))[:SR]
    np.testing.assert_allclose(np.asarray(store.extract_segment(1, 0)), want, atol=1e-6)


def test_wavstore_no_tail_rows_when_all_full_length():
    """All-full-length store keeps a single placeholder tail row, not a
    second copy of the packed waveforms."""
    rng = np.random.default_rng(3)
    wavs = [rng.standard_normal(SR).astype(np.float32) for _ in range(6)]
    store = PackedWavStore.pack(wavs, [0, 0, 1, 1, 2, 2], n_classes=3)
    assert store.tails.shape == (1, SR)
    # non-multiseg, equal lengths: extraction returns the waveform itself
    np.testing.assert_allclose(
        np.asarray(store.extract_segment(4, 0)), wavs[4], atol=1e-6
    )


@pytest.fixture(scope="module")
def wav_root(tmp_path_factory):
    return make_synthetic_wav_dataset(
        tmp_path_factory.mktemp("wavds"), n_classes=12, items_per_class=10,
        seconds=1.0, split_fractions=(6, 3, 3), seed=7,
    )


def _wav_exp(overrides=None):
    base = {
        "encoder_name": "CNN",
        "use_attention": False,
        "use_contrastive": False,
        "input_type": "wav",
        "multi_segm": False,
        "n_way_train": 3, "n_way_validation": 3, "n_way_test": 3,
        "n_shot_train": 3, "n_shot_validation": 3, "n_shot_test": 3,
        "n_query_train": 2, "n_query_validation": 2, "n_query_test": 2,
        "n_training_tasks": 4, "n_testing_tasks": 4,
        "lr": 2e-3, "num_epochs": 1,
        "train_query_augmentations": False,
        "validation_query_augmentations": False,
        "test_query_augmentations": False,
        "specaug_params": {"use": False},
        "waveaug_params": {
            "use": True, "aug_num": 2,
            "min_gain_in_db": -6, "max_gain_in_db": 6, "gain_p": 0.5,
            "min_snr_in_db": 10, "max_snr_in_db": 25,
            "noise_min_f_decay": -2, "noise_max_f_decay": 2, "noise_p": 0.5,
            "bandstop_min_bandwidth_fraction": 0.5, "bandstop_max_bandwidth_fraction": 1,
            "bandstop_p": 0.3, "highpass_p": 0.2, "lowpass_p": 0.3,
            "pitchshift_min_transpose_semitones": -2, "pitchshift_max_transpose_semitones": 2,
            "pitchshift_p": 0.3, "shift_min_shift": -0.2, "shift_max_shift": 0.2, "shift_p": 0.5,
            "spliceout_num_time_intervals": 4, "spliceout_max_width": 200, "spliceout_p": 0.3,
            "timeinversion_p": 0, "min_stretch_ratio": 0.9, "max_stretch_ratio": 1.1,
            "timestretch_p": 0, "timemasking_masks": 3, "timemasking_mask_fraction": 0.01,
            "timemasking_p": 0.3,
        },
        "tpu": {"episode_batch": 2, "eval_episode_batch": 2, "mesh_shape": 1},
    }
    base.update(overrides or {})
    exp = ExperimentConfig.from_dict(base)
    mdl = ModelConfig.from_dict(
        {"CNN": {"pool_dim": [2, 2], "hidden_channels": 16, "out_dim": 32},
         "Projection": {"input_dim": 32, "hidden_dim": 32, "output_dim": 32}}
    )
    return exp, mdl


def test_wav_dataset_scan_and_pack(wav_root):
    exp, _ = _wav_exp()
    ds = MetaAudioDataset(exp, wav_root, "train")
    assert len(ds) == 60
    store = ds.to_packed_store()
    assert store.num_items == 60
    assert not store.multi_segm
    assert store.seg_len == SR  # fixed 1-s items -> whole waveform


def test_wav_episode_sampling(wav_root, rng):
    exp, _ = _wav_exp()
    store = MetaAudioDataset(exp, wav_root, "train").to_packed_store()
    ep = sample_wav_episode(rng, store, n_way=3, k_support=3, k_query=2, is_test=False)
    assert ep.support.shape == (9, SR)
    assert ep.query.shape == (6, SR)


@pytest.mark.slow
def test_wav_training_epoch_runs(wav_root):
    exp, mdl = _wav_exp()
    load = lambda s: MetaAudioDataset(exp, wav_root, s).to_packed_store()
    tr = Trainer(exp, mdl, load("train"), load("valid"), load("test"))
    assert tr.v_support == 3  # 1 original + aug_num=2
    m = tr.train_epoch()
    assert np.isfinite(m["loss"])
    mean, _ = tr.validate()
    assert 0.0 <= mean <= 1.0


# ---------------------------------------------------------------------------
# wav multi-segment evaluation, end to end (VERDICT r02 item 3)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def var_wav_setup(tmp_path_factory):
    """Variable-length wav dataset (2-8 s items, 5 s segments -> s_max 2) plus
    a Trainer configured for multi-segment test-time evaluation. Mirrors the
    reference composition batch_creation.py:173-209 + loops/loops.py:250-283."""
    root = make_synthetic_wav_dataset(
        tmp_path_factory.mktemp("varwav"), n_classes=9, items_per_class=8,
        seconds=4.0, variable_length=True, split_fractions=(3, 3, 3), seed=11,
    )
    exp, mdl = _wav_exp({
        "multi_segm": True,
        "n_way_test": 3, "n_shot_test": 2, "n_query_test": 2,
        "n_testing_tasks": 4,
        "tpu": {"episode_batch": 2, "eval_episode_batch": 2, "mesh_shape": 1},
    })
    load = lambda s: MetaAudioDataset(exp, root, s).to_packed_store()
    test_store = load("test")
    tr = Trainer(exp, mdl, load("train"), load("valid"), test_store)
    return tr, test_store


@pytest.mark.slow
def test_wav_multisegment_eval_end_to_end(var_wav_setup):
    """Trainer.evaluate(multisegment=True) on a variable-length wav store:
    segment expansion (episodes.py is_test branch), on-device mel, and the
    vectorized majority vote compose without shape errors for all three tie
    strategies."""
    tr, store = var_wav_setup
    assert store.multi_segm and store.s_max >= 2  # genuinely multi-segment
    for tie in ("", "min_label", "max_posterior"):
        mean, std = tr.evaluate(
            store, n_tasks=4, n_way=3, k_shot=2, k_query=2,
            augment_query=False, multisegment=True, tie_strategy=tie,
        )
        assert 0.0 <= mean <= 1.0
        assert np.isfinite(std)


@pytest.mark.slow
def test_wav_multisegment_vote_matches_host_oracle(var_wav_setup):
    """The accuracy _eval_batch reports on the wav multi-segment path equals
    the literal host-side reference port (majority_vote_accuracy_host) applied
    to the same model scores — per episode, for every tie strategy."""
    from audio_few_shot_learning_tpu.data.episodes import sample_wav_episode
    from audio_few_shot_learning_tpu.train.evaluate import majority_vote_accuracy_host

    tr, store = var_wav_setup
    n_way, k_shot, k_query, batch = 3, 2, 2, 2
    key = jax.random.PRNGKey(42)

    # Reproduce _eval_batch's episode + view pipeline with the same key splits
    # to recover the raw scores the device vote consumed.
    k_sample, k_aug_s, k_aug_q = jax.random.split(key, 3)
    ep_keys = jax.random.split(k_sample, batch)
    ep = jax.vmap(
        lambda k: sample_wav_episode(k, store, n_way, k_shot, k_query, True)
    )(ep_keys)
    ep = tr._shard_episodes(ep)
    sup_views, qry_views = tr._make_wav_views_pair(
        ep.support, ep.query, k_aug_s, k_aug_q, False, store
    )
    outs = tr.model.apply(
        {"params": tr.state.params, "batch_stats": tr.state.batch_stats},
        sup_views, qry_views, ep.support_labels, n_way,
        train=False, with_contrastive=False,
    )
    qtot = ep.query.shape[1]  # Q * s_max padded segment rows
    scores0 = np.asarray(outs.scores[:, :qtot], np.float32)

    for tie in ("", "min_label", "max_posterior"):
        acc_dev = np.asarray(
            tr._eval_batch(
                tr.state, store, key, n_way=n_way, k_shot=k_shot,
                k_query=k_query, augment_query=False, multisegment=True,
                tie_strategy=tie, batch=batch,
            )
        )
        for e in range(batch):
            preds = scores0[e].argmax(-1)
            posts = scores0[e].max(-1)
            m = np.asarray(ep.query_mask[e]) > 0
            oracle = majority_vote_accuracy_host(
                preds[m],
                np.asarray(ep.audio_ids[e])[m],
                np.asarray(ep.query_labels[e])[m],
                posts[m],
                tie_strategy=tie,
            )
            np.testing.assert_allclose(
                acc_dev[e], oracle, atol=1e-6,
                err_msg=f"tie={tie!r} episode={e}",
            )
