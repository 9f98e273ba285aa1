"""Data substrate tests: packing, directory layout, episodic sampling
properties (reference batch_creation.py semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_few_shot_learning_tpu.config import ExperimentConfig
from audio_few_shot_learning_tpu.data import (
    MetaAudioDataset,
    PackedStore,
    make_synthetic_dataset,
    sample_episode_batch,
)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    return make_synthetic_dataset(
        tmp_path_factory.mktemp("ds"), n_classes=12, items_per_class=15, n_mels=32, n_frames=40
    )


@pytest.fixture(scope="module")
def synth_multiseg_root(tmp_path_factory):
    return make_synthetic_dataset(
        tmp_path_factory.mktemp("dsm"),
        n_classes=12,
        items_per_class=15,
        n_mels=32,
        n_frames=40,
        multi_segm=True,
        max_segments=3,
    )


def _exp(multi_segm=False):
    return ExperimentConfig.from_dict({"multi_segm": multi_segm, "input_type": "spec"})


def test_directory_scan_and_splits(synth_root):
    ds = MetaAudioDataset(_exp(), synth_root, "train")
    assert len(ds.class_names) == 8
    assert len(ds) == 8 * 15
    ds_val = MetaAudioDataset(_exp(), synth_root, "valid")
    assert len(ds_val.class_names) == 2
    x, y = ds[0]
    assert x.shape == (1, 32, 40)
    assert y == 0


def test_packing_normalization(synth_root):
    ds = MetaAudioDataset(_exp(), synth_root, "train")
    store = ds.to_packed_store()
    assert store.segments.shape == (120, 32, 40)  # flat layout, S=1 per item
    assert store.n_classes == 8
    # z-normalized with global stats: overall mean ~0, std ~1
    vals = np.asarray(store.segments).ravel()
    assert abs(vals.mean()) < 0.3
    assert 0.5 < vals.std() < 1.5
    # class table indexes items of that class
    table = np.asarray(store.class_table)
    labels = np.asarray(store.labels)
    for c in range(8):
        np.testing.assert_array_equal(labels[table[c, :15]], c)


def test_multisegment_packing(synth_multiseg_root):
    ds = MetaAudioDataset(_exp(True), synth_multiseg_root, "train")
    store = ds.to_packed_store()
    assert store.multi_segm
    assert store.s_max == int(np.asarray(store.seg_counts).max())
    counts = np.asarray(store.seg_counts)
    assert counts.min() >= 1 and counts.max() <= 3


def test_episode_sampling_structure(synth_root, rng):
    store = MetaAudioDataset(_exp(), synth_root, "train").to_packed_store()
    ep = sample_episode_batch(rng, store, n_way=5, k_support=5, k_query=5, batch=3)
    assert ep.support.shape == (3, 25, 32, 40)
    assert ep.query.shape == (3, 25, 32, 40)
    np.testing.assert_array_equal(
        np.asarray(ep.support_labels[0]), np.repeat(np.arange(5), 5)
    )
    np.testing.assert_array_equal(np.asarray(ep.query_labels[0]), np.repeat(np.arange(5), 5))
    np.testing.assert_array_equal(np.asarray(ep.audio_ids[0]), np.arange(25))
    assert np.asarray(ep.query_mask).all()


def test_episode_no_support_query_overlap(synth_root):
    """Support and query items never overlap within an episode, and items
    within each group are distinct (without-replacement split)."""
    store = MetaAudioDataset(_exp(), synth_root, "train").to_packed_store()
    segs = np.asarray(store.segments)[np.asarray(store.seg_offsets)]  # first segments
    for seed in range(5):
        ep = sample_episode_batch(
            jax.random.PRNGKey(seed), store, n_way=5, k_support=5, k_query=5, batch=1
        )
        sup = np.asarray(ep.support[0]).reshape(25, -1)
        qry = np.asarray(ep.query[0]).reshape(25, -1)
        all_rows = np.concatenate([sup, qry])
        # all 50 rows distinct (synthetic items are a.s. unique)
        assert len(np.unique(all_rows.round(4), axis=0)) == 50


def test_episode_classes_vary_across_episodes(synth_root):
    store = MetaAudioDataset(_exp(), synth_root, "train").to_packed_store()
    eps = sample_episode_batch(
        jax.random.PRNGKey(1), store, n_way=5, k_support=5, k_query=5, batch=16
    )
    # with 8 train classes choose 5: the sampled supports should differ
    sups = np.asarray(eps.support).reshape(16, -1)
    assert len(np.unique(sups.round(4), axis=0)) > 1


def test_episode_labels_match_class_content(synth_root):
    """All support items with the same episode label carry the same class
    band (labels remap to sorted sampled classes)."""
    store = MetaAudioDataset(_exp(), synth_root, "train").to_packed_store()
    ep = sample_episode_batch(jax.random.PRNGKey(2), store, 5, 5, 5, batch=1)
    sup = np.asarray(ep.support[0]).reshape(25, -1)  # [25, F*T]
    # map each support row back to its store item by content
    all_rows = np.asarray(store.segments)[np.asarray(store.seg_offsets)].reshape(store.num_items, -1)
    store_labels = np.asarray(store.labels)
    orig_labels = []
    for row in sup:
        matches = np.where(np.all(np.isclose(all_rows, row, atol=1e-5), axis=1))[0]
        assert len(matches) == 1
        orig_labels.append(int(store_labels[matches[0]]))
    orig_labels = np.asarray(orig_labels).reshape(5, 5)
    # all items within an episode class share one original class
    assert (orig_labels == orig_labels[:, :1]).all()
    # sorted remap: original class id increases with episode label
    firsts = orig_labels[:, 0]
    assert (np.diff(firsts) > 0).all()


def test_multisegment_test_episode(synth_multiseg_root):
    store = MetaAudioDataset(_exp(True), synth_multiseg_root, "train").to_packed_store()
    smax = store.s_max
    ep = sample_episode_batch(
        jax.random.PRNGKey(3), store, 5, 5, 5, is_test=True, batch=2
    )
    qtot = 25 * smax
    assert ep.query.shape == (2, qtot, 32, 40)
    np.testing.assert_array_equal(
        np.asarray(ep.audio_ids[0]), np.repeat(np.arange(25), smax)
    )
    mask = np.asarray(ep.query_mask[0]).reshape(25, smax)
    # each query has at least 1 valid segment, mask is a prefix
    assert (mask[:, 0] == 1).all()
    for row in mask:
        n = int(row.sum())
        np.testing.assert_array_equal(row[:n], 1)
        np.testing.assert_array_equal(row[n:], 0)
    # padded rows are zero segments, valid rows nonzero
    q = np.asarray(ep.query[0]).reshape(25, smax, -1)
    for i in range(25):
        n = int(mask[i].sum())
        for s in range(n, smax):
            np.testing.assert_array_equal(q[i, s], 0.0)


def test_sampler_is_jittable(synth_root, rng):
    store = MetaAudioDataset(_exp(), synth_root, "train").to_packed_store()
    f = jax.jit(
        lambda k: sample_episode_batch(k, store, 5, 5, 5, batch=4),
    )
    ep = f(rng)
    assert ep.support.shape == (4, 25, 32, 40)


def test_insufficient_class_items_excluded():
    """Classes with fewer than K+Q items are masked out of class sampling
    (the reference raises, batch_creation.py:42-44; here the sampler simply
    never picks them — richer behavior documented in PARITY notes)."""
    items = [np.random.default_rng(i).standard_normal((8, 10)).astype(np.float32) for i in range(23)]
    labels = [0] * 10 + [1] * 10 + [2] * 3  # class 2 has too few for 5+5
    store = PackedStore.pack(items, labels, n_classes=3)
    for seed in range(6):
        ep = sample_episode_batch(jax.random.PRNGKey(seed), store, 2, 5, 5, batch=1)
        sup = np.asarray(ep.support[0]).reshape(10, -1)
        small_class = np.stack([i.ravel() for i in items[20:]])
        for row in sup:
            assert not any(np.allclose(row, s) for s in small_class)


def test_floyd_sample_uniform_ordered_tuples():
    """_floyd_sample (per-class item picks) draws uniform ORDERED k-tuples
    without replacement — the distribution of random.sample(range(count), k)
    (reference batch_creation.py:38-48). Chi-square over all 120 ordered
    3-of-6 tuples; count rides as a traced scalar like in the sampler."""
    import scipy.stats

    from audio_few_shot_learning_tpu.data.episodes import _floyd_sample

    k, count, trials = 3, 6, 7200
    keys = jax.random.split(jax.random.PRNGKey(3), trials)
    draws = np.asarray(
        jax.jit(jax.vmap(lambda kk: _floyd_sample(kk, jnp.int32(count), k)))(keys)
    )
    assert draws.min() >= 0 and draws.max() < count
    # distinct within each draw
    assert all(len(set(map(int, d))) == k for d in draws)
    tuple_ids = draws[:, 0] * count * count + draws[:, 1] * count + draws[:, 2]
    observed = np.zeros(count ** 3)
    np.add.at(observed, tuple_ids, 1)
    valid = observed[observed.nonzero()]
    assert valid.size == 120  # every ordered 3-of-6 tuple occurs
    _, p = scipy.stats.chisquare(valid)
    assert p > 1e-4, f"ordered tuples non-uniform (p={p})"


def test_floyd_sample_count_equals_k():
    """count == k must return a uniform shuffle of ALL items (classes with
    exactly K+Q items are eligible, reference raises only below that)."""
    from audio_few_shot_learning_tpu.data.episodes import _floyd_sample

    keys = jax.random.split(jax.random.PRNGKey(5), 300)
    draws = np.asarray(jax.vmap(lambda kk: _floyd_sample(kk, jnp.int32(4), 4))(keys))
    assert (np.sort(draws, axis=1) == np.arange(4)).all()
    # first position is uniform over all 4 items
    counts = np.bincount(draws[:, 0], minlength=4)
    assert counts.min() > 40, counts


def test_class_sampling_uniform(synth_root):
    """Episode class draws are uniform over eligible classes (chi-square;
    replaces the reference's implicit random.sample semantics)."""
    import scipy.stats

    store = MetaAudioDataset(_exp(), synth_root, "train").to_packed_store()
    n_classes = store.n_classes  # 8
    counts = np.zeros(n_classes)
    trials = 300
    eps = sample_episode_batch(
        jax.random.PRNGKey(11), store, n_way=2, k_support=1, k_query=1, batch=trials
    )
    # recover sampled classes from support content -> store labels
    all_rows = np.asarray(store.segments)[np.asarray(store.seg_offsets)].reshape(store.num_items, -1)
    labels = np.asarray(store.labels)
    sup = np.asarray(eps.support).reshape(trials * 2, -1)
    for row in sup:
        m = np.where(np.all(np.isclose(all_rows, row, atol=1e-5), axis=1))[0]
        counts[labels[m[0]]] += 1
    _, p = scipy.stats.chisquare(counts)
    assert p > 1e-4, f"class sampling non-uniform: {counts} (p={p})"


@pytest.mark.slow
def test_segment_pick_uniform(synth_multiseg_root):
    """Random segment selection is uniform over an item's real segments."""
    store = MetaAudioDataset(_exp(True), synth_multiseg_root, "train").to_packed_store()
    # find an item with 3 segments
    item = int(np.argmax(np.asarray(store.seg_counts) == 3))
    off = int(np.asarray(store.seg_offsets)[item])
    segs = np.asarray(store.segments[off : off + 3])  # [3, F, T]
    from audio_few_shot_learning_tpu.data.episodes import sample_episode as _se

    counts = np.zeros(3)
    trials = 150
    eps = sample_episode_batch(
        jax.random.PRNGKey(13), store, n_way=5, k_support=5, k_query=2, batch=trials
    )
    sup = np.asarray(eps.support).reshape(-1, *segs.shape[1:])
    for row in sup:
        for s in range(3):
            if np.allclose(row, segs[s], atol=1e-5):
                counts[s] += 1
    assert counts.sum() > 10  # the item appears multiple times
    assert counts.min() > 0, f"some segment never picked: {counts}"


def test_pack_dataset_adapter():
    """pack_dataset: any indexable (x, label) sequence -> PackedStore."""
    from audio_few_shot_learning_tpu.data import pack_dataset

    rng_np = np.random.default_rng(3)
    data = [(rng_np.standard_normal((8, 9)).astype(np.float32), i % 4) for i in range(20)]
    store = pack_dataset(data)
    assert store.n_classes == 4
    assert int(np.asarray(store.class_counts).sum()) == 20
    # items land under their class, normalized with the given (0,1) stats
    eps = sample_episode_batch(
        jax.random.PRNGKey(0), store, n_way=4, k_support=2, k_query=1, batch=1
    )
    assert eps.support.shape[:2] == (1, 8)
