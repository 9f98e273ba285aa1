"""Prototype head vs NumPy oracle (reference models/util_functions.py:6-19,
few_shot_classifier.py:108-116)."""

import jax
import jax.numpy as jnp
import numpy as np

from audio_few_shot_learning_tpu.ops.protohead import (
    batched_episode_scores,
    compute_prototypes,
    pairwise_sqeuclidean,
    prototype_scores,
)


def _np_prototypes(feats, labels, n_way):
    return np.stack([feats[labels == c].mean(axis=0) for c in range(n_way)])


def test_prototypes_match_oracle():
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((25, 64)).astype(np.float32)
    labels = np.repeat(np.arange(5), 5)
    out = np.asarray(compute_prototypes(jnp.asarray(feats), jnp.asarray(labels), 5))
    np.testing.assert_allclose(out, _np_prototypes(feats, labels, 5), rtol=1e-5, atol=1e-5)


def test_prototypes_shuffled_labels():
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((25, 64)).astype(np.float32)
    labels = rng.permutation(np.repeat(np.arange(5), 5))
    out = np.asarray(compute_prototypes(jnp.asarray(feats), jnp.asarray(labels), 5))
    np.testing.assert_allclose(out, _np_prototypes(feats, labels, 5), rtol=1e-5, atol=1e-5)


def test_scores_match_cdist_oracle():
    rng = np.random.default_rng(2)
    q = rng.standard_normal((25, 256)).astype(np.float32)
    p = rng.standard_normal((5, 256)).astype(np.float32)
    scores = np.asarray(prototype_scores(jnp.asarray(q), jnp.asarray(p)))
    oracle = -np.sqrt(((q[:, None, :] - p[None, :, :]) ** 2).sum(-1))
    np.testing.assert_allclose(scores, oracle, rtol=1e-4, atol=1e-4)


def test_sqeuclidean_nonnegative():
    rng = np.random.default_rng(3)
    q = rng.standard_normal((100, 64)).astype(np.float32)
    d = np.asarray(pairwise_sqeuclidean(jnp.asarray(q), jnp.asarray(q[:5])))
    assert (d >= 0).all()
    np.testing.assert_allclose(np.diag(d[:5]), 0.0, atol=1e-4)


def test_batched_scores_match_unbatched():
    rng = np.random.default_rng(4)
    e, s, q, d, n = 4, 25, 25, 64, 5
    sup = rng.standard_normal((e, s, d)).astype(np.float32)
    qry = rng.standard_normal((e, q, d)).astype(np.float32)
    labels = np.tile(np.repeat(np.arange(n), 5), (e, 1))
    out = np.asarray(
        batched_episode_scores(jnp.asarray(sup), jnp.asarray(labels), jnp.asarray(qry), n, use_pallas=False)
    )
    for i in range(e):
        protos = _np_prototypes(sup[i], labels[i], n)
        oracle = -np.sqrt(((qry[i][:, None, :] - protos[None, :, :]) ** 2).sum(-1))
        np.testing.assert_allclose(out[i], oracle, rtol=1e-4, atol=1e-4)


def test_batched_scores_pallas_interpret():
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(5)
    e, s, q, d, n = 2, 25, 25, 64, 5
    sup = rng.standard_normal((e, s, d)).astype(np.float32)
    qry = rng.standard_normal((e, q, d)).astype(np.float32)
    labels = np.tile(np.repeat(np.arange(n), 5), (e, 1))
    ref = batched_episode_scores(jnp.asarray(sup), jnp.asarray(labels), jnp.asarray(qry), n, use_pallas=False)
    with pltpu.force_tpu_interpret_mode():
        out = batched_episode_scores(jnp.asarray(sup), jnp.asarray(labels), jnp.asarray(qry), n, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)
