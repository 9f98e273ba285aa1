"""Stateful classifier API + util functions tests."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

from audio_few_shot_learning_tpu.config import ExperimentConfig, ModelConfig
from audio_few_shot_learning_tpu.models.classifier_api import (
    ContrastivePrototypicalNetworks,
    PrototypicalNetworks,
)
from audio_few_shot_learning_tpu.ops.util_functions import (
    cosine_scores,
    entropy,
    k_nearest_neighbours,
    power_transform,
)


def _cfg(use_attention=False):
    exp = ExperimentConfig.from_dict(
        {
            "encoder_name": "CNN",
            "use_attention": use_attention,
            "tpu": {"compute_dtype": "float32"},
        }
    )
    mdl = ModelConfig.from_dict(
        {
            "CNN": {"pool_dim": [2, 2], "hidden_channels": 8, "out_dim": 16},
            "Attention": {"embed_dim": 16, "num_heads": 1, "ffn_dim": 32, "dropout": 0.1},
            "Projection": {"input_dim": 64, "hidden_dim": 32, "output_dim": 32},
        }
    )
    return exp, mdl


def test_protonet_object_protocol():
    exp, mdl = _cfg()
    clf = PrototypicalNetworks(exp, mdl)
    rng = np.random.default_rng(0)
    sup = jnp.asarray(rng.standard_normal((6, 1, 32, 24)).astype(np.float32))
    qry = jnp.asarray(rng.standard_normal((4, 1, 32, 24)).astype(np.float32))
    labels = jnp.asarray([0, 0, 1, 1, 2, 2])
    clf.process_support_set(sup, labels)
    assert clf.prototypes.shape == (3, 16)
    scores = clf(qry)
    assert scores.shape == (4, 3)
    assert np.isfinite(np.asarray(scores)).all()
    assert (np.asarray(scores) <= 1e-5).all()  # -cdist


def test_softmax_hook():
    exp, mdl = _cfg()
    clf = PrototypicalNetworks(exp, mdl, use_softmax=True)
    rng = np.random.default_rng(1)
    sup = jnp.asarray(rng.standard_normal((4, 1, 32, 24)).astype(np.float32))
    clf.process_support_set(sup, jnp.asarray([0, 0, 1, 1]))
    scores = np.asarray(clf(sup))
    np.testing.assert_allclose(scores.sum(axis=1), 1.0, atol=1e-5)


def test_cosine_scores_vs_oracle():
    rng = np.random.default_rng(2)
    s = rng.standard_normal((7, 16)).astype(np.float32)
    p = rng.standard_normal((3, 16)).astype(np.float32)
    got = np.asarray(cosine_scores(jnp.asarray(s), jnp.asarray(p)))
    sn = s / np.linalg.norm(s, axis=1, keepdims=True)
    pn = p / np.linalg.norm(p, axis=1, keepdims=True)
    np.testing.assert_allclose(got, sn @ pn.T, rtol=1e-5, atol=1e-6)
    assert (np.abs(got) <= 1 + 1e-5).all()


@pytest.mark.slow
def test_contrastive_api_shapes():
    exp, mdl = _cfg(use_attention=True)
    mdl_d = {
        "CNN": {"pool_dim": [2, 2], "hidden_channels": 8, "out_dim": 16},
        "Attention": {"embed_dim": 16, "num_heads": 1, "ffn_dim": 32, "dropout": 0.1},
        "Projection": {"input_dim": 64, "hidden_dim": 32, "output_dim": 32},
    }
    mdl = ModelConfig.from_dict(mdl_d)
    clf = ContrastivePrototypicalNetworks(exp, mdl)
    rng = np.random.default_rng(3)
    sup = jnp.asarray(rng.standard_normal((6, 4, 32, 24)).astype(np.float32))
    qry = jnp.asarray(rng.standard_normal((4, 4, 32, 24)).astype(np.float32))
    clf.process_support_set(sup, jnp.asarray([0, 0, 1, 1, 2, 2]))
    assert clf.prototypes.shape == (3, 64)  # 4 views x 16
    feats, protos = clf.contrastive_forward(qry, project_prototypes=True, key=jax.random.PRNGKey(0))
    assert feats.shape == (4, 32)
    assert protos.shape == (3, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(protos), axis=1), 1.0, atol=1e-5)


def test_entropy():
    logits = jnp.asarray([[100.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    e = float(entropy(logits))
    # first row ~0 entropy, second row ln(3)
    np.testing.assert_allclose(e, np.log(3) / 2, atol=1e-3)


def test_knn_excludes_self():
    pts = jnp.asarray([[0.0, 0], [0.1, 0], [5, 5], [5.1, 5]])
    idx = np.asarray(k_nearest_neighbours(pts, 1))
    np.testing.assert_array_equal(idx[:, 0], [1, 0, 3, 2])


def test_power_transform():
    x = jnp.asarray([[-1.0, 4.0]])
    out = np.asarray(power_transform(x, 0.5))
    np.testing.assert_allclose(out, [[1e-3, 2.0000002]], rtol=1e-3)
