"""Model-layer tests: shapes, torch-CPU oracles for RNN cells and the
transformer fusion layer, episode-model variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_few_shot_learning_tpu.config import (
    AttentionConfig,
    CNNConfig,
    ExperimentConfig,
    HybridConfig,
    ModelConfig,
    ProjectionConfig,
)
from audio_few_shot_learning_tpu.models import (
    FewShotEpisodeModel,
    ProjectionHead,
    SelfAttention,
    StandardCNN,
    StandardHybrid,
)
from audio_few_shot_learning_tpu.ops.rnn import Recurrent


# ---------------------------------------------------------------------------
# RNN vs torch oracle
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("cell", ["RNN", "GRU", "LSTM"])
@pytest.mark.parametrize("bidirectional", [False, True])
def test_recurrent_matches_torch(cell, bidirectional):
    import torch

    b, t, i, h = 3, 7, 5, 4
    rng = np.random.default_rng(0)
    x = rng.standard_normal((b, t, i)).astype(np.float32)

    mod = Recurrent(hidden_size=h, num_layers=2, cell_type=cell, bidirectional=bidirectional)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))

    tmod = getattr(torch.nn, cell)(
        input_size=i, hidden_size=h, num_layers=2, bidirectional=bidirectional, batch_first=True
    )
    # copy flax params into torch (torch weight layout: [gates*H, I], gate order matches)
    sd = tmod.state_dict()
    params = variables["params"]
    for layer in range(2):
        for direction in range(2 if bidirectional else 1):
            name = f"l{layer}_{'bwd' if direction else 'fwd'}"
            suffix = "_reverse" if direction else ""
            sd[f"weight_ih_l{layer}{suffix}"] = torch.tensor(np.asarray(params[name]["w_ih"]).T)
            sd[f"weight_hh_l{layer}{suffix}"] = torch.tensor(np.asarray(params[name]["w_hh"]).T)
            sd[f"bias_ih_l{layer}{suffix}"] = torch.tensor(np.asarray(params[name]["b_ih"]))
            sd[f"bias_hh_l{layer}{suffix}"] = torch.tensor(np.asarray(params[name]["b_hh"]))
    tmod.load_state_dict(sd)

    out = np.asarray(mod.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        tout = tmod(torch.tensor(x))[0].numpy()
    np.testing.assert_allclose(out, tout, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# SelfAttention vs torch TransformerEncoderLayer
# ---------------------------------------------------------------------------


def test_attention_matches_torch_encoder_layer():
    import torch

    cfg = AttentionConfig(embed_dim=64, num_heads=1, ffn_dim=256, dropout=0.1)
    b, v, d = 5, 4, 64
    rng = np.random.default_rng(1)
    x = rng.standard_normal((b, v, d)).astype(np.float32)

    mod = SelfAttention(cfg)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = variables["params"]

    tmod = torch.nn.TransformerEncoderLayer(
        d_model=d, nhead=1, dim_feedforward=256, dropout=0.1, batch_first=True
    )
    sd = tmod.state_dict()
    sd["self_attn.in_proj_weight"] = torch.tensor(np.asarray(p["in_proj"]["kernel"]).T)
    sd["self_attn.in_proj_bias"] = torch.tensor(np.asarray(p["in_proj"]["bias"]))
    sd["self_attn.out_proj.weight"] = torch.tensor(np.asarray(p["out_proj"]["kernel"]).T)
    sd["self_attn.out_proj.bias"] = torch.tensor(np.asarray(p["out_proj"]["bias"]))
    sd["linear1.weight"] = torch.tensor(np.asarray(p["linear1"]["kernel"]).T)
    sd["linear1.bias"] = torch.tensor(np.asarray(p["linear1"]["bias"]))
    sd["linear2.weight"] = torch.tensor(np.asarray(p["linear2"]["kernel"]).T)
    sd["linear2.bias"] = torch.tensor(np.asarray(p["linear2"]["bias"]))
    sd["norm1.weight"] = torch.tensor(np.asarray(p["norm1"]["scale"]))
    sd["norm1.bias"] = torch.tensor(np.asarray(p["norm1"]["bias"]))
    sd["norm2.weight"] = torch.tensor(np.asarray(p["norm2"]["scale"]))
    sd["norm2.bias"] = torch.tensor(np.asarray(p["norm2"]["bias"]))
    tmod.load_state_dict(sd)
    tmod.eval()

    out = np.asarray(mod.apply(variables, jnp.asarray(x), train=False))
    with torch.no_grad():
        tout = tmod(torch.tensor(x)).numpy()
    # reference concatenates the V tokens channel-wise (main_modules.py:225-226)
    tout = tout.reshape(b, v * d)
    np.testing.assert_allclose(out, tout, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# Encoders
# ---------------------------------------------------------------------------


def test_cnn_shapes():
    mod = StandardCNN(CNNConfig())
    x = jnp.ones((6, 128, 157))
    variables = mod.init(jax.random.PRNGKey(0), x)
    out = mod.apply(variables, x, train=False)
    assert out.shape == (6, 64)


def test_hybrid_shapes_and_train_mode(rng):
    mod = StandardHybrid(HybridConfig(seq_type="GRU"))
    x = jnp.ones((6, 128, 157))
    variables = mod.init(rng, x)
    out, updates = mod.apply(
        variables, x, train=True, mutable=["batch_stats"], rngs={"dropout": rng}
    )
    assert out.shape == (6, 64)
    assert "batch_stats" in updates


def test_hybrid_param_count_order_of_magnitude():
    """Reference prints ~1e5 trainable params for the Hybrid (BASELINE.md)."""
    mod = StandardHybrid(HybridConfig())
    variables = mod.init(jax.random.PRNGKey(0), jnp.ones((2, 128, 157)))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    assert 5e4 < n < 3e5, n


def test_projection_head_l2_normalized():
    mod = ProjectionHead(ProjectionConfig(input_dim=256, hidden_dim=128, output_dim=256))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((7, 256)).astype(np.float32)) * 10
    variables = mod.init(jax.random.PRNGKey(0), x)
    out = np.asarray(mod.apply(variables, x))
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, atol=1e-5)


# ---------------------------------------------------------------------------
# Episode model variants
# ---------------------------------------------------------------------------


def _episode_model(use_attention: bool, encoder: str = "Hybrid"):
    exp = ExperimentConfig.from_dict(
        {
            "encoder_name": encoder,
            "use_attention": use_attention,
            "use_contrastive": True,
        }
    )
    return FewShotEpisodeModel(exp=exp, mdl=ModelConfig())


@pytest.mark.slow
def test_episode_model_with_attention(rng):
    model = _episode_model(True)
    s, q, v, n = 25, 25, 4, 5
    sup = jnp.ones((s, v, 128, 157))
    qry = jnp.ones((q, v, 128, 157))
    labels = jnp.asarray(np.repeat(np.arange(n), 5))
    variables = model.init(rng, sup, qry, labels, n, with_contrastive=True)
    out = model.apply(
        variables, sup, qry, labels, n,
        shuffle_perm=jnp.asarray([2, 1, 3]), train=False, with_contrastive=True,
    )
    assert out.support_features.shape == (s, 256)
    assert out.query_features.shape == (q, 256)
    assert out.prototypes.shape == (n, 256)
    assert out.scores.shape == (q, n)
    assert out.cpl_features.shape == (q, 256)
    assert out.cpl_prototypes_projected.shape == (n, 256)


def test_episode_model_without_attention(rng):
    model = _episode_model(False)
    s, q, v, n = 25, 25, 4, 5
    sup = jnp.ones((s, v, 128, 157))
    qry = jnp.ones((q, v, 128, 157))
    labels = jnp.asarray(np.repeat(np.arange(n), 5))
    variables = model.init(rng, sup, qry, labels, n, with_contrastive=True)
    out = model.apply(variables, sup, qry, labels, n, train=False, with_contrastive=True)
    # views concatenated along batch (xV), feature dim = encoder out_dim
    assert out.support_features.shape == (s * v, 64)
    assert out.query_features.shape == (q * v, 64)
    assert out.scores.shape == (q * v, n)


def test_plain_protonet_single_view(rng):
    """BASELINE config #1: CNN encoder, V=1, no attention/contrastive."""
    model = _episode_model(False, encoder="CNN")
    sup = jnp.ones((25, 1, 128, 157))
    qry = jnp.ones((25, 1, 128, 157))
    labels = jnp.asarray(np.repeat(np.arange(5), 5))
    variables = model.init(rng, sup, qry, labels, 5)
    out = model.apply(variables, sup, qry, labels, 5, train=False)
    assert out.scores.shape == (25, 5)
    assert out.cpl_features is None


def test_scores_are_negative_distances(rng):
    """Identical support/query items -> score 0 to own prototype when K=1."""
    model = _episode_model(False, encoder="CNN")
    x = jnp.asarray(np.random.default_rng(3).standard_normal((5, 1, 128, 157)).astype(np.float32))
    labels = jnp.arange(5)
    variables = model.init(rng, x, x, labels, 5)
    out = model.apply(variables, x, x, labels, 5, train=False)
    scores = np.asarray(out.scores)
    # query i equals support i -> distance to own prototype ~0, others < 0
    np.testing.assert_allclose(np.diag(scores), 0.0, atol=1e-2)
    assert (scores <= 1e-5).all()
    assert np.argmax(scores, axis=1).tolist() == list(range(5))
