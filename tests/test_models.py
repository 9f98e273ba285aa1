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


def test_pool_relu_order_gradient_equivalence():
    """ConvBlock applies pool BEFORE relu (encoders.py), the reference the
    reverse (main_modules.py:43-60). Pins that the swap is exact for values
    AND gradients, including the tricky cases: all-negative windows, exact
    zeros (relu'(0)=0), and tied positive maxima (SelectAndScatter routes to
    the same argmax either way because relu preserves positive ordering)."""
    from flax import linen as nn

    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 12, 12, 3)).astype(np.float32)
    x[0, :6, :6, 0] = -np.abs(x[0, :6, :6, 0])  # all-negative windows
    x[1, :3, :3, 1] = 0.0  # exact-zero windows
    x[2, 0, 0, 2] = x[2, 0, 1, 2] = 1.5  # tied positive max in one window
    x = jnp.asarray(x)
    cot = jnp.asarray(rng.standard_normal((4, 4, 4, 3)).astype(np.float32))

    def relu_then_pool(v):
        return jnp.sum(nn.max_pool(nn.relu(v), (3, 3), strides=(3, 3)) * cot)

    def pool_then_relu(v):
        return jnp.sum(nn.relu(nn.max_pool(v, (3, 3), strides=(3, 3))) * cot)

    f_ref, g_ref = jax.value_and_grad(relu_then_pool)(x)
    f_new, g_new = jax.value_and_grad(pool_then_relu)(x)
    np.testing.assert_array_equal(np.asarray(f_ref), np.asarray(f_new))
    np.testing.assert_array_equal(np.asarray(g_ref), np.asarray(g_new))


def test_conv_block_gradients_match_torch_reference_order():
    """Full ConvBlock backward vs torch autograd through the REFERENCE op
    order (conv -> BN(eval) -> relu -> maxpool): same cotangent, same weights,
    matching conv kernel/bias and input grads despite the swapped pool/relu."""
    import torch

    from audio_few_shot_learning_tpu.models.encoders import ConvBlock

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 9, 9, 2)).astype(np.float32)
    blk = ConvBlock(features=8, pool=(3, 3), compute_dtype="float32")
    variables = blk.init(jax.random.PRNGKey(1), jnp.asarray(x), train=False)
    # scramble BN stats/affine so eval BN is a real transform
    stats = {
        "mean": jnp.asarray(rng.normal(0, 0.05, 8).astype(np.float32)),
        "var": jnp.asarray(rng.uniform(0.8, 1.2, 8).astype(np.float32)),
    }
    params = jax.tree.map(lambda p: p, variables["params"])
    variables = {"params": params, "batch_stats": {"BandwidthBatchNorm_0": stats}}
    cot = rng.standard_normal((2, 3, 3, 8)).astype(np.float32)

    def loss(p, v):
        out = blk.apply({"params": p, "batch_stats": variables["batch_stats"]}, v, train=False)
        return jnp.sum(out * jnp.asarray(cot))

    grads_p, grad_x = jax.grad(loss, argnums=(0, 1))(params, jnp.asarray(x))

    conv = torch.nn.Conv2d(2, 8, 3, padding=1)
    conv.weight.data = torch.tensor(np.asarray(params["kernel"])).permute(3, 2, 0, 1)
    conv.bias.data = torch.tensor(np.asarray(params["bias"]))
    bn = torch.nn.BatchNorm2d(8, eps=1e-5)
    bn.weight.data = torch.tensor(np.asarray(params["BandwidthBatchNorm_0"]["scale"]))
    bn.bias.data = torch.tensor(np.asarray(params["BandwidthBatchNorm_0"]["bias"]))
    bn.running_mean.data = torch.tensor(np.asarray(stats["mean"]))
    bn.running_var.data = torch.tensor(np.asarray(stats["var"]))
    bn.eval()
    xt = torch.tensor(np.transpose(x, (0, 3, 1, 2)), requires_grad=True)
    out = torch.nn.functional.max_pool2d(torch.relu(bn(conv(xt))), 3, 3)
    out.backward(torch.tensor(np.transpose(cot, (0, 3, 1, 2))))

    np.testing.assert_allclose(
        np.asarray(grads_p["kernel"]),
        conv.weight.grad.permute(2, 3, 1, 0).numpy(),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(grads_p["bias"]), conv.bias.grad.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(grad_x), xt.grad.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("cd,atol", [("float32", 1e-5), ("bfloat16", 6e-2)])
def test_conv_block_bn_fold_eval_equivalence(cd, atol):
    """tpu.fold_bn_eval: the folded eval path (BN affine folded into the conv
    kernel/bias, scripts/bn_fold_eval.py) must equal the plain conv->BN eval
    path up to compute-dtype rounding, on the SAME variable tree."""
    from audio_few_shot_learning_tpu.models.encoders import ConvBlock

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((3, 12, 12, 2)).astype(np.float32))
    plain = ConvBlock(features=8, pool=(3, 3), compute_dtype=cd, fold_bn_eval=False)
    folded = ConvBlock(features=8, pool=(3, 3), compute_dtype=cd, fold_bn_eval=True)
    variables = plain.init(jax.random.PRNGKey(2), x, train=False)
    stats = {
        "mean": jnp.asarray(rng.normal(0, 0.05, 8).astype(np.float32)),
        "var": jnp.asarray(rng.uniform(0.8, 1.2, 8).astype(np.float32)),
    }
    variables = {"params": variables["params"], "batch_stats": {"BandwidthBatchNorm_0": stats}}
    out_plain = np.asarray(plain.apply(variables, x, train=False), np.float32)
    out_fold = np.asarray(folded.apply(variables, x, train=False), np.float32)
    np.testing.assert_allclose(out_fold, out_plain, atol=atol, rtol=0)


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


def test_grouped_batchnorm_matches_per_group_oracle():
    """BandwidthBatchNorm's view_groups path (tpu.bn_per_view_group A/B):
    each (episode, view, support|query) group must be normalized with the
    stats of exactly the rows the reference's per-view loop would have fed
    BatchNorm (main_modules.py:18-23 via few_shot_classifier.py:64-76)."""
    from audio_few_shot_learning_tpu.models.encoders import BandwidthBatchNorm

    e, s, vs, q, vq, hw, c = 2, 3, 2, 4, 2, 5, 3
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((e * s * vs + e * q * vq, hw, hw, c)), jnp.float32)
    mod = BandwidthBatchNorm()
    variables = mod.init(jax.random.PRNGKey(0), x, True)
    got, updates = mod.apply(
        variables, x, True, (s, vs, q, vq), mutable=["batch_stats"]
    )
    got = np.asarray(got)

    xn = np.asarray(x, np.float64)
    sup = xn[: e * s * vs].reshape(e, s, vs, hw, hw, c)
    qry = xn[e * s * vs :].reshape(e, q, vq, hw, hw, c)
    eps = 1e-5
    want = np.empty_like(xn)
    for ei in range(e):
        for vi in range(vs):
            g = sup[ei, :, vi]  # the rows one reference support pass sees
            norm = (g - g.mean(axis=(0, 1, 2))) / np.sqrt(g.var(axis=(0, 1, 2)) + eps)
            want[: e * s * vs].reshape(e, s, vs, hw, hw, c)[ei, :, vi] = norm
        for vi in range(vq):
            g = qry[ei, :, vi]
            norm = (g - g.mean(axis=(0, 1, 2))) / np.sqrt(g.var(axis=(0, 1, 2)) + eps)
            want[e * s * vs :].reshape(e, q, vq, hw, hw, c)[ei, :, vi] = norm
    np.testing.assert_allclose(got, want, atol=2e-5)

    # running stats moved off their init values by the group-averaged batch
    bs = updates["batch_stats"]
    assert not np.allclose(np.asarray(bs["mean"]), 0.0)
    # eval mode ignores grouping and uses running stats: same output with and
    # without the view_groups argument
    ev_g = mod.apply({"params": variables["params"], "batch_stats": bs}, x, False, (s, vs, q, vq))
    ev_p = mod.apply({"params": variables["params"], "batch_stats": bs}, x, False)
    np.testing.assert_allclose(np.asarray(ev_g), np.asarray(ev_p), atol=0)


def test_episode_model_bn_per_view_group_runs(rng):
    """FewShotEpisodeModel with tpu.bn_per_view_group=True: full forward in
    train and eval modes, finite outputs, same output shapes as fused BN."""
    exp = ExperimentConfig.from_dict(
        {
            "encoder_name": "CNN",
            "use_attention": True,
            "use_contrastive": False,
            "tpu": {"bn_per_view_group": True, "mesh_shape": 1},
        }
    )
    mdl = ModelConfig.from_dict(
        {"CNN": {"pool_dim": [2, 2], "hidden_channels": 8, "out_dim": 64},
         "Projection": {"input_dim": 128, "hidden_dim": 64, "output_dim": 64}}
    )
    model = FewShotEpisodeModel(exp, mdl)
    e, s, q, v = 1, 6, 4, 2
    sup = jnp.asarray(np.random.default_rng(1).standard_normal((e, s, v, 32, 40)), jnp.float32)
    qry = jnp.asarray(np.random.default_rng(2).standard_normal((e, q, v, 32, 40)), jnp.float32)
    labels = jnp.tile(jnp.arange(2), (e, 3))
    variables = model.init(rng, sup, qry, labels, 2)
    outs, updates = model.apply(
        variables, sup, qry, labels, 2, train=True,
        mutable=["batch_stats"], rngs={"dropout": rng},
    )
    assert np.isfinite(np.asarray(outs.scores)).all()
    outs_eval = model.apply(
        {"params": variables["params"], "batch_stats": updates["batch_stats"]},
        sup, qry, labels, 2, train=False,
    )
    assert np.isfinite(np.asarray(outs_eval.scores)).all()
