"""Composed episode-forward parity vs a torch re-implementation.

Per-module oracles (tests/test_models.py, test_losses.py) cannot catch a
wiring-order or BN-semantics regression in the composed forward. Here the
FULL reference flow — conv4 -> RNN+skip -> attention fusion -> prototypes ->
-cdist scores -> FSL + CPL(projected) — runs with the same weights in flax
and in a torch re-implementation of models/prototypical.py:46-126 +
main_modules.py:84-228 + loops/loss.py, on a reference-shaped episode
(5-way 5-shot 5-query, 4 views), for both model variants.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from audio_few_shot_learning_tpu.config import (  # noqa: E402
    ExperimentConfig,
    ModelConfig,
    TPUConfig,
)
from audio_few_shot_learning_tpu.losses import cpl_loss, fsl_loss  # noqa: E402
from audio_few_shot_learning_tpu.models import FewShotEpisodeModel  # noqa: E402

N_WAY, K_SHOT, K_QUERY, V = 5, 5, 5, 4
F_MEL, T_FRAMES = 128, 157


def _t(x):
    return torch.tensor(np.asarray(x, dtype=np.float32))


def _episode(seed=0):
    rng = np.random.default_rng(seed)
    sup = rng.standard_normal((N_WAY * K_SHOT, V, F_MEL, T_FRAMES)).astype(np.float32)
    qry = rng.standard_normal((N_WAY * K_QUERY, V, F_MEL, T_FRAMES)).astype(np.float32)
    sup_lab = np.repeat(np.arange(N_WAY), K_SHOT)
    qry_lab = np.repeat(np.arange(N_WAY), K_QUERY)
    return sup, qry, sup_lab, qry_lab


def _flax_model(use_attention):
    exp = ExperimentConfig.from_dict(
        {
            "encoder_name": "Hybrid",
            "use_attention": use_attention,
            "use_contrastive": True,
            "project_prototypes": True,
        }
    )
    exp = dataclasses.replace(exp, tpu=TPUConfig(compute_dtype="float32"))
    return FewShotEpisodeModel(exp=exp, mdl=ModelConfig())


def _perturb_stats(variables, seed=1):
    """Randomize BN running stats and affines so eval-mode BN copying is
    actually exercised (fresh init would make BN a near-no-op)."""
    rng = np.random.default_rng(seed)

    def scramble(path, x):
        name = path[-1].key
        if name in ("mean", "bias"):
            return jnp.asarray(rng.normal(0.0, 0.05, x.shape).astype(np.float32))
        if name in ("var", "scale"):
            return jnp.asarray(rng.uniform(0.8, 1.2, x.shape).astype(np.float32))
        return x

    stats = jax.tree_util.tree_map_with_path(scramble, variables["batch_stats"])
    params = dict(variables["params"])
    return {"params": params, "batch_stats": stats}


class TorchReference:
    """Reference forward with weights copied from the flax variable tree."""

    def __init__(self, variables):
        p = variables["params"]
        s = variables["batch_stats"]
        bk, bs = p["backbone"], s["backbone"]

        self.blocks = []
        for i in range(4):
            blk = bk["ConvEncoder_0"][f"block{i}"]
            conv = torch.nn.Conv2d(1 if i == 0 else 64, 64, 3, padding=1)
            conv.weight.data = _t(blk["kernel"]).permute(3, 2, 0, 1)
            conv.bias.data = _t(blk["bias"])
            bn = torch.nn.BatchNorm2d(64, eps=1e-5)
            bn.weight.data = _t(blk["BandwidthBatchNorm_0"]["scale"])
            bn.bias.data = _t(blk["BandwidthBatchNorm_0"]["bias"])
            st = s["backbone"]["ConvEncoder_0"][f"block{i}"]["BandwidthBatchNorm_0"]
            bn.running_mean.data = _t(st["mean"])
            bn.running_var.data = _t(st["var"])
            bn.eval()
            self.blocks.append((conv, bn))

        self.rnn = torch.nn.RNN(64, 64, 1, batch_first=True)
        rp = bk["seq_layers"]["l0_fwd"]
        sd = self.rnn.state_dict()
        sd["weight_ih_l0"] = _t(rp["w_ih"]).T
        sd["weight_hh_l0"] = _t(rp["w_hh"]).T
        sd["bias_ih_l0"] = _t(rp["b_ih"])
        sd["bias_hh_l0"] = _t(rp["b_hh"])
        self.rnn.load_state_dict(sd)

        self.head_bn = torch.nn.BatchNorm1d(64, eps=1e-5)
        self.head_bn.weight.data = _t(bk["_LogitsHead_0"]["BatchNorm_0"]["scale"])
        self.head_bn.bias.data = _t(bk["_LogitsHead_0"]["BatchNorm_0"]["bias"])
        self.head_bn.running_mean.data = _t(bs["_LogitsHead_0"]["BatchNorm_0"]["mean"])
        self.head_bn.running_var.data = _t(bs["_LogitsHead_0"]["BatchNorm_0"]["var"])
        self.head_bn.eval()
        self.head_fc = torch.nn.Linear(64, 64)
        self.head_fc.weight.data = _t(bk["_LogitsHead_0"]["Dense_0"]["kernel"]).T
        self.head_fc.bias.data = _t(bk["_LogitsHead_0"]["Dense_0"]["bias"])

        if "attention" in p:
            a = p["attention"]
            self.attn = torch.nn.TransformerEncoderLayer(
                d_model=64, nhead=1, dim_feedforward=256, dropout=0.1, batch_first=True
            )
            sd = self.attn.state_dict()
            sd["self_attn.in_proj_weight"] = _t(a["in_proj"]["kernel"]).T
            sd["self_attn.in_proj_bias"] = _t(a["in_proj"]["bias"])
            sd["self_attn.out_proj.weight"] = _t(a["out_proj"]["kernel"]).T
            sd["self_attn.out_proj.bias"] = _t(a["out_proj"]["bias"])
            sd["linear1.weight"] = _t(a["linear1"]["kernel"]).T
            sd["linear1.bias"] = _t(a["linear1"]["bias"])
            sd["linear2.weight"] = _t(a["linear2"]["kernel"]).T
            sd["linear2.bias"] = _t(a["linear2"]["bias"])
            sd["norm1.weight"] = _t(a["norm1"]["scale"])
            sd["norm1.bias"] = _t(a["norm1"]["bias"])
            sd["norm2.weight"] = _t(a["norm2"]["scale"])
            sd["norm2.bias"] = _t(a["norm2"]["bias"])
            self.attn.load_state_dict(sd)
            self.attn.eval()
        else:
            self.attn = None

        pr = p["projection"]
        self.fc1 = torch.nn.Linear(256, 128)
        self.fc1.weight.data = _t(pr["fc1"]["kernel"]).T
        self.fc1.bias.data = _t(pr["fc1"]["bias"])
        self.fc2 = torch.nn.Linear(128, 256)
        self.fc2.weight.data = _t(pr["fc2"]["kernel"]).T
        self.fc2.bias.data = _t(pr["fc2"]["bias"])

    @torch.no_grad()
    def backbone(self, x):  # [B, F, T] -> [B, 64]
        x = x[:, None]  # NCHW
        for conv, bn in self.blocks:
            x = F.relu(bn(conv(x)))
            x = F.max_pool2d(x, 3, 3)  # floor mode
        # main_modules.py:170-177: [B,C,F',T'] -> [B,T',F'*C] sequence
        x = x.transpose(1, -1)
        b, t = x.shape[:2]
        seq = x.reshape(b, t, -1)
        out, _ = self.rnn(seq)
        seq_out = out + seq  # input+output skip (main_modules.py:185-193)
        last = seq_out[:, -1]
        return self.head_fc(self.head_bn(last))

    @torch.no_grad()
    def fuse(self, view_feats):  # [B, V, 64] -> [B, 256]
        y = self.attn(view_feats)
        return y.reshape(y.shape[0], -1)

    @torch.no_grad()
    def project(self, x):  # ProjectionHead: fc-relu-fc, always L2-normalized
        return F.normalize(self.fc2(F.relu(self.fc1(x))), dim=-1)


def _prototypes(feats, labels, n_way):
    return torch.stack([feats[labels == c].mean(0) for c in range(n_way)])


def _cpl_oracle(protos, queries, labels, t):
    """Reference CPL with M == per-class count (deterministic; the softmax is
    order-invariant so sampling 'all members' matches exactly)."""
    losses = []
    for i in range(len(queries)):
        own = protos[labels[i]]
        neg = queries[labels != labels[i]]
        samples = torch.cat([neg, queries[i : i + 1]])
        sims = F.cosine_similarity(own[None], samples) / t
        logp = torch.log_softmax(sims, -1)
        losses.append(-logp[-1])
    return (torch.stack(losses).mean() / len(queries)).item()


@pytest.mark.slow
def test_composed_forward_attention_variant():
    sup, qry, sup_lab, qry_lab = _episode(0)
    model = _flax_model(use_attention=True)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(sup), jnp.asarray(qry),
        jnp.asarray(sup_lab), N_WAY, with_contrastive=True,
    )
    variables = _perturb_stats(variables)
    perm = np.array([2, 1, 3])  # fixed original-first view shuffle

    out = model.apply(
        variables, jnp.asarray(sup), jnp.asarray(qry), jnp.asarray(sup_lab),
        N_WAY, shuffle_perm=jnp.asarray(perm), train=False, with_contrastive=True,
    )

    ref = TorchReference(variables)
    sup_t, qry_t = _t(sup), _t(qry)
    sup_vf = torch.stack([ref.backbone(sup_t[:, v]) for v in range(V)], dim=1)
    qry_vf = torch.stack([ref.backbone(qry_t[:, v]) for v in range(V)], dim=1)
    sup_f = ref.fuse(sup_vf)
    qry_f = ref.fuse(qry_vf)
    protos = _prototypes(sup_f, _t(sup_lab).long(), N_WAY)
    scores = -torch.cdist(qry_f, protos)

    np.testing.assert_allclose(np.asarray(out.support_features), sup_f.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.query_features), qry_f.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.prototypes), protos.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.scores), scores.numpy(), rtol=1e-4, atol=1e-4)

    # FSL loss (loops/loss.py:24-37)
    fsl_t = F.nll_loss(F.log_softmax(scores, -1), _t(qry_lab).long())
    fsl_j = float(fsl_loss(out.scores, jnp.asarray(qry_lab)))
    np.testing.assert_allclose(fsl_j, fsl_t.item(), rtol=1e-4, atol=1e-5)

    # contrastive branch: shuffled views (original first), re-fused, projected
    idx = torch.tensor(np.concatenate([[0], perm]))
    cpl_in = ref.fuse(qry_vf[:, idx])
    cpl_feats = ref.project(cpl_in)
    protos_proj = ref.project(protos)
    np.testing.assert_allclose(np.asarray(out.cpl_features), cpl_feats.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out.cpl_prototypes_projected), protos_proj.numpy(), rtol=1e-4, atol=1e-4
    )

    # CPL at M == class size (deterministic full sampling)
    cpl_j = float(
        cpl_loss(
            out.cpl_prototypes_projected, out.cpl_features, jnp.asarray(qry_lab),
            jax.random.PRNGKey(0), m_param=K_QUERY, t_param=6.0,
        )
    )
    cpl_t = _cpl_oracle(protos_proj, cpl_feats, _t(qry_lab).long(), t=6.0)
    np.testing.assert_allclose(cpl_j, cpl_t, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_composed_forward_no_attention_variant():
    """View-major batch concat + xV label tiling (prototypical.py:96-126,
    loops/loops.py:33-37)."""
    sup, qry, sup_lab, qry_lab = _episode(1)
    model = _flax_model(use_attention=False)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(sup), jnp.asarray(qry),
        jnp.asarray(sup_lab), N_WAY, with_contrastive=True,
    )
    variables = _perturb_stats(variables, seed=2)

    out = model.apply(
        variables, jnp.asarray(sup), jnp.asarray(qry), jnp.asarray(sup_lab),
        N_WAY, train=False, with_contrastive=True,
    )

    ref = TorchReference(variables)
    sup_t, qry_t = _t(sup), _t(qry)
    # view-major concat along batch (prototypical.py:103-106)
    sup_f = torch.cat([ref.backbone(sup_t[:, v]) for v in range(V)], dim=0)
    qry_f = torch.cat([ref.backbone(qry_t[:, v]) for v in range(V)], dim=0)
    lab_tiled = _t(np.tile(sup_lab, V)).long()
    qlab_tiled = np.tile(qry_lab, V)
    protos = _prototypes(sup_f, lab_tiled, N_WAY)
    scores = -torch.cdist(qry_f, protos)

    np.testing.assert_allclose(np.asarray(out.support_features), sup_f.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.scores), scores.numpy(), rtol=1e-4, atol=1e-4)

    fsl_t = F.nll_loss(F.log_softmax(scores, -1), _t(qlab_tiled).long())
    fsl_j = float(fsl_loss(out.scores, jnp.asarray(qlab_tiled)))
    np.testing.assert_allclose(fsl_j, fsl_t.item(), rtol=1e-4, atol=1e-5)

    # no-attention contrastive: projection of the tiled query features
    cpl_feats = ref.project(qry_f)
    np.testing.assert_allclose(np.asarray(out.cpl_features), cpl_feats.numpy(), rtol=1e-4, atol=1e-4)
