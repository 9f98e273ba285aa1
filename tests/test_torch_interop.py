"""Reference-checkpoint interop (train/torch_interop.py).

Three layers of evidence:

1. pure round-trip (no torch): export -> import restores every mapped leaf
   bit-exactly;
2. import from the ACTUAL reference torch model: a state_dict saved by
   /root/reference's ``ContrastivePrototypicalNetworks`` (models/
   prototypical.py:46) loads here and the composed eval forward (support
   prototypes -> -cdist query scores) matches the torch model;
3. export to the actual reference model: a checkpoint trained here loads with
   ``load_state_dict(strict=True)`` and produces the same scores in torch.

2/3 use the reference code itself as the oracle (not a re-implementation), so
they double as key-schema pins against the real ``model.pt`` format.
"""

import dataclasses
import importlib
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_few_shot_learning_tpu.config import ExperimentConfig, ModelConfig, TPUConfig
from audio_few_shot_learning_tpu.models import FewShotEpisodeModel
from audio_few_shot_learning_tpu.train.torch_interop import (
    export_reference_state_dict,
    import_reference_state_dict,
)

REFERENCE = Path("/root/reference")

# small-but-nontrivial geometry: F collapses to 1 after four pool-3 stages
# (the Hybrid skip connection requires F'*C == hidden, main_modules.py:141-142);
# V=4 so the projection input width matches the reference's 256-wide
# ProjectionHead config (w_hh layout is covered bit-exactly by the round-trip
# and semantically by test_recurrent_matches_torch)
N_WAY, K_SHOT, K_QUERY, V = 3, 1, 1, 4
F_MEL, T_FRAMES = 96, 99


def _flax_model(use_attention=True):
    exp = ExperimentConfig.from_dict(
        {"encoder_name": "Hybrid", "use_attention": use_attention, "use_contrastive": True}
    )
    exp = dataclasses.replace(exp, tpu=TPUConfig(compute_dtype="float32"))
    return FewShotEpisodeModel(exp=exp, mdl=ModelConfig())


def _episode(seed=0):
    rng = np.random.default_rng(seed)
    sup = rng.standard_normal((N_WAY * K_SHOT, V, F_MEL, T_FRAMES)).astype(np.float32)
    qry = rng.standard_normal((N_WAY * K_QUERY, V, F_MEL, T_FRAMES)).astype(np.float32)
    sup_lab = np.repeat(np.arange(N_WAY), K_SHOT)
    return sup, qry, sup_lab


def _variables(model, sup, qry, sup_lab):
    return model.init(
        jax.random.PRNGKey(0), jnp.asarray(sup), jnp.asarray(qry),
        jnp.asarray(sup_lab), N_WAY, with_contrastive=True,
    )


def _scramble(variables, seed=3):
    """Non-trivial BN running stats so eval-mode stat mapping is exercised."""
    rng = np.random.default_rng(seed)

    def f(path, x):
        name = path[-1].key
        if name in ("mean", "bias"):
            return jnp.asarray(rng.normal(0.0, 0.05, x.shape).astype(np.float32))
        if name in ("var", "scale"):
            return jnp.asarray(rng.uniform(0.8, 1.2, x.shape).astype(np.float32))
        return x

    return {
        "params": variables["params"],
        "batch_stats": jax.tree_util.tree_map_with_path(f, variables["batch_stats"]),
    }


def test_export_import_round_trip():
    sup, qry, sup_lab = _episode()
    model = _flax_model()
    variables = _scramble(_variables(model, sup, qry, sup_lab))
    sd = export_reference_state_dict(variables)

    # re-import into a zeroed template: every mapped leaf must be restored
    zeroed = jax.tree.map(jnp.zeros_like, variables)
    restored = import_reference_state_dict(sd, zeroed)

    flat_a = jax.tree_util.tree_leaves_with_path(variables)
    flat_b = dict(
        (jax.tree_util.keystr(p), v) for p, v in jax.tree_util.tree_leaves_with_path(restored)
    )
    for path, a in flat_a:
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(flat_b[jax.tree_util.keystr(path)]), err_msg=str(path)
        )


@pytest.mark.parametrize("cell,bidi,layers", [("GRU", True, 2), ("LSTM", False, 1)])
def test_round_trip_recurrent_variants(cell, bidi, layers):
    """Gate-stacked GRU/LSTM matrices and the _reverse/l{k} multi-layer keys
    survive the mapping (bit-exact)."""
    exp = ExperimentConfig.from_dict(
        {"encoder_name": "Hybrid", "use_attention": True, "use_contrastive": True}
    )
    exp = dataclasses.replace(exp, tpu=TPUConfig(compute_dtype="float32"))
    mdl = ModelConfig.from_dict(
        {"Hybrid": {"seq_type": cell, "bidirectional": bidi, "seq_layers": layers}}
    )
    model = FewShotEpisodeModel(exp=exp, mdl=mdl)
    sup, qry, sup_lab = _episode()
    variables = _scramble(_variables(model, sup, qry, sup_lab))
    sd = export_reference_state_dict(variables)

    expect = {f"backbone.encoder.seq_layers.weight_ih_l{k}" for k in range(layers)}
    if bidi:
        expect |= {f"backbone.encoder.seq_layers.weight_hh_l{k}_reverse" for k in range(layers)}
    assert expect <= set(sd)

    restored = import_reference_state_dict(sd, jax.tree.map(jnp.zeros_like, variables))
    for (pa, a), b in zip(
        jax.tree_util.tree_leaves_with_path(variables), jax.tree.leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))


def test_import_rejects_mismatched_architecture():
    sup, qry, sup_lab = _episode()
    variables = _variables(_flax_model(use_attention=True), sup, qry, sup_lab)
    sd = export_reference_state_dict(variables)

    missing = {k: v for k, v in sd.items() if not k.startswith("attention_model.")}
    with pytest.raises(KeyError, match="in_proj_weight"):
        import_reference_state_dict(missing, variables)

    # stray reference keys the target model has no slot for must be rejected
    no_attn_model = _flax_model(use_attention=False)
    no_attn = _variables(no_attn_model, sup, qry, sup_lab)
    sd_no = export_reference_state_dict(no_attn)
    sd_no["attention_model.encoder_layer.norm1.weight"] = np.ones(64, np.float32)
    with pytest.raises(ValueError, match="no slot"):
        import_reference_state_dict(sd_no, no_attn)

    # wrong-architecture weights surface as a shape error, not silent corruption
    with pytest.raises(ValueError, match="shape mismatch"):
        import_reference_state_dict(sd, no_attn)


# ---------------------------------------------------------------------------
# head-to-head against the actual reference torch code
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def reference_net():
    """The real /root/reference ContrastivePrototypicalNetworks, configured to
    match this suite's flax model, in eval mode."""
    torch = pytest.importorskip("torch")
    if not REFERENCE.exists():
        pytest.skip("reference repo not mounted")
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    mm = importlib.import_module("models.main_modules")
    pr = importlib.import_module("models.prototypical")

    exp_cfg = {"encoder_name": "Hybrid"}
    mdl_cfg = {
        "Hybrid": {
            "in_channels": 1, "seq_layers": 1, "seq_type": "RNN",
            "bidirectional": False, "hidden_channels": 64,
            "pool_dim": (3, 3), "out_dim": 64,
        },
        "Attention": {"embed_dim": 64, "num_heads": 1, "ffn_dim": 256, "dropout": 0.1},
        "Projection": {"input_dim": 256, "hidden_dim": 128, "output_dim": 256},
    }
    torch.manual_seed(7)
    net = pr.ContrastivePrototypicalNetworks(
        backbone=mm.EncoderModule(exp_cfg, mdl_cfg),
        attention_model=mm.SelfAttention(mdl_cfg),
        projection_head=mm.ProjectionHead(mdl_cfg),
    )
    # non-trivial BN running stats (fresh init would make stat mapping a no-op)
    gen = np.random.default_rng(11)
    with torch.no_grad():
        for name, buf in net.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.tensor(gen.normal(0.0, 0.05, buf.shape).astype(np.float32)))
            elif name.endswith("running_var"):
                buf.copy_(torch.tensor(gen.uniform(0.8, 1.2, buf.shape).astype(np.float32)))
    net.eval()
    return net


def _torch_scores(net, sup, qry, sup_lab):
    import torch

    with torch.no_grad():
        sup_t = torch.tensor(sup)[:, :, None]  # [S, V, 1, F, T]
        qry_t = torch.tensor(qry)[:, :, None]
        net.process_support_set(
            [sup_t[:, v] for v in range(V)], torch.tensor(sup_lab).long()
        )
        return net.forward([qry_t[:, v] for v in range(V)], inference=True).numpy()


def test_import_from_actual_reference_checkpoint(reference_net, tmp_path):
    """reference state_dict -> our variables: composed eval scores match."""
    import torch

    sup, qry, sup_lab = _episode(1)
    # persist + reload through the actual model.pt format
    pt = tmp_path / "model.pt"
    torch.save(reference_net.state_dict(), pt)
    sd = torch.load(pt, map_location="cpu", weights_only=True)

    model = _flax_model()
    variables = import_reference_state_dict(sd, _variables(model, sup, qry, sup_lab))
    out = model.apply(
        variables, jnp.asarray(sup), jnp.asarray(qry), jnp.asarray(sup_lab),
        N_WAY, train=False,
    )
    ref_scores = _torch_scores(reference_net, sup, qry, sup_lab)
    np.testing.assert_allclose(np.asarray(out.scores), ref_scores, rtol=1e-4, atol=1e-4)


def test_convert_checkpoint_cli_round_trip(reference_net, tmp_path):
    """model.pt -> model.ckpt -> model.pt through the converter CLI."""
    import json

    import torch

    from audio_few_shot_learning_tpu.cli import convert_checkpoint
    from audio_few_shot_learning_tpu.train import checkpoint as ckpt

    e_json = tmp_path / "exp.json"
    m_json = tmp_path / "model.json"
    e_json.write_text(json.dumps({"encoder_name": "Hybrid", "use_attention": True}))
    m_json.write_text(json.dumps({}))
    pt_in = tmp_path / "model.pt"
    torch.save(reference_net.state_dict(), pt_in)

    ck = tmp_path / "model.ckpt"
    convert_checkpoint.main(
        ["-e", str(e_json), "-m", str(m_json), "--input", str(pt_in), "--output", str(ck)]
    )
    assert ck.exists()

    # the .ckpt loads against a fresh template and matches the direct import
    sup, qry, sup_lab = _episode(4)
    model = _flax_model()
    template = _variables(model, sup, qry, sup_lab)
    params, bstats = ckpt.load_model(str(ck), template["params"], template["batch_stats"])
    direct = import_reference_state_dict(reference_net.state_dict(), template)
    for (pa, a), b in zip(
        jax.tree_util.tree_leaves_with_path({"params": params, "batch_stats": bstats}),
        jax.tree.leaves(direct),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))

    # and back out to torch: identical tensors to the original state_dict
    pt_out = tmp_path / "back.pt"
    convert_checkpoint.main(
        ["-e", str(e_json), "-m", str(m_json), "--input", str(ck), "--output", str(pt_out)]
    )
    back = torch.load(pt_out, map_location="cpu", weights_only=True)
    orig = reference_net.state_dict()
    assert set(back) == set(orig)
    for k in orig:
        if k.startswith(("projection_head.ln1.", "projection_head.ln2.")) or k.endswith(
            "num_batches_tracked"
        ):
            continue  # dead reference state, re-emitted at init values
        np.testing.assert_allclose(
            back[k].numpy(), orig[k].numpy(), rtol=0, atol=0, err_msg=k
        )


def test_export_loads_into_reference_strict(reference_net):
    """our variables -> reference load_state_dict(strict=True): scores match."""
    import copy

    import torch

    # load into a deepcopy — mutating the module-scoped fixture would feed a
    # scrambled oracle to any test that happens to run after this one
    net = copy.deepcopy(reference_net)
    sup, qry, sup_lab = _episode(2)
    model = _flax_model()
    variables = _scramble(_variables(model, sup, qry, sup_lab), seed=5)
    sd = export_reference_state_dict(variables)
    net.load_state_dict(
        {k: torch.tensor(np.asarray(v)) for k, v in sd.items()}, strict=True
    )
    net.eval()

    out = model.apply(
        variables, jnp.asarray(sup), jnp.asarray(qry), jnp.asarray(sup_lab),
        N_WAY, train=False,
    )
    ref_scores = _torch_scores(net, sup, qry, sup_lab)
    np.testing.assert_allclose(np.asarray(out.scores), ref_scores, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# CNN-encoder family: flattened-head geometry with F'*T' > 1
# ---------------------------------------------------------------------------

# 36x40 features with pool (2,2): four floor-div-2 stages give F'=2, T'=2,
# so the flattened head input is (F',T',C)-ordered here but (C,F',T')-ordered
# in torch — the permutation case the Hybrid tests never reach (F'==1 and the
# head input is the RNN output). ADVICE r04: this geometry silently produced
# wrong conversions before the (m, C) transpose landed.
CNN_F, CNN_T, CNN_POOL = 36, 40, (2, 2)


def _flax_cnn_model():
    exp = ExperimentConfig.from_dict(
        {"encoder_name": "CNN", "use_attention": True, "use_contrastive": True}
    )
    exp = dataclasses.replace(exp, tpu=TPUConfig(compute_dtype="float32"))
    mdl = ModelConfig.from_dict({"CNN": {"pool_dim": list(CNN_POOL)}})
    return FewShotEpisodeModel(exp=exp, mdl=mdl)


def _cnn_episode(seed=0):
    rng = np.random.default_rng(seed)
    sup = rng.standard_normal((N_WAY * K_SHOT, V, CNN_F, CNN_T)).astype(np.float32)
    qry = rng.standard_normal((N_WAY * K_QUERY, V, CNN_F, CNN_T)).astype(np.float32)
    return sup, qry, np.repeat(np.arange(N_WAY), K_SHOT)


@pytest.fixture(scope="module")
def reference_cnn_net():
    """The real reference StandardCNN (constructed directly — the reference's
    'CNN' factory path is broken, main_modules.py:265-268 omits trial_shape)
    inside ContrastivePrototypicalNetworks, at the F'=T'=2 geometry."""
    torch = pytest.importorskip("torch")
    if not REFERENCE.exists():
        pytest.skip("reference repo not mounted")
    if str(REFERENCE) not in sys.path:
        sys.path.insert(0, str(REFERENCE))
    mm = importlib.import_module("models.main_modules")
    pr = importlib.import_module("models.prototypical")

    class _Backbone(torch.nn.Module):
        """EncoderModule stand-in (its __init__ routes through the broken
        factory for 'CNN'); same ``backbone.encoder.*`` state_dict keys and
        the same list-of-views forward (main_modules.py:18-23)."""

        def __init__(self, encoder):
            super().__init__()
            self.encoder = encoder

        def forward(self, spec_list):
            return [self.encoder(x) for x in spec_list]

    mdl_cfg = {
        "Attention": {"embed_dim": 64, "num_heads": 1, "ffn_dim": 256, "dropout": 0.1},
        "Projection": {"input_dim": 256, "hidden_dim": 128, "output_dim": 256},
    }
    torch.manual_seed(13)
    cnn = mm.StandardCNN(
        in_channels=1,
        trial_shape=(1, 1, CNN_F, CNN_T),
        hidden_channels=64,
        pool_dim=CNN_POOL,
        out_dim=64,
    )
    net = pr.ContrastivePrototypicalNetworks(
        backbone=_Backbone(cnn),
        attention_model=mm.SelfAttention(mdl_cfg),
        projection_head=mm.ProjectionHead(mdl_cfg),
    )
    gen = np.random.default_rng(17)
    with torch.no_grad():
        for name, buf in net.named_buffers():
            if name.endswith("running_mean"):
                buf.copy_(torch.tensor(gen.normal(0.0, 0.05, buf.shape).astype(np.float32)))
            elif name.endswith("running_var"):
                buf.copy_(torch.tensor(gen.uniform(0.8, 1.2, buf.shape).astype(np.float32)))
    net.eval()
    return net


def test_cnn_import_from_actual_reference(reference_cnn_net):
    """reference CNN state_dict -> our variables at F'*T'=4: composed eval
    scores match the torch model (pins the flattened-head permutation)."""
    sup, qry, sup_lab = _cnn_episode(1)
    model = _flax_cnn_model()
    template = _variables(model, sup, qry, sup_lab)
    # the head width must actually exercise the permuted case
    assert np.shape(
        template["params"]["backbone"]["_LogitsHead_0"]["Dense_0"]["kernel"]
    )[0] == 4 * 64
    variables = import_reference_state_dict(reference_cnn_net.state_dict(), template)
    out = model.apply(
        variables, jnp.asarray(sup), jnp.asarray(qry), jnp.asarray(sup_lab),
        N_WAY, train=False,
    )
    ref_scores = _torch_scores(reference_cnn_net, sup, qry, sup_lab)
    np.testing.assert_allclose(np.asarray(out.scores), ref_scores, rtol=1e-4, atol=1e-4)


def test_cnn_export_loads_into_reference_strict(reference_cnn_net):
    """our CNN variables -> reference load_state_dict(strict=True): scores
    match; also pins the pure round-trip at the permuted geometry."""
    import copy

    import torch

    net = copy.deepcopy(reference_cnn_net)
    sup, qry, sup_lab = _cnn_episode(2)
    model = _flax_cnn_model()
    variables = _scramble(_variables(model, sup, qry, sup_lab), seed=9)
    sd = export_reference_state_dict(variables)
    net.load_state_dict(
        {k: torch.tensor(np.asarray(v)) for k, v in sd.items()}, strict=True
    )
    net.eval()

    out = model.apply(
        variables, jnp.asarray(sup), jnp.asarray(qry), jnp.asarray(sup_lab),
        N_WAY, train=False,
    )
    ref_scores = _torch_scores(net, sup, qry, sup_lab)
    np.testing.assert_allclose(np.asarray(out.scores), ref_scores, rtol=1e-4, atol=1e-4)

    restored = import_reference_state_dict(sd, jax.tree.map(jnp.zeros_like, variables))
    for (pa, a), b in zip(
        jax.tree_util.tree_leaves_with_path(variables), jax.tree.leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))
