"""Reference-checkpoint interop: torch ``model.pt`` <-> flax variables.

The reference persists its best model as a torch ``state_dict`` pickle
(callbacks/early_stopping.py:59-70, saved to ``experiments/<folder>/model.pt``)
of a ``ContrastivePrototypicalNetworks[WithoutAttention]`` tree
(models/prototypical.py:46-126): ``backbone`` (EncoderModule wrapping
StandardCNN/StandardHybrid, models/main_modules.py:84-198), optional
``attention_model`` (SelfAttention = one TransformerEncoderLayer,
main_modules.py:201-228) and ``projection_head`` (main_modules.py:231-255).

This module maps that tree to/from this framework's flax variables so a
reference user can bring trained checkpoints along (import) or take models
trained here back to the torch code (export):

* ``import_reference_state_dict(sd, variables)`` — reference ``state_dict``
  (torch tensors or numpy arrays) -> new variables with every mapped leaf
  replaced. Strict: every reference weight must land somewhere (unknown keys
  error) and every mapped flax leaf must be fed (missing keys error). The
  only ignored reference keys are documented no-ops: BatchNorm
  ``num_batches_tracked`` (the reference uses fixed momentum, so the counter
  is dead state) and ``projection_head.ln1/ln2`` (LayerNorms the reference
  defines but never applies in forward, main_modules.py:243-246 — see
  PARITY.md).
* ``export_reference_state_dict(variables)`` — inverse, returning a
  ``{reference key: numpy array}`` dict that loads with
  ``load_state_dict(strict=True)`` (the dead keys above are emitted at their
  torch fresh-init values: zero counters, identity LayerNorms).

Layout transforms (torch -> flax): Conv2d kernels ``[O, I, kh, kw]`` ->
``[kh, kw, I, O]``; Linear / recurrent matrices transpose (torch stores
``[out, in]``, flax ``[in, out]``; RNN/GRU/LSTM gate order already matches
torch in ops/rnn.py); BatchNorm/LayerNorm vectors map 1:1
(weight->scale, bias->bias, running_mean/var->batch_stats mean/var).
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import numpy as np

Entry = Tuple[str, Tuple[str, ...], str, str]  # (collection, flax path, ref key, kind)

_IGNORED_IMPORT_SUFFIXES = ("num_batches_tracked",)
_IGNORED_IMPORT_PREFIXES = ("projection_head.ln1.", "projection_head.ln2.")


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor, without importing torch
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _to_flax(a: np.ndarray, kind: str) -> np.ndarray:
    if kind == "conv_kernel":
        return np.transpose(a, (2, 3, 1, 0))
    if kind == "matrix":
        return np.transpose(a)
    return a


def _to_torch(a: np.ndarray, kind: str) -> np.ndarray:
    if kind == "conv_kernel":
        return np.ascontiguousarray(np.transpose(a, (3, 2, 0, 1)))
    if kind == "matrix":
        return np.ascontiguousarray(np.transpose(a))
    return a


def _get(tree, path):
    for k in path:
        tree = tree[k]
    return tree


def _set(tree, path, value):
    for k in path[:-1]:
        tree = tree[k]
    tree[path[-1]] = value


def _mutable(tree):
    if isinstance(tree, dict) or hasattr(tree, "items"):
        return {k: _mutable(v) for k, v in tree.items()}
    return tree


def build_mapping(variables: Dict[str, Any]) -> List[Entry]:
    """Derive the full leaf mapping from the variables tree's structure
    (encoder family, recurrent stack depth/direction, attention presence and
    the BN-granularity A/B knob are all read off the tree, so one mapping
    covers every config)."""
    params = variables["params"]
    entries: List[Entry] = []

    if "relation" in params:
        raise ValueError(
            "relation_head models have no reference counterpart (the reference "
            "reserves the config flag but ships no implementation, "
            "README.md:417-424) — there is no torch checkpoint format to map"
        )

    bk = params["backbone"]
    for name in sorted(bk["ConvEncoder_0"]):
        i = int(name.removeprefix("block"))
        r = f"backbone.encoder.conv_encoder.{i}"
        fp = ("backbone", "ConvEncoder_0", name)
        entries += [
            ("params", fp + ("kernel",), f"{r}.0.weight", "conv_kernel"),
            ("params", fp + ("bias",), f"{r}.0.bias", "vector"),
            ("params", fp + ("BandwidthBatchNorm_0", "scale"), f"{r}.1.weight", "vector"),
            ("params", fp + ("BandwidthBatchNorm_0", "bias"), f"{r}.1.bias", "vector"),
            ("batch_stats", fp + ("BandwidthBatchNorm_0", "mean"), f"{r}.1.running_mean", "vector"),
            ("batch_stats", fp + ("BandwidthBatchNorm_0", "var"), f"{r}.1.running_var", "vector"),
        ]

    if "seq_layers" in bk:  # Hybrid encoder
        for dname in sorted(bk["seq_layers"]):
            layer = int(dname[1 : dname.index("_")])
            suffix = "_reverse" if dname.endswith("_bwd") else ""
            r = "backbone.encoder.seq_layers"
            fp = ("backbone", "seq_layers", dname)
            entries += [
                ("params", fp + ("w_ih",), f"{r}.weight_ih_l{layer}{suffix}", "matrix"),
                ("params", fp + ("w_hh",), f"{r}.weight_hh_l{layer}{suffix}", "matrix"),
                ("params", fp + ("b_ih",), f"{r}.bias_ih_l{layer}{suffix}", "vector"),
                ("params", fp + ("b_hh",), f"{r}.bias_hh_l{layer}{suffix}", "vector"),
            ]

    head = bk["_LogitsHead_0"]
    bn = "bn_grouped" if "bn_grouped" in head else "BatchNorm_0"
    hp = ("backbone", "_LogitsHead_0")
    entries += [
        ("params", hp + (bn, "scale"), "backbone.encoder.logits.1.weight", "vector"),
        ("params", hp + (bn, "bias"), "backbone.encoder.logits.1.bias", "vector"),
        ("batch_stats", hp + (bn, "mean"), "backbone.encoder.logits.1.running_mean", "vector"),
        ("batch_stats", hp + (bn, "var"), "backbone.encoder.logits.1.running_var", "vector"),
        ("params", hp + ("Dense_0", "kernel"), "backbone.encoder.logits.2.weight", "matrix"),
        ("params", hp + ("Dense_0", "bias"), "backbone.encoder.logits.2.bias", "vector"),
    ]

    if "attention" in params:
        r = "attention_model.encoder_layer"
        ap = ("attention",)
        entries += [
            ("params", ap + ("in_proj", "kernel"), f"{r}.self_attn.in_proj_weight", "matrix"),
            ("params", ap + ("in_proj", "bias"), f"{r}.self_attn.in_proj_bias", "vector"),
            ("params", ap + ("out_proj", "kernel"), f"{r}.self_attn.out_proj.weight", "matrix"),
            ("params", ap + ("out_proj", "bias"), f"{r}.self_attn.out_proj.bias", "vector"),
            ("params", ap + ("linear1", "kernel"), f"{r}.linear1.weight", "matrix"),
            ("params", ap + ("linear1", "bias"), f"{r}.linear1.bias", "vector"),
            ("params", ap + ("linear2", "kernel"), f"{r}.linear2.weight", "matrix"),
            ("params", ap + ("linear2", "bias"), f"{r}.linear2.bias", "vector"),
            ("params", ap + ("norm1", "scale"), f"{r}.norm1.weight", "vector"),
            ("params", ap + ("norm1", "bias"), f"{r}.norm1.bias", "vector"),
            ("params", ap + ("norm2", "scale"), f"{r}.norm2.weight", "vector"),
            ("params", ap + ("norm2", "bias"), f"{r}.norm2.bias", "vector"),
        ]

    pp = ("projection",)
    entries += [
        ("params", pp + ("fc1", "kernel"), "projection_head.fc1.weight", "matrix"),
        ("params", pp + ("fc1", "bias"), "projection_head.fc1.bias", "vector"),
        ("params", pp + ("fc2", "kernel"), "projection_head.fc2.weight", "matrix"),
        ("params", pp + ("fc2", "bias"), "projection_head.fc2.bias", "vector"),
    ]
    return entries


def import_reference_state_dict(
    state_dict: Dict[str, Any], variables: Dict[str, Any]
) -> Dict[str, Any]:
    """Map a reference ``model.pt`` state_dict onto ``variables`` (a template
    from ``model.init`` / a Trainer, giving structure + dtypes). Returns a new
    variables dict; the template is not mutated."""
    entries = build_mapping(variables)
    out = _mutable(variables)
    sd = {k: _np(v) for k, v in state_dict.items()}
    used = set()
    for coll, path, rkey, kind in entries:
        if rkey not in sd:
            raise KeyError(f"reference checkpoint is missing '{rkey}' "
                           f"(needed for {coll}/{'/'.join(path)})")
        val = _to_flax(sd[rkey], kind)
        tgt = _get(out[coll], path)
        if tuple(val.shape) != tuple(np.shape(tgt)):
            raise ValueError(
                f"shape mismatch for '{rkey}' -> {coll}/{'/'.join(path)}: "
                f"checkpoint {tuple(val.shape)} vs model {tuple(np.shape(tgt))} — "
                "do the -e/-m configs (and --feat-shape) match the checkpoint's?"
            )
        _set(out[coll], path, np.asarray(val, dtype=np.asarray(tgt).dtype))
        used.add(rkey)
    stray = [
        k
        for k in sd
        if k not in used
        and not k.endswith(_IGNORED_IMPORT_SUFFIXES)
        and not k.startswith(_IGNORED_IMPORT_PREFIXES)
    ]
    if stray:
        raise ValueError(
            f"reference checkpoint has keys this model has no slot for: {sorted(stray)} "
            "— wrong encoder_name / use_attention / seq config?"
        )
    return jax.tree.map(np.asarray, out)


def export_reference_state_dict(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Inverse of :func:`import_reference_state_dict`: emit a reference-keyed
    ``{key: numpy array}`` dict accepted by the torch model's
    ``load_state_dict(strict=True)`` (save with
    ``torch.save({k: torch.from_numpy(v) ...})`` or via cli/convert_checkpoint)."""
    entries = build_mapping(variables)
    sd: Dict[str, np.ndarray] = {}
    for coll, path, rkey, kind in entries:
        leaf = np.asarray(jax.device_get(_get(variables[coll], path)), np.float32)
        sd[rkey] = _to_torch(leaf, kind)
    # dead-but-required-by-strict-load reference state, at torch init values
    for name in sorted(variables["params"]["backbone"]["ConvEncoder_0"]):
        i = int(name.removeprefix("block"))
        sd[f"backbone.encoder.conv_encoder.{i}.1.num_batches_tracked"] = np.zeros((), np.int64)
    sd["backbone.encoder.logits.1.num_batches_tracked"] = np.zeros((), np.int64)
    hidden = sd["projection_head.fc1.weight"].shape[0]
    out_dim = sd["projection_head.fc2.weight"].shape[0]
    for ln, width in (("ln1", hidden), ("ln2", out_dim)):
        sd[f"projection_head.{ln}.weight"] = np.ones(width, np.float32)
        sd[f"projection_head.{ln}.bias"] = np.zeros(width, np.float32)
    return sd
