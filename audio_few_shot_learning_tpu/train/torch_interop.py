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

CNN logits head: torch flattens the conv output NCHW -> (C, F', T')
(main_modules.py:113 ``x.view(x.size(0), -1)``) while this framework
flattens NHWC -> (F', T', C) (encoders.py StandardCNN). F' and T' keep
their relative order in both, so the flattened axis maps through a single
2-D transpose with ``m = F'*T'``: flax position ``(j, c)`` of an ``(m, C)``
view == torch position ``(c, j)`` of a ``(C, m)`` view. The head BN vectors
and the Linear input axis are permuted accordingly whenever ``m > 1``
(``m`` and ``C`` are both derived from the variables tree). The Hybrid
head's input is the RNN output — a plain feature vector — so it maps 1:1.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import numpy as np

# (collection, flax path, ref key, kind); kind is a str tag or a
# ("head_vector"|"head_matrix", m, C) tuple for the CNN flattened-head permutation
Entry = Tuple[str, Tuple[str, ...], str, Any]

_IGNORED_IMPORT_SUFFIXES = ("num_batches_tracked",)
_IGNORED_IMPORT_PREFIXES = ("projection_head.ln1.", "projection_head.ln2.")


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor, without importing torch
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _to_flax(a: np.ndarray, kind) -> np.ndarray:
    if kind == "conv_kernel":
        return np.transpose(a, (2, 3, 1, 0))
    if kind == "matrix":
        return np.transpose(a)
    if isinstance(kind, tuple):  # CNN flattened-head permutation (see module doc)
        tag, m, c = kind
        if tag == "head_vector":  # torch (C, m) order -> flax (m, C) order
            return np.ascontiguousarray(a.reshape(c, m).T).reshape(-1)
        if tag == "head_matrix":  # torch Linear [out, (C,m)] -> flax [(m,C), out]
            out = a.shape[0]
            return np.ascontiguousarray(
                a.reshape(out, c, m).transpose(2, 1, 0)
            ).reshape(m * c, out)
        raise ValueError(f"unknown kind {kind!r}")
    return a


def _to_torch(a: np.ndarray, kind) -> np.ndarray:
    if kind == "conv_kernel":
        return np.ascontiguousarray(np.transpose(a, (3, 2, 0, 1)))
    if kind == "matrix":
        return np.ascontiguousarray(np.transpose(a))
    if isinstance(kind, tuple):
        tag, m, c = kind
        if tag == "head_vector":  # flax (m, C) order -> torch (C, m) order
            return np.ascontiguousarray(a.reshape(m, c).T).reshape(-1)
        if tag == "head_matrix":  # flax [(m,C), out] -> torch [out, (C,m)]
            out = a.shape[1]
            return np.ascontiguousarray(
                a.reshape(m, c, out).transpose(2, 1, 0)
            ).reshape(out, m * c)
        raise ValueError(f"unknown kind {kind!r}")
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
    # CNN encoder: the head input is the FLATTENED conv map, whose element
    # order differs between torch (C, F', T') and flax (F', T', C) — permute
    # through an (m, C) transpose, m = F'*T' (module doc). m and C come off
    # the tree: C = last conv block's output channels, width = head BN size.
    vec_kind, mat_kind = "vector", "matrix"
    if "seq_layers" not in bk:
        c = int(np.shape(_get(bk, ("ConvEncoder_0", "block3", "kernel")))[-1])
        width = int(np.shape(_get(head, (bn, "scale")))[0])
        if width % c != 0:
            raise ValueError(
                f"CNN head width {width} is not a multiple of the conv "
                f"channel count {c} — corrupt variables tree?"
            )
        m = width // c
        if m > 1:
            vec_kind, mat_kind = ("head_vector", m, c), ("head_matrix", m, c)
    entries += [
        ("params", hp + (bn, "scale"), "backbone.encoder.logits.1.weight", vec_kind),
        ("params", hp + (bn, "bias"), "backbone.encoder.logits.1.bias", vec_kind),
        ("batch_stats", hp + (bn, "mean"), "backbone.encoder.logits.1.running_mean", vec_kind),
        ("batch_stats", hp + (bn, "var"), "backbone.encoder.logits.1.running_var", vec_kind),
        ("params", hp + ("Dense_0", "kernel"), "backbone.encoder.logits.2.weight", mat_kind),
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
