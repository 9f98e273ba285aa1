"""Convert checkpoints between this framework and the reference torch code.

Two directions (direction inferred from the input filename, override with
``--direction``):

* ``model.pt -> model.ckpt`` — bring a reference-trained
  ``experiments/<folder>/model.pt`` (a torch ``state_dict`` pickle saved by
  callbacks/early_stopping.py:59-70) into this framework; the output loads
  with ``--checkpoint`` in cli/predict.py or as a starting point for
  fine-tuning.
* ``model.ckpt -> model.pt`` — export a checkpoint trained here back to a
  ``state_dict`` the reference's torch model loads with ``strict=True``.

The ``-e/-m`` configs must describe the same architecture the checkpoint was
trained with (encoder_name, use_attention, seq/projection blocks). For the
'CNN' encoder the flattened logits width depends on the input geometry, so
``--feat-shape F T`` must match the training features (the Hybrid encoder's
parameter shapes are T-independent; the default 128x157 is the canonical
5 s / 128-mel geometry).

Usage:
    python -m audio_few_shot_learning_tpu.cli.convert_checkpoint \
        -e experiment_config.json -m model_config.json \
        --input experiments/exp/model.pt --output experiments/exp/model.ckpt
"""

from __future__ import annotations

import argparse
import json
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("-e", "--experiment_config", required=True)
    p.add_argument("-m", "--model_config", required=True)
    p.add_argument("--input", required=True, help="model.pt or model.ckpt")
    p.add_argument("--output", required=True)
    p.add_argument(
        "--direction",
        choices=["from-torch", "to-torch"],
        default=None,
        help="default: from-torch if --input ends with .pt, to-torch otherwise",
    )
    p.add_argument(
        "--feat-shape",
        nargs=2,
        type=int,
        default=(128, 157),
        metavar=("F", "T"),
        help="feature geometry the checkpoint was trained on (default 128 157)",
    )
    return p.parse_args(argv)


def _template(exp_cfg, mdl_cfg, feat_shape):
    """Variables tree (params + batch_stats) for the configured architecture."""
    import jax
    import optax

    from audio_few_shot_learning_tpu.config import ExperimentConfig, ModelConfig
    from audio_few_shot_learning_tpu.train.state import create_train_state

    exp = ExperimentConfig.from_dict(exp_cfg)
    mdl = ModelConfig.from_dict(mdl_cfg)
    # the projection's input width is data-derived here (V fused view tokens x
    # embed_dim with attention) but config-pinned in the reference
    # (main_modules.py:231-240) — recover V from the declared architecture so
    # the template's parameter shapes match the checkpoint's
    v = max(1, mdl.projection.input_dim // mdl.attention.embed_dim) if exp.use_attention else 1
    _, state = create_train_state(
        jax.random.PRNGKey(0), exp, mdl, tuple(feat_shape), optax.sgd(0.0),
        v_support=v, v_query=v,
    )
    return {"params": state.params, "batch_stats": state.batch_stats}


def main(argv=None):
    args = parse_args(argv)
    # conversion is a host-side tool (template init + leaf remapping) — keep it
    # off the accelerator so it runs instantly and without a TPU attached
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass  # backend already initialized (e.g. called in-process after use)
    with open(args.experiment_config) as f:
        exp_cfg = json.load(f)
    with open(args.model_config) as f:
        mdl_cfg = json.load(f)
    direction = args.direction or (
        "from-torch" if args.input.endswith((".pt", ".pth")) else "to-torch"
    )

    from audio_few_shot_learning_tpu.train import checkpoint as ckpt
    from audio_few_shot_learning_tpu.train.torch_interop import (
        export_reference_state_dict,
        import_reference_state_dict,
    )

    variables = _template(exp_cfg, mdl_cfg, args.feat_shape)

    if direction == "from-torch":
        try:
            import torch
        except ImportError:
            sys.exit("convert_checkpoint: reading .pt files requires torch")
        import pickle

        try:
            sd = torch.load(args.input, map_location="cpu", weights_only=True)
        except TypeError:  # older torch without weights_only
            sd = torch.load(args.input, map_location="cpu")
        except pickle.UnpicklingError:
            # a whole nn.Module was pickled (not a state_dict): weights_only
            # refuses it — retry with full unpickling, which runs arbitrary
            # pickle code, so warn loudly
            print(
                "convert_checkpoint: input is not a plain state_dict; "
                "retrying with weights_only=False (executes pickle code — "
                "only do this for checkpoints you trust)",
                file=sys.stderr,
            )
            sd = torch.load(args.input, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):  # a whole module was pickled, not a state_dict
            sd = sd.state_dict()
        import jax

        imported = import_reference_state_dict(sd, variables)
        ckpt.save_model(args.output, imported["params"], imported["batch_stats"])
        n = sum(v.size for v in jax.tree.leaves(imported["params"]))
        print(f"imported {len(sd)} reference tensors -> {args.output} ({n} params)")
    else:
        try:
            import torch
        except ImportError:
            sys.exit("convert_checkpoint: writing .pt files requires torch")
        params, bstats = ckpt.load_model(
            args.input, variables["params"], variables["batch_stats"]
        )
        sd = export_reference_state_dict({"params": params, "batch_stats": bstats})
        torch.save({k: torch.tensor(v) for k, v in sd.items()}, args.output)
        print(f"exported {len(sd)} reference-keyed tensors -> {args.output}")


if __name__ == "__main__":
    main()
