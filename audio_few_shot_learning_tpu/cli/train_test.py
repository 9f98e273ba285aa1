"""Training/testing CLI — drop-in for the reference entry point:

    python -m audio_few_shot_learning_tpu.cli.train_test \
        -e experiment_config.json -m model_config.json

Accepts the exact JSON schemas of reference src/train_test.py:18-32
(README.md:73-197, 382-429). Extra optional flags cover what the reference
hardcodes: --data-root (was '/data', src/train_test.py:35), --runs (was 5,
src/train_test.py:103), --resume (new capability).
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "-e", "--experiment_config", help="Path to Experiment configuration file.", required=True
    )
    parser.add_argument("-m", "--model_config", help="Path to model_params file", required=True)
    parser.add_argument("--data-root", default=None, help="Dataset root (default: config/data_root)")
    parser.add_argument("--experiments-root", default="experiments")
    parser.add_argument("--runs", type=int, default=None, help="Override number of repeated runs")
    parser.add_argument("--resume", action="store_true", help="Resume interrupted runs")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    from audio_few_shot_learning_tpu.config import load_configs

    exp, mdl = load_configs(args.experiment_config, args.model_config)

    # Honor the config's `device` key (reference semantics: 'cpu' or
    # 'cuda:<n>', src/train_test.py:40-45) BEFORE any backend init: a 'cpu'
    # run must not touch the TPU plugin at all (whose init hangs hard when
    # the tunnel is down). Any non-cpu value keeps the default backend.
    if exp.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    # Multi-host (DCN) launch detection must precede any backend query; a
    # single-host run is a no-op here (parallel/mesh.py).
    from audio_few_shot_learning_tpu.parallel.mesh import maybe_initialize_distributed

    maybe_initialize_distributed()
    if args.data_root:
        import dataclasses

        exp = dataclasses.replace(exp, data_root=args.data_root)

    from audio_few_shot_learning_tpu.train.experiment import run_experiment

    results = run_experiment(
        exp,
        mdl,
        experiments_root=args.experiments_root,
        resume=args.resume,
        num_runs=args.runs,
    )
    return results


if __name__ == "__main__":
    main()
