"""Experiment driver: the reference's ``src/train_test.py`` main flow.

Per run (the reference hardcodes 5 repeated runs, src/train_test.py:103-104):
fresh model -> epoch loop with per-epoch validation, early stopping and
best-checkpoint saving (loops/loops.py:124-167) -> reload best -> single- or
multi-segment test (src/train_test.py:159-178). Adds what the reference
lacks: real resume checkpoints, per-epoch metrics logging (JSONL) and an
episodes/sec counter.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional

import jax

import math

from audio_few_shot_learning_tpu.config import ExperimentConfig, ModelConfig
from audio_few_shot_learning_tpu.data.datasets import load_packed_split
from audio_few_shot_learning_tpu.train import checkpoint as ckpt
from audio_few_shot_learning_tpu.train.early_stopping import EarlyStopping
from audio_few_shot_learning_tpu.train.engine import Trainer
from audio_few_shot_learning_tpu.utils import EpisodeThroughput, MetricsLogger


class TrainingDiverged(RuntimeError):
    """Raised when the loss goes non-finite. The reference has no failure
    detection at all (SURVEY.md §5) — NaNs would silently poison the run; here
    the run aborts with a crash checkpoint for postmortem."""


def run_single_training(
    trainer: Trainer,
    results_dir: str,
    run_idx: int = 0,
    log_fn=print,
    resume: bool = False,
) -> Dict:
    """Train one model to early stopping; leaves the best params in
    ``trainer.state`` and returns the training log."""
    exp = trainer.exp
    model_path = os.path.join(results_dir, "model.ckpt")
    resume_path = os.path.join(results_dir, f"resume_run{run_idx}.ckpt")
    metrics_path = os.path.join(results_dir, f"metrics_run{run_idx}.jsonl")
    os.makedirs(results_dir, exist_ok=True)

    start_epoch = 1
    if resume and os.path.exists(resume_path):
        state, key, meta = ckpt.load_resume(resume_path, trainer.state)
        trainer.state = state
        trainer.run_key = key
        start_epoch = meta["epoch"] + 1
        log_fn(f"Resumed run {run_idx} from epoch {meta['epoch']}")

    stopper = EarlyStopping(
        patience=exp.patience,
        verbose=True,
        save_fn=lambda: ckpt.save_model(
            model_path, trainer.state.params, trainer.state.batch_stats
        ),
        trace_func=log_fn,
    )

    history: List[Dict] = []
    metrics_log = MetricsLogger(metrics_path, stdout=False)
    throughput = EpisodeThroughput()
    try:
        for epoch in range(start_epoch, exp.num_epochs + 1):
            log_fn(f"Epoch: {epoch:03}/{exp.num_epochs:03}")
            t_epoch = time.perf_counter()
            train_metrics = trainer.train_epoch()
            eps_per_sec = throughput.update(
                exp.n_training_tasks, time.perf_counter() - t_epoch
            )
            if not math.isfinite(train_metrics["fsl_loss"]):
                crash = os.path.join(results_dir, f"crash_run{run_idx}.ckpt")
                ckpt.save_resume(crash, trainer.state, epoch, trainer.run_key)
                raise TrainingDiverged(
                    f"non-finite loss at epoch {epoch} "
                    f"(metrics={train_metrics}); state saved to {crash}"
                )
            log_fn(
                {
                    "loss": train_metrics["loss"],
                    "fsl_loss": train_metrics["fsl_loss"],
                    "cpl_loss": train_metrics["cpl_loss"],
                }
            )
            val_acc, val_std = trainer.validate()
            row = {
                "epoch": epoch,
                **train_metrics,
                "val_accuracy": val_acc,
                "val_accuracy_std": val_std,
                "episodes_per_sec": eps_per_sec,
            }
            history.append(row)
            metrics_log.log(step=epoch, metrics=row)

            stopper(val_accuracy=val_acc, epoch=epoch)
            ckpt.save_resume(resume_path, trainer.state, epoch, trainer.run_key)
            if stopper.early_stop:
                log_fn("Early Stopping.")
                break
    finally:
        metrics_log.close()

    # reload best checkpoint (loops/loops.py:163-167)
    params, stats = ckpt.load_model(model_path, trainer.state.params, trainer.state.batch_stats)
    trainer.state = trainer.state.replace(params=params, batch_stats=stats)
    return {
        "history": history,
        "best_val_accuracy": stopper.val_accuracy_max,
        # smoothed train-step throughput (excludes validation/checkpoint time)
        "train_episodes_per_sec": throughput.value,
    }


def run_experiment(
    exp: ExperimentConfig,
    mdl: ModelConfig,
    experiments_root: str = "experiments",
    log_fn=print,
    resume: bool = False,
    num_runs: Optional[int] = None,
) -> List[Dict]:
    """Full reference flow: datasets -> num_runs x (train -> test)."""
    dataset_path = os.path.join(exp.data_root, exp.dataset_name)
    log_fn(f"Loading Dataset:::  {exp.dataset_name}, Backend:::  {jax.default_backend()}")

    train_store = load_packed_split(exp, dataset_path, "train")
    val_store = load_packed_split(exp, dataset_path, "valid")
    test_store = load_packed_split(exp, dataset_path, "test")

    results_dir = os.path.join(experiments_root, exp.experiment_folder)
    os.makedirs(results_dir, exist_ok=True)

    # Persist the resolved configs so downstream analysis (aggregate_results
    # --sweep, the notebook-equivalent angle sweeps) can group runs by any
    # hyperparameter without a hand-maintained spreadsheet.
    import dataclasses as _dc

    with open(os.path.join(results_dir, "config.json"), "w") as f:
        json.dump(
            {"experiment": _dc.asdict(exp), "model": _dc.asdict(mdl)}, f, indent=2
        )

    runs = exp.tpu.num_runs if num_runs is None else num_runs
    all_results = []
    for i in range(runs):
        log_fn(f"NEW RUN !!! NUMBER OF RUN ::: {i}")
        trainer = Trainer(
            exp, mdl, train_store, val_store, test_store, seed=exp.tpu.seed + i
        )
        t0 = time.perf_counter()
        train_log = run_single_training(trainer, results_dir, run_idx=i, log_fn=log_fn, resume=resume)
        log_fn("Starting to test")
        msg = trainer.test()
        msg["train_seconds"] = time.perf_counter() - t0
        msg["best_val_accuracy"] = train_log["best_val_accuracy"]
        msg["train_episodes_per_sec"] = train_log["train_episodes_per_sec"]
        log_fn(msg)
        all_results.append(msg)
        with open(os.path.join(results_dir, f"result_run{i}.json"), "w") as f:
            json.dump(msg, f, indent=2)
    return all_results
