"""Run the reference's FULL experiment protocol once, end to end
(VERDICT r04 missing #3): 5 runs x 200 epochs x 100 train tasks with
per-epoch 100-task validation, early stopping (patience 70, the ESC-50
flagship value), best-model reload, and a 2000-task test — through the real
CLI entry point (cli/train_test.py), at flagship geometry (Hybrid +
SpecAugment 4 views + attention + CPL, 5w5s5q, 128x157 specs), on a
learnable synthetic dataset. Reference protocol: src/train_test.py:103
(5 runs), README.md:74-124 (200 epochs / 100 tasks / 2000 test tasks).

A second pass runs the multi-segment variant (variable 1-6 segment items,
majority-vote test with max_posterior ties) for --mseg-runs runs.

Records per-run wall-clock/accuracy plus device peak HBM and total script
wall-clock into experiments/full_protocol/summary.json, and prints a
BASELINE.md-ready paragraph.

    python scripts/full_protocol.py [--runs 5] [--mseg-runs 2] [--band-gain 1.2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

N_MELS, N_FRAMES = 128, 157


def experiment_json(band_gain: float, runs: int, mseg: bool) -> dict:
    """Flagship ESC-50-CPL hyperparameters (configs/esc50_cpl.json =
    README's published best values) at the full reference protocol scale."""
    with open(REPO / "configs" / "esc50_cpl.json") as f:
        cfg = json.load(f)
    cfg.update(
        {
            "dataset_name": f"full_protocol{'_mseg' if mseg else ''}_g{band_gain:g}",
            "data_root": "/tmp",
            "num_epochs": 200,
            "n_training_tasks": 100,
            "n_testing_tasks": 2000,
            "multi_segm": mseg,
            "tie_strategy": "max_posterior" if mseg else "",
            "experiment_folder": "full_protocol" + ("_mseg" if mseg else ""),
        }
    )
    cfg["tpu"] = {
        # reference granularity: ONE optimizer step per episode
        "episode_batch": 1,
        "eval_episode_batch": 16,
        "mesh_shape": 1,
        "num_runs": runs,
    }
    return cfg


def make_data(band_gain: float, mseg: bool) -> str:
    from audio_few_shot_learning_tpu.data.datasets import make_synthetic_dataset

    name = f"full_protocol{'_mseg' if mseg else ''}_g{band_gain:g}"
    root = f"/tmp/{name}"
    make_synthetic_dataset(
        root,
        n_classes=20,
        items_per_class=15,
        n_mels=N_MELS,
        n_frames=N_FRAMES,
        multi_segm=mseg,
        max_segments=6,
        split_fractions=(10, 5, 5),
        seed=31,
        band_gain=band_gain,
    )
    return root


def peak_hbm_gb() -> float:
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        return round(stats.get("peak_bytes_in_use", 0) / 1e9, 2)
    except Exception:
        return float("nan")


def run_pass(band_gain: float, runs: int, mseg: bool) -> dict:
    from audio_few_shot_learning_tpu.cli import train_test

    make_data(band_gain, mseg)
    cfg = experiment_json(band_gain, runs, mseg)
    cfg_path = f"/tmp/full_protocol_exp{'_mseg' if mseg else ''}.json"
    with open(cfg_path, "w") as f:
        json.dump(cfg, f, indent=1)

    t0 = time.perf_counter()
    results = train_test.main(
        [
            "-e", cfg_path,
            "-m", str(REPO / "configs" / "model_config_esc50.json"),
            "--experiments-root", str(REPO / "experiments"),
        ]
    )
    wall = time.perf_counter() - t0

    folder = REPO / "experiments" / cfg["experiment_folder"]
    epochs_ran = []
    for i in range(runs):
        mfile = folder / f"metrics_run{i}.jsonl"
        epochs_ran.append(sum(1 for _ in open(mfile)) if mfile.exists() else None)
    return {
        "variant": "multiseg" if mseg else "single",
        "runs": runs,
        "band_gain": band_gain,
        "wall_clock_seconds": round(wall, 1),
        "peak_hbm_gb": peak_hbm_gb(),
        "epochs_ran_per_run": epochs_ran,
        "per_run": [
            {
                "test_acc": round(float(r["mean_accuracy"]), 4),
                "best_val_acc": round(float(r["best_val_accuracy"]), 4),
                "train_seconds": round(float(r["train_seconds"]), 1),
                "train_eps_per_sec": round(float(r["train_episodes_per_sec"]), 1),
            }
            for r in results
        ],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--mseg-runs", type=int, default=2)
    ap.add_argument("--band-gain", type=float, default=1.2)
    args = ap.parse_args()

    t0 = time.perf_counter()
    summary = {"protocol": "5x(200 epochs x 100 tasks) + 2000-task test "
                           "(reference src/train_test.py:103, README.md:74-124)"}
    summary["single_segment"] = run_pass(args.band_gain, args.runs, mseg=False)
    if args.mseg_runs:
        summary["multi_segment"] = run_pass(args.band_gain, args.mseg_runs, mseg=True)
    summary["total_wall_clock_minutes"] = round((time.perf_counter() - t0) / 60, 1)

    out = REPO / "experiments" / "full_protocol" / "summary.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
