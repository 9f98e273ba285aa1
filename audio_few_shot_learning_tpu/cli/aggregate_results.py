"""Aggregate experiment results into summary tables.

The reference's analysis notebook (angle_statistics.ipynb) summarizes runs
from a hand-maintained spreadsheet; here the experiment driver's JSON/JSONL
artifacts are aggregated directly:

    python -m audio_few_shot_learning_tpu.cli.aggregate_results experiments/

Prints per-experiment mean±std test accuracy across repeated runs, best val
accuracy, epochs trained and episodes/sec, and (with --json) a machine-
readable dump.
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path
from typing import Dict, List

import numpy as np


def collect(experiments_root: str) -> Dict[str, Dict]:
    out: Dict[str, Dict] = {}
    root = Path(experiments_root)
    if not root.is_dir():
        return out
    for exp_dir in sorted(p for p in root.iterdir() if p.is_dir()):
        runs: List[Dict] = []
        for rf in sorted(exp_dir.glob("result_run*.json")):
            with open(rf) as f:
                runs.append(json.load(f))
        epochs, eps = [], []
        for mf in sorted(exp_dir.glob("metrics_run*.jsonl")):
            rows = [json.loads(l) for l in open(mf) if l.strip()]
            if rows:
                epochs.append(rows[-1]["epoch"])
                eps.extend(r.get("episodes_per_sec", np.nan) for r in rows)
        if not runs:
            continue
        accs = np.asarray([r["mean_accuracy"] for r in runs])
        out[exp_dir.name] = {
            "runs": len(runs),
            "test_accuracy_mean": float(accs.mean()),
            "test_accuracy_std": float(accs.std()),
            "best_val_accuracy": float(
                np.max([r.get("best_val_accuracy", np.nan) for r in runs])
            ),
            "epochs_trained": epochs,
            "episodes_per_sec_mean": float(np.nanmean(eps)) if eps else None,
        }
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("experiments_root", nargs="?", default="experiments")
    p.add_argument("--json", action="store_true", help="print machine-readable JSON")
    args = p.parse_args(argv)
    summary = collect(args.experiments_root)
    if args.json:
        print(json.dumps(summary, indent=2))
        return summary
    if not summary:
        print(f"No results under {args.experiments_root}")
        return summary
    w = max(len(k) for k in summary) + 2
    print(f"{'experiment':<{w}} {'runs':>4} {'test acc':>18} {'best val':>9} {'eps/s':>8}")
    for name, s in summary.items():
        acc = f"{s['test_accuracy_mean']:.4f} ± {s['test_accuracy_std']:.4f}"
        eps = f"{s['episodes_per_sec_mean']:.1f}" if s["episodes_per_sec_mean"] else "-"
        print(f"{name:<{w}} {s['runs']:>4} {acc:>18} {s['best_val_accuracy']:>9.4f} {eps:>8}")
    return summary


if __name__ == "__main__":
    main()
