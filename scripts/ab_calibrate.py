"""Calibrate the A/B synthetic-dataset difficulty (VERDICT r04 weak #1):
sweep band_gain over a cheap ours-arm run per gain and report test accuracy,
so the head-to-head regime can be pinned where both arms land ~0.5-0.7
(well above the 0.2 chance floor, below saturation). Rows are NOT appended
to experiments/ab_vs_reference/results.jsonl — this is calibration only.

    python scripts/ab_calibrate.py --gains 0.8 1.2 1.6 2.0 [--loss cpl]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

spec = importlib.util.spec_from_file_location(
    "ab_vs_reference", REPO / "scripts" / "ab_vs_reference.py"
)
ab = importlib.util.module_from_spec(spec)
spec.loader.exec_module(ab)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gains", type=float, nargs="+", default=[0.8, 1.2, 1.6, 2.0])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--tasks", type=int, default=16)
    ap.add_argument("--test-tasks", type=int, default=150)
    ap.add_argument("--loss", choices=["cpl", "plain"], default="cpl")
    ap.add_argument("--multiseg", action="store_true")
    args = ap.parse_args()

    out = []
    for gain in args.gains:
        ab.BAND_GAIN = gain
        ab.MULTISEG = args.multiseg
        root = ab.make_dataset()
        row = ab.run_ours_arm(root, args.seed, args.epochs, args.tasks,
                              args.test_tasks, loss=args.loss)
        row["band_gain"] = gain
        out.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"sweep": [(r["band_gain"], r["test_acc"]) for r in out]}))


if __name__ == "__main__":
    main()
