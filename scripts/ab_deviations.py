"""A/B bounds for the two riskiest documented deviations (VERDICT r02 item 4).

(a) BatchNorm batch-stat granularity: fused E*V*(S+Q) batch (our default)
    vs per-(episode, view, support|query) groups (the reference's per-view
    Python loop, models/main_modules.py:18-23) — arm knob
    ``tpu.bn_per_view_group``.
(b) Pitch shift: clip/zero-pad resample (our default) vs a
    duration-preserving phase-vocoder stretch+resample emulating
    torch_audiomentations' PitchShift — arm knob
    ``waveaug_params.pitchshift_mode = "pv"``.
(c) LowPass fusion: reference chain order (lowpass BEFORE the colored-noise
    addition, own FFT pair) vs ``waveaug_params.fuse_lowpass`` (lowpass mask
    joins the shared noise/hp/bs spectrum group, so added noise gets
    lowpassed too — the throughput knob that crosses the 20 eps/s wav
    target, BASELINE.md driver round 4).

Each experiment trains both arms from identical inits, episode streams and
eval episodes over N seeds (the two arms of a seed share every PRNG draw, so
per-seed accuracy deltas are PAIRED and cancel init/sampling variance); the
deviation is "bounded" if the mean paired delta is within 2 SEM, and the
report states the minimum detectable effect that implies.

Run:  python scripts/ab_deviations.py [--seeds 3] [--epochs 10] [--cpu]
      [--experiment bn|pitch|all] [--out PARITY_AB.md]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_spec_exp(seed: int, bn_grouped: bool, epochs: int, light: bool = False):
    from audio_few_shot_learning_tpu.config import ExperimentConfig, ModelConfig

    # light mode: CPU-feasible variant for when the TPU tunnel is down. The
    # BN-granularity deviation lives in the conv encoder's BN layers and only
    # needs V>1 views; the flagship's attention/CPL/Hybrid extras add realism
    # but ~20x CPU cost (one full-scale epoch exceeded 25 min on this 1-core
    # box). Feature dims shrink with the dataset (48x60, see main()).
    exp = ExperimentConfig.from_dict({
        "dataset_name": "ab_spec", "data_root": "/tmp",
        "encoder_name": "CNN" if light else "Hybrid",
        "use_attention": not light, "use_contrastive": not light,
        "n_way_train": 5, "n_way_validation": 4, "n_way_test": 4,
        "n_shot_train": 5, "n_shot_validation": 5, "n_shot_test": 5,
        "n_query_train": 5, "n_query_validation": 5, "n_query_test": 5,
        "n_training_tasks": 10 if light else 20, "n_testing_tasks": 200,
        "lr": 1e-3, "num_epochs": epochs, "patience": epochs + 1,
        "train_query_augmentations": True,
        "specaug_params": {"use": True, "mask_param": 10, "W": 10,
                           "num_mask": 1, "mask_value": 0.0, "p": 0.3},
        "loss": {"l_param": 1.0,
                 "cpl": {"use": not light, "m_param": 3, "t_param": 6.0}},
        "tpu": {"episode_batch": 1, "eval_episode_batch": 8, "mesh_shape": 1,
                "seed": seed, "num_runs": 1, "bn_per_view_group": bn_grouped},
    })
    mdl = ModelConfig.from_dict(
        {"CNN": {"pool_dim": [2, 2], "hidden_channels": 32, "out_dim": 48},
         "Projection": {"input_dim": 48, "hidden_dim": 48, "output_dim": 48}}
        if light else {}
    )
    return exp, mdl


def build_wav_exp(seed: int, pv: bool, epochs: int, light: bool = False):
    from audio_few_shot_learning_tpu.config import ExperimentConfig, ModelConfig

    exp = ExperimentConfig.from_dict({
        "dataset_name": "ab_wav", "data_root": "/tmp",
        "encoder_name": "CNN", "use_attention": False, "use_contrastive": False,
        "input_type": "wav",
        "n_way_train": 4, "n_way_validation": 3, "n_way_test": 3,
        "n_shot_train": 3, "n_shot_validation": 3, "n_shot_test": 3,
        "n_query_train": 3, "n_query_validation": 3, "n_query_test": 3,
        "n_training_tasks": 10 if light else 20, "n_testing_tasks": 200,
        "lr": 2e-3, "num_epochs": epochs, "patience": epochs + 1,
        "train_query_augmentations": False,
        "specaug_params": {"use": False},
        "waveaug_params": {
            "use": True, "aug_num": 2,
            "pitchshift_mode": "pv" if pv else "resample",
            # pitch shift dominant; keep a light rest-of-chain for realism
            "pitchshift_p": 0.8,
            "pitchshift_min_transpose_semitones": -3,
            "pitchshift_max_transpose_semitones": 3,
            "min_gain_in_db": -4, "max_gain_in_db": 4, "gain_p": 0.3,
            "min_snr_in_db": 15, "max_snr_in_db": 25,
            "noise_min_f_decay": -1, "noise_max_f_decay": 1, "noise_p": 0.3,
            "lowpass_p": 0.0, "highpass_p": 0.0, "bandstop_p": 0.0,
            "shift_p": 0.3, "shift_min_shift": -0.2, "shift_max_shift": 0.2,
            "timeinversion_p": 0, "spliceout_p": 0, "timestretch_p": 0,
            "timemasking_p": 0,
        },
        "tpu": {"episode_batch": 1, "eval_episode_batch": 4, "mesh_shape": 1,
                "seed": seed, "num_runs": 1},
    })
    mdl = ModelConfig.from_dict(
        {"CNN": {"pool_dim": [2, 2], "hidden_channels": 16, "out_dim": 32},
         "Projection": {"input_dim": 32, "hidden_dim": 32, "output_dim": 32}}
    )
    return exp, mdl


def build_lowpass_exp(seed: int, fused: bool, epochs: int, light: bool = False):
    """Arms differ only in ``waveaug_params.fuse_lowpass``. The deviation
    only bites when lowpass AND the noise group co-apply to an example (the
    fused order lowpasses the added noise; the reference order adds noise to
    the already-lowpassed signal and its SNR references the lowpassed RMS),
    so lowpass/noise probabilities are set high enough to co-occur often."""
    from audio_few_shot_learning_tpu.config import ExperimentConfig, ModelConfig

    exp = ExperimentConfig.from_dict({
        "dataset_name": "ab_wav", "data_root": "/tmp",
        "encoder_name": "CNN", "use_attention": False, "use_contrastive": False,
        "input_type": "wav",
        "n_way_train": 4, "n_way_validation": 3, "n_way_test": 3,
        "n_shot_train": 3, "n_shot_validation": 3, "n_shot_test": 3,
        "n_query_train": 3, "n_query_validation": 3, "n_query_test": 3,
        "n_training_tasks": 10 if light else 20, "n_testing_tasks": 200,
        "lr": 2e-3, "num_epochs": epochs, "patience": epochs + 1,
        "train_query_augmentations": False,
        "specaug_params": {"use": False},
        "waveaug_params": {
            "use": True, "aug_num": 2,
            "fuse_lowpass": fused,
            "lowpass_p": 0.6,
            "min_snr_in_db": 10, "max_snr_in_db": 20,
            "noise_min_f_decay": -1, "noise_max_f_decay": 1, "noise_p": 0.6,
            "highpass_p": 0.3, "bandstop_p": 0.3,
            "min_gain_in_db": -4, "max_gain_in_db": 4, "gain_p": 0.3,
            "pitchshift_p": 0.0, "shift_p": 0.0, "timeinversion_p": 0,
            "spliceout_p": 0, "timestretch_p": 0, "timemasking_p": 0,
        },
        "tpu": {"episode_batch": 1, "eval_episode_batch": 4, "mesh_shape": 1,
                "seed": seed, "num_runs": 1},
    })
    mdl = ModelConfig.from_dict(
        {"CNN": {"pool_dim": [2, 2], "hidden_channels": 16, "out_dim": 32},
         "Projection": {"input_dim": 32, "hidden_dim": 32, "output_dim": 32}}
    )
    return exp, mdl


CACHE = Path("/tmp/ab_deviations_cache.jsonl")


def _cache_key(experiment: str, arm: str, seed: int, epochs: int, light: bool) -> str:
    return f"{experiment}/{arm}/seed{seed}/ep{epochs}/{'light' if light else 'full'}"


def _cache_load() -> dict:
    if not CACHE.exists():
        return {}
    return {row["key"]: row["result"] for row in map(json.loads, open(CACHE))}


def run_arm(exp, mdl, root, key=None, cache=None):
    """Train one arm; completed runs persist to a JSONL cache keyed on
    (experiment, arm, seed, epochs, scale) so a killed background process
    resumes instead of re-paying finished runs."""
    if cache is not None and key in cache:
        return {**cache[key], "cached": True}

    from audio_few_shot_learning_tpu.data.datasets import MetaAudioDataset
    from audio_few_shot_learning_tpu.train.engine import Trainer

    load = lambda s: MetaAudioDataset(exp, root, s).to_packed_store()
    tr = Trainer(exp, mdl, load("train"), load("valid"), load("test"))
    t0 = time.perf_counter()
    for _ in range(exp.num_epochs):
        tr.train_epoch()
    val_mean, _ = tr.validate()
    test = tr.test()
    result = {
        "val_acc": round(float(val_mean), 4),
        "test_acc": round(float(test["mean_accuracy"]), 4),
        "train_seconds": round(time.perf_counter() - t0, 1),
    }
    if key is not None:
        with open(CACHE, "a") as f:
            f.write(json.dumps({"key": key, "result": result}) + "\n")
    return result


def summarize(name, arm_names, results, out_lines):
    """Paired analysis: both arms of a seed share params init, episode
    stream, and eval episodes (identical PRNG seed; the knob only alters the
    arm-specific computation), so the per-seed DELTA cancels init/sampling
    variance. The minimum detectable effect is 2*std(deltas)/sqrt(n) — report
    it so 'within noise' has a stated power (VERDICT r03 item 4)."""
    import numpy as np

    line = [f"### {name}", "", "| arm | seed accs (test) | mean ± std |", "|---|---|---|"]
    means = {}
    for arm in arm_names:
        accs = [r["test_acc"] for r in results[arm]]
        means[arm] = (float(np.mean(accs)), float(np.std(accs)))
        line.append(
            f"| {arm} | {', '.join(f'{a:.3f}' for a in accs)} | "
            f"{means[arm][0]:.3f} ± {means[arm][1]:.3f} |"
        )
    a0, a1 = arm_names
    deltas = np.array(
        [r0["test_acc"] - r1["test_acc"] for r0, r1 in zip(results[a0], results[a1])]
    )
    n = len(deltas)
    d_mean = float(np.mean(deltas))
    d_std = float(np.std(deltas, ddof=1)) if n > 1 else float("nan")
    mde = 2.0 * d_std / np.sqrt(n) if n > 1 else float("nan")
    verdict = "WITHIN paired noise" if abs(d_mean) <= mde else "EXCEEDS paired noise (2 SEM)"
    line += [
        "",
        f"Paired per-seed deltas ({a0} − {a1}): "
        f"{', '.join(f'{d:+.3f}' for d in deltas)} → mean {d_mean:+.4f}, "
        f"std {d_std:.4f}, minimum detectable effect (2·SEM) {mde:.4f} "
        f"-> **{verdict}**.",
        "",
    ]
    out_lines += line
    return {
        "paired_delta_mean": round(d_mean, 4),
        "paired_delta_std": round(d_std, 4) if d_std == d_std else None,
        "min_detectable_effect": round(mde, 4) if mde == mde else None,
        "n_seeds": n,
        "verdict": verdict,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--experiment", choices=["bn", "pitch", "lowpass", "all"], default="all")
    ap.add_argument("--light", action="store_true",
                    help="CPU-feasible scale: CNN encoder, 48x60 features, "
                         "10 tasks/epoch (deviation semantics unchanged)")
    ap.add_argument("--out", default="PARITY_AB.md")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from audio_few_shot_learning_tpu.data.datasets import (
        make_synthetic_dataset,
        make_synthetic_wav_dataset,
    )

    backend = jax.default_backend()
    cache = _cache_load()
    if cache:
        print(f"resuming: {len(cache)} completed runs in {CACHE}", flush=True)
    stamp = time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime())
    out_lines = [
        "# Deviation A/B bounds (synthetic data)",
        "",
        f"Generated by scripts/ab_deviations.py — backend **{backend}**, "
        f"{args.seeds} seeds x {args.epochs} epochs{' (light scale)' if args.light else ''}, {stamp}.",
        "Arms share the dataset; the two arms of a seed share params init, "
        "episode stream and eval episodes (same PRNG seed; only the knob "
        "differs), so per-seed deltas are paired.",
        "",
    ]
    summary = {}

    if args.experiment in ("bn", "all"):
        root = make_synthetic_dataset(
            "/tmp/ab_spec", n_classes=14, items_per_class=12,
            n_mels=48 if args.light else 128,
            n_frames=60 if args.light else 157,
            split_fractions=(6, 4, 4), seed=100,
            # mid-range difficulty: the default gain 4.0 saturates test acc at
            # 0.94-0.97 where a ceiling clips arm deltas (PARITY_AB r03 run)
            band_gain=0.55,
        )
        results = {"bn_fused": [], "bn_per_view_group": []}
        for seed in range(args.seeds):
            for arm, grouped in (("bn_fused", False), ("bn_per_view_group", True)):
                exp, mdl = build_spec_exp(seed, grouped, args.epochs, args.light)
                r = run_arm(exp, mdl, root,
                            _cache_key("bn", arm, seed, args.epochs, args.light), cache)
                results[arm].append(r)
                print(f"[bn] seed={seed} arm={arm}: {r}", flush=True)
        summary["bn"] = summarize(
            "BatchNorm stats: fused batch vs per-(episode,view,support|query) groups "
            "(PARITY.md deviation; reference main_modules.py:18-23)",
            ("bn_fused", "bn_per_view_group"), results, out_lines,
        )

    if args.experiment in ("pitch", "all"):
        root = make_synthetic_wav_dataset(
            "/tmp/ab_wav", n_classes=10, items_per_class=10, seconds=1.0,
            split_fractions=(4, 3, 3), seed=200,
        )
        results = {"ps_resample": [], "ps_pv": []}
        for seed in range(args.seeds):
            for arm, pv in (("ps_resample", False), ("ps_pv", True)):
                exp, mdl = build_wav_exp(seed, pv, args.epochs, args.light)
                r = run_arm(exp, mdl, root,
                            _cache_key("pitch", arm, seed, args.epochs, args.light), cache)
                results[arm].append(r)
                print(f"[pitch] seed={seed} arm={arm}: {r}", flush=True)
        summary["pitch"] = summarize(
            "Pitch shift: clip/zero-pad resample vs duration-preserving phase vocoder "
            "(PARITY.md deviation; torch_audiomentations PitchShift semantics)",
            ("ps_resample", "ps_pv"), results, out_lines,
        )

    if args.experiment in ("lowpass", "all"):
        root = make_synthetic_wav_dataset(
            "/tmp/ab_wav_lp", n_classes=10, items_per_class=10, seconds=1.0,
            split_fractions=(4, 3, 3), seed=300,
        )
        results = {"lp_reference_order": [], "lp_fused": []}
        for seed in range(args.seeds):
            for arm, fused in (("lp_reference_order", False), ("lp_fused", True)):
                exp, mdl = build_lowpass_exp(seed, fused, args.epochs, args.light)
                r = run_arm(exp, mdl, root,
                            _cache_key("lowpass", arm, seed, args.epochs, args.light), cache)
                results[arm].append(r)
                print(f"[lowpass] seed={seed} arm={arm}: {r}", flush=True)
        summary["lowpass"] = summarize(
            "LowPass fusion: reference chain order (own FFT pair, noise added "
            "after lowpass) vs `waveaug_params.fuse_lowpass` (lowpass joins the "
            "shared spectrum group; the wav-path throughput knob, BASELINE.md "
            "driver round 4)",
            ("lp_reference_order", "lp_fused"), results, out_lines,
        )

    Path(args.out).write_text("\n".join(out_lines))
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
