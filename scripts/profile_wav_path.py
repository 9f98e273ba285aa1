"""Wav-path step anatomy (VERDICT r01 item 6): per-transform leave-one-out
ablation of the on-device WaveAugment chain + mel inside the REAL train step,
the way BASELINE.md's round-3 anatomy attacked the spec path.

    python scripts/profile_wav_path.py            # real TPU, ~10-15 min

For each variant, builds the flagship wav trainer (Hybrid + attention + CPL,
5w5s5q, aug_num=3 -> 4 views) with one transform's probability forced to 0
(skipped at trace time, ops/waveaugment.py:334-338), measures train_epoch
episodes/sec, and prints a table of eps/s + the implied per-episode cost of
each transform. Variants:

  full        the benchmarked wav configuration (all default probabilities)
  -<name>     leave-one-out: that transform traced out
  chain-off   every probability 0: sampler + mel + model only (aug-free roof)

Writes the table to stdout as markdown (paste into BASELINE.md).
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Transform-name -> the raw-dict probability key that traces it out
# (defaults from ops/waveaugment.py apply_once; timeinversion/timestretch
# default to 0 already and are not in the benchmarked chain).
PROB_KEYS = {
    "lowpass": "lowpass_p",
    "pitchshift": "pitchshift_p",
    "shift": "shift_p",
    "gain": "gain_p",
    "noise": "noise_p",
    "highpass": "highpass_p",
    "bandstop": "bandstop_p",
    "spliceout": "spliceout_p",
    "timemasking": "timemasking_p",
}


def make_wav_trainer(raw_overrides):
    from bench import make_trainer, make_wav_store

    tr = make_trainer(1, wav=True, store=make_wav_store())
    if raw_overrides:
        exp = tr.exp
        wa = dataclasses.replace(
            exp.waveaug_params, raw={**exp.waveaug_params.raw, **raw_overrides}
        )
        exp = dataclasses.replace(exp, waveaug_params=wa)
        from audio_few_shot_learning_tpu.train.engine import Trainer

        tr = Trainer(exp, tr.mdl, tr.train_store,
                     val_store=tr.val_store, test_store=tr.test_store)
    return tr


def bench_variant(raw_overrides, repeats=2):
    tr = make_wav_trainer(raw_overrides)
    tr.train_epoch()  # compile + warm
    best = 0.0
    for _ in range(repeats):
        m = tr.train_epoch()
        best = max(best, m["episodes_per_sec"])
    return best


def main():
    import jax

    print(f"backend={jax.default_backend()}", flush=True)
    rows = []

    t0 = time.time()
    full = bench_variant(None)
    rows.append(("full", full))
    print(f"full: {full:.2f} eps/s  [{time.time()-t0:.0f}s]", flush=True)

    # opt-in lever: LowPass folded into the shared spectrum group (saves one
    # rfft/irfft pair; documented reorder deviation, PARITY.md)
    t0 = time.time()
    fused = bench_variant({"fuse_lowpass": True})
    rows.append(("+fuse_lowpass", fused))
    print(f"+fuse_lowpass: {fused:.2f} eps/s  [{time.time()-t0:.0f}s]", flush=True)

    for name, pkey in PROB_KEYS.items():
        t0 = time.time()
        eps = bench_variant({pkey: 0.0})
        rows.append((f"-{name}", eps))
        print(f"-{name}: {eps:.2f} eps/s  [{time.time()-t0:.0f}s]", flush=True)

    t0 = time.time()
    off = bench_variant({k: 0.0 for k in PROB_KEYS.values()})
    rows.append(("chain-off", off))
    print(f"chain-off: {off:.2f} eps/s  [{time.time()-t0:.0f}s]", flush=True)

    print("\n| variant | eps/s | ms/episode | transform cost ms |")
    print("|---|---|---|---|")
    base_ms = 1000.0 / full
    for name, eps in rows:
        ms = 1000.0 / eps
        # leave-one-out: removing the transform saves (base - this) ms
        cost = base_ms - ms if name.startswith("-") else float("nan")
        cost_s = f"{cost:.1f}" if cost == cost else "—"
        print(f"| {name} | {eps:.2f} | {ms:.1f} | {cost_s} |")


if __name__ == "__main__":
    main()
