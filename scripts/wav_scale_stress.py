"""BirdClef-scale wav streaming stress (VERDICT r04 missing #1 'done' bar):
a synthetic 65k-item raw-audio split with long-tail durations up to 180 s
(the post-pruning BirdClef geometry, offline_preprocessing/folder_sort +
to_var_spec semantics) packed as a host-resident ragged WavHostStore, then
trained end-to-end on the real TPU via the engine's streaming wav path, and
multi-segment-evaluated at the real s_max (~36).

Memory arithmetic this proves in practice:
  padded [I, L_max] (rounds 1-4):  65k x 2.88M x 4 B ~ 750 GB  (impossible)
  ragged float32:                  sum(len) x 4 B    ~ 120 GB  (256 GB host)
  ragged float16 (--dtype f16):    sum(len) x 2 B    ~  60 GB  (this box)

The store is built directly (field-level) so peak RAM is ONE flat array —
the pack-from-files path is exercised at smaller scale by
tests/test_wavhoststore.py; sample content is a tiled noise bank (content
does not affect streaming throughput). Use --scale to shrink durations for
a quick run (e.g. --scale 0.1 -> ~6 GB).

    python scripts/wav_scale_stress.py [--items 65000] [--scale 1.0] \
        [--dtype f16] [--steps 12] [--eval-tasks 3]

Prints one JSON line: pack seconds, store GB, train eps/s, the raw
device_put floor for the same per-step bytes, and s_max=36 eval eps/s.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SR = 16000
SEG_SECONDS = 5


def birdclef_lengths(n_items: int, scale: float, rng: np.random.Generator) -> np.ndarray:
    """Long-tail duration draw: lognormal with median ~18 s clipped to
    [1 s, 180 s] — mean lands ~29 s, matching the ~120 GB-ragged /
    ~750 GB-padded BirdClef arithmetic (VERDICT r04)."""
    secs = np.clip(rng.lognormal(mean=np.log(18.0), sigma=1.0, size=n_items), 1.0, 180.0)
    return np.maximum((secs * scale * SR).astype(np.int64), SR // 4)


def build_store(n_items: int, n_classes: int, scale: float, dtype: str):
    from audio_few_shot_learning_tpu.data.wavhoststore import WavHostStore

    rng = np.random.default_rng(0)
    lengths = birdclef_lengths(n_items, scale, rng)
    labels = rng.integers(0, n_classes, size=n_items).astype(np.int32)
    np_dtype = np.float16 if dtype == "f16" else np.float32
    seg_len = SEG_SECONDS * SR

    offsets = np.zeros(n_items, np.int64)
    offsets[1:] = np.cumsum(lengths)[:-1]
    total = int(lengths.sum())
    t0 = time.perf_counter()
    flat = np.empty(max(total, seg_len), np_dtype)
    # tiled noise bank with a varying phase per item: fills at memcpy speed
    bank = rng.standard_normal(1_000_003).astype(np_dtype)
    for i in range(n_items):
        ln, off = int(lengths[i]), int(offsets[i])
        src = np.resize(bank[(i * 7919) % len(bank):], ln)
        flat[off: off + ln] = src
    # tail rows only for sub-segment items
    tail_rows, tail_index = [], np.zeros(n_items, np.int32)
    short = np.nonzero(lengths < seg_len)[0]
    for i in short:
        ln, off = int(lengths[i]), int(offsets[i])
        w = flat[off: off + ln]
        tail_index[i] = len(tail_rows)
        tail_rows.append(np.tile(w, -(-seg_len // ln))[:seg_len])
    tails = np.stack(tail_rows) if tail_rows else np.zeros((1, seg_len), np_dtype)
    seg_counts = np.maximum(-(-lengths // seg_len), 1).astype(np.int32)
    store = WavHostStore(
        flat, offsets, lengths, tails, tail_index, seg_counts, seg_len,
        labels, n_classes,
    )
    pack_s = time.perf_counter() - t0
    return store, pack_s


def raw_transfer_floor(nbytes_per_step: int, reps: int = 8) -> float:
    """Steps/s of a bare device_put+readback of the same per-step payload —
    the tunnel/link floor any streaming path should be judged against
    (ARCHITECTURE.md lesson 12)."""
    import jax
    import jax.numpy as jnp

    buf = np.empty(nbytes_per_step // 4, np.float32)
    float(jnp.sum(jax.device_put(buf)))  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        float(jnp.sum(jax.device_put(buf)))
    return reps / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=65000)
    ap.add_argument("--classes", type=int, default=120)
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--dtype", choices=["f16", "f32"], default="f16")
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--episode-batch", type=int, default=4)
    ap.add_argument("--eval-tasks", type=int, default=3)
    ap.add_argument("--cpu", action="store_true", help="CPU backend (smoke)")
    ap.add_argument("--pack-only", action="store_true",
                    help="build + size the ragged store and a sample episode "
                         "host-side, skip the on-device training/eval halves "
                         "(the capacity proof without needing a TPU)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from audio_few_shot_learning_tpu.config import ExperimentConfig, ModelConfig
    from audio_few_shot_learning_tpu.train.engine import Trainer

    store, pack_s = build_store(args.items, args.classes, args.scale, args.dtype)
    out = {
        "items": args.items,
        "scale": args.scale,
        "dtype": args.dtype,
        "store_gb": round(store.nbytes() / 1e9, 2),
        "s_max": store.s_max,
        "pack_seconds": round(pack_s, 1),
    }

    if args.pack_only:
        # capacity proof without a device: the ragged store fits host RAM and
        # per-step episode assembly (sampler + ragged slicing + tail rows) runs
        # at streaming-compatible speed. Train/eval halves need the TPU.
        rng = np.random.default_rng(1)
        t0 = time.perf_counter()
        n_asm = 6
        for _ in range(n_asm):
            eb = store.sample_episode_batch(
                rng, n_way=5, k_support=5, k_query=5, batch=args.episode_batch
            )
        out["host_assembly_ms_per_step"] = round(
            (time.perf_counter() - t0) / n_asm * 1e3, 1
        )
        out["episode_batch"] = args.episode_batch
        out["support_shape"] = list(eb.support.shape)
        out["query_shape"] = list(eb.query.shape)
        print(json.dumps(out))
        return

    exp = ExperimentConfig.from_dict(
        {
            "encoder_name": "Hybrid",
            "dataset_name": "birdclef_stress",
            "input_type": "wav",
            "use_attention": True,
            "use_contrastive": True,
            "multi_segm": True,
            "tie_strategy": "max_posterior",
            "n_way_train": 5, "n_way_validation": 5, "n_way_test": 5,
            "n_shot_train": 5, "n_shot_validation": 5, "n_shot_test": 5,
            "n_query_train": 5, "n_query_validation": 5, "n_query_test": 5,
            "train_query_augmentations": True,
            "validation_query_augmentations": True,
            "test_query_augmentations": True,
            "lr": 1e-3, "num_epochs": 1,
            "n_training_tasks": args.episode_batch * args.steps,
            "n_testing_tasks": args.eval_tasks,
            "scheduler_milestones": [100], "scheduler_gamma": 0.5, "patience": 5,
            "specaug_params": {"use": False},
            "waveaug_params": {
                "use": True, "aug_num": 3, "gain_p": 0.5, "gain_min_db": -6,
                "gain_max_db": 6, "gaussiannoise_p": 0.5,
                "gaussiannoise_min_amp": 0.001, "gaussiannoise_max_amp": 0.015,
                "pitchshift_p": 0.2, "timestretch_p": 0.2,
                "timemasking_masks": 3, "timemasking_mask_fraction": 0.05,
                "timemasking_p": 0.3,
            },
            "loss": {"l_param": 0.5, "cpl": {"use": True, "m_param": 4, "t_param": 9.0},
                     "angular": {"use": False, "angle": 0, "prototypes_as_anchors": True}},
            "tpu": {"episode_batch": args.episode_batch, "eval_episode_batch": 4,
                    "mesh_shape": 1},
        }
    )
    mdl = ModelConfig.from_dict({})

    trainer = Trainer(exp, mdl, store, val_store=store, test_store=store)
    assert trainer.host_mode and trainer.is_wav
    m = trainer.train_epoch()  # compile + stream
    m2 = trainer.train_epoch()
    out["train_eps_per_sec"] = round(max(m["episodes_per_sec"], m2["episodes_per_sec"]), 2)
    out["loss_finite"] = bool(np.isfinite(m2["loss"]))

    # per-step payload: (S + Q) wav rows per episode x episode_batch, f32
    rows = exp.n_way_train * (exp.n_shot_train + exp.n_query_train)
    step_bytes = args.episode_batch * rows * store.seg_len * 4
    floor = raw_transfer_floor(step_bytes)
    out["raw_device_put_floor_steps_per_sec"] = round(floor, 2)
    out["raw_floor_eps_per_sec"] = round(floor * args.episode_batch, 2)

    # the REAL BirdClef eval geometry: all segments of every test query,
    # padded to s_max (~36), majority vote on device
    t0 = time.perf_counter()
    mean, _ = trainer.evaluate(
        store, n_tasks=args.eval_tasks, n_way=5, k_shot=5, k_query=5,
        augment_query=True, multisegment=True, tie_strategy="max_posterior",
    )
    out["eval_smax_tasks_per_sec"] = round(args.eval_tasks / (time.perf_counter() - t0), 3)
    out["eval_acc_sane"] = bool(0.0 <= mean <= 1.0)
    out["backend"] = jax.default_backend()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
