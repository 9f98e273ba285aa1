"""NSynth-scale stress test of the data substrate (VERDICT r02 item 6).

Generates a synthetic split at the scale of the reference's largest dataset —
NSynth: 306k items / 1006 classes (angle_statistics.ipynb cell 4, SURVEY §6) —
in the reference on-disk layout, packs it through the native C++ packer into a
bf16 flat store, and measures:

  * generation + pack wall-time and peak host RSS,
  * packed store size and class-table skew (M_max vs mean — NSynth-like
    long-tail class sizes),
  * episode-sampling cost on the big store vs a small control store
    (must be flat: sampling is index gathers, independent of store size).

Host-side (CPU backend): the 306k x 128 x 126 bf16 store is ~9.9 GB, which
does not fit the 16 GB v5e HBM alongside a training program; the substrate's
job at this scale is host-RAM residency + fast packing, with episode batches
moving to device per step.

Run: python scripts/stress_nsynth_scale.py [--items 306000] [--classes 1006]
     [--root /tmp/nsynth_scale] [--keep]
"""

from __future__ import annotations

import argparse
import json
import resource
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def long_tail_counts(rng, n_classes: int, total: int, min_count: int = 20) -> np.ndarray:
    """NSynth-like skewed class sizes: Zipf-weighted, clipped, scaled to sum."""
    w = 1.0 / np.arange(1, n_classes + 1) ** 0.9
    rng.shuffle(w)
    counts = np.maximum(min_count, (w / w.sum() * total).astype(np.int64))
    # trim/pad deterministically to hit the exact total
    diff = int(total - counts.sum())
    order = np.argsort(-counts)
    i = 0
    while diff != 0:
        c = order[i % n_classes]
        step = 1 if diff > 0 else -1
        if counts[c] + step >= min_count:
            counts[c] += step
            diff -= step
        i += 1
    return counts


def generate(root: Path, n_classes: int, total: int, n_mels: int, n_frames: int, seed: int):
    rng = np.random.default_rng(seed)
    counts = long_tail_counts(rng, n_classes, total)
    feat = root / "features"
    feat.mkdir(parents=True, exist_ok=True)
    (root / "norm_stats").mkdir(exist_ok=True)
    names = [f"class_{i:04d}" for i in range(n_classes)]
    sample_vals = []
    t0 = time.perf_counter()
    for ci, (name, cnt) in enumerate(zip(names, counts)):
        cdir = feat / name
        cdir.mkdir(exist_ok=True)
        base = rng.standard_normal((n_mels, n_frames)).astype(np.float32)
        band = 4 + (ci * (n_mels - 20)) // max(n_classes - 1, 1)
        base[band : band + 8, :] += 4.0
        for ii in range(cnt):
            # scalar offset keeps per-item variation at negligible gen cost
            np.save(cdir / f"item_{ii:05d}.npy", base + np.float32(0.01 * (ii % 97)))
        if ci % 200 == 0:
            sample_vals.append(base.ravel()[:2000])
            print(f"  gen class {ci}/{n_classes} (count {cnt})", flush=True)
    flat = np.concatenate(sample_vals)
    np.save(root / "norm_stats" / "glob_norm.npy",
            np.array([[[flat.mean()]], [[flat.std()]]], dtype=np.float32))
    # all classes in the train split: the stress target is one 306k-item split
    splits = np.array(
        [np.array(names, dtype=object), np.array(names[:1], dtype=object),
         np.array(names[:1], dtype=object)], dtype=object)
    np.save(root / "splits.npy", splits, allow_pickle=True)
    return counts, time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/nsynth_scale")
    ap.add_argument("--items", type=int, default=306_000)
    ap.add_argument("--classes", type=int, default=1006)
    ap.add_argument("--mels", type=int, default=128)
    ap.add_argument("--frames", type=int, default=126)  # 4 s NSynth geometry
    ap.add_argument("--keep", action="store_true", help="keep generated files")
    ap.add_argument("--skip-gen", action="store_true", help="reuse existing root")
    args = ap.parse_args()

    from audio_few_shot_learning_tpu.config import ExperimentConfig
    from audio_few_shot_learning_tpu.data.datasets import MetaAudioDataset
    from audio_few_shot_learning_tpu.data.episodes import sample_episode_batch
    from audio_few_shot_learning_tpu.data import native_pack

    root = Path(args.root)
    out = {"items": args.items, "classes": args.classes,
           "feat_shape": [args.mels, args.frames],
           "native_packer": native_pack.native_available()}

    if not args.skip_gen:
        if root.exists():
            shutil.rmtree(root)
        print(f"generating {args.items} items / {args.classes} classes at {root} ...",
              flush=True)
        counts, gen_s = generate(root, args.classes, args.items, args.mels,
                                 args.frames, seed=0)
        out["gen_seconds"] = round(gen_s, 1)
        out["class_count_min"] = int(counts.min())
        out["class_count_max"] = int(counts.max())
        out["class_count_mean"] = round(float(counts.mean()), 1)

    exp = ExperimentConfig.from_dict({
        "dataset_name": "nsynth_scale", "data_root": str(root.parent),
        "encoder_name": "CNN",
        "n_way_train": 5, "n_shot_train": 5, "n_query_train": 5,
        "specaug_params": {"use": False},
        "tpu": {"store_dtype": "bfloat16", "mesh_shape": 1},
    })

    print("scanning ...", flush=True)
    t0 = time.perf_counter()
    ds = MetaAudioDataset(exp, root, "train")
    out["scan_seconds"] = round(time.perf_counter() - t0, 1)
    out["scanned_items"] = len(ds)

    print("packing (native, bf16) ...", flush=True)
    rss_before = rss_gb()
    t0 = time.perf_counter()
    store = ds.to_packed_store(dtype="bfloat16")
    out["pack_seconds"] = round(time.perf_counter() - t0, 1)
    out["peak_rss_gb"] = round(rss_gb(), 2)
    out["rss_before_pack_gb"] = round(rss_before, 2)
    out["store_gb"] = round(store.segments.nbytes / 1e9, 2)
    out["store_dtype"] = str(store.segments.dtype)
    ct = np.asarray(store.class_counts)
    out["class_table_m_max"] = int(store.class_table.shape[1])
    out["class_table_skew"] = round(float(store.class_table.shape[1] / ct.mean()), 1)

    # episode-sampling cost: big store vs small control (must be ~flat)
    def time_sampling(st, label):
        key = jax.random.PRNGKey(0)
        # the store rides as a jit ARGUMENT (flax struct pytree): closing over
        # it would bake the multi-GB segments array into the program as a
        # captured constant (see ARCHITECTURE.md "Lessons")
        fn = jax.jit(
            lambda k, s: sample_episode_batch(k, s, 5, 5, 5, False, batch=8),
            static_argnums=(),
        )
        st_dev = jax.device_put(st)
        # Right after a 306k-file pack the 1-core box spends minutes on
        # kernel writeback/page-reclaim: single-round timings decay 58 -> 12
        # ms/8ep over ~150 s with 10x spikes (measured 2026-08-18), while a
        # settled process measures ~4.5 ms. Best-of-rounds is the robust
        # estimator under that interference.
        for i in range(10):  # warm: page-fault the store, drain compile tails
            ep = fn(jax.random.fold_in(key, 1000 + i), st_dev)
        jax.block_until_ready(ep.support)
        best = float("inf")
        for rnd in range(12):
            t0 = time.perf_counter()
            for i in range(10):
                ep = fn(jax.random.fold_in(key, rnd * 100 + i), st_dev)
            jax.block_until_ready(ep.support)
            best = min(best, (time.perf_counter() - t0) / 10 * 1e3)
        out[f"sample_ms_per_8ep_{label}"] = round(best, 2)
        return best

    print("timing episode sampling ...", flush=True)
    big_ms = time_sampling(store, "306k")

    # Host-resident arm (data/hoststore.py): at this scale the split lives in
    # host RAM and the numpy sampler must assemble episode batches faster
    # than the device consumes them (flagship E=8 step ~120 ms on a v5e).
    print("timing host-store episode assembly ...", flush=True)
    from audio_few_shot_learning_tpu.data.hoststore import HostStore

    hs = HostStore.from_flat_arrays(
        np.asarray(store.segments), np.asarray(store.seg_counts),
        np.asarray(store.labels), store.n_classes)
    hrng = np.random.default_rng(0)
    for _ in range(5):
        hep = hs.sample_episode_batch(hrng, 5, 5, 5, batch=8)
    host_best = float("inf")
    for _ in range(12):
        t0 = time.perf_counter()
        for _ in range(10):
            hep = hs.sample_episode_batch(hrng, 5, 5, 5, batch=8)
        host_best = min(host_best, (time.perf_counter() - t0) / 10 * 1e3)
    out["host_sample_ms_per_8ep_306k"] = round(host_best, 2)
    batch_bytes = hep.support.nbytes + hep.query.nbytes
    out["host_assemble_gbps"] = round(batch_bytes / (host_best / 1e3) / 1e9, 2)
    out["host_batch_mb"] = round(batch_bytes / 1e6, 2)

    from audio_few_shot_learning_tpu.data.datasets import make_synthetic_dataset
    small_root = Path("/tmp/nsynth_scale_small")
    if small_root.exists():
        shutil.rmtree(small_root)
    make_synthetic_dataset(small_root, n_classes=12, items_per_class=15,
                           n_mels=args.mels, n_frames=args.frames,
                           split_fractions=(8, 2, 2))
    small_exp = ExperimentConfig.from_dict({
        "dataset_name": "small", "data_root": str(small_root.parent),
        "encoder_name": "CNN",
        "n_way_train": 5, "n_shot_train": 5, "n_query_train": 5,
        "specaug_params": {"use": False},
        "tpu": {"store_dtype": "bfloat16", "mesh_shape": 1},
    })
    small_store = MetaAudioDataset(small_exp, small_root, "train").to_packed_store(
        dtype="bfloat16")
    small_ms = time_sampling(small_store, "small")
    out["sampling_flat"] = bool(big_ms < 5 * small_ms + 5.0)

    print(json.dumps(out, indent=2))
    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)
    shutil.rmtree(small_root, ignore_errors=True)


if __name__ == "__main__":
    main()
