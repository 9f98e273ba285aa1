"""On-chip A/B: float32 vs bfloat16 packed-store residency for the flagship
spec-path train step (queued round-2 lever, BASELINE.md driver round 2b:
the step is bandwidth-bound, and a bf16 store halves the episode-gather and
view-materialization HBM traffic feeding SpecAugment).

The store dtype only changes where the segments live in HBM; episode rows are
upcast on gather and the compute path is unchanged (conv/BN compute dtype is
governed separately by ``tpu.compute_dtype``), so accuracy-relevant behavior
is the documented bf16-store quantization of inputs only (store.py).

Run on the real TPU: ``python scripts/ab_store_dtype.py [--e 1 4]``.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_store(dtype: str):
    from audio_few_shot_learning_tpu.data.store import PackedStore

    from bench import N_FRAMES, N_MELS

    rng = np.random.default_rng(0)
    n_classes, per_class = 35, 40  # ESC-50 train split shape (bench.make_store)
    items = [
        rng.standard_normal((N_MELS, N_FRAMES)).astype(np.float32)
        for _ in range(n_classes * per_class)
    ]
    labels = list(np.repeat(np.arange(n_classes), per_class))
    return PackedStore.pack(items, labels, n_classes=n_classes, dtype=dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--e", type=int, nargs="+", default=[1, 4])
    args = ap.parse_args()

    import jax

    from bench import bench_train, make_trainer

    print(f"backend={jax.default_backend()}", flush=True)
    rows = []
    for dtype in ("float32", "bfloat16"):
        store = make_store(dtype)
        print(f"store dtype={dtype}: {store.segments.nbytes/1e6:.0f} MB", flush=True)
        for e in args.e:
            t0 = time.time()
            tr = make_trainer(e, store=store)
            eps = bench_train(tr)
            rows.append((dtype, e, eps))
            print(f"  E={e}: {eps:.2f} eps/s  [{time.time()-t0:.0f}s]", flush=True)

    print("\n| store dtype | E | train eps/s |")
    print("|---|---|---|")
    for dtype, e, eps in rows:
        print(f"| {dtype} | {e} | {eps:.2f} |")


if __name__ == "__main__":
    main()
