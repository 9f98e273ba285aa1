"""Serving-path latency probe: `Trainer.predict_episode` on the flagship
model (VERDICT r03 item 8 — the newest surface and the only one without a
perf note). Reports cold (includes jit compile) and warm-median latency for
a 5-way 5-shot episode with 10 queries, and checks that bf16 caller inputs
land on a distinct jit cache entry (dtype is part of the cache key,
engine.py predict_episode) while agreeing with the f32 predictions.

Run on the real chip: `python scripts/predict_latency.py`.
"""

from __future__ import annotations

import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import __graft_entry__ as G
    from audio_few_shot_learning_tpu.config import TPUConfig
    from audio_few_shot_learning_tpu.data.store import PackedStore
    from audio_few_shot_learning_tpu.train.engine import Trainer

    print("backend:", jax.default_backend(), flush=True)
    exp, mdl = G._flagship_configs()
    exp = dataclasses.replace(exp, tpu=TPUConfig(episode_batch=1, eval_episode_batch=8))
    rng = np.random.default_rng(0)
    items = [rng.standard_normal((128, 157)).astype(np.float32) for _ in range(60)]
    store = PackedStore.pack(items, list(np.repeat(np.arange(6), 10)), n_classes=6)
    t = Trainer(exp, mdl, store, val_store=store, test_store=store)

    sup = rng.standard_normal((25, 128, 157)).astype(np.float32)
    lab = np.repeat(np.arange(5), 5)
    qry = rng.standard_normal((10, 128, 157)).astype(np.float32)

    t0 = time.perf_counter()
    t.predict_episode(sup, lab, qry)  # cold: includes jit compile
    cold = time.perf_counter() - t0
    times = []
    for _ in range(30):
        t0 = time.perf_counter()
        t.predict_episode(sup, lab, qry)  # returns numpy => already synced
        times.append(time.perf_counter() - t0)
    warm = float(np.median(times))
    print(
        f"predict_episode flagship 5w5s, 10 queries: cold {cold:.2f}s, "
        f"warm median {warm * 1e3:.1f} ms ({10 / warm:.0f} queries/s)"
    )

    # bf16 caller inputs must hit a DISTINCT cache entry (dtype in the key)
    # yet agree with the f32 predictions
    pred_f32, _ = t.predict_episode(sup, lab, qry)
    sup16 = np.asarray(jnp.asarray(sup, jnp.bfloat16))
    qry16 = np.asarray(jnp.asarray(qry, jnp.bfloat16))
    pred_bf16, _ = t.predict_episode(sup16, lab, qry16)
    n_entries = sum(1 for k in t._eval_fns if k[0] == "predict")
    agree = float((np.asarray(pred_f32) == np.asarray(pred_bf16)).mean())
    print(f"distinct cache entries: {n_entries} agree: {agree}")


if __name__ == "__main__":
    main()
