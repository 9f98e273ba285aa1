"""On-chip A/B: Pallas kernels vs the pure-XLA implementations.

Run on the real TPU (plain `python scripts/ab_pallas.py`). Measures the two
kernels VERDICT.md flagged as unwired, at the exact shapes the training hot
path uses, plus the full fused train step both ways. Results feed BASELINE.md
and decide the default of ``TPUConfig.use_pallas``.
"""

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from audio_few_shot_learning_tpu.config import SpecAugParams
from audio_few_shot_learning_tpu.ops.specaugment import spec_augment_views
from audio_few_shot_learning_tpu.ops.protohead import batched_episode_scores


def timeit(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def ab_specaugment(e=8, b=50, f=128, t=157):
    """Per-episode 4-view expansion, vmapped over E episodes (engine shape)."""
    params = SpecAugParams(use=True, mask_param=16, W=22, num_mask=1, mask_value=0, p=0.282)
    specs = jnp.asarray(np.random.default_rng(0).standard_normal((e, b, f, t)), jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), e)

    results = {}
    for name, flag in [("xla", False), ("pallas", True)]:
        fn = jax.jit(
            jax.vmap(lambda s, k: spec_augment_views(s, k, params, use_pallas=flag))
        )
        try:
            dt = timeit(fn, specs, keys)
            results[name] = dt
            print(f"specaugment[{name}]  E={e} B={b}: {dt*1e3:8.3f} ms")
        except Exception as ex:
            results[name] = None
            print(f"specaugment[{name}]  FAILED: {type(ex).__name__}: {str(ex)[:200]}")
    # numerical agreement (same draws -> identical views)
    if all(results.values()):
        a = jax.vmap(lambda s, k: spec_augment_views(s, k, params, use_pallas=False))(specs, keys)
        p = jax.vmap(lambda s, k: spec_augment_views(s, k, params, use_pallas=True))(specs, keys)
        err = float(jnp.max(jnp.abs(a - p)))
        print(f"specaugment max|xla-pallas| = {err:.2e}")
    return results


def ab_protohead(e=8, s=25, q=25, d=256, n_way=5):
    """Fused episode head at the flagship attention-variant shapes."""
    rng = np.random.default_rng(1)
    sup = jnp.asarray(rng.standard_normal((e, s, d)), jnp.float32)
    qry = jnp.asarray(rng.standard_normal((e, q, d)), jnp.float32)
    lab = jnp.asarray(rng.integers(0, n_way, (e, s)), jnp.int32)

    results = {}
    for name, flag in [("xla", False), ("pallas", True)]:
        fn = jax.jit(
            lambda su, la, qu: batched_episode_scores(su, la, qu, n_way, use_pallas=flag)
        )
        try:
            dt = timeit(fn, sup, lab, qry)
            results[name] = dt
            print(f"protohead[{name}]    E={e} S={s} Q={q} D={d}: {dt*1e3:8.3f} ms")
        except Exception as ex:
            results[name] = None
            print(f"protohead[{name}]    FAILED: {type(ex).__name__}: {str(ex)[:200]}")
    if all(results.values()):
        a = batched_episode_scores(sup, lab, qry, n_way, use_pallas=False)
        p = batched_episode_scores(sup, lab, qry, n_way, use_pallas=True)
        err = float(jnp.max(jnp.abs(a - p)))
        print(f"protohead   max|xla-pallas| = {err:.2e}")
    return results


def ab_train_step(use_pallas: bool, e=1, steps=20, microbatch=None):
    """Full fused train step (flagship config) with the kernels on/off."""
    import dataclasses
    from audio_few_shot_learning_tpu.config import TPUConfig
    from audio_few_shot_learning_tpu.data.store import PackedStore
    from audio_few_shot_learning_tpu.train.engine import Trainer
    from __graft_entry__ import _flagship_configs

    exp, mdl = _flagship_configs()
    exp = dataclasses.replace(
        exp,
        n_training_tasks=steps * e,
        tpu=TPUConfig(
            episode_batch=e, use_pallas=use_pallas, episode_microbatch=microbatch
        ),
    )
    rng = np.random.default_rng(0)
    items = [rng.standard_normal((128, 157)).astype(np.float32) for _ in range(240)]
    labels = list(np.repeat(np.arange(12), 20))
    store = PackedStore.pack(items, labels, n_classes=12)
    trainer = Trainer(exp, mdl, store, val_store=store, test_store=store)
    trainer.train_epoch()  # compile
    m = trainer.train_epoch()
    print(
        f"train_step[pallas={use_pallas}] E={e}: "
        f"{m['episodes_per_sec']:.2f} eps/s ({trainer.last_epoch_seconds/steps*1e3:.1f} ms/step)"
    )
    return m["episodes_per_sec"]


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    ab_specaugment()
    ab_protohead()
    ab_protohead(e=32)
    if "--full" in sys.argv:
        for e in (1, 8):
            ab_train_step(False, e=e)
            ab_train_step(True, e=e)
