"""Cumulative step-anatomy profile of the flagship train step on the real TPU.

Measures, as separate jitted scan-over-steps programs (store passed as a jit
argument, never a closed-over constant — see ARCHITECTURE.md "Lessons"):

  sample    on-device episodic sampling only
  views     + SpecAugment 4-view expansion (support + query)
  forward   + full episode forward and loss (no gradients)
  backward  + value_and_grad
  step      + Adam update (== the real train step)

The difference between consecutive rows is the cost of that stage inside the
real program (XLA fusion can shift work between rows; treat deltas as
attribution, not isolated kernel times). Round-3 numbers (pre pool-before-ReLU
reorder): sample 0.6 ms, +views 0.7, +forward 3.1, +backward 17.7 — run this
after any hot-path change to see where the step's time now goes.

Usage: python scripts/step_anatomy.py [steps_per_program]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import make_store, make_trainer  # noqa: E402

from audio_few_shot_learning_tpu.data.episodes import sample_episode  # noqa: E402


def timed(fn, state, store, key, iters=5):
    out = fn(state, store, key)  # compile + warmup
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))  # force readback
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(state, store, key)
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    print("backend:", jax.default_backend())
    store = make_store()
    tr = make_trainer(1, store=store)
    exp = tr.exp
    n_way, k_shot, k_query = exp.n_way_train, exp.n_shot_train, exp.n_query_train
    vq = tr._v_query(exp.train_query_augmentations)
    state = tr.state

    def scan_of(body):
        @jax.jit
        def run(state, store, key):
            keys = jax.random.split(key, steps)
            return jax.lax.scan(lambda c, k: (c, body(state, store, k)), 0, keys)[1]
        return run

    def sample_only(state, store, key):
        k_sample, _ = jax.random.split(key)
        ep = jax.vmap(
            lambda k: sample_episode(k, store, n_way, k_shot, k_query, False)
        )(jax.random.split(k_sample, tr.episode_batch))
        return jnp.sum(ep.support) + jnp.sum(ep.query)

    def views_too(state, store, key):
        k_sample, k_loss = jax.random.split(key)
        ep = jax.vmap(
            lambda k: sample_episode(k, store, n_way, k_shot, k_query, False)
        )(jax.random.split(k_sample, tr.episode_batch))
        k_s, k_q, *_ = jax.random.split(k_loss, 5)
        sup = tr._make_views(ep.support, k_s, tr.specaug)
        qry = tr._make_views(ep.query, k_q, vq > 1)
        return jnp.sum(sup.astype(jnp.float32)) + jnp.sum(qry.astype(jnp.float32))

    def forward_too(state, store, key):
        k_sample, k_loss = jax.random.split(key)
        ep = jax.vmap(
            lambda k: sample_episode(k, store, n_way, k_shot, k_query, False)
        )(jax.random.split(k_sample, tr.episode_batch))
        loss, _ = tr._loss_and_metrics(
            state.params, state.batch_stats, ep, k_loss, n_way, vq, store
        )
        return loss

    def backward_too(state, store, key):
        k_sample, k_loss = jax.random.split(key)
        ep = jax.vmap(
            lambda k: sample_episode(k, store, n_way, k_shot, k_query, False)
        )(jax.random.split(k_sample, tr.episode_batch))
        (_, _), grads = jax.value_and_grad(tr._loss_and_metrics, has_aux=True)(
            state.params, state.batch_stats, ep, k_loss, n_way, vq, store
        )
        return sum(jnp.sum(g.astype(jnp.float32)) for g in jax.tree.leaves(grads))

    @jax.jit
    def full_step(state, store, key):
        keys = jax.random.split(key, steps)
        st, metrics = jax.lax.scan(
            lambda s, k: tr._train_step(s, store, k), state, keys
        )
        return metrics["loss"]

    key = jax.random.PRNGKey(0)
    rows = [
        ("sample", scan_of(sample_only)),
        ("views", scan_of(views_too)),
        ("forward", scan_of(forward_too)),
        ("backward", scan_of(backward_too)),
        ("step", full_step),
    ]
    prev = 0.0
    print(f"{'stage':<10}{'ms/step':>10}{'delta ms':>10}")
    for name, fn in rows:
        dt = timed(fn, state, store, key) / steps
        print(f"{name:<10}{dt*1e3:>10.2f}{(dt*1e3 - prev):>10.2f}")
        prev = dt * 1e3


if __name__ == "__main__":
    main()
