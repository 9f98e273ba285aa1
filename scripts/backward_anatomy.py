"""Decompose the train step's BACKWARD cost (step_anatomy.py r4: forward
3.07 ms vs backward +10.96 ms at E=1 — 3.6x forward where matmul-bound
workloads expect ~2x). Times fwd and fwd+bwd over the 4-block conv stack at
flagship shapes ([200, 128, 157] = 1 episode x 50 items x 4 views) across a
{pool formulation} x {BN | plain affine} grid.

This re-confirms, at the r4 tree, the round-2b pool investigation
(ARCHITECTURE.md lesson 6: SelectAndScatter is the practical optimum; see
BASELINE.md for the five formulations measured then) and ADDS the
BatchNorm decomposition the earlier investigation didn't have — the
norm=affine arms isolate what the BN statistics contribute to the backward:

  pool=rw        lax.reduce_window max (flax nn.max_pool; backward =
                 SelectAndScatterAdd)
  pool=reshape   reshape [B,h/3,3,w/3,3,C] + reduce-max (backward = eq-mask
                 select) — measured SLOWER on v5e: the 6-D reshape shuffles
                 the minor dims (fwd 5.5 vs 3.1 ms)
  pool=strided   9-way elementwise max of strided slices x[i::3, j::3]
                 (backward = selects + slice-transpose pads, no scatter)

  norm=bn        BandwidthBatchNorm (train mode, batch stats)
  norm=affine    per-channel scale+shift (isolates BN's stats backward)

Run on the real chip (CLAUDE.md: force a readback in warmup AND timed loop).

Measured conclusions (v5e, 2026-08-19 — kept as the record for why ConvBlock
stays on nn.max_pool):
  * The conv stack is ~100% of the step's backward: rw+bn's bwd-only here
    (11.17 ms) matches step_anatomy's backward delta (10.96 ms).
  * rw wins EVERY arm: stack fwd 3.14/5.26/7.42 ms and fwd+bwd
    14.31/20.02/27.14 ms for rw/reshape/strided — the alternatives'
    "fusable" backwards lose to their reshape/strided-slice relayouts.
  * BN's stats backward costs 3.25 ms (rw: bn 11.17 vs affine 7.92 bwd-only)
    — which is its bandwidth floor: it must re-read x and dy (2 x 514 MB,
    bf16, block0) for the reductions and write dx (514 MB), ~2.6 GB at
    ~800 GB/s. Not a scheduling loss; no kernel can do it with less traffic.
  * rw+affine backward is 2.26x forward — the stack is within ~15% of its
    HBM roofline. Further step-time gains require reducing traffic
    structurally (e.g. cross-op fusion past conv boundaries), not better
    op choices.
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
from flax import linen as nn

B, F, T = 200, 128, 157  # 1 episode x (25 support + 25 queries) x 4 views
POOL = (3, 3)
CH = 64


def _pool(x, impl: str):
    ph, pw = POOL
    h, w = (x.shape[1] // ph) * ph, (x.shape[2] // pw) * pw
    if impl == "rw":
        return nn.max_pool(x[:, :h, :w, :], POOL, strides=POOL, padding="VALID")
    if impl == "reshape":
        x = x[:, :h, :w, :].reshape(x.shape[0], h // ph, ph, w // pw, pw, x.shape[-1])
        return jnp.max(x, axis=(2, 4))
    if impl == "strided":
        slices = [
            x[:, i:h:ph, j:w:pw, :] for i in range(ph) for j in range(pw)
        ]
        return functools.reduce(jnp.maximum, slices)
    raise ValueError(impl)


class _Stack(nn.Module):
    pool_impl: str
    norm: str  # 'bn' | 'affine'

    @nn.compact
    def __call__(self, x, train=True):
        from audio_few_shot_learning_tpu.models.encoders import (
            BandwidthBatchNorm,
            _torch_bias_init,
            _torch_conv_init,
        )

        for i in range(4):
            in_feat = x.shape[-1]
            kernel = self.param(f"k{i}", _torch_conv_init, (3, 3, in_feat, CH))
            bias = self.param(f"b{i}", _torch_bias_init(in_feat * 9), (CH,))
            x = jax.lax.conv_general_dilated(
                x.astype(jnp.bfloat16), kernel.astype(jnp.bfloat16),
                window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias.astype(jnp.bfloat16)
            if self.norm == "bn":
                x = BandwidthBatchNorm(name=f"bn{i}")(x, train)
            else:
                scale = self.param(f"s{i}", nn.initializers.ones, (CH,))
                shift = self.param(f"t{i}", nn.initializers.zeros, (CH,))
                x = x * scale.astype(x.dtype) + shift.astype(x.dtype)
            x = nn.relu(_pool(x, self.pool_impl))
        return x


def _timeit(fn, *args, iters=30) -> float:
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))  # force readback (CLAUDE.md)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / iters * 1e3


def bench(pool_impl: str, norm: str, x):
    module = _Stack(pool_impl, norm)
    variables = module.init(jax.random.PRNGKey(0), x, True)

    @jax.jit
    def fwd(v, x):
        out, _ = module.apply(v, x, True, mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def bwd(v, x):
        def loss(params):
            out, _ = module.apply(
                {**v, "params": params}, x, True, mutable=["batch_stats"]
            )
            return jnp.sum(out.astype(jnp.float32))

        return jax.grad(loss)(v["params"])

    f_ms = _timeit(fwd, variables, x)
    b_ms = _timeit(bwd, variables, x)
    print(f"pool={pool_impl:8s} norm={norm:7s} fwd {f_ms:7.2f} ms   "
          f"fwd+bwd {b_ms:7.2f} ms   bwd-only {b_ms - f_ms:7.2f} ms", flush=True)


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, F, T, 1), jnp.float32)
    for pool_impl in ("rw", "strided", "reshape"):
        for norm in ("bn", "affine"):
            bench(pool_impl, norm, x)


if __name__ == "__main__":
    main()
