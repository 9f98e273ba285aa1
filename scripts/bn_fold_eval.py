"""On-chip A/B: does folding eval-mode BatchNorm into the conv weights speed
up the eval forward, or does XLA already fuse the per-channel affine into the
conv epilogue?

Eval-mode BN is ``y = x*inv + shift`` with per-channel constants
(encoders.py::BandwidthBatchNorm, train=False), and conv is linear, so
``BN(conv(x, K, b)) == conv(x, K*inv, b*inv + shift)``. If XLA does NOT fuse
the affine, folding removes one full-size elementwise read/write pair per
block from the eval forward (same argument as the pool-before-ReLU reorder,
BASELINE.md "Round 4", but for the forward-only eval path).

Run on the real TPU: ``python scripts/bn_fold_eval.py``. Reports per-block
and full 4-block-stack timings plus max abs deviation of the folded form.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def timeit(fn, *args, iters=50, warmup=5):
    # host readback (float(...)) in BOTH loops: through the tunnel,
    # block_until_ready can return before execution (repo CLAUDE.md)
    for _ in range(warmup):
        float(jnp.sum(fn(*args).astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(jnp.sum(fn(*args).astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters


def _stack(x, kernels, biases, invs, shifts, folded: bool):
    """4-block eval forward: conv3x3 -> [affine] -> maxpool3 -> relu."""
    for k, b, inv, shift in zip(kernels, biases, invs, shifts):
        if folded:
            kf = (k * inv[None, None, None, :]).astype(x.dtype)
            bf = (b * inv + shift).astype(x.dtype)
            x = jax.lax.conv_general_dilated(
                x, kf, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            ) + bf
        else:
            x = jax.lax.conv_general_dilated(
                x, k.astype(x.dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b.astype(x.dtype)
            x = x * inv.astype(x.dtype) + shift.astype(x.dtype)
        h = (x.shape[1] // 3) * 3
        w = (x.shape[2] // 3) * 3
        x = nn.max_pool(x[:, :h, :w, :], (3, 3), strides=(3, 3), padding="VALID")
        x = nn.relu(x)
    return x


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    # eval-shaped batch: eval_episode_batch=16 episodes x 50 items x 4 views
    # is too big for one microbench tensor; use the per-block0 shape that
    # dominates (200 maps) as in the pool-before-ReLU microbench.
    b, f, t = 200, 128, 157
    x = jnp.asarray(rng.standard_normal((b, f, t, 1)), jnp.bfloat16)

    kernels, biases, invs, shifts = [], [], [], []
    cin = 1
    for _ in range(4):
        kernels.append(jnp.asarray(rng.standard_normal((3, 3, cin, 64)) * 0.05, jnp.float32))
        biases.append(jnp.asarray(rng.standard_normal(64) * 0.05, jnp.float32))
        invs.append(jnp.asarray(rng.uniform(0.8, 1.2, 64), jnp.float32))
        shifts.append(jnp.asarray(rng.standard_normal(64) * 0.05, jnp.float32))
        cin = 64

    run_plain = jax.jit(lambda v: _stack(v, kernels, biases, invs, shifts, False))
    run_fold = jax.jit(lambda v: _stack(v, kernels, biases, invs, shifts, True))

    dt_plain = timeit(run_plain, x)
    dt_fold = timeit(run_fold, x)
    dev = float(jnp.max(jnp.abs(run_plain(x).astype(jnp.float32) - run_fold(x).astype(jnp.float32))))
    print(f"eval 4-block stack  plain(conv+affine): {dt_plain*1e3:7.3f} ms")
    print(f"eval 4-block stack  folded(conv only) : {dt_fold*1e3:7.3f} ms")
    print(f"speedup: {dt_plain/dt_fold:5.2f}x   max|dev|={dev:.2e} (bf16 rounding)")


if __name__ == "__main__":
    main()
