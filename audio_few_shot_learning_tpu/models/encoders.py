"""Backbone encoders: 4-block CNN and CNN+RNN hybrid.

Re-derivations of the reference's ``StandardCNN`` / ``StandardHybrid``
(models/main_modules.py:84-198) in flax.linen with TPU-native NHWC layout:

* conv block = 3x3 same conv -> BatchNorm -> max-pool(pool_dim) -> ReLU
  (main_modules.py:43-60 orders ReLU before the pool; pooling first is
  value- and gradient-equivalent and cheaper, see ConvBlock);
* CNN head = flatten -> Dropout(0.3) -> BatchNorm -> Linear(out_dim)
  (main_modules.py:103-105). The reference's 'CNN' factory path is broken
  (omits the required trial_shape arg, main_modules.py:265-268); here the
  flattened width is derived from the actual input shape, fixing it;
* Hybrid = conv stack -> [B, T', F'*C] sequence -> RNN/GRU/LSTM with an
  input+output skip connection -> last timestep -> same head
  (main_modules.py:170-198).

Weight init follows torch conventions (uniform +-1/sqrt(fan_in)) so training
dynamics track the reference.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from audio_few_shot_learning_tpu.config import CNNConfig, HybridConfig
from audio_few_shot_learning_tpu.ops.rnn import Recurrent


def _torch_conv_init(key, shape, dtype=jnp.float32):
    # torch Conv2d: kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)), fan_in = C_in*kh*kw
    bound = 1.0 / math.sqrt(shape[0] * shape[1] * shape[2])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_dense_init(key, shape, dtype=jnp.float32):
    bound = 1.0 / math.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class BandwidthBatchNorm(nn.Module):
    """BatchNorm with f32 statistics but compute-dtype normalization.

    flax's nn.BatchNorm with dtype=float32 upcasts the whole activation
    tensor, turning the conv blocks' dominant HBM traffic back into f32.
    Here the reductions accumulate in f32 (fused by XLA, nothing
    materializes) while the normalize/affine pass stays in the input dtype —
    torch semantics (momentum 0.1, eps 1e-5, biased batch variance for
    normalization) at half the bandwidth.
    """

    momentum: float = 0.9  # running = momentum*running + (1-momentum)*batch
    epsilon: float = 1e-5

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool,
        view_groups: Optional[Tuple[int, int, int, int]] = None,
        fold: bool = False,
    ) -> jnp.ndarray:
        """``fold=True`` (eval only): ``x`` is the channel count (int); returns
        the per-channel f32 ``(inv, shift)`` of the eval affine
        ``y = x*inv + shift`` instead of applying it, so the caller can fold
        it into the preceding conv's kernel/bias (ConvBlock, tpu.fold_bn_eval).
        The same variables are created either way — the param tree is
        identical across fold and non-fold paths."""
        feat = x if isinstance(x, int) else x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(feat, jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(feat, jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)

        if fold:
            if train:
                raise ValueError("BN folding is eval-only (train=False)")
            inv = jax.lax.rsqrt(ra_var.value + self.epsilon) * scale
            return inv, bias - ra_mean.value * inv

        axes = tuple(range(x.ndim - 1))
        if train and view_groups is not None:
            return self._grouped(x, view_groups, ra_mean, ra_var, scale, bias)

        if train:
            # f32 accumulation without materializing an f32 copy of x
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(mean)
            var = jnp.maximum(var, 0.0)
            if not self.is_initializing():
                n = 1
                for a in axes:
                    n *= x.shape[a]
                unbiased = var * (n / max(n - 1, 1))  # torch tracks unbiased var
                ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
                ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        inv_c = inv.astype(x.dtype)
        shift = (bias - mean * inv).astype(x.dtype)
        return x * inv_c + shift

    def _grouped(self, x, view_groups, ra_mean, ra_var, scale, bias):
        """Per-(episode, view, support|query) batch statistics — emulates the
        reference's BN granularity, whose per-view Python loop feeds the
        backbone ~25-item groups (models/main_modules.py:18-23 via
        few_shot_classifier.py:64-76) instead of one fused batch.

        Rows arrive support-block-first in (episode, item, view) order
        (protonets.py flat layout); each group normalizes with its OWN
        mean/var. Running stats update once per step with the average of the
        group statistics (the reference updates sequentially per group with
        momentum — averaged here; same fixed point, slightly different
        transient, acceptable for the training-dynamics A/B this emulates).
        """
        s, vs, q, vq = view_groups
        b = x.shape[0]
        feat = x.shape[-1]
        per = s * vs + q * vq
        e = b // per
        if e * per != b:
            raise ValueError(f"batch {b} incompatible with view_groups {view_groups}")
        spatial = int(np.prod(x.shape[1:-1])) if x.ndim > 2 else 1
        xf = x.astype(jnp.float32)

        def stats(part, items, views):
            g = part.reshape(e, items, views, spatial, feat)
            m = g.mean(axis=(1, 3))  # [e, views, feat]
            v = jnp.maximum(jnp.square(g).mean(axis=(1, 3)) - jnp.square(m), 0.0)
            return m, v

        sup_m, sup_v = stats(xf[: e * s * vs], s, vs)
        qry_m, qry_v = stats(xf[e * s * vs :], q, vq)

        def rows(m, items, views):
            return jnp.broadcast_to(m[:, None], (e, items, views, feat)).reshape(-1, feat)

        mean_rows = jnp.concatenate([rows(sup_m, s, vs), rows(qry_m, q, vq)])
        var_rows = jnp.concatenate([rows(sup_v, s, vs), rows(qry_v, q, vq)])

        if not self.is_initializing():
            g_means = jnp.concatenate([sup_m.reshape(-1, feat), qry_m.reshape(-1, feat)])
            n_sup, n_qry = s * spatial, q * spatial
            unb = lambda v, n: v.reshape(-1, feat) * (n / max(n - 1, 1))
            g_vars = jnp.concatenate([unb(sup_v, n_sup), unb(qry_v, n_qry)])
            ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * g_means.mean(0)
            ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * g_vars.mean(0)

        bshape = (b,) + (1,) * (x.ndim - 2) + (feat,)
        inv = (jax.lax.rsqrt(var_rows + self.epsilon) * scale).reshape(bshape)
        shift = (bias - mean_rows.reshape(bshape) * inv).astype(x.dtype)
        return x * inv.astype(x.dtype) + shift


class ConvBlock(nn.Module):
    """conv3x3(same) -> BN -> maxpool(pool, stride=pool) -> ReLU (floor mode).

    Reference order is conv -> BN -> ReLU -> maxpool (main_modules.py:84-114);
    pooling first is value- and gradient-equivalent (see inline note) and
    faster on TPU.
    """

    features: int
    pool: Tuple[int, int]
    compute_dtype: str = "bfloat16"
    fold_bn_eval: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool, view_groups: Optional[Tuple[int, int, int, int]] = None
    ) -> jnp.ndarray:
        in_feat = x.shape[-1]
        cd = jnp.dtype(self.compute_dtype)
        # conv params owned directly (not via nn.Conv) so the eval-time BN
        # fold below can rescale the kernel in-graph — a per-channel op on
        # the [3,3,Cin,C] weights, negligible next to the conv itself
        kernel = self.param("kernel", _torch_conv_init, (3, 3, in_feat, self.features))
        bias = self.param("bias", _torch_bias_init(in_feat * 9), (self.features,))
        bn = BandwidthBatchNorm()
        conv = functools.partial(
            jax.lax.conv_general_dilated,
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.fold_bn_eval and not train:
            # eval-mode BN is y = x*inv + shift with per-channel running-stat
            # constants, and conv is linear, so BN(conv(x,K,b)) ==
            # conv(x, K*inv, b*inv + shift) — one conv, no full-size affine
            # pass (1.29x on the eval stack, scripts/bn_fold_eval.py)
            inv, shift = bn(self.features, train=False, fold=True)
            x = conv(x.astype(cd), (kernel * inv).astype(cd))
            x = x + (bias * inv + shift).astype(cd)
        else:
            x = conv(x.astype(cd), kernel.astype(cd)) + bias.astype(cd)
            x = bn(x, train, view_groups)
        # torch MaxPool2d(kernel=pool, stride=pool): floor division of dims
        ph, pw = self.pool
        h = (x.shape[1] // ph) * ph
        w = (x.shape[2] // pw) * pw
        if h == 0 or w == 0:
            raise ValueError(
                f"pool {self.pool} collapses a {x.shape[1]}x{x.shape[2]} map to zero — "
                "reduce pool_dim or use longer inputs"
            )
        # Pool BEFORE ReLU: exactly equivalent to the reference's ReLU->pool
        # (max commutes with the monotone relu; the backward also matches —
        # relu' is 0 wherever the pooled max is <=0 and 1 at the selected
        # positive argmax either way) but applies the relu mask to the
        # pool^2-times-smaller map, cutting full-size elementwise HBM traffic
        # in the backward (block0 fwd+bwd 4.6 -> 3.8 ms measured on v5e).
        # reduce_window is the fastest pool formulation on this chip
        # (ARCHITECTURE.md lesson 6; re-confirmed at the r4 tree by
        # scripts/backward_anatomy.py against reshape-max and strided-max).
        x = nn.max_pool(x[:, :h, :w, :], (ph, pw), strides=(ph, pw), padding="VALID")
        return nn.relu(x)


class ConvEncoder(nn.Module):
    """Four identical conv blocks (main_modules.py:63-81).

    Convolutions run in ``compute_dtype`` (bfloat16 on TPU: MXU-native, halves
    the HBM footprint of the pre-pool activations that cap the episode batch
    size); BatchNorm statistics stay float32.

    ``remat``: rematerialize each block in the backward pass instead of
    holding its pre-pool activations. block0's conv/BN/ReLU intermediates are
    [B, F, T, C] each (~4 GB at episode_batch=8 x 50 items x 4 views) and cap
    the episode batch at ~4 without remat; with it the peak is the post-pool
    map (~1/pool^2 the size), trading a cheap conv recompute for HBM.
    """

    hidden_channels: int
    pool: Tuple[int, int]
    compute_dtype: str = "bfloat16"
    remat: bool = True
    fold_bn_eval: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool, view_groups: Optional[Tuple[int, int, int, int]] = None
    ) -> jnp.ndarray:
        block_cls = (
            nn.remat(ConvBlock, static_argnums=(2, 3)) if self.remat else ConvBlock
        )
        for i in range(4):
            x = block_cls(
                self.hidden_channels,
                self.pool,
                self.compute_dtype,
                self.fold_bn_eval,
                name=f"block{i}",
            )(x, train, view_groups)
        return x


class _LogitsHead(nn.Module):
    """Dropout(0.3) -> BatchNorm1d -> Linear(out_dim) (main_modules.py:104-105,159-160)."""

    out_dim: int

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool, view_groups: Optional[Tuple[int, int, int, int]] = None
    ) -> jnp.ndarray:
        x = nn.Dropout(rate=0.3, deterministic=not train)(x)
        if view_groups is not None:
            # A/B emulation: the reference's head BN1d also sees per-group
            # batches. Must route through the SAME module at train and eval
            # (consistent batch_stats), so the branch keys on view_groups —
            # a static model-mode choice — not on `train`.
            x = BandwidthBatchNorm(name="bn_grouped")(x, train, view_groups)
        else:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5, dtype=jnp.float32
            )(x)
        x = nn.Dense(
            self.out_dim,
            kernel_init=_torch_dense_init,
            bias_init=_torch_bias_init(x.shape[-1]),
            dtype=x.dtype,
        )(x)
        return x


class StandardCNN(nn.Module):
    """4-block CNN -> flatten -> logits head. Input [B, F, T] (no channel dim)."""

    cfg: CNNConfig
    compute_dtype: str = "bfloat16"
    remat: bool = True
    fold_bn_eval: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        view_groups: Optional[Tuple[int, int, int, int]] = None,
    ) -> jnp.ndarray:
        x = x[..., None]  # NHWC, C=1 (cfg.in_channels==1 for all datasets)
        x = ConvEncoder(
            self.cfg.hidden_channels,
            self.cfg.pool_dim,
            self.compute_dtype,
            self.remat,
            self.fold_bn_eval,
        )(x, train, view_groups)
        x = x.reshape(x.shape[0], -1)
        return _LogitsHead(self.cfg.out_dim)(x, train, view_groups)


class StandardHybrid(nn.Module):
    """4-block CNN -> time-major sequence -> recurrent stack with skip -> head.

    Sequence layout matches main_modules.py:170-177: after the conv stack the
    tensor [B, F', T', C] is transposed to (batch, time, freq, channel) and
    flattened to [B, T', F'*C]; with the canonical 128-mel/pool-3 setup
    F'==1 so the RNN input size equals C==64.
    """

    cfg: HybridConfig
    compute_dtype: str = "bfloat16"
    remat: bool = True
    fold_bn_eval: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        view_groups: Optional[Tuple[int, int, int, int]] = None,
    ) -> jnp.ndarray:
        x = x[..., None]
        x = ConvEncoder(
            self.cfg.hidden_channels,
            self.cfg.pool_dim,
            self.compute_dtype,
            self.remat,
            self.fold_bn_eval,
        )(x, train, view_groups)
        x = x.astype(jnp.float32)
        b, fp, tp, c = x.shape
        seq = jnp.transpose(x, (0, 2, 1, 3)).reshape(b, tp, fp * c)

        # The reference hardcodes hidden=64 with the comment "number of output
        # channels * floor_div(n_mels, pool, 4)" (main_modules.py:141-142) —
        # i.e. hidden must equal the flattened conv width F'*C for the skip
        # connection to typecheck. Generalized here to any input geometry.
        hidden = fp * c
        out = Recurrent(
            hidden_size=hidden,
            num_layers=self.cfg.seq_layers,
            cell_type=self.cfg.seq_type,
            bidirectional=self.cfg.bidirectional,
            name="seq_layers",
        )(seq)

        # skip connection g(x) = h_fwd + h_bwd + x (main_modules.py:185-193)
        fwd = out[:, :, :hidden]
        if self.cfg.bidirectional:
            bwd = out[:, :, hidden:]
            seq_out = fwd + bwd + seq
        else:
            seq_out = fwd + seq
        last = seq_out[:, -1, :]  # many_to_one: last timestep (main_modules.py:167-168,195)
        return _LogitsHead(self.cfg.out_dim)(last, train, view_groups)


def make_backbone(
    encoder_name: str,
    cnn_cfg: CNNConfig,
    hybrid_cfg: HybridConfig,
    compute_dtype: str = "bfloat16",
    remat: bool = True,
    fold_bn_eval: bool = False,
) -> nn.Module:
    """Factory mirroring get_backbone_model (main_modules.py:258-285)."""
    if encoder_name == "CNN":
        return StandardCNN(cnn_cfg, compute_dtype, remat, fold_bn_eval)
    if encoder_name == "Hybrid":
        return StandardHybrid(hybrid_cfg, compute_dtype, remat, fold_bn_eval)
    raise ValueError(f"unknown encoder {encoder_name!r}")
