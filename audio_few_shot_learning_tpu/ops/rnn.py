"""Recurrent cells (RNN/GRU/LSTM) as ``lax.scan`` layers.

The reference's Hybrid encoder runs a torch ``nn.RNN/GRU/LSTM`` over the
conv-encoder's time axis (models/main_modules.py:150-156). After four pool-3
stages a 5 s/128-mel input has sequence length 1 (SURVEY.md §7), so the scan
is nearly free; the batch dimension carries all the parallelism. Weight
layout and math follow the torch conventions (gate order, tanh default
nonlinearity, uniform ±1/sqrt(H) init) so training dynamics match.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def _uniform_init(scale: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init


class _RecurrentDirection(nn.Module):
    """One direction of one recurrent layer. x: [B, T, I] -> [B, T, H]."""

    hidden_size: int
    cell_type: str  # 'RNN' | 'GRU' | 'LSTM'
    reverse: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, t, i = x.shape
        h = self.hidden_size
        n_gates = {"RNN": 1, "GRU": 3, "LSTM": 4}[self.cell_type]
        k = 1.0 / math.sqrt(h)
        w_ih = self.param("w_ih", _uniform_init(k), (i, n_gates * h))
        w_hh = self.param("w_hh", _uniform_init(k), (h, n_gates * h))
        b_ih = self.param("b_ih", _uniform_init(k), (n_gates * h,))
        b_hh = self.param("b_hh", _uniform_init(k), (n_gates * h,))

        x_proj = jnp.einsum("bti,ig->btg", x, w_ih) + b_ih  # hoisted input matmul

        def rnn_step(carry, xt):
            (hprev,) = carry
            out = jnp.tanh(xt + hprev @ w_hh + b_hh)
            return (out,), out

        def gru_step(carry, xt):
            (hprev,) = carry
            # torch gate order: r, z, n
            xr, xz, xn = jnp.split(xt, 3, axis=-1)
            hr, hz, hn = jnp.split(hprev @ w_hh + b_hh, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            out = (1.0 - z) * n + z * hprev
            return (out,), out

        def lstm_step(carry, xt):
            hprev, cprev = carry
            # torch gate order: i, f, g, o
            gates = xt + hprev @ w_hh + b_hh
            ig, fg, gg, og = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(fg) * cprev + jax.nn.sigmoid(ig) * jnp.tanh(gg)
            out = jax.nn.sigmoid(og) * jnp.tanh(c)
            return (out, c), out

        h0 = jnp.zeros((b, h), x.dtype)
        if self.cell_type == "LSTM":
            carry0: Tuple = (h0, jnp.zeros((b, h), x.dtype))
            step = lstm_step
        else:
            carry0 = (h0,)
            step = {"RNN": rnn_step, "GRU": gru_step}[self.cell_type]

        xs = jnp.swapaxes(x_proj, 0, 1)  # [T, B, G*H]
        _, ys = jax.lax.scan(step, carry0, xs, reverse=self.reverse)
        return jnp.swapaxes(ys, 0, 1)  # [B, T, H]


class Recurrent(nn.Module):
    """Multi-layer, optionally bidirectional recurrent stack (torch semantics:
    outputs of the last layer at every timestep; bidirectional output is
    [forward ; backward] concatenated on the feature axis)."""

    hidden_size: int
    num_layers: int = 1
    cell_type: str = "RNN"
    bidirectional: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.cell_type not in ("RNN", "GRU", "LSTM"):
            raise ValueError("Seq type not recognised")  # reference main_modules.py:147-148
        out = x
        for layer in range(self.num_layers):
            fwd = _RecurrentDirection(
                self.hidden_size, self.cell_type, reverse=False, name=f"l{layer}_fwd"
            )(out)
            if self.bidirectional:
                bwd = _RecurrentDirection(
                    self.hidden_size, self.cell_type, reverse=True, name=f"l{layer}_bwd"
                )(out)
                out = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                out = fwd
        return out
