"""Self-attention view-fusion layer.

Re-derivation of the reference's ``SelfAttention`` wrapper around one torch
``TransformerEncoderLayer`` (models/main_modules.py:201-228): post-norm
residual attention + ReLU FFN over the V (=4) view tokens, then channel-wise
concatenation of the tokens into one [B, V*D] vector.

The sequence is only V=4 tokens, so there is nothing to shard here — the win
is folding the whole episode batch into the leading dim and letting the MXU
chew the [E*(S+Q), V, D] batch in one pass.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from audio_few_shot_learning_tpu.config import AttentionConfig
from audio_few_shot_learning_tpu.models.encoders import _torch_bias_init, _torch_dense_init


class SelfAttention(nn.Module):
    cfg: AttentionConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x: [B, V, D] view tokens -> [B, V*D] fused features."""
        d = self.cfg.embed_dim
        h = self.cfg.num_heads
        if d % h:
            raise ValueError("embed_dim must divide num_heads")
        dh = d // h
        b, v, _ = x.shape
        drop = nn.Dropout(rate=self.cfg.dropout, deterministic=not train)

        # --- multi-head self-attention (torch MultiheadAttention layout) ---
        qkv = nn.Dense(
            3 * d,
            kernel_init=_torch_dense_init,
            bias_init=nn.initializers.zeros,  # torch in_proj bias init is 0
            name="in_proj",
        )(x)
        q, k, vv = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, v, h, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, v, h, dh).transpose(0, 2, 1, 3)
        vv = vv.reshape(b, v, h, dh).transpose(0, 2, 1, 3)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(dh).astype(x.dtype)
        attn = nn.softmax(attn, axis=-1)
        attn = nn.Dropout(rate=self.cfg.dropout, deterministic=not train)(attn)
        ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, vv)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(b, v, d)
        ctx = nn.Dense(
            d,
            kernel_init=_torch_dense_init,
            bias_init=_torch_bias_init(d),
            name="out_proj",
        )(ctx)

        # post-norm residual (torch norm_first=False)
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x + drop(ctx))

        # --- FFN ---
        y = nn.Dense(
            self.cfg.ffn_dim,
            kernel_init=_torch_dense_init,
            bias_init=_torch_bias_init(d),
            name="linear1",
        )(x)
        y = drop(nn.relu(y))
        y = nn.Dense(
            d,
            kernel_init=_torch_dense_init,
            bias_init=_torch_bias_init(self.cfg.ffn_dim),
            name="linear2",
        )(y)
        x = nn.LayerNorm(epsilon=1e-5, name="norm2")(x + drop(y))

        # channel-wise concat of the view tokens (main_modules.py:225-226)
        return x.reshape(b, v * d)
