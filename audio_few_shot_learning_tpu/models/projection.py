"""Projection head and the config-only Relation head.

ProjectionHead re-derives reference models/main_modules.py:231-255:
Linear -> ReLU -> Linear -> L2 normalize. (The reference defines two
LayerNorms that its forward never applies, main_modules.py:243-246 — they are
deliberately omitted here.)

RelationHead: the reference config schema reserves a "Relation" block and a
``relation_head`` flag (README.md:417-424) but ships **no implementation**;
this MLP pair-scorer completes that declared-but-missing capability.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from audio_few_shot_learning_tpu.config import ProjectionConfig, RelationConfig
from audio_few_shot_learning_tpu.models.encoders import _torch_bias_init, _torch_dense_init


class ProjectionHead(nn.Module):
    cfg: ProjectionConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(
            self.cfg.hidden_dim,
            kernel_init=_torch_dense_init,
            bias_init=_torch_bias_init(self.cfg.input_dim),
            name="fc1",
        )(x)
        x = nn.relu(x)
        x = nn.Dense(
            self.cfg.output_dim,
            kernel_init=_torch_dense_init,
            bias_init=_torch_bias_init(self.cfg.hidden_dim),
            name="fc2",
        )(x)
        # always L2-normalize (main_modules.py:253, eps matches F.normalize)
        norm = jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        return x / norm


class RelationHead(nn.Module):
    """MLP relation scorer over [query ; prototype] concatenations."""

    cfg: RelationConfig

    @nn.compact
    def __call__(self, pairs: jnp.ndarray) -> jnp.ndarray:
        x = pairs
        for i, width in enumerate(
            (self.cfg.hidden_dim1, self.cfg.hidden_dim2, self.cfg.hidden_dim3)
        ):
            x = nn.Dense(
                width,
                kernel_init=_torch_dense_init,
                bias_init=_torch_bias_init(x.shape[-1]),
                name=f"fc{i + 1}",
            )(x)
            x = nn.relu(x)
        x = nn.Dense(
            self.cfg.out_dim,
            kernel_init=_torch_dense_init,
            bias_init=_torch_bias_init(x.shape[-1]),
            name="out",
        )(x)
        return x
