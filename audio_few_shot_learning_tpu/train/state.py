"""Train state + optimizer (reference: Adam + MultiStepLR,
src/train_test.py:117-119)."""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from audio_few_shot_learning_tpu.config import ExperimentConfig, ModelConfig
from audio_few_shot_learning_tpu.models.protonets import FewShotEpisodeModel


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(
    lr: float, milestones: Sequence[int], gamma: float, steps_per_epoch: int
) -> optax.GradientTransformation:
    """Adam with torch-MultiStepLR semantics: lr multiplied by gamma at each
    epoch milestone (scheduler stepped per epoch in the reference,
    loops/loops.py:162)."""
    schedule = optax.piecewise_constant_schedule(
        init_value=lr,
        boundaries_and_scales={int(m) * steps_per_epoch: gamma for m in milestones},
    )
    # torch Adam defaults: b1=0.9 b2=0.999 eps=1e-8
    return optax.adam(learning_rate=schedule, b1=0.9, b2=0.999, eps=1e-8)


def create_train_state(
    key: jax.Array,
    exp: ExperimentConfig,
    mdl: ModelConfig,
    feat_shape: Tuple[int, int],
    optimizer: optax.GradientTransformation,
    n_way: Optional[int] = None,
    v_support: int = 1,
    v_query: int = 1,
) -> Tuple[FewShotEpisodeModel, TrainState]:
    model = FewShotEpisodeModel(exp=exp, mdl=mdl)
    f, t = feat_shape
    n_way = n_way or exp.n_way_train
    sup = jnp.zeros((1, n_way, v_support, f, t))
    qry = jnp.zeros((1, n_way, v_query, f, t))
    labels = jnp.broadcast_to(jnp.arange(n_way), (1, n_way))
    variables = model.init(
        {"params": key, "dropout": key},
        sup,
        qry,
        labels,
        n_way,
        train=False,
        with_contrastive=True,  # always create projection params
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return model, TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
    )


def param_count(params) -> int:
    return sum(int(jnp.size(p)) for p in jax.tree.leaves(params))
