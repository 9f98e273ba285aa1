"""Checkpointing.

Two artifacts (SURVEY.md §5 checkpoint/resume plan):
* ``model.ckpt``  — best-by-val-accuracy model (params + batch_stats), the
  reference's ``experiments/<folder>/model.pt`` equivalent
  (callbacks/early_stopping.py:59-70);
* ``resume.ckpt`` — full training state (params, batch_stats, opt_state,
  epoch, RNG key, early-stopping counters) — genuine resume, which the
  reference lacks (optimizer/epoch state never saved).

Format: flax msgpack serialization (framework-independent, no torch pickle).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from audio_few_shot_learning_tpu.train.state import TrainState


def save_model(path: str, params: Any, batch_stats: Any) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {"params": params, "batch_stats": batch_stats}
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(payload)))


def load_model(path: str, template_params: Any, template_stats: Any) -> Tuple[Any, Any]:
    with open(path, "rb") as f:
        payload = serialization.from_bytes(
            {"params": template_params, "batch_stats": template_stats}, f.read()
        )
    return payload["params"], payload["batch_stats"]


def save_resume(
    path: str,
    state: TrainState,
    epoch: int,
    rng_key: jax.Array,
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "state": jax.device_get(state),
        "rng_key": np.asarray(jax.device_get(jax.random.key_data(rng_key))),
    }
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(payload))
    meta = {"epoch": int(epoch), **(extra or {})}
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)


def load_resume(path: str, template_state: TrainState):
    with open(path, "rb") as f:
        payload = serialization.from_bytes(
            {
                "state": jax.device_get(template_state),
                "rng_key": np.zeros((2,), np.uint32),
            },
            f.read(),
        )
    with open(path + ".meta.json") as f:
        meta = json.load(f)
    state = jax.tree.map(lambda x: jax.numpy.asarray(x), payload["state"])
    key = jax.random.wrap_key_data(jax.numpy.asarray(payload["rng_key"]))
    return state, key, meta
