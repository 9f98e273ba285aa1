"""Stateful few-shot classifier API, mirroring the reference's class surface.

The reference exposes torch modules with a ``process_support_set`` /
``forward`` / ``contrastive_forward`` object protocol
(models/few_shot_classifier.py:13-148, models/prototypical.py:15-126). The
TPU engine uses the functional ``FewShotEpisodeModel`` directly, but users
porting code from the reference get the same protocol here — a thin stateful
wrapper that holds (params, batch_stats) and the processed support set.

Class names match the reference:
  * PrototypicalNetworks                              (prototypical.py:15-43)
  * ContrastivePrototypicalNetworks                   (prototypical.py:46-93)
  * ContrastivePrototypicalNetworksWithoutAttention   (prototypical.py:96-126)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from audio_few_shot_learning_tpu.config import ExperimentConfig, ModelConfig
from audio_few_shot_learning_tpu.models.protonets import FewShotEpisodeModel
from audio_few_shot_learning_tpu.ops.protohead import compute_prototypes, prototype_scores
from audio_few_shot_learning_tpu.ops.util_functions import cosine_scores


class FewShotClassifier:
    """Base protocol: store support set -> prototypes; score queries by
    (negative euclidean | cosine) distance to prototypes. Optional softmax
    output, feature centering and feature normalization hooks
    (few_shot_classifier.py:18-48,96-126)."""

    def __init__(
        self,
        exp: ExperimentConfig,
        mdl: ModelConfig,
        variables=None,
        rng: Optional[jax.Array] = None,
        use_softmax: bool = False,
        feature_centering: Optional[jnp.ndarray] = None,
        feature_normalization: Optional[float] = None,
    ):
        self.exp = exp
        self.model = FewShotEpisodeModel(exp=exp, mdl=mdl)
        self.use_softmax = use_softmax
        self.feature_centering = feature_centering
        self.feature_normalization = feature_normalization
        self.prototypes: Optional[jnp.ndarray] = None
        self.support_features: Optional[jnp.ndarray] = None
        self.support_labels: Optional[jnp.ndarray] = None
        self._n_way: Optional[int] = None
        self._query_feature_views: Optional[jnp.ndarray] = None

        # parameters initialize lazily on the first call (input shape defines
        # the CNN flatten width, encoders.py:_LogitsHead)
        self.variables = variables
        self._rng = jax.random.PRNGKey(0) if rng is None else rng

    def _ensure_init(self, views: jnp.ndarray) -> None:
        if self.variables is not None:
            return
        s, v, f, t = views.shape
        self.variables = self.model.init(
            {"params": self._rng, "dropout": self._rng},
            jnp.zeros((2, v, f, t)),
            jnp.zeros((2, v, f, t)),
            jnp.zeros((2,), jnp.int32),
            2,
            train=False,
            with_contrastive=True,
        )

    # -- feature plumbing ----------------------------------------------------

    def _postprocess(self, feats: jnp.ndarray) -> jnp.ndarray:
        if self.feature_centering is not None:
            feats = feats - self.feature_centering
        if self.feature_normalization is not None:
            norm = jnp.linalg.norm(feats, ord=self.feature_normalization, axis=1, keepdims=True)
            feats = feats / jnp.maximum(norm, 1e-12)
        return feats

    def _encode(self, views: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """views: [B, V, F, T] -> (fused features [B(*V), D], per-view feats)."""
        outs = self.model.apply(
            self.variables,
            views,
            views[:1],  # dummy query block
            jnp.zeros((views.shape[0],), jnp.int32),
            1,
            train=False,
            with_contrastive=False,
        )
        return outs.support_features, None

    # -- reference protocol ----------------------------------------------------

    def process_support_set(self, support_views: jnp.ndarray, support_labels: jnp.ndarray):
        """support_views: [S, V, F, T] (V=1 when unaugmented);
        support_labels: [S]."""
        self._ensure_init(support_views)
        n_way = int(jnp.max(support_labels)) + 1
        outs = self.model.apply(
            self.variables,
            support_views,
            support_views[:1],
            support_labels,
            n_way,
            train=False,
            with_contrastive=False,
        )
        feats = self._postprocess(outs.support_features)
        labels = support_labels
        if not self.exp.use_attention:
            labels = jnp.tile(support_labels, support_views.shape[1])
        self.support_features = feats
        self.support_labels = labels
        self.prototypes = compute_prototypes(feats, labels, n_way)
        self._n_way = n_way

    def compute_query_features(self, query_views: jnp.ndarray) -> jnp.ndarray:
        self._ensure_init(query_views)
        outs = self.model.apply(
            self.variables,
            query_views[:1],
            query_views,
            jnp.zeros((1,), jnp.int32),
            1,
            train=False,
            with_contrastive=False,
        )
        return self._postprocess(outs.query_features)

    def l2_distance_to_prototypes(self, samples: jnp.ndarray) -> jnp.ndarray:
        return prototype_scores(samples, self.prototypes)

    def cosine_distance_to_prototypes(self, samples: jnp.ndarray) -> jnp.ndarray:
        return cosine_scores(samples, self.prototypes)

    def softmax_if_specified(self, output: jnp.ndarray, temperature: float = 1.0) -> jnp.ndarray:
        return jax.nn.softmax(temperature * output, axis=-1) if self.use_softmax else output

    def __call__(self, query_views: jnp.ndarray, inference: bool = False) -> jnp.ndarray:
        feats = self.compute_query_features(query_views)
        if inference:
            return self.softmax_if_specified(self.l2_distance_to_prototypes(feats))
        return feats

    @staticmethod
    def is_transductive() -> bool:
        return False


class PrototypicalNetworks(FewShotClassifier):
    """Plain ProtoNet: forward returns softmax-able -cdist scores
    (prototypical.py:26-43)."""

    def __call__(self, query_views: jnp.ndarray, inference: bool = True) -> jnp.ndarray:
        feats = self.compute_query_features(query_views)
        return self.softmax_if_specified(self.l2_distance_to_prototypes(feats))


class ContrastivePrototypicalNetworks(FewShotClassifier):
    """Attention-fusion variant with contrastive_forward
    (prototypical.py:46-93)."""

    def contrastive_forward(
        self, query_views: jnp.ndarray, project_prototypes: bool, key: Optional[jax.Array] = None
    ):
        v = query_views.shape[1]
        if key is None:
            perm = jnp.arange(1, v)
        else:
            perm = jax.random.permutation(key, jnp.arange(1, v))
        n_way = self._n_way or 1
        outs = self.model.apply(
            self.variables,
            query_views[:1],
            query_views,
            jnp.zeros((1,), jnp.int32),
            1,
            shuffle_perm=perm,
            train=False,
            with_contrastive=True,
        )
        projected_features = outs.cpl_features
        if project_prototypes:
            protos = self.model.apply(
                self.variables, self.prototypes, method=lambda m, p: m.projection(p)
            )
        else:
            protos = self.prototypes
        return projected_features, protos


class ContrastivePrototypicalNetworksWithoutAttention(ContrastivePrototypicalNetworks):
    """Batch-concat variant (prototypical.py:96-126); callers tile labels xV
    exactly like loops/loops.py:33-37."""
