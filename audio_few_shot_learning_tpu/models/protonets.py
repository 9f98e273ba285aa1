"""Prototypical-network episode models.

One flax module runs the *whole episode forward* that the reference spreads
across ``FewShotClassifier.process_support_set`` / ``forward`` /
``contrastive_forward`` (models/few_shot_classifier.py:64-142,
models/prototypical.py:46-126):

  encode all support+query views -> fuse views (attention | batch-concat) ->
  prototypes -> -cdist scores -> contrastive projections.

Variants, selected by config exactly like the reference:

* ``use_attention=True``  -> ContrastivePrototypicalNetworks
  (models/prototypical.py:46-93): per-item attention fusion of the V view
  tokens into a V*D feature.
* ``use_attention=False`` -> ContrastivePrototypicalNetworksWithoutAttention
  (models/prototypical.py:96-126): views concatenated along the batch axis
  (view-major), labels tiled xV by the caller (loops/loops.py:33-37).
* V=1, no contrastive -> plain PrototypicalNetworks (models/prototypical.py:15-43).

Parity quirks deliberately matched:
* contrastive_forward shuffles the augmented views but keeps the original
  first (models/prototypical.py:66-70) — here a permutation over views 1..V-1
  is passed in as data (``shuffle_perm``);
* the projection head always L2-normalizes (main_modules.py:253);
* prototypes for the contrastive loss are either projected or (caller-side)
  L2-normalized; ``project_prototypes`` overrides ``normalize_prototypes``
  (loops/loops.py:44-48).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from audio_few_shot_learning_tpu.config import ExperimentConfig, ModelConfig
from audio_few_shot_learning_tpu.models.attention import SelfAttention
from audio_few_shot_learning_tpu.models.encoders import make_backbone
from audio_few_shot_learning_tpu.models.projection import ProjectionHead
from audio_few_shot_learning_tpu.ops.protohead import compute_prototypes, prototype_scores


@struct.dataclass
class EpisodeOutputs:
    """Everything the losses/eval need from one episode forward.

    With attention: feature dim = V*embed_dim, n_support rows = S.
    Without attention: feature dim = encoder out_dim, n_support rows = S*V
    (views stacked view-major, labels tiled by the caller).
    """

    support_features: jnp.ndarray  # [S(*V), D]
    query_features: jnp.ndarray  # [Q(*V), D]
    prototypes: jnp.ndarray  # [N, D]
    scores: jnp.ndarray  # [Q(*V), N] = -euclidean distance
    cpl_features: Optional[jnp.ndarray]  # [Q(*V), P] projected (shuffled) queries
    cpl_prototypes_projected: Optional[jnp.ndarray]  # [N, P]


class FewShotEpisodeModel(nn.Module):
    """Episode-level forward. Inputs carry an explicit view axis V (V=1 when
    augmentation is off)."""

    exp: ExperimentConfig
    mdl: ModelConfig

    def setup(self):
        self.backbone = make_backbone(self.exp.encoder_name, self.mdl.cnn, self.mdl.hybrid)
        if self.exp.use_attention:
            self.attention = SelfAttention(self.mdl.attention)
        self.projection = ProjectionHead(self.mdl.projection)

    def encode_views(self, views: jnp.ndarray, train: bool) -> jnp.ndarray:
        """[B, V, F, T] -> [B, V, D] per-view backbone features.

        The whole (B*V) block goes through the backbone as one batch — this is
        the MXU-friendly replacement for the reference's per-view Python loop
        (models/main_modules.py:18-23). BatchNorm batch statistics are
        therefore computed over all views/items of the step jointly rather
        than per 25-item view group (documented deviation; identical running
        stats in expectation, identical eval behavior).
        """
        b, v, f, t = views.shape
        flat = views.reshape(b * v, f, t)
        feats = self.backbone(flat, train=train)
        return feats.reshape(b, v, -1)

    def __call__(
        self,
        support_views: jnp.ndarray,  # [S, V, F, T]
        query_views: jnp.ndarray,  # [Q, V, F, T]
        support_labels: jnp.ndarray,  # [S] ints (pre-tiling; tiled here if needed)
        n_way: int,
        shuffle_perm: Optional[jnp.ndarray] = None,  # [V-1] permutation of 1..V-1
        train: bool = False,
        with_contrastive: bool = False,
    ) -> EpisodeOutputs:
        s, v = support_views.shape[:2]
        q = query_views.shape[0]
        # one backbone pass over every (item, view) of the episode
        all_views = jnp.concatenate([support_views, query_views], axis=0)
        feats = self.encode_views(all_views, train)  # [S+Q, V, D]
        sup_f, qry_f = feats[:s], feats[s:]

        if self.exp.use_attention:
            fused = self.attention(feats, train=train)  # [S+Q, V*D]
            support_features = fused[:s]
            query_features = fused[s:]
            labels = support_labels
        else:
            # concat along batch, view-major (prototypical.py:103-106); labels
            # tiled xV like loops/loops.py:33-37
            support_features = jnp.swapaxes(sup_f, 0, 1).reshape(s * v, -1)
            query_features = jnp.swapaxes(qry_f, 0, 1).reshape(q * v, -1)
            labels = jnp.tile(support_labels, v)

        prototypes = compute_prototypes(support_features, labels, n_way)
        scores = prototype_scores(query_features, prototypes)

        cpl_features = None
        cpl_protos_proj = None
        if with_contrastive:
            if self.exp.use_attention:
                if shuffle_perm is None:
                    shuffle_perm = jnp.arange(1, v)
                idx = jnp.concatenate([jnp.zeros((1,), shuffle_perm.dtype), shuffle_perm])
                shuffled = jnp.take(qry_f, idx, axis=1)  # original stays first
                cpl_features = self.projection(self.attention(shuffled, train=train))
            else:
                cpl_features = self.projection(query_features)
            cpl_protos_proj = self.projection(prototypes)

        return EpisodeOutputs(
            support_features=support_features,
            query_features=query_features,
            prototypes=prototypes,
            scores=scores,
            cpl_features=cpl_features,
            cpl_prototypes_projected=cpl_protos_proj,
        )
