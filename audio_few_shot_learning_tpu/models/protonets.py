"""Prototypical-network episode models.

One flax module runs the *whole episode forward* that the reference spreads
across ``FewShotClassifier.process_support_set`` / ``forward`` /
``contrastive_forward`` (models/few_shot_classifier.py:64-142,
models/prototypical.py:46-126):

  encode all support+query views -> fuse views (attention | batch-concat) ->
  prototypes -> -cdist scores -> contrastive projections.

It natively consumes a *batch* of E episodes ([E, S, V, F, T]) — the
episode axis folds into the encoder batch (MXU utilization) and only the
prototype/score math is per-episode (vmapped pure functions). A single
episode ([S, V, F, T]) is the E=1 special case.

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
  is passed in as data (``shuffle_perm``, one per episode);
* the projection head always L2-normalizes (main_modules.py:253);
* prototypes for the contrastive loss are either projected or (caller-side)
  L2-normalized; ``project_prototypes`` overrides ``normalize_prototypes``
  (loops/loops.py:44-48).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from audio_few_shot_learning_tpu.config import ExperimentConfig, ModelConfig
from audio_few_shot_learning_tpu.models.attention import SelfAttention
from audio_few_shot_learning_tpu.models.encoders import make_backbone
from audio_few_shot_learning_tpu.models.projection import ProjectionHead
from audio_few_shot_learning_tpu.ops.pallas_utils import pallas_enabled
from audio_few_shot_learning_tpu.ops.protohead import (
    batched_episode_scores,
    compute_prototypes,
)


@struct.dataclass
class EpisodeOutputs:
    """Everything the losses/eval need from a batch of episode forwards.

    With attention: feature dim = V*embed_dim, support rows per episode = S.
    Without attention: feature dim = encoder out_dim, support rows = S*V
    (views stacked view-major; query labels must be tiled xV by the caller).
    All fields have a leading episode axis E (absent when called with a
    single unbatched episode).
    """

    support_features: jnp.ndarray  # [E, S(*V), D]
    query_features: jnp.ndarray  # [E, Q(*V), D]
    prototypes: jnp.ndarray  # [E, N, D]
    scores: jnp.ndarray  # [E, Q(*V), N] = -euclidean distance
    cpl_features: Optional[jnp.ndarray]  # [E, Q(*V), P]
    cpl_prototypes_projected: Optional[jnp.ndarray]  # [E, N, P]


class FewShotEpisodeModel(nn.Module):
    """Episode-level forward over batches of episodes with an explicit view
    axis V (V=1 when augmentation is off)."""

    exp: ExperimentConfig
    mdl: ModelConfig

    def setup(self):
        self.backbone = make_backbone(
            self.exp.encoder_name,
            self.mdl.cnn,
            self.mdl.hybrid,
            compute_dtype=self.exp.tpu.compute_dtype,
            remat=self.exp.tpu.remat_enabled(),
            fold_bn_eval=self.exp.tpu.fold_bn_eval,
        )
        if self.exp.use_attention:
            self.attention = SelfAttention(self.mdl.attention)
        self.projection = ProjectionHead(self.mdl.projection)
        if self.exp.relation_head:
            # RelationNet scoring (Sung et al. 2018): the reference reserves
            # the config flag + Relation block (README.md:417-424) but never
            # implemented it; completed here as pairwise [query;prototype]
            # relation logits replacing -cdist
            from audio_few_shot_learning_tpu.models.projection import RelationHead

            self.relation = RelationHead(self.mdl.relation)

    def __call__(
        self,
        support_views: jnp.ndarray,  # [E, S, V, F, T] or [S, V, F, T]
        query_views: jnp.ndarray,  # [E, Q, V, F, T] or [Q, V, F, T]
        support_labels: jnp.ndarray,  # [E, S] or [S] ints (pre-tiling)
        n_way: int,
        shuffle_perm: Optional[jnp.ndarray] = None,  # [E, V-1] or [V-1]
        train: bool = False,
        with_contrastive: bool = False,
    ) -> EpisodeOutputs:
        single = support_views.ndim == 4
        if single:
            support_views = support_views[None]
            query_views = query_views[None]
            support_labels = support_labels[None]
            if shuffle_perm is not None:
                shuffle_perm = shuffle_perm[None]

        e, s, vs, f, t = support_views.shape
        q, vq = query_views.shape[1:3]
        if self.exp.use_attention and vs != vq:
            # reference crashes on mismatched feature dims (cdist 256 vs 64);
            # rejected here with a clear error instead
            raise ValueError(
                "use_attention requires equal support/query view counts "
                f"(got {vs} vs {vq}) — enable query augmentations"
            )

        # one backbone pass over every (episode, item, view) — the reference's
        # per-view Python loop (main_modules.py:18-23) folded into one batch
        flat = jnp.concatenate(
            [support_views.reshape(e * s * vs, f, t), query_views.reshape(e * q * vq, f, t)],
            axis=0,
        )
        # A/B knob (tpu.bn_per_view_group): tell BatchNorm the (s, vs, q, vq)
        # layout of the fused batch so it can emulate the reference's
        # per-(episode, view, support|query) stat groups
        view_groups = (s, vs, q, vq) if self.exp.tpu.bn_per_view_group else None
        feats = self.backbone(flat, train=train, view_groups=view_groups).astype(jnp.float32)
        sup_f = feats[: e * s * vs].reshape(e, s, vs, -1)
        qry_f = feats[e * s * vs :].reshape(e, q, vq, -1)
        d = feats.shape[-1]

        if self.exp.use_attention:
            v = vs
            fused = self.attention(
                jnp.concatenate([sup_f, qry_f], axis=1).reshape(e * (s + q), v, d),
                train=train,
            ).reshape(e, s + q, v * d)
            support_features = fused[:, :s]
            query_features = fused[:, s:]
            labels = support_labels
        else:
            # concat along batch, view-major (prototypical.py:103-106); labels
            # tiled xV like loops/loops.py:33-37
            support_features = jnp.swapaxes(sup_f, 1, 2).reshape(e, s * vs, -1)
            query_features = jnp.swapaxes(qry_f, 1, 2).reshape(e, q * vq, -1)
            labels = jnp.tile(support_labels, (1, vs))

        prototypes = jax.vmap(lambda sf, lb: compute_prototypes(sf, lb, n_way))(
            support_features, labels
        )
        if self.exp.relation_head:
            qn = query_features.shape[1]
            pairs = jnp.concatenate(
                [
                    jnp.broadcast_to(
                        query_features[:, :, None, :],
                        (e, qn, n_way, query_features.shape[-1]),
                    ),
                    jnp.broadcast_to(
                        prototypes[:, None, :, :], (e, qn, n_way, prototypes.shape[-1])
                    ),
                ],
                axis=-1,
            )
            scores = self.relation(pairs)[..., 0]  # [E, Q, N] relation logits
        else:
            # fused Pallas episode head (prototypes + -cdist in VMEM) behind
            # the tpu.use_pallas knob; XLA vmap head otherwise. A/B numbers
            # in BASELINE.md decide the default.
            scores = batched_episode_scores(
                support_features,
                labels,
                query_features,
                n_way,
                use_pallas=self.exp.tpu.use_pallas and pallas_enabled(),
            )

        cpl_features = None
        cpl_protos_proj = None
        if with_contrastive:
            if self.exp.use_attention:
                if shuffle_perm is None:
                    shuffle_perm = jnp.broadcast_to(jnp.arange(1, vq), (e, vq - 1))
                idx = jnp.concatenate(
                    [jnp.zeros((e, 1), shuffle_perm.dtype), shuffle_perm], axis=1
                )  # original stays first
                shuffled = jnp.take_along_axis(qry_f, idx[:, None, :, None], axis=2)
                cpl_in = self.attention(shuffled.reshape(e * q, vq, d), train=train)
                cpl_features = self.projection(cpl_in).reshape(e, q, -1)
            else:
                cpl_features = self.projection(query_features)
            cpl_protos_proj = self.projection(prototypes)

        out = EpisodeOutputs(
            support_features=support_features,
            query_features=query_features,
            prototypes=prototypes,
            scores=scores,
            cpl_features=cpl_features,
            cpl_prototypes_projected=cpl_protos_proj,
        )
        if single:
            out = jax.tree.map(lambda x: x[0], out)
        return out
