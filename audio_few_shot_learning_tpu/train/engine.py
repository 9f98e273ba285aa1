"""The training/evaluation engine.

The reference's hot loop (loops/loops.py:19-64) does, per task, synchronous
disk reads, CPU augmentation, an H2D copy, 4 backbone passes and an optimizer
step — the GPU idles most of the time (SURVEY.md §3.1). Here the *entire
epoch* is one XLA program: ``lax.scan`` over fused train steps, each of which
samples a batch of E episodes from the HBM-resident store, augments on
device, runs the episode model, computes FSL (+CPL/APL) losses, and applies
the Adam update. Nothing touches the host between epochs.

Episode batching semantics: the reference takes one optimizer step per
episode; ``episode_batch=1`` reproduces that exactly, E>1 averages the
gradient over E episodes per step (throughput lever, documented deviation).

Multi-chip: episode batches shard over the ``episode`` mesh axis; parameters
are replicated and XLA inserts the psum for the gradient mean over ICI.
"""

from __future__ import annotations

import functools
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from audio_few_shot_learning_tpu.config import ExperimentConfig, ModelConfig
from audio_few_shot_learning_tpu.data.episodes import (
    EpisodeBatch,
    sample_episode,
    sample_wav_episode,
)
from audio_few_shot_learning_tpu.data.hoststore import HostStore
from audio_few_shot_learning_tpu.data.store import PackedStore
from audio_few_shot_learning_tpu.losses import angular_loss, cpl_loss, fsl_loss
from audio_few_shot_learning_tpu.ops.mel import MelSpec
from audio_few_shot_learning_tpu.ops.specaugment import spec_augment_views
from audio_few_shot_learning_tpu.ops.waveaugment import WaveAugment
from audio_few_shot_learning_tpu.parallel.mesh import (
    episode_sharding,
    make_mesh,
    replicated,
)
from audio_few_shot_learning_tpu.train.evaluate import majority_vote_accuracy
from audio_few_shot_learning_tpu.train.state import (
    TrainState,
    create_train_state,
    make_optimizer,
)

NUM_SPECAUG_VIEWS = 4  # fixed 4-view expansion (utils/augmentations.py:148-157)


def _l2norm(x, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def _np_rng_from_key(key: jax.Array) -> np.random.Generator:
    """Numpy Generator deterministically seeded from a jax PRNG key — the
    host sampler's RNG, derived from the checkpointed run key so resumed
    host-mode runs replay the same episode stream."""
    try:
        data = jax.random.key_data(key)
    except (TypeError, ValueError):
        data = key
    return np.random.default_rng(
        [int(x) for x in np.asarray(data, dtype=np.uint32).ravel()]
    )


class Trainer:
    """Owns the model, optimizer, compiled step functions and the stores."""

    def __init__(
        self,
        exp: ExperimentConfig,
        mdl: ModelConfig,
        train_store: PackedStore,
        val_store: Optional[PackedStore] = None,
        test_store: Optional[PackedStore] = None,
        mesh=None,
        seed: Optional[int] = None,
    ):
        self.exp = exp
        self.mdl = mdl
        self.train_store = train_store
        self.val_store = val_store
        self.test_store = test_store
        # host-resident store = split stays in host RAM, episodes stream per
        # step (splits bigger than HBM; see data/hoststore.py for spec,
        # data/wavhoststore.py for wav — BirdClef/VoxCeleb-scale raw audio)
        self.host_mode = getattr(train_store, "is_host_resident", False)
        self.mesh = mesh if mesh is not None else make_mesh(exp.tpu.mesh_shape)

        # hot-path kernel selection: the tpu.use_pallas knob gates every
        # Pallas kernel; pallas_enabled() auto-falls-back off-TPU
        from audio_few_shot_learning_tpu.ops.pallas_utils import pallas_enabled

        self.use_pallas = exp.tpu.use_pallas and pallas_enabled()

        self.is_wav = exp.input_type == "wav"
        self.specaug = (not self.is_wav) and exp.specaug_params.use
        self.waveaug = self.is_wav and exp.waveaug_params.use
        if self.specaug:
            self.v_support = NUM_SPECAUG_VIEWS
        elif self.waveaug:
            self.v_support = 1 + exp.waveaug_params.aug_num
        else:
            self.v_support = 1
        if self.is_wav:
            # on-the-fly extractor == the reference's device-resident
            # torchaudio MelSpectrogram + 10*log10 (src/train_test.py:123-129)
            self.mel = MelSpec(flavor="online")
            self.waveaugment = WaveAugment(exp.waveaug_params, dataset_name=exp.dataset_name)

        self.episode_batch = exp.tpu.episode_batch
        self.eval_episode_batch = exp.tpu.eval_episode_batch
        self.steps_per_epoch = -(-exp.n_training_tasks // self.episode_batch)
        # gradient accumulation: episodes per backward chunk. The conv stack's
        # full-resolution activations cap a single backward at ~4x50x4 inputs
        # on 16G HBM (even with remat); larger episode batches scan over
        # chunks and average the gradient — same semantics, bounded memory.
        self.microbatch = exp.tpu.episode_microbatch
        if self.microbatch is not None and self.episode_batch % self.microbatch != 0:
            raise ValueError(
                f"episode_microbatch={self.microbatch} must divide "
                f"episode_batch={self.episode_batch}"
            )

        self.optimizer = make_optimizer(
            exp.lr, exp.scheduler_milestones, exp.scheduler_gamma, self.steps_per_epoch
        )
        key = jax.random.PRNGKey(exp.tpu.seed if seed is None else seed)
        self.init_key, self.run_key = jax.random.split(key)
        if self.is_wav:
            from audio_few_shot_learning_tpu.config import HOP_LENGTH, N_MELS

            feat_shape = (N_MELS, 1 + train_store.seg_len // HOP_LENGTH)
        else:
            feat_shape = train_store.feat_shape
        self.model, self.state = create_train_state(
            self.init_key,
            exp,
            mdl,
            feat_shape=feat_shape,
            optimizer=self.optimizer,
            v_support=self.v_support,
            v_query=self._v_query(exp.train_query_augmentations),
        )
        self._epoch_fn = None
        self._host_step_fn = None
        self._eval_fns: Dict = {}
        # throughput accounting
        self.last_epoch_seconds: Optional[float] = None
        # episode-axis sharding constraint (multi-chip DP; no-op on 1 device)
        self._ep_sharding = (
            episode_sharding(self.mesh) if self.mesh.size > 1 else None
        )

    def _shard_episodes(self, ep: EpisodeBatch) -> EpisodeBatch:
        if self._ep_sharding is None:
            return ep
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, self._ep_sharding), ep
        )

    # ------------------------------------------------------------------
    # view construction
    # ------------------------------------------------------------------

    def _v_query(self, augment_query: bool) -> int:
        if self.specaug and augment_query:
            return NUM_SPECAUG_VIEWS
        if self.waveaug and augment_query:
            return 1 + self.exp.waveaug_params.aug_num
        return 1

    def _make_views(self, specs: jnp.ndarray, key: jax.Array, enabled: bool) -> jnp.ndarray:
        """[E, B, F, T] -> [E, B, V, F, T]; per-episode augmentation draws
        (masks shared within an episode, like one SpecAugment call per episode,
        utils/augmentations.py:49-56)."""
        if not enabled:
            return specs[:, :, None]
        e = specs.shape[0]
        keys = jax.random.split(key, e)
        views = jax.vmap(
            lambda s, k: spec_augment_views(
                s, k, self.exp.specaug_params, use_pallas=self.use_pallas
            )
        )(specs, keys)  # [E, B, 4, F, T]
        return views

    def _make_wav_views_pair(
        self,
        sup: jnp.ndarray,
        qry: jnp.ndarray,
        key_s: jax.Array,
        key_q: jax.Array,
        aug_q: bool,
        store,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Support and query wav views through ONE batched pipeline:
        augment (per-example draws) -> online mel -> glob z-norm
        (reference behavior: batch_creation.py:123-143).

        When both groups are augmented the WaveAugment chain (all its
        FFT/resample dispatches) runs once over the concatenated [E, S+Q, L]
        rows; the online mel + z-norm always runs as one dispatch over every
        view row of both groups. Every random draw in the chain is
        per-example, so the combined batch is draw-for-draw distributionally
        identical to two separate calls (VERDICT r02 item 2: batch the
        per-view FFTs across support/query)."""
        e, s, l = sup.shape
        q = qry.shape[1]
        aug_s = self.waveaug
        if aug_s == aug_q:
            # one chain application (or none) over support and query together
            combined = jnp.concatenate([sup, qry], axis=1)  # [E, S+Q, L]
            if aug_s:
                keys = jax.random.split(key_s, e)
                views = jax.vmap(lambda w, k: self.waveaugment(w, k))(combined, keys)
            else:
                views = combined[:, :, None]
            v = views.shape[2]
            flat = views.reshape(e * (s + q) * v, l)
            sizes = (s * v, q * v)
        else:
            # differing view counts: separate augmentation, shared mel
            if aug_s:
                keys = jax.random.split(key_s, e)
                sup_v = jax.vmap(lambda w, k: self.waveaugment(w, k))(sup, keys)
            else:
                sup_v = sup[:, :, None]
            if aug_q:
                keys = jax.random.split(key_q, e)
                qry_v = jax.vmap(lambda w, k: self.waveaugment(w, k))(qry, keys)
            else:
                qry_v = qry[:, :, None]
            vs, vq_ = sup_v.shape[2], qry_v.shape[2]
            flat = jnp.concatenate(
                [sup_v.reshape(e, s * vs, l), qry_v.reshape(e, q * vq_, l)], axis=1
            ).reshape(-1, l)
            sizes = (s * vs, q * vq_)
        mels = self.mel(flat)  # [., F, T]
        mels = (mels - store.mean) / store.std
        f, t = mels.shape[-2:]
        per_ep = mels.reshape(e, sizes[0] + sizes[1], f, t)
        sup_views = per_ep[:, : sizes[0]].reshape(e, s, sizes[0] // s, f, t)
        qry_views = per_ep[:, sizes[0] :].reshape(e, q, sizes[1] // q, f, t)
        return sup_views, qry_views

    # ------------------------------------------------------------------
    # train step / epoch
    # ------------------------------------------------------------------

    def _loss_and_metrics(self, params, batch_stats, ep: EpisodeBatch, key, n_way, vq, store=None):
        exp = self.exp
        e = ep.support.shape[0]
        k_aug_s, k_aug_q, k_drop, k_perm, k_cpl = jax.random.split(key, 5)

        if self.is_wav:
            sup_views, qry_views = self._make_wav_views_pair(
                ep.support, ep.query, k_aug_s, k_aug_q, vq > 1, store
            )
        else:
            sup_views = self._make_views(ep.support, k_aug_s, self.specaug)
            qry_views = self._make_views(ep.query, k_aug_q, vq > 1)

        if exp.use_attention and vq > 1:
            perms = jax.vmap(lambda k: jax.random.permutation(k, jnp.arange(1, vq)))(
                jax.random.split(k_perm, e)
            )
        else:
            perms = None

        outs, updates = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            sup_views,
            qry_views,
            ep.support_labels,
            n_way,
            shuffle_perm=perms,
            train=True,
            with_contrastive=exp.use_contrastive,
            rngs={"dropout": k_drop},
            mutable=["batch_stats"],
        )

        tile = 1 if exp.use_attention else vq
        q_labels = jnp.tile(ep.query_labels, (1, tile))  # loops/loops.py:36-37

        fsl = jax.vmap(fsl_loss)(outs.scores, q_labels)  # [E]

        aux = jnp.zeros_like(fsl)
        if exp.use_contrastive and (exp.loss.cpl.use or exp.loss.angular.use):
            if exp.project_prototypes:
                protos_c = outs.cpl_prototypes_projected  # project overrides normalize
            elif exp.normalize_prototypes:
                protos_c = _l2norm(outs.prototypes)
            else:
                protos_c = outs.prototypes
            if exp.loss.cpl.use:
                cpl_keys = jax.random.split(k_cpl, e)
                aux = jax.vmap(
                    lambda p, qf, lb, k: cpl_loss(
                        p, qf, lb, k, exp.loss.cpl.m_param, exp.loss.cpl.t_param
                    )
                )(protos_c, outs.cpl_features, q_labels, cpl_keys)
            else:
                aux = jax.vmap(
                    lambda p, qf, lb: angular_loss(
                        p,
                        qf,
                        lb,
                        exp.loss.angular.angle,
                        exp.loss.angular.prototypes_as_anchors,
                    )
                )(protos_c, outs.cpl_features, q_labels)

        total = jnp.mean(fsl + exp.loss.l_param * aux)
        metrics = {
            "loss": total,
            "fsl_loss": jnp.mean(fsl),
            "cpl_loss": jnp.mean(aux),
        }
        return total, (metrics, updates["batch_stats"])

    def _train_step(self, state: TrainState, store: PackedStore, key: jax.Array):
        exp = self.exp
        k_sample, k_loss = jax.random.split(key)
        ep_keys = jax.random.split(k_sample, self.episode_batch)
        sampler = sample_wav_episode if self.is_wav else sample_episode
        ep = jax.vmap(
            lambda k: sampler(
                k, store, exp.n_way_train, exp.n_shot_train, exp.n_query_train, False
            )
        )(ep_keys)
        return self._apply_train_step(state, ep, k_loss, store)

    def _apply_train_step(
        self,
        state: TrainState,
        ep: EpisodeBatch,
        k_loss: jax.Array,
        store: Optional[PackedStore] = None,
    ):
        """Gradient step on an already-assembled episode batch — the shared
        tail of the device-sampled scan step and the host-fed streaming step
        (HostStore path; ``store`` only feeds the wav mel-norm stats)."""
        exp = self.exp
        n_way = exp.n_way_train
        vq = self._v_query(exp.train_query_augmentations)

        grad_fn = jax.value_and_grad(self._loss_and_metrics, has_aux=True)
        m = self.microbatch
        if m is not None and m < self.episode_batch:
            chunks = self.episode_batch // m
            ep_c = jax.tree.map(lambda x: x.reshape(chunks, m, *x.shape[1:]), ep)
            keys_c = jax.random.split(k_loss, chunks)

            def chunk_step(carry, inp):
                stats, gsum, msum = carry
                epc, kc = inp
                epc = self._shard_episodes(epc)
                (_, (metrics, new_stats)), g = grad_fn(
                    state.params, stats, epc, kc, n_way, vq, store
                )
                return (
                    new_stats,
                    jax.tree.map(jnp.add, gsum, g),
                    jax.tree.map(jnp.add, msum, metrics),
                ), None

            zero_g = jax.tree.map(jnp.zeros_like, state.params)
            zero_m = {k: jnp.zeros(()) for k in ("loss", "fsl_loss", "cpl_loss")}
            (new_stats, gsum, msum), _ = jax.lax.scan(
                chunk_step, (state.batch_stats, zero_g, zero_m), (ep_c, keys_c)
            )
            grads = jax.tree.map(lambda g: g / chunks, gsum)
            metrics = jax.tree.map(lambda v: v / chunks, msum)
        else:
            ep = self._shard_episodes(ep)
            (_, (metrics, new_stats)), grads = grad_fn(
                state.params, state.batch_stats, ep, k_loss, n_way, vq, store
            )
        upd, new_opt = self.optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, upd)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
        )
        return new_state, metrics

    def _build_epoch_fn(self):
        steps = self.steps_per_epoch

        # The store is a jit ARGUMENT (not a closed-over constant: that would
        # embed the multi-GB packed split into the program and ship it to the
        # compiler per compile) and a scan-INVARIANT (not part of the carry:
        # XLA double-buffers carries, which would copy the store every step).
        @functools.partial(jax.jit, donate_argnums=(0,))
        def epoch_fn(state: TrainState, store: PackedStore, key: jax.Array):
            keys = jax.random.split(key, steps)
            return jax.lax.scan(
                lambda st, k: self._train_step(st, store, k), state, keys
            )

        return epoch_fn

    def _run_epoch_hostfed(self, key: jax.Array):
        """Streaming epoch over a HostStore: the host sampler assembles each
        episode batch (reference random.sample semantics) while the device
        runs the previous step — JAX dispatch is async, so the python loop
        only blocks on the device_put/step of an already-running pipeline.
        The numpy sampler is seeded from the (checkpointed) run key, so
        resumed runs replay the same episode stream."""
        exp = self.exp
        if self._host_step_fn is None:
            # the store is a static closure: only the wav mel-norm scalars
            # are read inside the trace (spec host batches are pre-normed)
            hstore = self.train_store if self.is_wav else None
            self._host_step_fn = jax.jit(
                lambda st, ep, k: self._apply_train_step(st, ep, k, hstore),
                donate_argnums=0,
            )
        rng = _np_rng_from_key(key)
        step_keys = jax.random.split(key, self.steps_per_epoch)
        per_step = []
        for i in range(self.steps_per_epoch):
            ep = self.train_store.sample_episode_batch(
                rng,
                exp.n_way_train,
                exp.n_shot_train,
                exp.n_query_train,
                is_test=False,
                batch=self.episode_batch,
            )
            self.state, metrics = self._host_step_fn(self.state, ep, step_keys[i])
            per_step.append(metrics)  # device scalars; don't sync mid-epoch
        return {
            name: jnp.stack([m[name] for m in per_step]) for name in per_step[0]
        }

    def train_epoch(self) -> Dict[str, float]:
        """One epoch == one device execution (scan over fused steps); for a
        host-resident split (HostStore), one per-step program fed by the host
        sampler with async-dispatch overlap."""
        self.run_key, k = jax.random.split(self.run_key)
        t0 = time.perf_counter()
        if self.host_mode:
            metrics = self._run_epoch_hostfed(k)
        else:
            if self._epoch_fn is None:
                self._epoch_fn = self._build_epoch_fn()
            self.state, metrics = self._epoch_fn(self.state, self.train_store, k)
        metrics = jax.device_get(metrics)
        self.last_epoch_seconds = time.perf_counter() - t0
        out = {name: float(np.mean(vals)) for name, vals in metrics.items()}
        if not (self.exp.use_contrastive and (self.exp.loss.cpl.use or self.exp.loss.angular.use)):
            out["cpl_loss"] = float("nan")  # reference reports NaN (loops/loops.py:59)
        out["episodes_per_sec"] = (
            self.steps_per_epoch * self.episode_batch / self.last_epoch_seconds
        )
        return out

    def profile_epoch(self, log_dir: str) -> Dict[str, float]:
        """Run one training epoch under a jax.profiler trace (SURVEY.md §5:
        the reference has no profiling). View with TensorBoard/xprof."""
        from audio_few_shot_learning_tpu.utils.profiling import profile_trace

        with profile_trace(log_dir):
            return self.train_epoch()

    # ------------------------------------------------------------------
    # evaluation
    # ------------------------------------------------------------------

    def _eval_batch(
        self,
        state: TrainState,
        store: PackedStore,
        key: jax.Array,
        n_way: int,
        k_shot: int,
        k_query: int,
        augment_query: bool,
        multisegment: bool,
        tie_strategy: str,
        batch: int,
    ) -> jnp.ndarray:
        """Accuracies for one batch of eval episodes. Returns [batch]."""
        k_sample, k_score = jax.random.split(key)
        ep_keys = jax.random.split(k_sample, batch)
        sampler = sample_wav_episode if self.is_wav else sample_episode
        ep = jax.vmap(
            lambda k: sampler(k, store, n_way, k_shot, k_query, multisegment)
        )(ep_keys)
        return self._eval_episodes(
            state, ep, k_score, n_way, augment_query, multisegment,
            tie_strategy, store.s_max, store,
        )

    def _eval_episodes(
        self,
        state: TrainState,
        ep: EpisodeBatch,
        key: jax.Array,
        n_way: int,
        augment_query: bool,
        multisegment: bool,
        tie_strategy: str,
        s_max: int,
        store: Optional[PackedStore] = None,
    ) -> jnp.ndarray:
        """Score an already-assembled eval episode batch — shared tail of the
        device-sampled eval program and the host-fed (HostStore) eval path.
        ``store`` only feeds the wav mel-norm stats."""
        exp = self.exp
        vq = self._v_query(augment_query)
        batch = ep.support.shape[0]
        k_aug_s, k_aug_q = jax.random.split(key)
        ep = self._shard_episodes(ep)

        if self.is_wav:
            sup_views, qry_views = self._make_wav_views_pair(
                ep.support, ep.query, k_aug_s, k_aug_q, vq > 1, store
            )
        else:
            sup_views = self._make_views(ep.support, k_aug_s, self.specaug)
            qry_views = self._make_views(ep.query, k_aug_q, vq > 1)

        outs = self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            sup_views,
            qry_views,
            ep.support_labels,
            n_way,
            train=False,
            with_contrastive=False,
        )
        tile = 1 if exp.use_attention else vq
        q_labels = jnp.tile(ep.query_labels, (1, tile))

        if not multisegment:
            preds = jnp.argmax(outs.scores, axis=-1)  # [E, Q*]
            return jnp.mean((preds == q_labels).astype(jnp.float32), axis=-1)

        # multi-segment majority vote. Quirk preserved: the no-attention
        # variant's extra view rows are ignored because the reference's
        # audio_ids are never tiled (loops/loops.py:257-277) — votes use the
        # original-view block, which is first in view-major order.
        qtot = ep.query.shape[1]  # Q * S_max rows (original view)
        smax = s_max
        q = qtot // smax
        scores0 = outs.scores[:, :qtot]
        preds = jnp.argmax(scores0, axis=-1).reshape(batch, q, smax)
        posts = jnp.max(scores0, axis=-1).reshape(batch, q, smax)
        mask = ep.query_mask.reshape(batch, q, smax)
        true = ep.query_labels.reshape(batch, q, smax)[:, :, 0]
        return jax.vmap(
            lambda p, po, m, t: majority_vote_accuracy(p, po, m, t, n_way, tie_strategy)
        )(preds, posts, mask, true)

    def _eval_segment_budget(self, store: PackedStore) -> int:
        """Segment-episode budget for one multi-segment eval program.

        Explicit ``tpu.eval_segment_budget`` wins. Otherwise derive from the
        device's reported memory limit and the store's per-segment feature
        size, anchored at the measured point: 36 segment-episodes fit a
        16 GB v5e with 128x157 features and the flagship 5w5s5q/4-view model
        resident (96 OOMed). Devices that don't report memory (CPU backend)
        fall back to the anchor.
        """
        if self.exp.tpu.eval_segment_budget is not None:
            return max(1, self.exp.tpu.eval_segment_budget)
        anchor, anchor_feat, anchor_bytes = 36, 128 * 157, 16e9
        feat = int(np.prod(store.feat_shape))
        mem_ratio = 1.0
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            limit = stats.get("bytes_limit")
            if limit:
                mem_ratio = float(limit) / anchor_bytes
        except Exception:
            pass
        # The linear model ignores model/optimizer residency (the anchor's
        # OOM margin is <3x), so when extrapolating to a larger-HBM device
        # only credit 70% of the extra memory (advisor round-2 finding);
        # tpu.eval_segment_budget remains the explicit escape hatch.
        if mem_ratio > 1.0:
            mem_ratio = 1.0 + 0.7 * (mem_ratio - 1.0)
        return max(1, int(anchor * mem_ratio * anchor_feat / max(feat, 1)))

    def evaluate(
        self,
        store: PackedStore,
        n_tasks: int,
        n_way: int,
        k_shot: int,
        k_query: int,
        augment_query: bool,
        multisegment: bool = False,
        tie_strategy: str = "",
    ) -> Tuple[float, float]:
        """Mean/std of per-task accuracy over n_tasks episodes."""
        batch = min(self.eval_episode_batch, n_tasks)
        if multisegment:
            # Multi-segment queries expand every query item into s_max padded
            # segments, so activation memory per program scales with
            # batch * s_max ("segment-episodes"). Eval is forward-only, so
            # the old train-style batch//s_max rule was ~3x too conservative
            # (s_max=6 x batch 6 -> 73.7 eval eps/s vs 38.9).
            seg_budget = self._eval_segment_budget(store)
            batch = max(1, min(batch, seg_budget // max(store.s_max, 1)))
        is_host = getattr(store, "is_host_resident", False)
        cache_key = ("host" if is_host else "dev", store.s_max, store.feat_shape, n_way, k_shot, k_query, augment_query, multisegment, tie_strategy, batch)
        if cache_key not in self._eval_fns:
            if is_host:
                self._eval_fns[cache_key] = jax.jit(
                    functools.partial(
                        self._eval_episodes,
                        n_way=n_way,
                        augment_query=augment_query,
                        multisegment=multisegment,
                        tie_strategy=tie_strategy,
                        s_max=store.s_max,
                        # static closure; only wav mel-norm scalars are read
                        store=store if self.is_wav else None,
                    )
                )
            else:
                self._eval_fns[cache_key] = jax.jit(
                    functools.partial(
                        self._eval_batch,
                        n_way=n_way,
                        k_shot=k_shot,
                        k_query=k_query,
                        augment_query=augment_query,
                        multisegment=multisegment,
                        tie_strategy=tie_strategy,
                        batch=batch,
                    )
                )
        fn = self._eval_fns[cache_key]
        accs = []
        remaining = n_tasks
        while remaining > 0:
            self.run_key, k = jax.random.split(self.run_key)
            if is_host:
                ep = store.sample_episode_batch(
                    _np_rng_from_key(k), n_way, k_shot, k_query,
                    is_test=multisegment, batch=batch,
                )
                accs.append(np.asarray(jax.device_get(fn(self.state, ep, k))))
            else:
                accs.append(np.asarray(jax.device_get(fn(self.state, store, k))))
            remaining -= batch
        accs = np.concatenate(accs)[:n_tasks]
        return float(accs.mean()), float(accs.std())

    def validate(self) -> Tuple[float, float]:
        exp = self.exp
        return self.evaluate(
            self.val_store,
            n_tasks=exp.n_training_tasks,  # reference uses num_train_tasks for val (src/train_test.py:136)
            n_way=exp.n_way_validation,
            k_shot=exp.n_shot_validation,
            k_query=exp.n_query_validation,
            augment_query=exp.validation_query_augmentations,
        )

    def test(self) -> Dict[str, float]:
        exp = self.exp
        mean, std = self.evaluate(
            self.test_store,
            n_tasks=exp.n_testing_tasks,
            n_way=exp.n_way_test,
            k_shot=exp.n_shot_test,
            k_query=exp.n_query_test,
            augment_query=exp.test_query_augmentations,
            multisegment=exp.multi_segm,
            tie_strategy=exp.tie_strategy,
        )
        return {"mean_accuracy": mean, "accuracy_std": std}

    def predict_episode(
        self,
        support: np.ndarray,
        support_labels: np.ndarray,
        query: np.ndarray,
        n_way: Optional[int] = None,
        key: Optional[jax.Array] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Classify FIXED query items against a FIXED support set — the
        serving entry point (cli/predict.py). The reference has no inference
        path at all (train/test only, src/train_test.py); this runs the exact
        eval-time view/model pipeline on one caller-supplied episode instead
        of a sampled one.

        support: [S, F, T] spec features (already normalized like the
        training store) for spec models, or [S, L] raw waveforms for wav
        models (mel + glob z-norm happen on device exactly as in eval).
        support_labels: [S] ints in [0, n_way). query: [Q, F, T] / [Q, L].
        Returns (pred [Q] class indices, scores [Q, n_way] f32). View
        semantics mirror test-time eval: support uses the training
        augmentation bank, queries follow ``test_query_augmentations``
        (attention models REQUIRE it — matched view counts); ``key`` fixes
        the draws (default: deterministic). For no-attention models with
        augmented queries, predictions are the original-view scores (the
        extra view rows are eval-accuracy tiling, not votes — matches the
        reference's untiled audio_ids, loops/loops.py:257-277).
        """
        sup = jnp.asarray(support)[None]
        qry = jnp.asarray(query)[None]
        labs = jnp.asarray(support_labels, jnp.int32)[None]
        if n_way is None:
            n_way = int(np.asarray(support_labels).max()) + 1
        if key is None:
            key = jax.random.PRNGKey(0)

        # dtype is part of the key: jit retraces on dtype anyway, so a bf16
        # store and f32 caller inputs must map to distinct cached callables
        # (VERDICT r03 item 8).
        cache_key = ("predict", sup.shape, str(sup.dtype), qry.shape, str(qry.dtype), n_way)
        if cache_key not in self._eval_fns:

            def fn(state, sup, qry, labs, k):
                k_aug_s, k_aug_q = jax.random.split(k)
                vq = self._v_query(self.exp.test_query_augmentations)
                if self.is_wav:
                    sup_views, qry_views = self._make_wav_views_pair(
                        sup, qry, k_aug_s, k_aug_q, vq > 1, self.train_store
                    )
                else:
                    sup_views = self._make_views(sup, k_aug_s, self.specaug)
                    qry_views = self._make_views(qry, k_aug_q, vq > 1)
                outs = self.model.apply(
                    {"params": state.params, "batch_stats": state.batch_stats},
                    sup_views,
                    qry_views,
                    labs,
                    n_way,
                    train=False,
                    with_contrastive=False,
                )
                # attention: Q rows; no-attention + augmented queries: Q*vq
                # rows view-major — keep the original-view block
                scores = outs.scores[0][: qry.shape[1]]  # [Q, n_way]
                return jnp.argmax(scores, axis=-1), scores

            self._eval_fns[cache_key] = jax.jit(fn)
        pred, scores = self._eval_fns[cache_key](self.state, sup, qry, labs, key)
        return np.asarray(pred), np.asarray(jax.device_get(scores), dtype=np.float32)
