"""Angular Prototypical Loss (APL).

The reference wraps ``pytorch_metric_learning``'s AngularLoss + AngularMiner
(loops/loss.py:39-97). That library is reimplemented here from the Angular
Loss definition (Wang et al., "Deep Metric Learning with Angular Loss", ICCV
2017) under static masks:

* miner: keep triplets (a, p, n) — label(a)==label(p), label(n)!=label(a) —
  whose angle  atan(||a-p|| / (2*||(a+p)/2 - n||))  exceeds the configured
  threshold (degrees), computed on L2-normalized embeddings;
* loss:  f_apn = 4*tan^2(alpha) * (a+p)·n - 2*(1+tan^2(alpha)) * a·p  on
  normalized embeddings with alpha = 40 deg (the library's default — the
  reference constructs ``AngularLoss()`` with no args, loops/loss.py:43);
  per (a, p) pair: log(1 + sum_n exp(f_apn)) over kept negatives; mean over
  pairs with at least one kept negative.

Two modes, as in the reference:
* ``prototypes_as_anchors=True`` (loops/loss.py:68-83): anchors are
  prototypes, positives/negatives are queries. (The reference feeds the mined
  duplicate-expanded lists back through the library, which re-pairs across
  triplets; here the loss is computed directly over the mined triplets —
  functionally the published loss, without the library's duplicate-expansion
  artifact.)
* ``prototypes_as_anchors=False`` (loops/loss.py:84-96): prototypes and
  queries pooled into one embedding set, mined jointly.
"""

from __future__ import annotations

import jax.numpy as jnp


def _l2norm(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)


def _angular_core(
    anchors: jnp.ndarray,  # [A, D] normalized
    refs: jnp.ndarray,  # [R, D] normalized (positives & negatives both live here)
    anchor_labels: jnp.ndarray,  # [A]
    ref_labels: jnp.ndarray,  # [R]
    mine_angle_deg: float,
    loss_alpha_deg: float,
    exclude_self_pairs: bool,
) -> jnp.ndarray:
    a_lab = anchor_labels[:, None]
    r_lab = ref_labels[None, :]
    pos_mask = (a_lab == r_lab).astype(jnp.float32)  # [A, R]
    neg_mask = (a_lab != r_lab).astype(jnp.float32)  # [A, R]
    if exclude_self_pairs:
        # pooled mode: an element cannot be its own positive
        eye = jnp.eye(anchors.shape[0], refs.shape[0])
        pos_mask = pos_mask * (1.0 - eye)

    # pairwise quantities
    ap_dot = anchors @ refs.T  # [A, R]
    ap_sqdist = jnp.maximum(2.0 - 2.0 * ap_dot, 0.0)  # normalized embeddings
    ap_dist = jnp.sqrt(ap_sqdist + 1e-24)

    # centers c_{ap} = (a+p)/2 ; distance to every negative n
    # ||c - n||^2 = ||c||^2 - 2 c·n + 1 ; c·n = (a·n + p·n)/2
    c_sq = 0.25 * (2.0 + 2.0 * ap_dot)  # ||a+p||^2/4
    an = anchors @ refs.T  # [A, Rn] (a·n)
    pn = refs @ refs.T  # [Rp, Rn] (p·n)
    c_dot_n = 0.5 * (an[:, None, :] + pn[None, :, :])  # [A, Rp, Rn]
    nc_sq = jnp.maximum(c_sq[:, :, None] - 2.0 * c_dot_n + 1.0, 0.0)
    nc_dist = jnp.sqrt(nc_sq + 1e-24)

    angles = jnp.arctan(ap_dist[:, :, None] / (2.0 * nc_dist + 1e-24))  # [A, Rp, Rn]
    mined = (angles > jnp.deg2rad(mine_angle_deg)).astype(jnp.float32)

    triplet_mask = pos_mask[:, :, None] * neg_mask[:, None, :] * mined  # [A, Rp, Rn]

    sq_tan = jnp.tan(jnp.deg2rad(loss_alpha_deg)) ** 2
    apn = an[:, None, :] + pn[None, :, :]  # (a+p)·n
    f = 4.0 * sq_tan * apn - 2.0 * (1.0 + sq_tan) * ap_dot[:, :, None]

    # per-(a,p): log(1 + sum over kept n of exp(f)) — numerically safe form
    fmax = jnp.max(jnp.where(triplet_mask > 0, f, -jnp.inf), axis=-1)  # [A, Rp]
    has_neg = jnp.isfinite(fmax)
    m = jnp.maximum(jnp.where(has_neg, fmax, 0.0), 0.0)
    sums = jnp.sum(jnp.where(triplet_mask > 0, jnp.exp(f - m[:, :, None]), 0.0), axis=-1)
    pair_loss = m + jnp.log(jnp.exp(-m) + sums)

    pair_valid = (pos_mask > 0) & has_neg
    n_pairs = jnp.maximum(jnp.sum(pair_valid), 1.0)
    return jnp.sum(jnp.where(pair_valid, pair_loss, 0.0)) / n_pairs


def angular_loss(
    prototypes: jnp.ndarray,  # [N, D]
    queries: jnp.ndarray,  # [B, D]
    query_labels: jnp.ndarray,  # [B]
    angle: float,
    prototypes_as_anchors: bool,
    loss_alpha_deg: float = 40.0,
) -> jnp.ndarray:
    n_way = prototypes.shape[0]
    proto_labels = jnp.arange(n_way)
    protos_n = _l2norm(prototypes)
    queries_n = _l2norm(queries)

    if prototypes_as_anchors:
        return _angular_core(
            protos_n,
            queries_n,
            proto_labels,
            query_labels,
            mine_angle_deg=angle,
            loss_alpha_deg=loss_alpha_deg,
            exclude_self_pairs=False,
        )
    pooled = jnp.concatenate([protos_n, queries_n], axis=0)
    labels = jnp.concatenate([proto_labels, query_labels], axis=0)
    return _angular_core(
        pooled,
        pooled,
        labels,
        labels,
        mine_angle_deg=angle,
        loss_alpha_deg=loss_alpha_deg,
        exclude_self_pairs=True,
    )
