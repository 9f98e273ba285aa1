"""Evaluation: single-segment accuracy and multi-segment majority voting.

Majority vote re-derives reference loops/loops.py:169-247 as a fully
vectorized device computation over the padded [Q, S_max] segment layout, with
the three tie strategies:

  ""             first tied label in segment order (Counter insertion order)
  "min_label"    smallest tied label
  "max_posterior" label of the tied-label segment with the highest posterior

A literal host-side port (``majority_vote_accuracy_host``) doubles as the
table-driven test oracle.
"""

from __future__ import annotations

from collections import Counter
from typing import Optional

import jax.numpy as jnp
import numpy as np

TIE_STRATEGIES = ("", "min_label", "max_posterior")


def majority_vote_accuracy(
    predictions: jnp.ndarray,  # [Q, S] predicted labels per segment
    posteriors: jnp.ndarray,  # [Q, S] max score per segment
    seg_mask: jnp.ndarray,  # [Q, S] 1 = real segment
    true_labels: jnp.ndarray,  # [Q]
    n_way: int,
    tie_strategy: str = "",
) -> jnp.ndarray:
    """Vectorized majority vote. Returns scalar accuracy over Q queries."""
    if tie_strategy not in TIE_STRATEGIES:
        raise ValueError(f"unknown tie_strategy {tie_strategy!r}")
    q, s = predictions.shape
    onehot = (predictions[:, :, None] == jnp.arange(n_way)[None, None, :]).astype(
        jnp.float32
    ) * seg_mask[:, :, None]
    counts = onehot.sum(axis=1)  # [Q, N]
    max_count = counts.max(axis=1, keepdims=True)
    tied = (counts == max_count) & (counts > 0)  # [Q, N]

    if tie_strategy == "min_label":
        vote = jnp.argmax(tied, axis=1)  # first True = smallest label
    elif tie_strategy == "max_posterior":
        # among segments whose predicted label is tied, take the label of the
        # highest-posterior segment
        seg_tied = jnp.take_along_axis(tied, predictions, axis=1) & (seg_mask > 0)
        score = jnp.where(seg_tied, posteriors, -jnp.inf)
        best_seg = jnp.argmax(score, axis=1)  # [Q]
        vote = jnp.take_along_axis(predictions, best_seg[:, None], axis=1)[:, 0]
    else:
        # "": first tied label in order of first appearance among segments
        seg_tied = jnp.take_along_axis(tied, predictions, axis=1) & (seg_mask > 0)
        first_seg = jnp.argmax(seg_tied, axis=1)  # earliest tied segment
        vote = jnp.take_along_axis(predictions, first_seg[:, None], axis=1)[:, 0]

    return jnp.mean((vote == true_labels).astype(jnp.float32))


def majority_vote_accuracy_host(
    predicted_labels: np.ndarray,
    spectrogram_ids: np.ndarray,
    query_labels: np.ndarray,
    posterior_values: np.ndarray,
    tie_strategy: str = "min_label",
) -> float:
    """Literal port of calculate_majority_vote_accuracy (loops/loops.py:169-247)
    — the behavioral oracle for the device version."""
    unique_segments = np.unique(spectrogram_ids)
    correct = 0
    for segment in unique_segments:
        idx = [i for i, sid in enumerate(spectrogram_ids) if sid == segment]
        preds = [int(predicted_labels[i]) for i in idx]
        trues = [int(query_labels[i]) for i in idx]
        posts = [posterior_values[i] for i in idx]

        cnt = Counter(preds)
        max_count = max(cnt.values())
        tied = [lab for lab, c in cnt.items() if c == max_count]
        if len(tied) == 1:
            vote = tied[0]
        elif tie_strategy == "min_label":
            vote = min(tied)
        elif tie_strategy == "max_posterior":
            best, vote = -np.inf, None
            for i, lab in enumerate(preds):
                if lab in tied and posts[i] > best:
                    best, vote = posts[i], lab
        else:
            vote = tied[0]
        if vote == trues[0]:
            correct += 1
    return correct / len(unique_segments)
