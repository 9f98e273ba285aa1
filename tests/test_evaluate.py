"""Majority-vote tests: table-driven tie-strategy cases + device-vs-host
oracle equivalence (reference loops/loops.py:169-247)."""

import jax.numpy as jnp
import numpy as np
import pytest

from audio_few_shot_learning_tpu.train.evaluate import (
    majority_vote_accuracy,
    majority_vote_accuracy_host,
)


def _device_acc(preds, posts, mask, true, n_way, strategy):
    return float(
        majority_vote_accuracy(
            jnp.asarray(preds), jnp.asarray(posts), jnp.asarray(mask), jnp.asarray(true), n_way, strategy
        )
    )


# ---------------------------------------------------------------------------
# table-driven tie cases (one query per row, 4 segments)
# ---------------------------------------------------------------------------


def test_clear_majority():
    preds = np.array([[2, 2, 2, 1]])
    posts = np.array([[0.1, 0.1, 0.1, 9.9]])
    mask = np.ones((1, 4))
    assert _device_acc(preds, posts, mask, np.array([2]), 5, "") == 1.0
    assert _device_acc(preds, posts, mask, np.array([2]), 5, "min_label") == 1.0
    assert _device_acc(preds, posts, mask, np.array([2]), 5, "max_posterior") == 1.0


def test_tie_first_occurrence():
    # 3 and 1 tied (2 votes each); 3 appears first -> "" picks 3
    preds = np.array([[3, 1, 3, 1]])
    posts = np.array([[0.0, 5.0, 0.0, 5.0]])
    mask = np.ones((1, 4))
    assert _device_acc(preds, posts, mask, np.array([3]), 5, "") == 1.0
    assert _device_acc(preds, posts, mask, np.array([1]), 5, "") == 0.0


def test_tie_min_label():
    preds = np.array([[3, 1, 3, 1]])
    posts = np.array([[9.0, 0.0, 9.0, 0.0]])
    mask = np.ones((1, 4))
    assert _device_acc(preds, posts, mask, np.array([1]), 5, "min_label") == 1.0


def test_tie_max_posterior():
    preds = np.array([[3, 1, 3, 1]])
    posts = np.array([[0.2, 0.9, 0.1, 0.3]])
    mask = np.ones((1, 4))
    # highest posterior among tied-label segments is 0.9 at label 1
    assert _device_acc(preds, posts, mask, np.array([1]), 5, "max_posterior") == 1.0


def test_padded_segments_ignored():
    # without mask the padded segment would flip the vote
    preds = np.array([[2, 1, 1, 1]])
    posts = np.zeros((1, 4))
    mask = np.array([[1.0, 1.0, 0.0, 0.0]])
    # valid segments: [2, 1] -> tie; min_label -> 1
    assert _device_acc(preds, posts, mask, np.array([1]), 5, "min_label") == 1.0
    # "" -> first occurring tied label among valid = 2
    assert _device_acc(preds, posts, mask, np.array([2]), 5, "") == 1.0


def test_unknown_strategy_raises():
    with pytest.raises(ValueError):
        majority_vote_accuracy(
            jnp.zeros((1, 2), jnp.int32),
            jnp.zeros((1, 2)),
            jnp.ones((1, 2)),
            jnp.zeros((1,), jnp.int32),
            5,
            "bogus",
        )


# ---------------------------------------------------------------------------
# randomized equivalence with the host oracle (literal reference port)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("strategy", ["", "min_label", "max_posterior"])
def test_device_matches_host_oracle(strategy):
    rng = np.random.default_rng(0)
    for trial in range(20):
        q, smax, n_way = 10, 5, 5
        counts = rng.integers(1, smax + 1, size=q)
        preds = rng.integers(0, n_way, size=(q, smax))
        posts = rng.standard_normal((q, smax)).round(3)  # ties in posts unlikely
        mask = (np.arange(smax)[None, :] < counts[:, None]).astype(np.float32)
        true = rng.integers(0, n_way, size=q)

        # flatten to the reference's per-segment list format
        flat_preds, flat_ids, flat_true, flat_posts = [], [], [], []
        for i in range(q):
            for s in range(int(counts[i])):
                flat_preds.append(preds[i, s])
                flat_ids.append(i)
                flat_true.append(true[i])
                flat_posts.append(posts[i, s])
        oracle = majority_vote_accuracy_host(
            np.asarray(flat_preds),
            np.asarray(flat_ids),
            np.asarray(flat_true),
            np.asarray(flat_posts),
            tie_strategy=strategy,
        )
        got = _device_acc(preds, posts, mask, true, n_way, strategy)
        np.testing.assert_allclose(got, oracle, atol=1e-6, err_msg=f"trial {trial}")
