"""Loss tests vs NumPy oracles (reference loops/loss.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.special

from audio_few_shot_learning_tpu.losses import angular_loss, cpl_loss, fsl_loss


# ---------------------------------------------------------------------------
# FSL
# ---------------------------------------------------------------------------


def test_fsl_matches_oracle():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((25, 256)).astype(np.float32)
    p = rng.standard_normal((5, 256)).astype(np.float32)
    labels = np.repeat(np.arange(5), 5)
    scores = -np.sqrt(((q[:, None] - p[None]) ** 2).sum(-1))
    logp = scores - scipy.special.logsumexp(scores, axis=1, keepdims=True)
    oracle = -logp[np.arange(25), labels].mean()
    out = float(fsl_loss(jnp.asarray(scores), jnp.asarray(labels)))
    np.testing.assert_allclose(out, oracle, rtol=1e-5)


def test_fsl_perfect_prediction_low_loss():
    scores = np.full((5, 5), -100.0, dtype=np.float32)
    np.fill_diagonal(scores, 0.0)
    out = float(fsl_loss(jnp.asarray(scores), jnp.arange(5)))
    assert out < 1e-3


# ---------------------------------------------------------------------------
# CPL
# ---------------------------------------------------------------------------


def _cpl_oracle_all_members(protos, queries, labels, t):
    """Reference CPL (loops/loss.py:118-165) with M == per-class count: the
    'sampling' deterministically selects every member, so the oracle is exact
    up to negative ordering (softmax is order-invariant)."""

    def cos(a, b):
        return (a * b).sum(-1) / np.maximum(
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1), 1e-8
        )

    b = queries.shape[0]
    losses = []
    for i in range(b):
        own = protos[labels[i]]
        neg = queries[labels != labels[i]]
        sims = cos(own[None, :], np.concatenate([neg, queries[i : i + 1]], axis=0)) / t
        logp = sims - scipy.special.logsumexp(sims)
        losses.append(-logp[-1])
    return np.mean(losses) / b


def test_cpl_matches_oracle_when_sampling_everything():
    rng = np.random.default_rng(1)
    protos = rng.standard_normal((5, 64)).astype(np.float32)
    queries = rng.standard_normal((25, 64)).astype(np.float32)
    labels = np.repeat(np.arange(5), 5)
    oracle = _cpl_oracle_all_members(protos, queries, labels, t=6.0)
    out = float(
        cpl_loss(
            jnp.asarray(protos),
            jnp.asarray(queries),
            jnp.asarray(labels),
            jax.random.PRNGKey(0),
            m_param=5,  # == class size -> samples all members
            t_param=6.0,
        )
    )
    np.testing.assert_allclose(out, oracle, rtol=1e-4, atol=1e-6)


def test_cpl_sampling_m_smaller_is_finite_and_near_full(rng):
    rngn = np.random.default_rng(2)
    protos = rngn.standard_normal((5, 64)).astype(np.float32)
    queries = rngn.standard_normal((25, 64)).astype(np.float32)
    labels = jnp.asarray(np.repeat(np.arange(5), 5))
    vals = [
        float(cpl_loss(jnp.asarray(protos), jnp.asarray(queries), labels, jax.random.PRNGKey(s), 3, 6.0))
        for s in range(8)
    ]
    assert all(np.isfinite(vals))
    full = _cpl_oracle_all_members(protos, queries, np.repeat(np.arange(5), 5), 6.0)
    # subsampled loss fluctuates around a value of the same scale
    assert 0.25 * full < np.mean(vals) < 4 * full


def test_cpl_self_alignment_lowers_loss(rng):
    """Queries sitting exactly on their own prototype (and far from others in
    angle) should yield lower loss than random queries."""
    rngn = np.random.default_rng(3)
    protos = np.eye(5, 64).astype(np.float32)
    aligned = np.repeat(protos, 5, axis=0)
    random_q = rngn.standard_normal((25, 64)).astype(np.float32)
    labels = jnp.asarray(np.repeat(np.arange(5), 5))
    la = float(cpl_loss(jnp.asarray(protos), jnp.asarray(aligned), labels, rng, 3, 1.0))
    lr = float(cpl_loss(jnp.asarray(protos), jnp.asarray(random_q), labels, rng, 3, 1.0))
    assert la < lr


def test_cpl_jit_and_grad(rng):
    protos = jnp.asarray(np.random.default_rng(4).standard_normal((5, 64)).astype(np.float32))
    queries = jnp.asarray(np.random.default_rng(5).standard_normal((25, 64)).astype(np.float32))
    labels = jnp.asarray(np.repeat(np.arange(5), 5))
    f = jax.jit(lambda p, q: cpl_loss(p, q, labels, rng, 3, 6.0))
    g = jax.grad(lambda p, q: cpl_loss(p, q, labels, rng, 3, 6.0), argnums=(0, 1))(protos, queries)
    assert np.isfinite(float(f(protos, queries)))
    assert all(np.isfinite(np.asarray(x)).all() for x in g)


# ---------------------------------------------------------------------------
# Angular
# ---------------------------------------------------------------------------


def _angular_oracle(protos, queries, labels, angle_deg, anchors_mode, alpha_deg=40.0):
    """Literal triple-loop implementation of the documented math."""

    def norm(x):
        return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    p = norm(protos)
    q = norm(queries)
    if anchors_mode:
        anchors, a_labels = p, np.arange(len(p))
        refs, r_labels = q, labels
        self_pairs = False
    else:
        anchors = refs = np.concatenate([p, q], axis=0)
        a_labels = r_labels = np.concatenate([np.arange(len(p)), labels])
        self_pairs = True

    sq_tan = np.tan(np.deg2rad(alpha_deg)) ** 2
    pair_losses = []
    for i in range(len(anchors)):
        for j in range(len(refs)):
            if a_labels[i] != r_labels[j]:
                continue
            if self_pairs and i == j:
                continue
            fs = []
            for k in range(len(refs)):
                if r_labels[k] == a_labels[i]:
                    continue
                ap = np.linalg.norm(anchors[i] - refs[j])
                c = (anchors[i] + refs[j]) / 2
                nc = np.linalg.norm(c - refs[k])
                ang = np.arctan(ap / (2 * nc))
                if ang <= np.deg2rad(angle_deg):
                    continue
                f = 4 * sq_tan * np.dot(anchors[i] + refs[j], refs[k]) - 2 * (1 + sq_tan) * np.dot(
                    anchors[i], refs[j]
                )
                fs.append(f)
            if fs:
                pair_losses.append(np.log1p(np.sum(np.exp(fs))))
    return np.mean(pair_losses) if pair_losses else 0.0


def test_angular_matches_oracle_anchor_mode():
    rng = np.random.default_rng(6)
    protos = rng.standard_normal((5, 32)).astype(np.float32)
    queries = rng.standard_normal((25, 32)).astype(np.float32)
    labels = np.repeat(np.arange(5), 5)
    for angle in (0.0, 15.0, 30.0):
        oracle = _angular_oracle(protos, queries, labels, angle, True)
        out = float(
            angular_loss(jnp.asarray(protos), jnp.asarray(queries), jnp.asarray(labels), angle, True)
        )
        np.testing.assert_allclose(out, oracle, rtol=1e-4, atol=1e-5)


def test_angular_matches_oracle_pooled_mode():
    rng = np.random.default_rng(7)
    protos = rng.standard_normal((4, 32)).astype(np.float32)
    queries = rng.standard_normal((12, 32)).astype(np.float32)
    labels = np.repeat(np.arange(4), 3)
    for angle in (0.0, 15.0):
        oracle = _angular_oracle(protos, queries, labels, angle, False)
        out = float(
            angular_loss(jnp.asarray(protos), jnp.asarray(queries), jnp.asarray(labels), angle, False)
        )
        np.testing.assert_allclose(out, oracle, rtol=1e-4, atol=1e-5)


def test_angular_extreme_threshold_gives_zero():
    rng = np.random.default_rng(8)
    protos = rng.standard_normal((5, 32)).astype(np.float32)
    queries = rng.standard_normal((25, 32)).astype(np.float32)
    labels = jnp.asarray(np.repeat(np.arange(5), 5))
    out = float(angular_loss(jnp.asarray(protos), jnp.asarray(queries), labels, 89.9, True))
    assert out == 0.0


def test_angular_grad_finite():
    rng = np.random.default_rng(9)
    protos = jnp.asarray(rng.standard_normal((5, 32)).astype(np.float32))
    queries = jnp.asarray(rng.standard_normal((25, 32)).astype(np.float32))
    labels = jnp.asarray(np.repeat(np.arange(5), 5))
    g = jax.grad(lambda p, q: angular_loss(p, q, labels, 15.0, True), argnums=(0, 1))(protos, queries)
    assert all(np.isfinite(np.asarray(x)).all() for x in g)
