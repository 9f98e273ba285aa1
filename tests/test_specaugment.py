"""SpecAugment semantics tests (reference utils/augmentations.py:21-157)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audio_few_shot_learning_tpu.config import SpecAugParams
from audio_few_shot_learning_tpu.ops.specaugment import (
    _hermite_warp_positions,
    _warp_matrix,
    spec_augment_views,
    time_warp,
)

PARAMS = SpecAugParams(use=True, mask_param=16, W=22, num_mask=1, mask_value=0.0, p=0.282)


def test_views_shape(rng):
    spec = jnp.ones((6, 128, 157))
    views = spec_augment_views(spec, rng, PARAMS, use_pallas=False)
    assert views.shape == (6, 4, 128, 157)
    # view 0 is the untouched original
    np.testing.assert_array_equal(np.asarray(views[:, 0]), np.asarray(spec))


def test_time_mask_is_contiguous_time_band(rng):
    spec = jnp.ones((2, 128, 157))
    views = np.asarray(spec_augment_views(spec, rng, PARAMS, use_pallas=False))
    tview = views[:, 2]
    masked_cols = (tview == 0.0).all(axis=1)  # [B, T]: fully-masked time cols
    assert masked_cols.any()
    # same mask across the batch (reference draws once per call)
    np.testing.assert_array_equal(masked_cols[0], masked_cols[1])
    # contiguous interval, length within [1, min(mask_param, p*T)]
    cols = np.where(masked_cols[0])[0]
    assert (np.diff(cols) == 1).all()
    assert 1 <= len(cols) <= min(PARAMS.mask_param, int(PARAMS.p * 157))
    # untouched elsewhere
    assert (tview[:, :, ~masked_cols[0]] == 1.0).all()


def test_freq_mask_is_contiguous_freq_band(rng):
    spec = jnp.ones((2, 128, 157))
    views = np.asarray(spec_augment_views(spec, rng, PARAMS, use_pallas=False))
    fview = views[:, 3]
    masked_rows = (fview == 0.0).all(axis=2)  # [B, F]
    rows = np.where(masked_rows[0])[0]
    assert 1 <= len(rows) <= PARAMS.mask_param
    assert (np.diff(rows) == 1).all()


def test_num_mask_2():
    params = SpecAugParams(use=True, mask_param=7, W=20, num_mask=2, mask_value=0.0, p=0.3127)
    spec = jnp.ones((1, 128, 157))
    total = 0
    for seed in range(8):
        views = np.asarray(spec_augment_views(spec, jax.random.PRNGKey(seed), params, use_pallas=False))
        cols = np.where((views[0, 2] == 0.0).all(axis=0))[0]
        total = max(total, len(np.split(cols, np.where(np.diff(cols) != 1)[0] + 1)))
    assert total >= 1  # at least one band; two bands appear when draws don't overlap
    assert total <= 2


def test_mask_value_respected(rng):
    params = SpecAugParams(use=True, mask_param=16, W=22, num_mask=1, mask_value=-5.0, p=0.282)
    spec = jnp.ones((1, 128, 157))
    views = np.asarray(spec_augment_views(spec, rng, params, use_pallas=False))
    assert (views[0, 2] == -5.0).any()


def test_warp_endpoints_fixed():
    """align_corners=True spline maps t=0 -> 0 and t=T-1 -> T-1 exactly."""
    key = jax.random.PRNGKey(3)
    t_len = 157
    ys = _hermite_warp_positions(key, t_len, 22)
    np.testing.assert_allclose(float(ys[0]), -1.0, atol=1e-5)
    np.testing.assert_allclose(float(ys[-1]), 1.0, atol=1e-5)
    # monotone-ish: mostly increasing
    assert float(ys[-1]) > float(ys[0])


def test_warp_matrix_partition_of_unity():
    """Interior columns of the interpolation matrix sum to 1 (bilinear weights)."""
    key = jax.random.PRNGKey(4)
    t_len = 157
    ys = _hermite_warp_positions(key, t_len, 22)
    m = np.asarray(_warp_matrix(ys, t_len))
    col_sums = m.sum(axis=0)
    in_range = (np.asarray(ys) >= -1.0) & (np.asarray(ys) <= 1.0)
    np.testing.assert_allclose(col_sums[in_range], 1.0, atol=1e-5)


def test_warp_identity_on_linear_ramp():
    """Warping preserves values at the fixed endpoints."""
    key = jax.random.PRNGKey(5)
    spec = jnp.broadcast_to(jnp.arange(157.0)[None, None, :], (1, 4, 157))
    out = np.asarray(time_warp(spec, key, 22))
    np.testing.assert_allclose(out[0, 0, 0], 0.0, atol=1e-4)
    np.testing.assert_allclose(out[0, 0, -1], 156.0, atol=1e-3)
    # values stay within the ramp's range (interpolation, no extrapolation)
    assert out.min() >= -1e-3 and out.max() <= 156.0 + 1e-3


def test_pallas_interpret_matches_xla(rng):
    from jax.experimental.pallas import tpu as pltpu

    spec = jax.random.normal(jax.random.PRNGKey(7), (3, 128, 157))
    ref = spec_augment_views(spec, rng, PARAMS, use_pallas=False)
    with pltpu.force_tpu_interpret_mode():
        out = spec_augment_views(spec, rng, PARAMS, use_pallas=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_jit_compatible(rng):
    spec = jnp.ones((2, 128, 157))
    f = jax.jit(lambda s, k: spec_augment_views(s, k, PARAMS, use_pallas=False))
    out = f(spec, rng)
    assert out.shape == (2, 4, 128, 157)
