"""SpecAugment on-device, producing the reference's fixed 4-view expansion.

Reference semantics (utils/augmentations.py:148-157): from one batch of
spectrograms produce ``[original, time_warp, time_mask, freq_mask]`` — each
augmentation applied to a fresh copy of the original, not chained. Mask draws
are **shared across the batch** within one call (one randint per call,
utils/augmentations.py:49-56, 79-87); the time-warp control points are drawn
**per item** (utils/augmentations.py:124-128).

TPU-first design:
  * time/freq masks are iota-compare selects — pure VPU work;
  * time warp = Hermite-spline control curve (same math as the reference's
    h_poly/hspline_interpolate_1D, utils/augmentations.py:91-146) turned into
    a per-item sparse interpolation matrix, applied as a ``[F,T] @ [T,T]``
    batched **matmul** — grid_sample's gather becomes MXU work;
  * a fused Pallas kernel emits all 4 views from a single HBM read of the
    input (4x write, 1x read instead of 4x read).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from audio_few_shot_learning_tpu.config import SpecAugParams
from audio_few_shot_learning_tpu.ops.pallas_utils import pallas_enabled, round_up


def _hermite_warp_positions(key: jax.Array, t_len: int, w: int) -> jnp.ndarray:
    """Per-item source positions (normalized [-1, 1]) for the time warp.

    Mirrors the reference's spline: control points
      x = [0, warp_p, T-1],  y = [-1, (warp_p - warp_d) * 2/(T-1) - 1, 1]
    with finite-difference tangents, evaluated at xs = 0..T-1
    (utils/augmentations.py:110-146). Returns ys with shape [t_len].
    """
    kp, kd = jax.random.split(key)
    warp_p = jax.random.randint(kp, (), w, t_len - w).astype(jnp.float32)
    warp_d = jax.random.randint(kd, (), -w, w).astype(jnp.float32)

    x0, x1, x2 = 0.0, warp_p, float(t_len - 1)
    y0 = -1.0
    y1 = (warp_p - warp_d) * 2.0 / (t_len - 1) - 1.0
    y2 = 1.0

    m0 = (y1 - y0) / (x1 - x0)
    m1 = (y2 - y1) / (x2 - x1)
    # tangents: [m0, (m0+m1)/2, m1]
    mm = (m0 + m1) * 0.5

    xs = jnp.arange(t_len, dtype=jnp.float32)
    in_second = xs > warp_p  # searchsorted(x[1:], xs) == 1

    xa = jnp.where(in_second, x1, x0)
    xb = jnp.where(in_second, x2, x1)
    ya = jnp.where(in_second, y1, y0)
    yb = jnp.where(in_second, y2, y1)
    ma = jnp.where(in_second, mm, m0)
    mb = jnp.where(in_second, m1, mm)

    dx = xb - xa
    t = (xs - xa) / dx
    # cubic Hermite basis
    h00 = (1.0 + 2.0 * t) * (1.0 - t) ** 2
    h10 = t * (1.0 - t) ** 2
    h01 = t * t * (3.0 - 2.0 * t)
    h11 = t * t * (t - 1.0)
    return h00 * ya + h10 * ma * dx + h01 * yb + h11 * mb * dx


def _warp_matrix(ys: jnp.ndarray, t_len: int) -> jnp.ndarray:
    """Build the [T, T] bilinear interpolation matrix for source curve ``ys``.

    out[:, t] = sum_s in[:, s] * M[s, t]. Emulates
    ``grid_sample(..., align_corners=True)`` with zeros padding
    (utils/augmentations.py:146): out-of-range taps contribute 0.
    """
    src = (ys + 1.0) * 0.5 * (t_len - 1)  # pixel coords
    s0 = jnp.floor(src)
    w1 = src - s0
    w0 = 1.0 - w1
    s1 = s0 + 1.0

    valid0 = (s0 >= 0) & (s0 <= t_len - 1)
    valid1 = (s1 >= 0) & (s1 <= t_len - 1)
    w0 = jnp.where(valid0, w0, 0.0)
    w1 = jnp.where(valid1, w1, 0.0)
    s0c = jnp.clip(s0, 0, t_len - 1)
    s1c = jnp.clip(s1, 0, t_len - 1)

    rows = jnp.arange(t_len, dtype=jnp.float32)[:, None]  # source index s
    m = w0[None, :] * (rows == s0c[None, :]) + w1[None, :] * (rows == s1c[None, :])
    return m.astype(jnp.float32)


def _warp_gather(spec: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
    """Bilinear time-warp as a gather along the time axis.

    spec: [B, F, T]; ys: [B, T] normalized source positions. Equivalent to the
    interpolation-matrix matmul but with no [T, T] intermediates — the form
    XLA:TPU compiles and schedules well (the per-item batched-matmul version
    sends the TPU compiler into a pathological search at batch > ~100).
    """
    b, f, t_len = spec.shape
    src = (ys + 1.0) * 0.5 * (t_len - 1)  # pixel coords, align_corners=True
    s0 = jnp.floor(src)
    w1 = src - s0
    w0 = 1.0 - w1
    s1 = s0 + 1.0
    valid0 = (s0 >= 0) & (s0 <= t_len - 1)
    valid1 = (s1 >= 0) & (s1 <= t_len - 1)
    w0 = jnp.where(valid0, w0, 0.0)[:, None, :]
    w1 = jnp.where(valid1, w1, 0.0)[:, None, :]
    i0 = jnp.clip(s0, 0, t_len - 1).astype(jnp.int32)[:, None, :]
    i1 = jnp.clip(s1, 0, t_len - 1).astype(jnp.int32)[:, None, :]
    g0 = jnp.take_along_axis(spec, jnp.broadcast_to(i0, spec.shape), axis=2)
    g1 = jnp.take_along_axis(spec, jnp.broadcast_to(i1, spec.shape), axis=2)
    return (w0 * g0.astype(jnp.float32) + w1 * g1.astype(jnp.float32)).astype(spec.dtype)


def time_warp(spec: jnp.ndarray, key: jax.Array, w: int) -> jnp.ndarray:
    """Per-item Hermite time warp. spec: [B, F, T] -> [B, F, T]."""
    b, f, t_len = spec.shape
    keys = jax.random.split(key, b)
    ys = jax.vmap(lambda k: _hermite_warp_positions(k, t_len, w))(keys)  # [B, T]
    return _warp_gather(spec, ys)


def _mask_bounds_freq(key: jax.Array, num_mask: int, mask_param: int, f_len: int):
    """num_mask draws of (f0, f0+f): f ~ U[1, mask_param], f0 ~ U[0, F-f-1].

    Matches utils/augmentations.py:49-56 including its hardcoded 128-bin
    assumption generalized to f_len.
    """
    ks = jax.random.split(key, num_mask)

    def draw(k):
        k1, k2 = jax.random.split(k)
        f = jax.random.randint(k1, (), 1, mask_param + 1)
        f0 = jax.random.randint(k2, (), 0, jnp.maximum(f_len - f, 1))
        return f0, f0 + f

    lo, hi = jax.vmap(draw)(ks)
    return lo, hi


def _mask_bounds_time(key: jax.Array, num_mask: int, mask_param: int, p: float, t_len: int):
    """t ~ U[1, min(mask_param, int(p*T))], t0 ~ U[0, T-t-1]
    (utils/augmentations.py:73-87)."""
    max_len = max(min(mask_param, int(p * t_len)), 1)
    ks = jax.random.split(key, num_mask)

    def draw(k):
        k1, k2 = jax.random.split(k)
        t = jax.random.randint(k1, (), 1, max_len + 1)
        t0 = jax.random.randint(k2, (), 0, jnp.maximum(t_len - t, 1))
        return t0, t0 + t

    lo, hi = jax.vmap(draw)(ks)
    return lo, hi


def _interval_mask(lo: jnp.ndarray, hi: jnp.ndarray, length: int) -> jnp.ndarray:
    """OR of [lo_i, hi_i) intervals -> bool [length]."""
    idx = jnp.arange(length)
    return jnp.any((idx[None, :] >= lo[:, None]) & (idx[None, :] < hi[:, None]), axis=0)


def spec_augment_views(
    spec: jnp.ndarray,
    key: jax.Array,
    params: SpecAugParams,
    use_pallas: Optional[bool] = None,
) -> jnp.ndarray:
    """[B, F, T] -> [B, 4, F, T] views: original, warp, time-mask, freq-mask."""
    b, f_len, t_len = spec.shape
    k_warp, k_time, k_freq = jax.random.split(key, 3)

    tlo, thi = _mask_bounds_time(k_time, params.num_mask, params.mask_param, params.p, t_len)
    flo, fhi = _mask_bounds_freq(k_freq, params.num_mask, params.mask_param, f_len)
    tmask = _interval_mask(tlo, thi, t_len)  # [T] bool, batch-shared
    fmask = _interval_mask(flo, fhi, f_len)  # [F] bool, batch-shared

    keys = jax.random.split(k_warp, b)
    ys = jax.vmap(lambda k: _hermite_warp_positions(k, t_len, params.W))(keys)  # [B, T]

    if use_pallas is None:
        use_pallas = pallas_enabled()
    if use_pallas:
        mats = jax.vmap(lambda y: _warp_matrix(y, t_len))(ys)  # [B, T, T]
        return _views_pallas(spec, mats, tmask, fmask, float(params.mask_value))
    return _views_xla(spec, ys, tmask, fmask, float(params.mask_value))


def _views_xla(spec, ys, tmask, fmask, mask_value):
    warped = _warp_gather(spec, ys)
    tview = jnp.where(tmask[None, None, :], mask_value, spec)
    fview = jnp.where(fmask[None, :, None], mask_value, spec)
    return jnp.stack([spec, warped, tview, fview], axis=1)


def _views_pallas(spec, mats, tmask, fmask, mask_value):
    """Fused 4-view emission: one read of the input tile, four writes."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, f_len, t_len = spec.shape
    fp = round_up(f_len, 8)
    tp = round_up(t_len, 128)

    x = jnp.pad(spec.astype(jnp.float32), ((0, 0), (0, fp - f_len), (0, tp - t_len)))
    m = jnp.pad(mats, ((0, 0), (0, tp - t_len), (0, tp - t_len)))
    tm = jnp.pad(tmask.astype(jnp.float32), (0, tp - t_len)).reshape(1, tp)
    fm = jnp.pad(fmask.astype(jnp.float32), (0, fp - f_len)).reshape(1, fp)

    def kernel(x_ref, m_ref, tm_ref, fm_ref, o_ref):
        xv = x_ref[0]  # [fp, tp]
        o_ref[0, 0] = xv
        o_ref[0, 1] = jnp.dot(xv, m_ref[0], preferred_element_type=jnp.float32)
        tmv = tm_ref[0, :][None, :]  # [1, tp]
        fmv = fm_ref[0, :][:, None]  # [fp, 1]
        o_ref[0, 2] = xv * (1.0 - tmv) + mask_value * tmv
        o_ref[0, 3] = xv * (1.0 - fmv) + mask_value * fmv

    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, fp, tp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, tp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, fp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, fp, tp), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 4, fp, tp), jnp.float32),
    )(x, m, tm, fm)
    return out[:, :, :f_len, :t_len].astype(spec.dtype)


@dataclasses.dataclass(frozen=True)
class SpecAugment:
    """Configured SpecAugment callable mirroring the reference class
    (utils/augmentations.py:21-157)."""

    params: SpecAugParams

    def __call__(self, spec: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        return spec_augment_views(spec, key, self.params)

    @property
    def num_views(self) -> int:
        return 4
