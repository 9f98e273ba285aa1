"""Waveform augmentation bank, on-device.

Re-derivation of the reference's ``WaveAugment``
(utils/augmentations.py:180-451): a probabilistic chain of
LowPass -> PitchShift -> Shift -> TimeInversion -> Gain -> AddColoredNoise ->
HighPass -> BandStop -> SpliceOut (per-example probabilities), plus optional
time-stretch and time-masking, producing 1 original + ``aug_num`` augmented
copies. Cutoffs/SNR bounds adapt to per-dataset spectral statistics exactly
as in the reference (utils/augmentations.py:186-207,211-277).

TPU-first formulations (general gathers/sorts over 80 k-sample rows are the
enemy — they cost 100-250 ms per batch; everything below is contiguous
slices, elementwise math, FFTs, or small matmuls):
  * filters are rFFT-domain soft masks (instead of FIR convolutions) — same
    cutoff semantics, raised-cosine edge; the adjacent AddColoredNoise ->
    HighPass -> BandStop stretch shares ONE rfft/irfft pair with the noise
    synthesized directly in the frequency domain (``noise_highpass_bandstop``);
  * pitch shift / time stretch are linear-interpolation resamples in blocked
    form: contiguous dynamic_slice windows × two-tap interpolation matrices
    on the MXU (see ``_resample_to_length``);
  * shift is a dynamic_slice of the doubled signal; splice-out compacts the
    kept regions in ONE pass — a select among N+1 contiguous shifted copies,
    scanned row-at-a-time so XLA emits scalar-start slices (``splice_out``);
  * colored noise is spectrally shaped white noise (f^(-decay/2)) scaled to a
    target SNR.
All transforms are static-shape, jit- and vmap-friendly ([B, L] batches).
Transforms whose probability is statically 0 are skipped at trace time — a
p=0 entry in the chain would otherwise still pay its full compute under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from audio_few_shot_learning_tpu.config import SAMPLE_RATE, WaveAugParams

# per-dataset spectral statistics (reference utils/augmentations.py:186-207)
FEATURE_STATS: Dict[str, Dict[str, float]] = {
    "FSD2018": {"avg_centroid": 1944, "avg_bandwidth": 1605, "avg_flatness": 0.056},
    "nsynth": {"avg_centroid": 1294, "avg_bandwidth": 961, "avg_flatness": 0.224},
    "ESC-50-master": {"avg_centroid": 1191, "avg_bandwidth": 1669, "avg_flatness": 0.144},
    "BirdClef": {"avg_centroid": 3038, "avg_bandwidth": 1910, "avg_flatness": 0.127},
}
_DEFAULT_STATS = {"avg_centroid": 2000, "avg_bandwidth": 1500, "avg_flatness": 0.1}


def _freqs(n: int, sr: int) -> jnp.ndarray:
    return jnp.fft.rfftfreq(n, 1.0 / sr)


def _soft_edge(f: jnp.ndarray, cutoff: jnp.ndarray, width_hz: float = 50.0) -> jnp.ndarray:
    """0->1 raised-cosine transition centered at cutoff."""
    t = jnp.clip((f - cutoff) / width_hz + 0.5, 0.0, 1.0)
    return 0.5 - 0.5 * jnp.cos(jnp.pi * t)


def _fft_filter(x: jnp.ndarray, gain_mask: jnp.ndarray) -> jnp.ndarray:
    """[B, L] filtered through per-example rFFT gain masks [B, L//2+1]."""
    spec = jnp.fft.rfft(x, axis=-1)
    return jnp.fft.irfft(spec * gain_mask, n=x.shape[-1], axis=-1).astype(x.dtype)


def _per_example(key, b, p):
    return jax.random.uniform(key, (b,)) < p


def _mix(applied, x_aug, x):
    return jnp.where(applied[:, None], x_aug, x)


def lowpass(x, key, min_cut, max_cut, p, sr=SAMPLE_RATE):
    b, l = x.shape
    k1, k2 = jax.random.split(key)
    cut = jax.random.uniform(k1, (b, 1), minval=min_cut, maxval=max_cut)
    mask = 1.0 - _soft_edge(_freqs(l, sr)[None, :], cut)
    return _mix(_per_example(k2, b, p), _fft_filter(x, mask), x)


def highpass(x, key, min_cut, max_cut, p, sr=SAMPLE_RATE):
    b, l = x.shape
    k1, k2 = jax.random.split(key)
    cut = jax.random.uniform(k1, (b, 1), minval=min_cut, maxval=max_cut)
    mask = _soft_edge(_freqs(l, sr)[None, :], cut)
    return _mix(_per_example(k2, b, p), _fft_filter(x, mask), x)


def bandstop(x, key, min_center, max_center, min_bw_frac, max_bw_frac, p, sr=SAMPLE_RATE):
    b, l = x.shape
    k1, k2, k3 = jax.random.split(key, 3)
    center = jax.random.uniform(k1, (b, 1), minval=min_center, maxval=max_center)
    bw = center * jax.random.uniform(k2, (b, 1), minval=min_bw_frac, maxval=max_bw_frac)
    f = _freqs(l, sr)[None, :]
    stop = _soft_edge(f, center - bw / 2) * (1.0 - _soft_edge(f, center + bw / 2))
    return _mix(_per_example(k3, b, p), _fft_filter(x, 1.0 - stop), x)


def highpass_bandstop(
    x, key_hp, key_bs, min_cut, max_cut, min_center, max_center,
    min_bw_frac, max_bw_frac, p_hp, p_bs, sr=SAMPLE_RATE,
):
    """Fused HighPass -> BandStop (adjacent in the reference chain,
    utils/augmentations.py:341-366): per-example masks multiply, so both
    filters share ONE rfft/irfft pair instead of two. Draw-for-draw
    identical distributions to running highpass() then bandstop()."""
    b, l = x.shape
    k1, k2 = jax.random.split(key_hp)
    k3, k4, k5 = jax.random.split(key_bs, 3)
    f = _freqs(l, sr)[None, :]
    cut = jax.random.uniform(k1, (b, 1), minval=min_cut, maxval=max_cut)
    hp_applied = _per_example(k2, b, p_hp)
    hp_mask = jnp.where(hp_applied[:, None], _soft_edge(f, cut), 1.0)
    center = jax.random.uniform(k3, (b, 1), minval=min_center, maxval=max_center)
    bw = center * jax.random.uniform(k4, (b, 1), minval=min_bw_frac, maxval=max_bw_frac)
    stop = _soft_edge(f, center - bw / 2) * (1.0 - _soft_edge(f, center + bw / 2))
    bs_applied = _per_example(k5, b, p_bs)
    mask = hp_mask * jnp.where(bs_applied[:, None], 1.0 - stop, 1.0)
    return _mix(hp_applied | bs_applied, _fft_filter(x, mask), x)


def gain(x, key, min_db, max_db, p):
    b = x.shape[0]
    k1, k2 = jax.random.split(key)
    g = 10.0 ** (jax.random.uniform(k1, (b, 1), minval=min_db, maxval=max_db) / 20.0)
    return _mix(_per_example(k2, b, p), x * g, x)


def time_inversion(x, key, p):
    return _mix(_per_example(key, x.shape[0], p), x[:, ::-1], x)


def shift(x, key, min_shift, max_shift, p):
    """Fractional circular shift (rollover=True, reference Shift transform).

    Implemented as a dynamic_slice into the doubled signal (contiguous, fast
    on TPU) rather than a modular index gather: out[i] = x[(i - offs) % L]
    == concat(x, x)[(L - offs) % L + i].
    """
    b, l = x.shape
    k1, k2 = jax.random.split(key)
    frac = jax.random.uniform(k1, (b,), minval=min_shift, maxval=max_shift)
    offs = (frac * l).astype(jnp.int32) % l
    x2 = jnp.concatenate([x, x], axis=1)

    # scan over rows, not vmap: a BATCHED dynamic_slice with per-row starts
    # lowers to a gather (~2 ms for [150, 80k] on v5e), while a scalar-start
    # slice of one row inside a scan is a cheap contiguous copy (same trick
    # as splice_out below).
    def one_row(_, row_off):
        row, o = row_off
        return None, jax.lax.dynamic_slice(row, (o,), (l,))

    _, rolled = jax.lax.scan(one_row, None, (x2, (l - offs) % l))
    return _mix(_per_example(k2, b, p), rolled, x)


def add_colored_noise(x, key, min_snr_db, max_snr_db, min_f_decay, max_f_decay, p, sr=SAMPLE_RATE):
    b, l = x.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    snr = jax.random.uniform(k1, (b, 1), minval=min_snr_db, maxval=max_snr_db)
    decay = jax.random.uniform(k2, (b, 1), minval=min_f_decay, maxval=max_f_decay)
    white = jax.random.normal(k3, (b, l))
    f = _freqs(l, sr)[None, :]
    shape = jnp.where(f > 0, jnp.maximum(f, 1.0) ** (decay / 2.0), 0.0)
    noise = _fft_filter(white, shape)
    sig_rms = jnp.sqrt(jnp.mean(x * x, axis=-1, keepdims=True) + 1e-12)
    noise_rms = jnp.sqrt(jnp.mean(noise * noise, axis=-1, keepdims=True) + 1e-12)
    target_noise_rms = sig_rms / (10.0 ** (snr / 20.0))
    return _mix(_per_example(k4, b, p), x + noise * (target_noise_rms / noise_rms), x)


def noise_highpass_bandstop(
    x, key_noise, key_hp, key_bs,
    min_snr_db, max_snr_db, min_f_decay, max_f_decay,
    min_cut, max_cut, min_center, max_center, min_bw_frac, max_bw_frac,
    p_noise, p_hp, p_bs, sr=SAMPLE_RATE,
    key_lp=None, lp_min_cut=0.0, lp_max_cut=0.0, p_lp=0.0,
):
    """Fused AddColoredNoise -> HighPass -> BandStop (adjacent in the
    reference chain, utils/augmentations.py:311-366) sharing ONE rfft/irfft
    pair for all three.

    The colored noise is synthesized directly in the frequency domain: the
    rDFT of unit white noise has i.i.d. N(0, L/2) real/imag components on
    interior bins and real N(0, L) DC/Nyquist bins (L even), so drawing the
    spectrum skips the noise's own rfft; its RMS for SNR scaling comes from
    Parseval (sum_t n_t^2 = (|N_0|^2 + 2*sum_interior |N_k|^2 +
    |N_Nyq|^2)/L). Noise addition and both filter masks are then linear ops
    on the signal spectrum: out = irfft((rfft(x) + applied*scale*noisespec)
    * hp_mask * bs_mask). Distributionally identical to the sequential
    transforms; examples where nothing applies pass through exactly.
    Statically-zero probabilities skip their draws and masks at trace time.
    Measured: collapses ~12.7 ms/episode of sequential FFT work to one pair
    (~6.6 ms per 150x80000 batch)."""
    b, l = x.shape
    f = _freqs(l, sr)[None, :]
    n_freqs = l // 2 + 1
    spec = jnp.fft.rfft(x, axis=-1)

    any_applied = jnp.zeros((b,), dtype=bool)
    if p_noise > 0:
        k1, k2, k3, k4 = jax.random.split(key_noise, 4)
        snr = jax.random.uniform(k1, (b, 1), minval=min_snr_db, maxval=max_snr_db)
        decay = jax.random.uniform(k2, (b, 1), minval=min_f_decay, maxval=max_f_decay)
        w = jax.random.normal(k3, (b, n_freqs, 2))
        kidx = jnp.arange(n_freqs)
        edge = (kidx == 0) | (kidx == n_freqs - 1) if l % 2 == 0 else (kidx == 0)
        real = w[..., 0] * jnp.where(edge, np.sqrt(float(l)), np.sqrt(l / 2.0))
        imag = w[..., 1] * jnp.where(edge, 0.0, np.sqrt(l / 2.0))
        shape = jnp.where(f > 0, jnp.maximum(f, 1.0) ** (decay / 2.0), 0.0)
        nspec = (real + 1j * imag) * shape
        # Parseval RMS (== time-domain RMS of irfft(nspec), no irfft needed)
        p2 = real * real + imag * imag
        w2 = p2 * shape * shape
        mult = jnp.where(edge, 1.0, 2.0)[None, :]
        noise_rms = jnp.sqrt(
            jnp.sum(w2 * mult, axis=-1, keepdims=True) / (float(l) ** 2) + 1e-12
        )
        sig_rms = jnp.sqrt(jnp.mean(x * x, axis=-1, keepdims=True) + 1e-12)
        target_noise_rms = sig_rms / (10.0 ** (snr / 20.0))
        n_applied = _per_example(k4, b, p_noise)
        spec = spec + jnp.where(n_applied[:, None], target_noise_rms / noise_rms, 0.0) * nspec
        any_applied = any_applied | n_applied

    mask = jnp.ones((1, 1))
    if p_lp > 0:
        # opt-in `fuse_lowpass` deviation: LowPass joins the shared-spectrum
        # group instead of opening the chain with its own rfft/irfft pair
        # (reference order gain->noise->hp->bs with lowpass FIRST,
        # utils/augmentations.py:279-376 — documented reorder, PARITY.md)
        k1, k2 = jax.random.split(key_lp)
        lp_cut = jax.random.uniform(k1, (b, 1), minval=lp_min_cut, maxval=lp_max_cut)
        lp_applied = _per_example(k2, b, p_lp)
        mask = mask * jnp.where(lp_applied[:, None], 1.0 - _soft_edge(f, lp_cut), 1.0)
        any_applied = any_applied | lp_applied
    if p_hp > 0:
        k1, k2 = jax.random.split(key_hp)
        cut = jax.random.uniform(k1, (b, 1), minval=min_cut, maxval=max_cut)
        hp_applied = _per_example(k2, b, p_hp)
        mask = mask * jnp.where(hp_applied[:, None], _soft_edge(f, cut), 1.0)
        any_applied = any_applied | hp_applied
    if p_bs > 0:
        k3, k4, k5 = jax.random.split(key_bs, 3)
        center = jax.random.uniform(k3, (b, 1), minval=min_center, maxval=max_center)
        bw = center * jax.random.uniform(k4, (b, 1), minval=min_bw_frac, maxval=max_bw_frac)
        stop = _soft_edge(f, center - bw / 2) * (1.0 - _soft_edge(f, center + bw / 2))
        bs_applied = _per_example(k5, b, p_bs)
        mask = mask * jnp.where(bs_applied[:, None], 1.0 - stop, 1.0)
        any_applied = any_applied | bs_applied

    out = jnp.fft.irfft(spec * mask, n=l, axis=-1).astype(x.dtype)
    return _mix(any_applied, out, x)


# Output elements per resample block. Total one-hot interp work scales as
# out_len * win with win ≈ 3*blk, so SMALL blocks win: measured on v5e for
# [50, 80000], blk=128 -> 7.9 ms, 64 -> 5.5 ms, 32 -> 4.75 ms.
_RS_BLK = 32


def _resample_to_length(
    x: jnp.ndarray, rate: jnp.ndarray, out_len: int, max_rate: float = 1.5
) -> jnp.ndarray:
    """Per-example linear-interp resample by ``rate``, clipped/padded to out_len.

    TPU formulation: a naive fractional-position gather of 80 k elements runs
    ~250 ms per 150-row batch (general gathers don't vectorize on TPU), and
    even per-block ``vmap(dynamic_slice)`` windows lower to a gather (~33 ms).
    Instead everything is matmuls: window starts are quantized to static
    multiples of BLK, so the per-block windows live in a sliding-window matrix
    built from static shifted slices, fetched with a one-hot row matmul (an
    MXU embedding lookup), and the two interpolation taps are one-hot matmuls
    against the window and its shift. ~11 ms for [50, 80000] on a v5e.

    ``max_rate`` must statically bound ``rate`` (it sizes the window).
    Positions are computed blockwise in float32, so interpolation fractions
    deviate from exact ``i*rate`` by ~1e-2 at i~1e5 — semantically irrelevant
    for augmentation (and the same order as float32's own rounding of i*rate).
    """
    b, l = x.shape
    blk = _RS_BLK
    rate = jnp.clip(rate, 1e-3, max_rate)
    n_blocks = -(-out_len // blk)
    # window must cover [rem, rem + (blk-1)*rate + 2) with rem < blk
    win = blk * (1 + int(np.ceil((blk * max_rate + 2.0) / blk)))
    n_shift = win // blk
    # rows of blk samples; row m covers x[blk*m : blk*m + win] after shifts
    max_base = int(np.floor((n_blocks - 1) * blk * max_rate)) + win
    n_rows = max(-(-max_base // blk) + 1, -(-l // blk))  # also cover the input
    xp = jnp.pad(x, ((0, 0), (0, (n_rows + n_shift) * blk - l)))
    rows = xp.reshape(b, -1, blk)
    slid = jnp.concatenate(
        [rows[:, s : s + n_rows] for s in range(n_shift)], axis=-1
    )  # [B, n_rows, win]
    j = jnp.arange(blk, dtype=jnp.float32)
    ka = jnp.arange(win, dtype=jnp.int32)
    bi = jnp.arange(n_blocks, dtype=jnp.float32)
    row_ids = jnp.arange(n_rows, dtype=jnp.int32)

    def one_row(w3, r):
        gstart = bi * (blk * r)  # [n_blocks]
        m = (jnp.floor(gstart).astype(jnp.int32) // blk).clip(0, n_rows - 1)
        onehot = (m[:, None] == row_ids[None, :]).astype(x.dtype)
        wnd = jnp.matmul(onehot, w3, precision="highest")  # [n_blocks, win]
        pos = (gstart - (m * blk).astype(jnp.float32))[:, None] + j[None, :] * r
        p0 = jnp.floor(pos).astype(jnp.int32).clip(0, win - 2)
        f = (pos - p0).astype(x.dtype)
        # Both interpolation taps fold into ONE matmul: the weight matrix
        # carries (1-f) at k==p0 and f at k==p0+1, so
        # out_j = sum_k W_jk * wnd_k == (1-f)*wnd[p0] + f*wnd[p0+1] with the
        # same two rounded products — vs the previous two one-hot einsums +
        # host-side lerp this halves the dominant MXU work and drops the
        # shifted-window concat.
        k_eq = ka[None, None, :] == p0[:, :, None]
        k_eq1 = ka[None, None, :] == (p0 + 1)[:, :, None]
        wmat = k_eq * (1.0 - f)[:, :, None] + k_eq1 * f[:, :, None]
        out = jnp.einsum("bjk,bk->bj", wmat.astype(x.dtype), wnd,
                         precision="highest").reshape(-1)[:out_len]
        valid = jnp.arange(out_len) * r <= (l - 1)
        return jnp.where(valid, out, 0.0)

    return jax.vmap(one_row)(slid, rate)


def pitch_shift(x, key, min_semitones, max_semitones, p):
    """Resample-based pitch shift (duration restored by clipping/zero-pad —
    documented approximation of the reference's resample+stretch chain)."""
    b, l = x.shape
    k1, k2 = jax.random.split(key)
    st = jax.random.uniform(k1, (b,), minval=min_semitones, maxval=max_semitones)
    rate = 2.0 ** (st / 12.0)
    max_rate = 2.0 ** (max(abs(min_semitones), abs(max_semitones)) / 12.0)
    return _mix(
        _per_example(k2, b, p), _resample_to_length(x, rate, l, max_rate), x
    )


def _pv_shift_row(x_row, f, f_upper: float, n_fft: int = 1024, hop: int = 256):
    """Duration-preserving pitch shift of one row by factor ``f``:
    phase-vocoder time-stretch by f (duration L*f, pitch kept) composed with
    a rate-f linear resample back to L (pitch *f, duration L). The composite
    emulates torch_audiomentations' PitchShift (torch_pitch_shift:
    stretch+resample) that the default clip/zero-pad ``pitch_shift``
    deviates from (PARITY.md). A/B oracle arm — written for correctness,
    not TPU throughput.

    ``f_upper`` statically bounds f (sizes the stretched-domain buffers).
    """
    l = x_row.shape[0]
    k_bins = n_fft // 2 + 1
    # win_np stays NumPy: the overlap-add weight below is computed with
    # np.add.at at trace time (static), and np.asarray on the jnp copy is a
    # TracerArrayConversionError inside the jitted train step (the jnp
    # constant is a tracer under remat).
    win_np = (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft)).astype(
        np.float32
    )
    win = jnp.asarray(win_np)
    t_frames = 1 + (l - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(t_frames)[:, None]
    frames = x_row[idx] * win
    spec = jnp.fft.rfft(frames, axis=-1)  # [T, K]
    mag, ph = jnp.abs(spec), jnp.angle(spec)
    omega = (2.0 * np.pi * hop / n_fft) * np.arange(k_bins)  # expected hop advance

    out_t = int(np.ceil((t_frames - 1) * f_upper)) + 1
    t = jnp.arange(out_t) / f  # analysis positions in input frames
    t0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, t_frames - 2)
    frac = jnp.clip(t - t0, 0.0, 1.0)[:, None]
    mag_i = (1.0 - frac) * mag[t0] + frac * mag[t0 + 1]
    dphi = ph[t0 + 1] - ph[t0] - omega[None, :]
    dphi = dphi - 2.0 * np.pi * jnp.round(dphi / (2.0 * np.pi))  # principal value
    advance = dphi + omega[None, :]  # true per-hop phase advance around t0
    acc = ph[t0[0]][None, :] + jnp.concatenate(
        [jnp.zeros((1, k_bins)), jnp.cumsum(advance[:-1], axis=0)], axis=0
    )
    y_frames = jnp.fft.irfft(mag_i * jnp.exp(1j * acc), n=n_fft, axis=-1) * win

    # overlap-add (positions are static -> scatter-add with static indices)
    tail_pad = int(np.ceil(n_fft * f_upper)) + 1
    buf_len = (out_t - 1) * hop + n_fft + tail_pad
    pos = (hop * np.arange(out_t)[:, None] + np.arange(n_fft)[None, :]).ravel()
    buf = jnp.zeros(buf_len, jnp.float32).at[pos].add(y_frames.ravel())
    wsum = np.zeros(buf_len, np.float32)
    np.add.at(wsum, pos, np.tile(win_np ** 2, out_t))
    buf = buf / np.maximum(wsum, 1e-8)

    # read back at rate f: duration L, pitch scaled by f
    rp = jnp.arange(l) * f
    r0 = jnp.clip(jnp.floor(rp).astype(jnp.int32), 0, buf_len - 2)
    fr = rp - r0
    return (1.0 - fr) * buf[r0] + fr * buf[r0 + 1]


def pitch_shift_pv(x, key, min_semitones, max_semitones, p):
    """Duration-preserving pitch shift (``pitchshift_mode: "pv"``) — the A/B
    counterpart of the default resample ``pitch_shift``; same draw structure."""
    b, l = x.shape
    k1, k2 = jax.random.split(key)
    st = jax.random.uniform(k1, (b,), minval=min_semitones, maxval=max_semitones)
    rate = 2.0 ** (st / 12.0)
    f_upper = 2.0 ** (max(abs(min_semitones), abs(max_semitones)) / 12.0)
    y = jax.vmap(lambda r, fi: _pv_shift_row(r, fi, f_upper))(x, rate)
    return _mix(_per_example(k2, b, p), y.astype(x.dtype), x)


def time_stretch(x, key, min_ratio, max_ratio, p):
    """sox-stretch equivalent: resample by 1/ratio, fix length
    (utils/augmentations.py:397-420 fixes to 80000 samples)."""
    b, l = x.shape
    k1, k2 = jax.random.split(key)
    ratio = jax.random.uniform(k1, (b,), minval=min_ratio, maxval=max_ratio)
    max_rate = 1.0 / min(min_ratio, max_ratio)
    return _mix(
        _per_example(k2, b, p), _resample_to_length(x, 1.0 / ratio, l, max_rate), x
    )


def splice_out(x, key, num_intervals, max_width, p):
    """Remove up to num_intervals random intervals and compact, zero-padding
    the tail (torch_audiomentations SpliceOut semantics).

    TPU formulation: compacting via stable argsort of an 80 k flag row costs
    ~140 ms per 150-row batch, and the earlier N sequential delete passes
    (slice + select per interval) cost ~14.5 ms/episode in the train step.
    Single-pass form instead: merge the (possibly overlapping) intervals
    into sorted disjoint pieces with a [B, N] sweep, then observe that
    compaction is piecewise-constant shifting — output position i reads
    source i + C_k, where C_k is the cumulative cut width of the first k
    intervals and k increments at output-coordinate breakpoints
    b_k = s_k - C_{k-1} (nondecreasing for disjoint sorted cuts). So the
    result is a select among N+1 contiguous dynamic-sliced copies of the
    zero-extended signal. Crucially the select runs as a `lax.scan` over
    rows: a batched per-row dynamic_slice lowers to a gather (~2 ms each on
    v5e for [150, 80k]) while a scalar-start slice of one row is a cheap
    contiguous copy — measured 4.8 ms/batch for the whole N=8 splice vs
    15.7 ms for the batched multi-pass form. Exactly equal to union-cut +
    compact (and to the old multi-pass form, which tests pin)."""
    b, l = x.shape
    k1, k2, k3 = jax.random.split(key, 3)
    starts = jax.random.randint(k1, (b, num_intervals), 0, jnp.maximum(l - max_width, 1))
    widths = jax.random.randint(k2, (b, num_intervals), 1, max_width + 1)

    # Sweep-merge into disjoint pieces: after sorting by start, piece i covers
    # [max(start_i, m_{i-1}), max(end_i, m_{i-1})) with m = running max end.
    order = jnp.argsort(starts, axis=1)
    starts = jnp.take_along_axis(starts, order, axis=1)
    ends = starts + jnp.take_along_axis(widths, order, axis=1)
    run_max = jax.lax.associative_scan(jnp.maximum, ends, axis=1)
    prev_max = jnp.concatenate([jnp.zeros((b, 1), ends.dtype), run_max[:, :-1]], axis=1)
    cut_start = jnp.maximum(starts, prev_max)
    cut_width = jnp.maximum(ends, prev_max) - cut_start  # >= 0, 0 = swallowed

    cum = jnp.cumsum(cut_width, axis=1)  # [B, N] C_k (1-indexed)
    cum_prev = jnp.concatenate([jnp.zeros((b, 1), cum.dtype), cum[:, :-1]], axis=1)
    bkpt = cut_start - cum_prev  # [B, N] output-coord breakpoints, nondecreasing
    idx = jnp.arange(l)

    x2 = jnp.pad(x, ((0, 0), (0, num_intervals * max_width)))
    shifts = jnp.concatenate([jnp.zeros((b, 1), cum.dtype), cum], axis=1)  # [B, N+1]

    # region(i) = #{k : i >= b_k} in 0..N selects shift C_region (C_0 = 0).
    # Computed BATCHED outside the row scan: inside the scan body these N
    # compares+adds over l elements serialize per row (~N*l*B elementwise in
    # the sequential loop); as one [B, N, l] reduction they vectorize fully.
    region = jnp.sum(
        (idx[None, None, :] >= bkpt[:, :, None]).astype(jnp.int32), axis=1
    )  # [B, l]

    def one_row(_, row_shift_region):
        row, row_shifts, row_region = row_shift_region
        out = jnp.where(row_region == 0, row[:l], 0.0)
        for k in range(1, num_intervals + 1):
            sl = jax.lax.dynamic_slice(row, (row_shifts[k],), (l,))
            out = out + jnp.where(row_region == k, sl, 0.0)
        return None, out

    _, out = jax.lax.scan(one_row, None, (x2, shifts, region))
    return _mix(_per_example(k3, b, p), out, x)


def time_masking(x, key, num_masks, mask_fraction, p):
    """Zero out num_masks random windows (utils/augmentations.py:378-395)."""
    b, l = x.shape
    k1, k2 = jax.random.split(key)
    mask_len = max(int(l * mask_fraction), 1)
    starts = jax.random.randint(k1, (b, num_masks), 0, max(l - mask_len, 1))
    idx = jnp.arange(l)[None, None, :]
    masked_region = jnp.any(
        (idx >= starts[:, :, None]) & (idx < starts[:, :, None] + mask_len), axis=1
    )
    out = jnp.where(masked_region, 0.0, x)
    return _mix(_per_example(k2, b, p), out, x)


@dataclasses.dataclass(frozen=True)
class WaveAugment:
    """Configured waveform augmentation chain (reference order,
    utils/augmentations.py:279-376,422-451)."""

    params: WaveAugParams
    dataset_name: str = "ESC-50-master"
    sr: int = SAMPLE_RATE

    def _stats(self):
        return FEATURE_STATS.get(self.dataset_name, _DEFAULT_STATS)

    def apply_once(self, x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        """One augmented copy of [B, L]."""
        p = self.params.raw
        stats = self._stats()
        centroid = float(stats["avg_centroid"])
        bandwidth = float(stats["avg_bandwidth"])
        flatness = float(stats["avg_flatness"])
        max_snr = float(p.get("max_snr_in_db", 25.0))
        min_snr = float(p.get("min_snr_in_db", 10.0))
        adapted = max_snr * (1.0 - flatness)  # augmentations.py:222-231

        ks = jax.random.split(key, 12)

        # p values are static config floats: a transform with p == 0 is
        # skipped at trace time (under jit a zero-probability transform would
        # otherwise still execute its full compute for every example).
        def prob(name, default):
            return float(p.get(name, default))

        p_lp = prob("lowpass_p", 0.5)
        p_noise = prob("noise_p", 0.5)
        p_hp, p_bs = prob("highpass_p", 0.3), prob("bandstop_p", 0.5)
        # Opt-in perf deviation (default off): fold LowPass into the shared
        # noise/highpass/bandstop spectrum group, saving its dedicated
        # rfft/irfft pair (~9.3 ms/episode measured). Changes transform ORDER
        # vs the reference (lowpass then applies after pitchshift/shift/gain,
        # and the noise SNR references the un-lowpassed signal) — see
        # PARITY.md deviations.
        fuse_lp = (
            bool(p.get("fuse_lowpass", False))
            and p_lp > 0
            and (p_noise > 0 or p_hp > 0 or p_bs > 0)
        )
        if p_lp > 0 and not fuse_lp:
            x = lowpass(x, ks[0], centroid, centroid + bandwidth / 2, p_lp, self.sr)
        if prob("pitchshift_p", 0.5) > 0:
            # "resample" (default): clip/zero-pad resample (fast, documented
            # deviation); "pv": duration-preserving phase-vocoder A/B arm
            ps_fn = pitch_shift_pv if p.get("pitchshift_mode", "resample") == "pv" else pitch_shift
            x = ps_fn(
                x,
                ks[1],
                p.get("pitchshift_min_transpose_semitones", -4),
                p.get("pitchshift_max_transpose_semitones", 4),
                prob("pitchshift_p", 0.5),
            )
        if prob("shift_p", 0.5) > 0:
            x = shift(
                x, ks[2], p.get("shift_min_shift", -0.5), p.get("shift_max_shift", 0.5), prob("shift_p", 0.5)
            )
        if prob("timeinversion_p", 0.0) > 0:
            x = time_inversion(x, ks[3], prob("timeinversion_p", 0.0))
        if prob("gain_p", 0.5) > 0:
            x = gain(x, ks[4], p.get("min_gain_in_db", -6), p.get("max_gain_in_db", 6), prob("gain_p", 0.5))
        if fuse_lp or (p_noise > 0) + (p_hp > 0) + (p_bs > 0) >= 2:
            # adjacent spectrum-domain transforms share one rfft/irfft pair;
            # statically-zero members are traced out inside
            x = noise_highpass_bandstop(
                x, ks[5], ks[6], ks[7],
                min_snr, adapted,  # min draw bound pair as in reference
                p.get("noise_min_f_decay", -2),
                p.get("noise_max_f_decay", 2),
                centroid - bandwidth / 2, centroid,
                centroid - bandwidth / 2, centroid,
                p.get("bandstop_min_bandwidth_fraction", 0.5),
                p.get("bandstop_max_bandwidth_fraction", 1.0),
                p_noise, p_hp, p_bs, self.sr,
                key_lp=ks[0],
                lp_min_cut=centroid,
                lp_max_cut=centroid + bandwidth / 2,
                p_lp=p_lp if fuse_lp else 0.0,
            )
        elif p_noise > 0:
            x = add_colored_noise(
                x,
                ks[5],
                min_snr,
                adapted,  # min draw bound: uniform(min_snr, adapted); bound pair as in reference
                p.get("noise_min_f_decay", -2),
                p.get("noise_max_f_decay", 2),
                p_noise,
                self.sr,
            )
        elif p_hp > 0:
            x = highpass(x, ks[6], centroid - bandwidth / 2, centroid, p_hp, self.sr)
        elif p_bs > 0:
            x = bandstop(
                x,
                ks[7],
                centroid - bandwidth / 2,
                centroid,
                p.get("bandstop_min_bandwidth_fraction", 0.5),
                p.get("bandstop_max_bandwidth_fraction", 1.0),
                p_bs,
                self.sr,
            )
        if prob("spliceout_p", 0.5) > 0:
            x = splice_out(
                x,
                ks[8],
                int(p.get("spliceout_num_time_intervals", 8)),
                int(p.get("spliceout_max_width", 400)),
                prob("spliceout_p", 0.5),
            )
        if prob("timestretch_p", 0.0) > 0:
            x = time_stretch(
                x,
                ks[9],
                p.get("min_stretch_ratio", 0.9),
                p.get("max_stretch_ratio", 1.1),
                prob("timestretch_p", 0.0),
            )
        if prob("timemasking_p", 0.5) > 0:
            x = time_masking(
                x,
                ks[10],
                int(p.get("timemasking_masks", 5)),
                float(p.get("timemasking_mask_fraction", 0.01)),
                prob("timemasking_p", 0.5),
            )
        return x

    def __call__(self, x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        """[B, L] -> [B, 1 + aug_num, L] views (original first,
        utils/augmentations.py:429-451).

        The aug_num copies are folded into the batch axis and run through ONE
        chain application (every random draw is per-example, so copies stay
        independent): one FFT/resample dispatch at batch aug_num*B instead of
        aug_num sequential passes — measurably faster on TPU."""
        b, l = x.shape
        n = self.params.aug_num
        tiled = jnp.broadcast_to(x[None], (n, b, l)).reshape(n * b, l)
        augmented = self.apply_once(tiled, key).reshape(n, b, l)
        return jnp.concatenate([x[:, None], jnp.moveaxis(augmented, 0, 1)], axis=1)

    @property
    def num_views(self) -> int:
        return 1 + self.params.aug_num
