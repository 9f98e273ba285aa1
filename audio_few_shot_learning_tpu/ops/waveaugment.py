"""Waveform augmentation bank, on-device.

Re-derivation of the reference's ``WaveAugment``
(utils/augmentations.py:180-451): a probabilistic chain of
LowPass -> PitchShift -> Shift -> TimeInversion -> Gain -> AddColoredNoise ->
HighPass -> BandStop -> SpliceOut (per-example probabilities), plus optional
time-stretch and time-masking, producing 1 original + ``aug_num`` augmented
copies. Cutoffs/SNR bounds adapt to per-dataset spectral statistics exactly
as in the reference (utils/augmentations.py:186-207,211-277).

TPU-first formulations:
  * filters are rFFT-domain soft masks (one rfft/irfft pair per transform
    instead of FIR convolutions) — same cutoff semantics, raised-cosine edge;
  * pitch shift / time stretch are linear-interpolation resamples expressed
    as gathers;
  * splice-out compacts kept samples with a stable argsort;
  * colored noise is spectrally shaped white noise (f^(-decay/2)) scaled to a
    target SNR.
All transforms are static-shape, jit- and vmap-friendly ([B, L] batches).
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

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


def gain(x, key, min_db, max_db, p):
    b = x.shape[0]
    k1, k2 = jax.random.split(key)
    g = 10.0 ** (jax.random.uniform(k1, (b, 1), minval=min_db, maxval=max_db) / 20.0)
    return _mix(_per_example(k2, b, p), x * g, x)


def time_inversion(x, key, p):
    return _mix(_per_example(key, x.shape[0], p), x[:, ::-1], x)


def shift(x, key, min_shift, max_shift, p):
    """Fractional circular shift (rollover=True, reference Shift transform)."""
    b, l = x.shape
    k1, k2 = jax.random.split(key)
    frac = jax.random.uniform(k1, (b,), minval=min_shift, maxval=max_shift)
    offs = (frac * l).astype(jnp.int32)
    idx = (jnp.arange(l)[None, :] - offs[:, None]) % l
    return _mix(_per_example(k2, b, p), jnp.take_along_axis(x, idx, axis=1), x)


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


def _resample_to_length(x: jnp.ndarray, rate: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Per-example linear-interp resample by ``rate``, clipped/padded to out_len."""
    b, l = x.shape
    pos = jnp.arange(out_len)[None, :] * rate[:, None]  # source positions
    p0 = jnp.floor(pos)
    w = pos - p0
    valid = pos <= (l - 1)
    i0 = jnp.clip(p0, 0, l - 1).astype(jnp.int32)
    i1 = jnp.clip(p0 + 1, 0, l - 1).astype(jnp.int32)
    out = (1 - w) * jnp.take_along_axis(x, i0, axis=1) + w * jnp.take_along_axis(x, i1, axis=1)
    return jnp.where(valid, out, 0.0)


def pitch_shift(x, key, min_semitones, max_semitones, p):
    """Resample-based pitch shift (duration restored by clipping/zero-pad —
    documented approximation of the reference's resample+stretch chain)."""
    b, l = x.shape
    k1, k2 = jax.random.split(key)
    st = jax.random.uniform(k1, (b,), minval=min_semitones, maxval=max_semitones)
    rate = 2.0 ** (st / 12.0)
    return _mix(_per_example(k2, b, p), _resample_to_length(x, rate, l), x)


def time_stretch(x, key, min_ratio, max_ratio, p):
    """sox-stretch equivalent: resample by 1/ratio, fix length
    (utils/augmentations.py:397-420 fixes to 80000 samples)."""
    b, l = x.shape
    k1, k2 = jax.random.split(key)
    ratio = jax.random.uniform(k1, (b,), minval=min_ratio, maxval=max_ratio)
    return _mix(_per_example(k2, b, p), _resample_to_length(x, 1.0 / ratio, l), x)


def splice_out(x, key, num_intervals, max_width, p):
    """Remove up to num_intervals random intervals and compact, zero-padding
    the tail (torch_audiomentations SpliceOut semantics)."""
    b, l = x.shape
    k1, k2, k3 = jax.random.split(key, 3)
    starts = jax.random.randint(k1, (b, num_intervals), 0, jnp.maximum(l - max_width, 1))
    widths = jax.random.randint(k2, (b, num_intervals), 1, max_width + 1)
    idx = jnp.arange(l)[None, None, :]
    cut = jnp.any(
        (idx >= starts[:, :, None]) & (idx < (starts + widths)[:, :, None]), axis=1
    )  # [B, L] True = remove
    # stable sort moves kept samples (0) forward preserving order
    order = jnp.argsort(cut.astype(jnp.int32), axis=1, stable=True)
    compacted = jnp.take_along_axis(x, order, axis=1)
    keep_counts = (~cut).sum(axis=1, keepdims=True)
    compacted = jnp.where(jnp.arange(l)[None, :] < keep_counts, compacted, 0.0)
    return _mix(_per_example(k3, b, p), compacted, x)


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
        x = lowpass(x, ks[0], centroid, centroid + bandwidth / 2, p.get("lowpass_p", 0.5), self.sr)
        x = pitch_shift(
            x,
            ks[1],
            p.get("pitchshift_min_transpose_semitones", -4),
            p.get("pitchshift_max_transpose_semitones", 4),
            p.get("pitchshift_p", 0.5),
        )
        x = shift(
            x, ks[2], p.get("shift_min_shift", -0.5), p.get("shift_max_shift", 0.5), p.get("shift_p", 0.5)
        )
        x = time_inversion(x, ks[3], p.get("timeinversion_p", 0.0))
        x = gain(x, ks[4], p.get("min_gain_in_db", -6), p.get("max_gain_in_db", 6), p.get("gain_p", 0.5))
        x = add_colored_noise(
            x,
            ks[5],
            min_snr,
            adapted,  # min draw bound: uniform(min_snr, adapted); bound pair as in reference
            p.get("noise_min_f_decay", -2),
            p.get("noise_max_f_decay", 2),
            p.get("noise_p", 0.5),
            self.sr,
        )
        x = highpass(x, ks[6], centroid - bandwidth / 2, centroid, p.get("highpass_p", 0.3), self.sr)
        x = bandstop(
            x,
            ks[7],
            centroid - bandwidth / 2,
            centroid,
            p.get("bandstop_min_bandwidth_fraction", 0.5),
            p.get("bandstop_max_bandwidth_fraction", 1.0),
            p.get("bandstop_p", 0.5),
            self.sr,
        )
        x = splice_out(
            x,
            ks[8],
            int(p.get("spliceout_num_time_intervals", 8)),
            int(p.get("spliceout_max_width", 400)),
            p.get("spliceout_p", 0.5),
        )
        x = time_stretch(
            x,
            ks[9],
            p.get("min_stretch_ratio", 0.9),
            p.get("max_stretch_ratio", 1.1),
            p.get("timestretch_p", 0.0),
        )
        x = time_masking(
            x,
            ks[10],
            int(p.get("timemasking_masks", 5)),
            float(p.get("timemasking_mask_fraction", 0.01)),
            p.get("timemasking_p", 0.5),
        )
        return x

    def __call__(self, x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        """[B, L] -> [B, 1 + aug_num, L] views (original first,
        utils/augmentations.py:429-451)."""
        keys = jax.random.split(key, self.params.aug_num)
        views = [x] + [self.apply_once(x, k) for k in keys]
        return jnp.stack(views, axis=1)

    @property
    def num_views(self) -> int:
        return 1 + self.params.aug_num
