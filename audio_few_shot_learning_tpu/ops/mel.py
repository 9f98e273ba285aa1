"""Log-mel spectrogram extraction, TPU-native.

Replaces the reference's two library code paths with one JAX implementation:

* offline: ``librosa.feature.melspectrogram`` + ``20/power*log10(mel+eps)``
  (reference offline_preprocessing/to_spec.py:60-63) — Slaney mel scale,
  slaney norm, constant center padding, eps = 2**-52.
* online:  ``torchaudio.transforms.MelSpectrogram`` + ``10*log10(mel+eps)``
  (reference src/train_test.py:123-129, datasets/batch_creation.py:211-214) —
  HTK mel scale, no norm, reflect center padding, eps = float32 machine eps.

Structure: frame -> window -> rFFT -> |.|^power (XLA; the TPU has a native
FFT) then a **fused Pallas kernel** for the mel filterbank matmul + log10 —
the filterbank projection is the MXU-friendly part and fusing the log into it
saves one full HBM round-trip of the [frames, n_mels] intermediate.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from audio_few_shot_learning_tpu.config import (
    HOP_LENGTH,
    MEL_POWER,
    N_FFT,
    N_MELS,
    SAMPLE_RATE,
)
from audio_few_shot_learning_tpu.ops.pallas_utils import pallas_enabled, round_up

_F64EPS = float(np.finfo(np.float64).eps)  # sys.float_info.epsilon in the reference
_F32EPS = float(np.finfo(np.float32).eps)


def _hz_to_mel(f: np.ndarray, scale: str) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    if scale == "htk":
        return 2595.0 * np.log10(1.0 + f / 700.0)
    if scale == "slaney":
        f_sp = 200.0 / 3.0
        min_log_hz = 1000.0
        logstep = np.log(6.4) / 27.0
        mel = f / f_sp
        log_region = f >= min_log_hz
        mel = np.where(
            log_region,
            min_log_hz / f_sp + np.log(np.maximum(f, min_log_hz) / min_log_hz) / logstep,
            mel,
        )
        return mel
    raise ValueError(f"unknown mel scale {scale!r}")


def _mel_to_hz(m: np.ndarray, scale: str) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    if scale == "htk":
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    if scale == "slaney":
        f_sp = 200.0 / 3.0
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        hz = m * f_sp
        log_region = m >= min_log_mel
        hz = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), hz)
        return hz
    raise ValueError(f"unknown mel scale {scale!r}")


def mel_filterbank(
    sr: int = SAMPLE_RATE,
    n_fft: int = N_FFT,
    n_mels: int = N_MELS,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
    scale: str = "htk",
    norm: Optional[str] = None,
) -> np.ndarray:
    """Triangular mel filterbank, shape [n_fft//2 + 1, n_mels].

    ``scale='htk', norm=None`` matches torchaudio defaults (the reference's
    online extractor); ``scale='slaney', norm='slaney'`` matches librosa
    defaults (the reference's offline extractor).
    """
    f_max = float(sr) / 2 if f_max is None else f_max
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0, sr // 2, n_freqs)

    m_min = _hz_to_mel(np.array(f_min), scale)
    m_max = _hz_to_mel(np.array(f_max), scale)
    m_pts = np.linspace(m_min, m_max, n_mels + 2)
    f_pts = _mel_to_hz(m_pts, scale)

    # Triangular filters: rising slope from f_pts[i] to f_pts[i+1], falling to f_pts[i+2]
    f_diff = f_pts[1:] - f_pts[:-1]  # [n_mels + 1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels + 2]
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))  # [n_freqs, n_mels]

    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]
    elif norm is not None:
        raise ValueError(f"unknown filterbank norm {norm!r}")
    return fb.astype(np.float32)


def _frame(x: jnp.ndarray, n_fft: int, hop: int, pad_mode: str) -> jnp.ndarray:
    """[..., L] -> [..., frames, n_fft] with center padding (frames = 1 + L//hop)."""
    pad = [(0, 0)] * (x.ndim - 1) + [(n_fft // 2, n_fft // 2)]
    x = jnp.pad(x, pad, mode=pad_mode)
    n_frames = 1 + (x.shape[-1] - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    return x[..., idx]


def _hann(n: int) -> np.ndarray:
    # periodic Hann (torch.hann_window / scipy fftbins=True)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float32)


def power_spectrogram(
    wav: jnp.ndarray,
    n_fft: int = N_FFT,
    hop_length: int = HOP_LENGTH,
    power: float = MEL_POWER,
    pad_mode: str = "reflect",
) -> jnp.ndarray:
    """[..., L] -> [..., frames, n_fft//2+1] power spectrogram."""
    frames = _frame(wav.astype(jnp.float32), n_fft, hop_length, pad_mode)
    frames = frames * jnp.asarray(_hann(n_fft))
    spec = jnp.fft.rfft(frames, axis=-1)
    mag2 = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    if power == 2.0:
        return mag2
    return mag2 ** (power / 2.0)


# ----------------------------------------------------------------------------
# Fused filterbank-projection + log kernel
# ----------------------------------------------------------------------------


def _mel_log_xla(pspec: jnp.ndarray, fb: jnp.ndarray, log_mult: float, eps: float):
    mel = jnp.einsum("...tf,fm->...tm", pspec, fb)
    return log_mult * jnp.log10(mel + eps)


def _mel_log_pallas(pspec: jnp.ndarray, fb: jnp.ndarray, log_mult: float, eps: float):
    """Fused (pspec @ fb) + log10 Pallas kernel.

    pspec: [M, K] rows = flattened (batch*frames); fb: [K, n_mels].
    Tiles M; K and n_mels are zero-padded to lane multiples once.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = pspec.shape
    n = fb.shape[1]
    kp = round_up(k, 128)
    np_ = round_up(n, 128)
    tile_m = 256
    mp = round_up(m, tile_m)

    pspec_p = jnp.pad(pspec, ((0, mp - m), (0, kp - k)))
    fb_p = jnp.pad(fb, ((0, kp - k), (0, np_ - n)))

    def kernel(x_ref, w_ref, o_ref):
        acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
        o_ref[:] = log_mult * jnp.log10(acc + eps)

    out = pl.pallas_call(
        kernel,
        grid=(mp // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, np_), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, np_), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * kp * np_,
            bytes_accessed=4 * (mp * kp + kp * np_ + mp * np_),
            transcendentals=mp * np_,
        ),
    )(pspec_p, fb_p)
    return out[:m, :n]


@dataclasses.dataclass(frozen=True)
class MelSpec:
    """Configured log-mel extractor.

    flavor="online": HTK scale, no norm, reflect pad, 10*log10(mel + f32eps)
        == the reference's on-GPU torchaudio path for wav-input episodes.
    flavor="offline": Slaney scale, slaney norm, constant pad,
        (20/power)*log10(mel + f64eps) == the reference's librosa
        preprocessing path that builds the on-disk feature stores.
    """

    sr: int = SAMPLE_RATE
    n_fft: int = N_FFT
    hop_length: int = HOP_LENGTH
    n_mels: int = N_MELS
    power: float = MEL_POWER
    flavor: str = "online"
    use_pallas: Optional[bool] = None

    def __post_init__(self):
        if self.flavor not in ("online", "offline"):
            raise ValueError(f"unknown flavor {self.flavor!r}")

    @functools.cached_property
    def fb(self) -> np.ndarray:
        if self.flavor == "online":
            return mel_filterbank(self.sr, self.n_fft, self.n_mels, scale="htk", norm=None)
        return mel_filterbank(self.sr, self.n_fft, self.n_mels, scale="slaney", norm="slaney")

    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        """[..., L] waveform -> [..., n_mels, frames] log-mel spectrogram.

        Output axis order (mel, time) matches both reference paths.
        """
        pad_mode = "reflect" if self.flavor == "online" else "constant"
        eps = _F32EPS if self.flavor == "online" else _F64EPS
        log_mult = 10.0 if self.flavor == "online" else 20.0 / self.power

        pspec = power_spectrogram(wav, self.n_fft, self.hop_length, self.power, pad_mode)
        lead = pspec.shape[:-1]  # [..., frames] leading dims incl. frames
        k = pspec.shape[-1]
        flat = pspec.reshape(-1, k)

        use_pallas = self.use_pallas
        if use_pallas is None:
            use_pallas = pallas_enabled()
        if use_pallas:
            logmel = _mel_log_pallas(flat, jnp.asarray(self.fb), log_mult, eps)
        else:
            logmel = _mel_log_xla(flat, jnp.asarray(self.fb), log_mult, eps)
        logmel = logmel.reshape(*lead, self.n_mels)
        return jnp.swapaxes(logmel, -1, -2)  # [..., n_mels, frames]


def log_mel_spectrogram(wav: jnp.ndarray, flavor: str = "online", **kw) -> jnp.ndarray:
    """Functional convenience wrapper over :class:`MelSpec`."""
    return MelSpec(flavor=flavor, **kw)(wav)
