"""Fixed-length npy waveforms -> log-mel spectrogram npy files.

Reference offline_preprocessing/to_spec.py:30-121, with its defensive skip
rules preserved exactly: zero-std files, files shorter than 1 s, NaN files,
wrong-length files (when a fixed length is expected). Mel extraction runs
*batched on the accelerator* (offline flavor: Slaney mel, slaney norm,
20/power*log10(mel+f64eps)) instead of per-file librosa calls.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional, Union

import jax.numpy as jnp
import numpy as np

from audio_few_shot_learning_tpu.config import (
    HOP_LENGTH,
    MEL_POWER,
    N_FFT,
    N_MELS,
    SAMPLE_RATE,
)
from audio_few_shot_learning_tpu.ops.mel import MelSpec


def _should_skip(audio: np.ndarray, path, length: Optional[int], sr: int, log_fn) -> bool:
    if np.std(audio) == 0.0:
        log_fn(f"File has 0 std: {path}")
        return True
    if audio.shape[0] < sr:  # < 1 second (to_spec.py:45-46)
        return True
    if np.isnan(np.sum(audio)):
        return True
    if length is not None and audio.shape[0] != sr * length:
        log_fn(f"Unsuitable length: {audio.shape[0]}:: {path}")
        return True
    return False


def npy_dir_to_spec(
    old_dir: Union[str, Path],
    new_dir: Union[str, Path],
    sample_length: Optional[int],
    sr: int = SAMPLE_RATE,
    n_mels: int = N_MELS,
    n_fft: int = N_FFT,
    hop_length: int = HOP_LENGTH,
    power: float = MEL_POWER,
    batch_size: int = 64,
    log_fn=print,
) -> int:
    """Convert every class folder of fixed-length waveforms to log-mel specs.

    Files sharing a length are batched through one device call.
    Returns number of spectrograms written.
    """
    old_dir, new_dir = Path(old_dir), Path(new_dir)
    new_dir.mkdir(parents=True, exist_ok=True)
    mel = MelSpec(
        sr=sr, n_fft=n_fft, hop_length=hop_length, n_mels=n_mels, power=power, flavor="offline"
    )
    written = 0

    def flush(batch: List[np.ndarray], paths: List[Path]):
        nonlocal written
        if not batch:
            return
        stacked = jnp.asarray(np.stack(batch))
        specs = np.asarray(mel(stacked))  # [B, n_mels, frames]
        for spec, out_path in zip(specs, paths):
            np.save(out_path, spec.astype(np.float32))
            written += 1

    for cls in sorted(os.listdir(old_dir)):
        cdir = old_dir / cls
        if not cdir.is_dir():
            continue
        out_cdir = new_dir / cls
        out_cdir.mkdir(exist_ok=True)
        # batch by waveform length so variable-length sets still stack
        by_len = {}
        for fname in sorted(os.listdir(cdir)):
            if not fname.endswith(".npy"):
                continue
            audio = np.load(cdir / fname)
            if _should_skip(audio, cdir / fname, sample_length, sr, log_fn):
                continue
            batch, paths = by_len.setdefault(audio.shape[0], ([], []))
            batch.append(audio)
            paths.append(out_cdir / fname)
            if len(batch) >= batch_size:
                flush(batch, paths)
                by_len.pop(audio.shape[0])
        for batch, paths in by_len.values():
            flush(batch, paths)
    return written
