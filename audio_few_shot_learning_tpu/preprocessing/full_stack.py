"""Full-stack per-dataset preprocessing drivers.

One callable per MetaAudio dataset, chaining sort -> npy+norm -> (prune) ->
spec/var-spec -> glob_norm, with the reference's canonical parameters
(full_stack_ESC.py:40-45: sr 16000, 128 mels, n_fft 1024, hop 512, power 2;
lengths: ESC/FSD/BirdClef/VoxCeleb 5 s, NSynth 4 s).

Usage:
    python -m audio_few_shot_learning_tpu.preprocessing.full_stack esc /data/ESC-50-master
"""

from __future__ import annotations

import sys
from pathlib import Path
from typing import Optional, Union

from audio_few_shot_learning_tpu.preprocessing import folder_sort
from audio_few_shot_learning_tpu.preprocessing.make_splits import (
    compute_waveform_norm,
    make_splits,
)
from audio_few_shot_learning_tpu.preprocessing.norm_stats import compute_global_norm
from audio_few_shot_learning_tpu.preprocessing.to_np_and_norm import wav_dir_to_npy
from audio_few_shot_learning_tpu.preprocessing.to_spec import npy_dir_to_spec
from audio_few_shot_learning_tpu.preprocessing.to_var_spec import npy_dir_to_var_spec

SR = 16000


def _finish(main_dir: Path, spec_dir: Path, npy_dir: Path, dataset: str) -> None:
    """Emit the data assets the loader contract requires (SURVEY.md C18):
    glob_norm stats, the seeded class-split file, and waveform stats."""
    compute_global_norm(spec_dir, main_dir / "norm_stats" / "glob_norm.npy")
    make_splits(spec_dir, main_dir / "splits.npy", dataset=dataset)
    compute_waveform_norm(npy_dir, main_dir / "norm_stats" / "waveform_norm.npy")


def full_stack_esc(main_dir: Union[str, Path]) -> None:
    main_dir = Path(main_dir)
    sorted_dir = folder_sort.sort_esc50(main_dir)
    npy_dir = main_dir / "Sorted_npy"
    wav_dir_to_npy(sorted_dir, npy_dir, sr=SR)
    spec_dir = main_dir / "features"
    npy_dir_to_spec(npy_dir, spec_dir, sample_length=5)
    _finish(main_dir, spec_dir, npy_dir, "esc")


def full_stack_kaggle(main_dir: Union[str, Path]) -> None:
    main_dir = Path(main_dir)
    sorted_dir = folder_sort.sort_kaggle18(main_dir)
    npy_dir = main_dir / "Sorted_npy"
    wav_dir_to_npy(sorted_dir, npy_dir, sr=SR)
    # FSD2018 is variable length -> stacked 5 s segments (full_stack_KAGGLE.py)
    spec_dir = main_dir / "features"
    npy_dir_to_var_spec(npy_dir, spec_dir, length_s=5)
    _finish(main_dir, spec_dir, npy_dir, "kaggle")


def full_stack_nsynth(main_dir: Union[str, Path]) -> None:
    main_dir = Path(main_dir)
    sorted_dir = folder_sort.sort_nsynth(main_dir)
    npy_dir = main_dir / "Sorted_nsynth_npy"
    wav_dir_to_npy(sorted_dir, npy_dir, sr=SR)
    spec_dir = main_dir / "features"
    npy_dir_to_spec(npy_dir, spec_dir, sample_length=4)  # NSynth is 4 s
    _finish(main_dir, spec_dir, npy_dir, "nsynth")


def full_stack_birdclef(
    main_dir: Union[str, Path], wav_dir: Optional[Union[str, Path]] = None
) -> None:
    """BirdClef: assumes class-foldered raw audio at ``wav_dir`` (the raw
    distribution is already foldered by species)."""
    main_dir = Path(main_dir)
    wav_dir = Path(wav_dir) if wav_dir else main_dir / "audio"
    npy_dir = main_dir / "Sorted_npy"
    wav_dir_to_npy(wav_dir, npy_dir, sr=SR)
    folder_sort.prune_birdclef(npy_dir, time_thresh_s=180.0, class_thresh=50, sr=SR)
    spec_dir = main_dir / "features"
    npy_dir_to_var_spec(npy_dir, spec_dir, length_s=5)
    _finish(main_dir, spec_dir, npy_dir, "birdclef")


def full_stack_voxceleb(
    main_dir: Union[str, Path], wav_dir: Optional[Union[str, Path]] = None
) -> None:
    main_dir = Path(main_dir)
    wav_dir = Path(wav_dir) if wav_dir else main_dir / "audio"
    npy_dir = main_dir / "Sorted_npy"
    wav_dir_to_npy(wav_dir, npy_dir, sr=SR)
    spec_dir = main_dir / "features"
    npy_dir_to_var_spec(npy_dir, spec_dir, length_s=5)
    _finish(main_dir, spec_dir, npy_dir, "voxceleb")


_DRIVERS = {
    "esc": full_stack_esc,
    "kaggle": full_stack_kaggle,
    "fsd2018": full_stack_kaggle,
    "nsynth": full_stack_nsynth,
    "birdclef": full_stack_birdclef,
    "voxceleb": full_stack_voxceleb,
}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2 or argv[0] not in _DRIVERS:
        print(f"usage: full_stack {{{'|'.join(sorted(_DRIVERS))}}} <dataset_dir>")
        raise SystemExit(2)
    _DRIVERS[argv[0]](*argv[1:])


if __name__ == "__main__":
    main()
