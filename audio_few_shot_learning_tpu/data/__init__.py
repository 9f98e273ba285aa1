"""Data substrate: packed device-resident spectrogram stores and the
on-device episodic sampler (replaces reference datasets/ + batch_creation.py
with gather-based episode assembly that never stalls the TPU).

``pack_dataset`` is the bring-your-own-data entry point (reference
datasets/few_shot_dataset.py protocol, vendored there from EasyFSL): any
indexable ``(array, label)`` sequence packs into a device-resident
``PackedStore`` consumable by the episode engine.
"""

from typing import Sequence

import numpy as np

from audio_few_shot_learning_tpu.data.store import PackedStore  # noqa: F401
from audio_few_shot_learning_tpu.data.episodes import (  # noqa: F401
    EpisodeBatch,
    sample_episode_batch,
)
from audio_few_shot_learning_tpu.data.datasets import (  # noqa: F401
    MetaAudioDataset,
    load_packed_split,
    make_synthetic_dataset,
    make_synthetic_wav_dataset,
)
from audio_few_shot_learning_tpu.data.wavstore import PackedWavStore  # noqa: F401
from audio_few_shot_learning_tpu.data.hoststore import HostStore  # noqa: F401
from audio_few_shot_learning_tpu.data.wavhoststore import WavHostStore  # noqa: F401


def pack_dataset(dataset: Sequence, mean: float = 0.0, std: float = 1.0, device=None):
    """Pack any indexable ``(x, label)`` dataset into a device-resident
    ``PackedStore`` (the adapter role of reference
    datasets/few_shot_dataset.py:31-80, minus the torch Dataset ceremony)."""
    items = [np.asarray(dataset[i][0]) for i in range(len(dataset))]
    labels = [int(dataset[i][1]) for i in range(len(dataset))]
    return PackedStore.pack(items, labels, mean=mean, std=std, device=device)
