"""Data substrate: packed device-resident spectrogram stores and the
on-device episodic sampler (replaces reference datasets/ + batch_creation.py
with gather-based episode assembly that never stalls the TPU)."""

from audio_few_shot_learning_tpu.data.store import PackedStore  # noqa: F401
from audio_few_shot_learning_tpu.data.episodes import (  # noqa: F401
    EpisodeBatch,
    sample_episode_batch,
)
from audio_few_shot_learning_tpu.data.datasets import (  # noqa: F401
    MetaAudioDataset,
    load_packed_split,
    make_synthetic_dataset,
)
from audio_few_shot_learning_tpu.data.few_shot_dataset import (  # noqa: F401
    FewShotDataset,
    WrapFewShotDataset,
    pack_dataset,
)
from audio_few_shot_learning_tpu.data.wavstore import PackedWavStore  # noqa: F401
from audio_few_shot_learning_tpu.data.datasets import make_synthetic_wav_dataset  # noqa: F401
