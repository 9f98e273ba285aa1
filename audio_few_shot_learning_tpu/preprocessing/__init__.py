"""Offline dataset preprocessing (reference offline_preprocessing/*).

Run-once builders producing the exact on-disk layout the training stack
consumes: ``waveforms_npy/<class>/*.npy`` -> ``features/<class>/*.npy`` +
``splits.npy`` + ``norm_stats/glob_norm.npy``. Mel extraction runs batched on
the accelerator through ops.mel (offline flavor: Slaney scale/norm,
20/power*log10) instead of per-file librosa calls.
"""

from audio_few_shot_learning_tpu.preprocessing.audio_io import load_audio  # noqa: F401
from audio_few_shot_learning_tpu.preprocessing.to_np_and_norm import (  # noqa: F401
    normalise,
    wav_dir_to_npy,
)
from audio_few_shot_learning_tpu.preprocessing.to_spec import npy_dir_to_spec  # noqa: F401
from audio_few_shot_learning_tpu.preprocessing.to_var_spec import (  # noqa: F401
    npy_dir_to_var_spec,
    stacked_spec,
    variable_splits,
)
from audio_few_shot_learning_tpu.preprocessing.norm_stats import (  # noqa: F401
    compute_global_norm,
)
from audio_few_shot_learning_tpu.preprocessing.make_splits import (  # noqa: F401
    REFERENCE_SPLIT_COUNTS,
    compute_waveform_norm,
    make_splits,
)
