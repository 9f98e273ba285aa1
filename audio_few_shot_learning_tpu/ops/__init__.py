"""TPU compute ops: fused Pallas kernels with pure-XLA fallbacks.

Every op in this package has two implementations selected by
``use_pallas`` (and auto-disabled off-TPU):

* a Pallas TPU kernel tuned for MXU/VPU tiling and HBM bandwidth, and
* a pure ``jax.numpy`` reference that XLA fuses well enough for CPU tests.

The pure version is also the numerical oracle in ``tests/``.
"""

from audio_few_shot_learning_tpu.ops.mel import (  # noqa: F401
    MelSpec,
    log_mel_spectrogram,
    mel_filterbank,
)
from audio_few_shot_learning_tpu.ops.specaugment import (  # noqa: F401
    SpecAugment,
    spec_augment_views,
)
from audio_few_shot_learning_tpu.ops.protohead import (  # noqa: F401
    batched_episode_scores,
    compute_prototypes,
    pairwise_sqeuclidean,
    prototype_scores,
)
