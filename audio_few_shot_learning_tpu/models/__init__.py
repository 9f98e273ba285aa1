"""Model layer: flax.linen modules mirroring the reference's model zoo
(models/main_modules.py, models/prototypical.py) with TPU-first layout
(NHWC convs, scan RNNs, episode-batched heads)."""

from audio_few_shot_learning_tpu.models.encoders import (  # noqa: F401
    StandardCNN,
    StandardHybrid,
    make_backbone,
)
from audio_few_shot_learning_tpu.models.attention import SelfAttention  # noqa: F401
from audio_few_shot_learning_tpu.models.projection import ProjectionHead, RelationHead  # noqa: F401
from audio_few_shot_learning_tpu.models.protonets import (  # noqa: F401
    EpisodeOutputs,
    FewShotEpisodeModel,
)
