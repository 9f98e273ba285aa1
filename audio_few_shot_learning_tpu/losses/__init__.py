"""Loss functions: FSL prototypical CE, CPL contrastive-prototypical, and
angular prototypical loss — all vectorized over fixed episode shapes (no
Python loops, reference loops/loss.py)."""

from audio_few_shot_learning_tpu.losses.fsl import fsl_loss  # noqa: F401
from audio_few_shot_learning_tpu.losses.cpl import cpl_loss  # noqa: F401
from audio_few_shot_learning_tpu.losses.angular import angular_loss  # noqa: F401
