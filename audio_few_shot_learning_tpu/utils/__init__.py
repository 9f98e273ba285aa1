"""Utilities: profiling/tracing hooks and metrics logging (the reference has
only tqdm bars and prints — SURVEY.md §5)."""

from audio_few_shot_learning_tpu.utils.profiling import (  # noqa: F401
    EpisodeThroughput,
    profile_trace,
)
from audio_few_shot_learning_tpu.utils.logging import MetricsLogger  # noqa: F401
