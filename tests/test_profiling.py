"""Profiling utilities: EMA throughput math and trace-hook degradation."""

import numpy as np

from audio_few_shot_learning_tpu.utils.profiling import (
    EpisodeThroughput,
    profile_trace,
)


def test_episode_throughput_ema():
    tp = EpisodeThroughput(alpha=0.5)
    assert tp.update(10, 1.0) == 10.0  # first sample seeds the EMA
    assert tp.update(20, 1.0) == 0.5 * 20 + 0.5 * 10
    assert tp.total_episodes == 30
    assert tp.lifetime > 0

    # zero-duration update must not divide by zero
    tp2 = EpisodeThroughput()
    assert np.isfinite(tp2.update(5, 0.0))


def test_profile_trace_disabled_and_bad_dir(tmp_path):
    # disabled -> pure no-op
    with profile_trace(str(tmp_path / "log"), enabled=False):
        x = 1 + 1
    assert x == 2

    # unavailable/failing backend trace degrades to a no-op, never raises
    with profile_trace("/nonexistent-dir/\0bad"):
        x = 2 + 2
    assert x == 4
