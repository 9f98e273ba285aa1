"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container pre-imports jax with ``JAX_PLATFORMS=axon`` (real TPU tunnel),
so tests must override via ``jax.config`` before any backend initializes
(SURVEY.md §4: multi-chip sharding is tested without TPUs via
``--xla_force_host_platform_device_count=8``).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audio_few_shot_learning_tpu.utils.xla_flags import merge_xla_flags  # noqa: E402

# 8-device virtual mesh + 600 s collective rendezvous timeout (XLA:CPU
# hard-aborts a missed 40 s rendezvous; a straggler on this contended 1-core
# box can blow that). Caller-set device counts / timeouts are respected.
os.environ["XLA_FLAGS"] = merge_xla_flags(
    os.environ.get("XLA_FLAGS", ""), device_count=8, collective_timeout_seconds=600
)
os.environ["AFSL_FORCE_PALLAS"] = "0"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# NOTE: do NOT enable the persistent compilation cache here — XLA:CPU AOT
# entries record host machine features and this box loads them with a
# feature-set mismatch warning ("+prefer-no-gather is not supported...") and
# intermittent SIGILL crashes.
assert jax.default_backend() == "cpu", "tests must run on the virtual CPU mesh"
assert jax.device_count() == 8

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
