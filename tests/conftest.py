"""Test configuration: run everything on a virtual 8-device CPU mesh.

The container pre-imports jax with ``JAX_PLATFORMS=axon`` (real TPU tunnel),
so tests must override via ``jax.config`` before any backend initializes
(SURVEY.md §4: multi-chip sharding is tested without TPUs via
``--xla_force_host_platform_device_count=8``).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "collective_call_terminate_timeout" not in flags:
    # XLA:CPU in-process collectives hard-abort when the 8 time-sliced device
    # threads miss a 40 s rendezvous window; on this contended 1-core box a
    # straggler can blow that. 600 s buys ~15x margin (same fix as
    # __graft_entry__.dryrun_multichip, verified with a deliberate straggler).
    flags += (
        " --xla_cpu_collective_call_terminate_timeout_seconds=600"
        " --xla_cpu_collective_timeout_seconds=600"
    )
os.environ["XLA_FLAGS"] = flags
os.environ["AFSL_FORCE_PALLAS"] = "0"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
