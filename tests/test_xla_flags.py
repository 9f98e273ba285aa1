"""XLA_FLAGS composition: gates, force-replacement, and the grouped
collective-timeout flags (a caller-set timeout must never gain a second,
conflicting copy)."""

from audio_few_shot_learning_tpu.utils.xla_flags import merge_xla_flags


def test_appends_to_empty():
    out = merge_xla_flags("", device_count=8, collective_timeout_seconds=600)
    assert "--xla_force_host_platform_device_count=8" in out
    assert "--xla_cpu_collective_timeout_seconds=600" in out
    assert "--xla_cpu_collective_call_terminate_timeout_seconds=600" in out


def test_respects_existing_without_force():
    base = "--xla_force_host_platform_device_count=4"
    out = merge_xla_flags(base, device_count=8, collective_timeout_seconds=600)
    assert "device_count=4" in out and "device_count=8" not in out


def test_partial_timeout_flag_never_duplicated():
    """The regression: one of the two timeout flags set by the caller used to
    get the pair appended anyway, yielding two conflicting copies."""
    base = "--xla_cpu_collective_timeout_seconds=120"
    out = merge_xla_flags(base, device_count=8, collective_timeout_seconds=600)
    assert out.count("xla_cpu_collective_timeout_seconds") == 1
    assert "=120" in out  # the caller's value survived
    assert "terminate_timeout" not in out  # group respected as a unit


def test_force_strips_stale_copies():
    base = (
        "--xla_force_host_platform_device_count=8 --other=1 "
        "--xla_cpu_collective_timeout_seconds=40"
    )
    out = merge_xla_flags(base, device_count=2, collective_timeout_seconds=600, force=True)
    assert "--other=1" in out
    assert out.count("host_platform_device_count") == 1 and "device_count=2" in out
    assert out.count("xla_cpu_collective_timeout_seconds") == 1 and "=600" in out
