"""One place to compose XLA_FLAGS for virtual-CPU-mesh runs.

Three call sites need the same two adjustments (tests/conftest.py,
__graft_entry__.dryrun_multichip, tests/_dist_worker.py) and previously each
hand-rolled its own string surgery, with divergent gates — a caller-set
``--xla_cpu_collective_timeout_seconds`` without the terminate flag used to
get a second, conflicting copy appended. Import cost is just ``os``-free
string handling; XLA only reads the env var at backend initialization, so
composing flags before ``import jax`` is not required — only before the
first device query.
"""

from __future__ import annotations

_TIMEOUT_FLAGS = (
    "xla_cpu_collective_timeout_seconds",
    "xla_cpu_collective_call_terminate_timeout_seconds",
)


def merge_xla_flags(
    flags: str,
    *,
    device_count: int | None = None,
    collective_timeout_seconds: int | None = None,
    force: bool = False,
) -> str:
    """Return ``flags`` with the virtual-mesh flags applied.

    With ``force=False`` a flag group the caller already set (either timeout
    flag, or the device count) is left untouched; with ``force=True`` stale
    copies are stripped and replaced. The two collective-timeout flags are
    treated as one group so they can never diverge. 600 s timeouts buy ~15x
    margin over XLA:CPU's 40 s rendezvous abort on a contended 1-core box
    (measured with a deliberate straggler — see __graft_entry__).
    """
    parts = flags.split()

    def has(sub: str) -> bool:
        return any(sub in p for p in parts)

    if device_count is not None and (force or not has("host_platform_device_count")):
        parts = [p for p in parts if "host_platform_device_count" not in p]
        parts.append(f"--xla_force_host_platform_device_count={device_count}")

    if collective_timeout_seconds is not None and (
        force or not any(has(o) for o in _TIMEOUT_FLAGS)
    ):
        parts = [p for p in parts if not any(o in p for o in _TIMEOUT_FLAGS)]
        s = collective_timeout_seconds
        parts.append(f"--xla_cpu_collective_call_terminate_timeout_seconds={s}")
        parts.append(f"--xla_cpu_collective_timeout_seconds={s}")

    return " ".join(parts)
