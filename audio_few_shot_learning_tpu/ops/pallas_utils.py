"""Shared helpers for Pallas TPU kernels."""

from __future__ import annotations

import os

import jax

_FORCE = os.environ.get("AFSL_FORCE_PALLAS", "")


def pallas_enabled() -> bool:
    """Pallas TPU kernels run only on real TPU backends.

    CPU test runs fall back to the pure-XLA implementations (which double as
    numerical oracles). Set AFSL_FORCE_PALLAS=1 to force kernels on
    (interpret mode is handled by the caller), =0 to force them off.
    """
    if _FORCE == "1":
        return True
    if _FORCE == "0":
        return False
    return jax.default_backend() == "tpu"


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def cdiv(a: int, b: int) -> int:
    return -(-a // b)
