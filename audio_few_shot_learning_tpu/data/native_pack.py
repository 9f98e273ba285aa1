"""ctypes bindings for the native C++ dataset packer (native/npy_pack.cc).

Builds the shared library on first use with g++ (no pybind11 in the image;
plain C ABI + ctypes). Every entry point degrades to the pure-Python path on
any failure, so the framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "npy_pack.cc"
_BUILD_DIR = _REPO_ROOT / "native" / "build"
_LIB_PATH = _BUILD_DIR / "libafslnpy.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_lib_failed = False


def _build() -> bool:
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        str(_SRC), "-o", str(_LIB_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> ctypes.CDLL:
    """CDLL + symbol resolution; raises on missing symbols (stale .so)."""
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.afsl_npy_probe.restype = ctypes.c_int64
    lib.afsl_npy_probe.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64)]
    lib.afsl_pack_f32.restype = ctypes.c_int64
    lib.afsl_pack_f32.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_float,
        ctypes.c_float,
        ctypes.c_int,
    ]
    lib.afsl_pack_f32_var.restype = ctypes.c_int64
    lib.afsl_pack_f32_var.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_float,
        ctypes.c_float,
        ctypes.c_int,
    ]
    lib.afsl_pack_bf16_var.restype = ctypes.c_int64
    lib.afsl_pack_bf16_var.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint16),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_float,
        ctypes.c_float,
        ctypes.c_int,
    ]
    return lib


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None.

    A prebuilt .so that fails to load or lacks a symbol (e.g. a copied build
    dir whose mtime defeats the staleness check — advisor round-2 finding) is
    deleted and rebuilt once from source before the native path is declared
    unavailable, so a stale binary can't silently disable the fast path.
    """
    global _lib, _lib_failed
    with _lock:
        if _lib is not None or _lib_failed:
            return _lib
        stale = (
            _LIB_PATH.exists()
            and _SRC.exists()
            and _SRC.stat().st_mtime > _LIB_PATH.stat().st_mtime
        )
        if (not _LIB_PATH.exists() or stale) and not (_SRC.exists() and _build()):
            _lib_failed = True
            return None
        try:
            _lib = _load()
        except Exception:
            try:
                _LIB_PATH.unlink()
            except OSError:
                pass
            if _SRC.exists() and _build():
                try:
                    _lib = _load()
                except Exception:
                    _lib_failed = True
            else:
                _lib_failed = True
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def probe(path: str) -> Optional[Tuple[int, int]]:
    """(total_elems, leading_dim) of a .npy file, or None."""
    lib = get_lib()
    if lib is None:
        return None
    shape0 = ctypes.c_int64(0)
    elems = lib.afsl_npy_probe(str(path).encode(), ctypes.byref(shape0))
    if elems < 0:
        return None
    return int(elems), int(shape0.value)


def pack_files(
    paths: Sequence[str],
    out: np.ndarray,
    mean: float,
    std: float,
    threads: int = 8,
) -> bool:
    """Fill ``out`` (float32, shape [n, ...]) with normalized file payloads.

    File i writes its elements into out[i].ravel()[:elems]; remaining slots
    keep their (zero) padding. Returns False on any failure (caller falls
    back to the Python path).
    """
    lib = get_lib()
    if lib is None or out.dtype != np.float32 or not out.flags.c_contiguous:
        return False
    n = len(paths)
    stride = int(np.prod(out.shape[1:]))
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    failures = lib.afsl_pack_f32(
        arr,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        stride,
        ctypes.c_float(mean),
        ctypes.c_float(1.0 / std if std else 1.0),
        threads,
    )
    return failures == 0


def pack_files_flat(
    paths: Sequence[str],
    out: np.ndarray,
    offsets_elems: np.ndarray,
    mean: float,
    std: float,
    threads: int = 8,
) -> bool:
    """Flat/ragged pack: file i writes its payload at out.ravel()[offsets[i]:
    offsets[i+1]] (offsets has len(paths)+1 entries, in ELEMENTS).

    ``out`` may be float32 or bfloat16 (ml_dtypes); bf16 converts in C++ with
    round-to-nearest-even, bit-identical to ``np.asarray(x, bfloat16)``."""
    import ml_dtypes

    lib = get_lib()
    if lib is None or not out.flags.c_contiguous:
        return False
    if out.dtype == np.float32:
        entry, ptr_t = lib.afsl_pack_f32_var, ctypes.POINTER(ctypes.c_float)
    elif out.dtype == ml_dtypes.bfloat16:
        entry, ptr_t = lib.afsl_pack_bf16_var, ctypes.POINTER(ctypes.c_uint16)
    else:
        return False
    n = len(paths)
    offs = np.ascontiguousarray(offsets_elems, dtype=np.int64)
    if offs.shape[0] != n + 1:
        return False
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    failures = entry(
        arr,
        n,
        out.ctypes.data_as(ptr_t),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_float(mean),
        ctypes.c_float(1.0 / std if std else 1.0),
        threads,
    )
    return failures == 0
