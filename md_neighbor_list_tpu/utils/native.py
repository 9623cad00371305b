"""ctypes bridge to the native host-side components (native/*.cpp).

The native layer is built ON DEMAND with the system g++ (no pip, no
pybind11 — the environment is air-gapped) into ``native/_build/`` and
cached by source mtime. Loading is soft: any toolchain failure raises
``NativeUnavailable`` and callers (ops/decode.py) fall back to their pure
numpy paths, so the library never hard-requires a compiler at runtime.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading

_ROOT = pathlib.Path(__file__).resolve().parents[2]
_SRC = _ROOT / "native" / "decode.cpp"
_SO = _ROOT / "native" / "_build" / "libmdnl_native.so"

_lock = threading.Lock()
_lib = None
_err: Exception | None = None


class NativeUnavailable(RuntimeError):
    """The native library could not be built or loaded."""


def load() -> ctypes.CDLL:
    """Build (if stale) and load the native library; cached per process."""
    global _lib, _err
    with _lock:
        if _lib is not None:
            return _lib
        if _err is not None:  # don't retry a broken toolchain every call
            raise NativeUnavailable(str(_err)) from _err
        try:
            if (not _SO.exists()
                    or _SO.stat().st_mtime < _SRC.stat().st_mtime):
                _SO.parent.mkdir(parents=True, exist_ok=True)
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-std=c++17", "-shared",
                     "-fPIC", str(_SRC), "-o", str(_SO)],
                    check=True, capture_output=True, text=True,
                )
            lib = ctypes.CDLL(str(_SO))
            i32p = ctypes.POINTER(ctypes.c_int32)
            lib.mdnl_mask_pair_count.restype = ctypes.c_int64
            lib.mdnl_mask_pair_count.argtypes = [
                i32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ]
            lib.mdnl_decode_half.restype = ctypes.c_int64
            lib.mdnl_decode_half.argtypes = [
                i32p, i32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                i32p, i32p, ctypes.c_int64,
            ]
        except (OSError, subprocess.CalledProcessError) as e:
            _err = e
            raise NativeUnavailable(str(e)) from e
        _lib = lib
        return _lib


def decode_half(masks, pid, mc: int, cap: int):
    """Decode packed masks to (own pid, partner pid) int32 arrays via the
    C++ walker. Raises NativeUnavailable if the library can't load, and
    ValueError if a set bit points at an empty slot."""
    import numpy as np

    lib = load()
    m = np.ascontiguousarray(np.asarray(masks), dtype=np.int32)
    p = np.ascontiguousarray(np.asarray(pid), dtype=np.int32)
    words = int(m.shape[1])
    if m.shape != (5, words, mc * mc, mc, 3 * cap):
        raise ValueError(f"masks shape {m.shape} does not match the "
                         f"(5, words, mc², mc, 3·cap) layout at mc={mc}, "
                         f"cap={cap}")
    if p.shape != (mc * mc, mc, cap):
        raise ValueError(f"pid shape {p.shape} != {(mc * mc, mc, cap)}")
    i32p = ctypes.POINTER(ctypes.c_int32)
    total = lib.mdnl_mask_pair_count(
        m.ctypes.data_as(i32p), mc, cap, words)
    own = np.empty(total, np.int32)
    partner = np.empty(total, np.int32)
    nout = lib.mdnl_decode_half(
        m.ctypes.data_as(i32p), p.ctypes.data_as(i32p), mc, cap, words,
        own.ctypes.data_as(i32p), partner.ctypes.data_as(i32p), total,
    )
    if nout == -1:
        raise ValueError("mask bit points at an empty slot — masks and "
                         "pid are from different states")
    assert nout == total, (nout, total)  # count pass == decode pass
    return own, partner
