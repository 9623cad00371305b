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
            lib.mdnl_decode_half_padded.restype = ctypes.c_int64
            lib.mdnl_decode_half_padded.argtypes = [
                i32p, i32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, i32p, i32p,
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
    words = _check_mask_shapes(m, p, mc, cap)
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


def _check_mask_shapes(m, p, mc: int, cap: int) -> int:
    words = int(m.shape[1])
    if m.shape != (5, words, mc * mc, mc, 3 * cap):
        raise ValueError(f"masks shape {m.shape} does not match the "
                         f"(5, words, mc², mc, 3·cap) layout at mc={mc}, "
                         f"cap={cap}")
    if p.shape != (mc * mc, mc, cap):
        raise ValueError(f"pid shape {p.shape} != {(mc * mc, mc, cap)}")
    return words


def decode_half_padded(masks, pid, mc: int, cap: int, n: int,
                       k_cap: int, full: bool):
    """Decode packed masks STRAIGHT into fixed-capacity padded rows via
    the single-pass C++ emitter — no pair buffer, no sort (the numpy
    padded-row construction stable-argsorts every pair; at N=1M / 40M
    pairs that is tens of seconds on this 1-vCPU host, the walk is ~1 s).

    Returns (idx (n, k_cap) i32 padded with sentinel n, cnt (n,) i32,
    max_count). If max_count > k_cap the rows are TRUNCATED (counts stay
    correct) — the caller decides whether to re-call with a bigger k_cap
    or raise (mirrors masks_to_padded's k_cap contract)."""
    import numpy as np

    lib = load()
    m = np.ascontiguousarray(np.asarray(masks), dtype=np.int32)
    p = np.ascontiguousarray(np.asarray(pid), dtype=np.int32)
    words = _check_mask_shapes(m, p, mc, cap)
    i32p = ctypes.POINTER(ctypes.c_int32)
    idx = np.empty((n, k_cap), np.int32)
    cnt = np.empty((n,), np.int32)
    maxc = lib.mdnl_decode_half_padded(
        m.ctypes.data_as(i32p), p.ctypes.data_as(i32p), mc, cap, words,
        n, k_cap, 1 if full else 0,
        idx.ctypes.data_as(i32p), cnt.ctypes.data_as(i32p),
    )
    if maxc == -1:
        raise ValueError("mask bit points at an empty slot — masks and "
                         "pid are from different states")
    if maxc == -3:
        raise ValueError(f"n={n} is smaller than max decoded pid")
    return idx, cnt, int(maxc)
