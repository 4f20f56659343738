"""ctypes bindings for the native CPU SW library (native/swlib.cpp).

Exposes the multi-threaded banded aligner (the CPU baseline bench.py
compares the TPU kernel against — it mirrors the reference tool's per-read
banded aligner cost profile) and an exact full-SW batch used for
large-scale cross-validation of the device kernels.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "_native", "libvartrixsw.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    script = os.path.join(os.path.dirname(__file__), "..", "..", "native", "build.sh")
    subprocess.run(["bash", script], check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        if not os.path.exists(_LIB_PATH):
            _build()
        lib = ctypes.CDLL(os.path.abspath(_LIB_PATH))
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.full_sw_batch.argtypes = [u8p, i64p, u8p, i64p, ctypes.c_int64, i32p, ctypes.c_int]
        lib.banded_sw_batch.argtypes = [u8p, i64p, u8p, i64p, ctypes.c_int64, i32p,
                                        ctypes.c_int, ctypes.c_int, ctypes.c_int]
        try:  # absent in pre-existing .so builds
            lib.banded_sw_chained_batch.argtypes = [
                u8p, i64p, u8p, i64p, ctypes.c_int64, i32p,
                ctypes.c_int, ctypes.c_int, ctypes.c_int]
        except AttributeError:
            pass
        try:  # per-row band bounds for device-side banded scoring
            i16p = ctypes.POINTER(ctypes.c_int16)
            lib.banded_bounds_batch.argtypes = [
                u8p, i64p, u8p, i64p, ctypes.c_int64, ctypes.c_int32,
                i16p, i16p, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        except AttributeError:
            pass
        _lib = lib
    return _lib


def native_available() -> bool:
    try:
        get_lib()
        return True
    except Exception:
        return False


def _pack(seqs: Sequence[bytes]) -> Tuple[np.ndarray, np.ndarray]:
    offs = np.zeros(len(seqs) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in seqs], out=offs[1:])
    pool = np.frombuffer(b"".join(seqs), dtype=np.uint8).copy()
    if pool.size == 0:
        pool = np.zeros(1, dtype=np.uint8)
    return pool, offs


def _run(fn_name: str, xs: Sequence[bytes], ys: Sequence[bytes],
         n_threads: int, extra: Tuple = ()) -> np.ndarray:
    lib = get_lib()
    xp, xo = _pack(xs)
    yp, yo = _pack(ys)
    out = np.zeros(len(xs), dtype=np.int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    getattr(lib, fn_name)(
        xp.ctypes.data_as(u8p), xo.ctypes.data_as(i64p),
        yp.ctypes.data_as(u8p), yo.ctypes.data_as(i64p),
        ctypes.c_int64(len(xs)), out.ctypes.data_as(i32p),
        ctypes.c_int(n_threads), *extra,
    )
    return out


def full_sw_batch_native(xs: Sequence[bytes], ys: Sequence[bytes],
                         n_threads: int = 1) -> np.ndarray:
    return _run("full_sw_batch", xs, ys, n_threads)


def banded_sw_batch_native(xs: Sequence[bytes], ys: Sequence[bytes],
                           n_threads: int = 1, k: int = 6, w: int = 20) -> np.ndarray:
    return _run("banded_sw_batch", xs, ys, n_threads,
                (ctypes.c_int(k), ctypes.c_int(w)))


def banded_sw_chained_batch_native(xs: Sequence[bytes], ys: Sequence[bytes],
                                   n_threads: int = 1, k: int = 6,
                                   w: int = 20) -> np.ndarray:
    """rust-bio-style banded scores: k-mer anchors chained by sparse DP,
    band = widened best-chain path + connecting boxes + corner extensions
    (native/swlib.cpp banded_sw_chained). Always <= full SW."""
    return _run("banded_sw_chained_batch", xs, ys, n_threads,
                (ctypes.c_int(k), ctypes.c_int(w)))


def banded_bounds_batch_native(xs: Sequence[bytes], ys: Sequence[bytes],
                               lx_pad: int, n_threads: int = 1, k: int = 6,
                               w: int = 20):
    """Per-row chained-band intervals [jlo, jhi) (int16 [n, lx_pad] each)
    for device-side banded scoring. Sequences shorter than k get the full
    band [0, ly); unseeded pairs get all-empty rows (score 0). The DP
    restricted to these intervals reproduces banded_sw_chained exactly."""
    lib = get_lib()
    if not hasattr(lib, "banded_bounds_batch"):
        return None
    xp, xo = _pack(xs)
    yp, yo = _pack(ys)
    n = len(xs)
    jlo = np.zeros((n, lx_pad), dtype=np.int16)
    jhi = np.zeros((n, lx_pad), dtype=np.int16)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i64p = ctypes.POINTER(ctypes.c_int64)
    i16p = ctypes.POINTER(ctypes.c_int16)
    lib.banded_bounds_batch(
        xp.ctypes.data_as(u8p), xo.ctypes.data_as(i64p),
        yp.ctypes.data_as(u8p), yo.ctypes.data_as(i64p),
        ctypes.c_int64(n), ctypes.c_int32(lx_pad),
        jlo.ctypes.data_as(i16p), jhi.ctypes.data_as(i16p),
        ctypes.c_int(n_threads), ctypes.c_int(k), ctypes.c_int(w))
    return jlo, jhi
