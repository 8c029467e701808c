"""Native (C++) helpers, JIT-compiled with g++ and bound via ctypes.

Parity role: the reference's C++ core (aten array ops). No FFI registry /
PackedFunc machinery — a single small shared library compiled on first
use and cached under ``~/.cache/dgl1_tpu``; every entry point has a pure
numpy fallback (``DGL1_TPU_NO_NATIVE=1`` disables the native path).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

__all__ = ["lib", "available", "gather_rows"]

_LIB = None
_TRIED = False


def _compile() -> Optional[ctypes.CDLL]:
    src = Path(__file__).parent / "graph_builder.cpp"
    code = src.read_bytes()
    tag = hashlib.sha256(code).hexdigest()[:16]
    cache = Path(os.environ.get("DGL1_TPU_CACHE",
                                os.path.expanduser("~/.cache/dgl1_tpu")))
    cache.mkdir(parents=True, exist_ok=True)
    so = cache / f"graph_builder_{tag}.so"
    if not so.exists():
        tmp = so.with_suffix(".so.tmp")
        cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC",
               str(src), "-o", str(tmp)]
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, so)
    lib = ctypes.CDLL(str(so))
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.build_adj.argtypes = [i32p, i32p, ctypes.c_int64, ctypes.c_int32,
                              i32p, i32p, i32p, i32p]
    lib.build_adj.restype = None
    lib.build_tiles.argtypes = [i32p, i32p, i32p, ctypes.c_int64,
                                ctypes.c_int32, ctypes.c_int32,
                                ctypes.c_int32, i32p, i32p, i32p, i32p, i32p]
    lib.build_tiles.restype = None
    lib.plan_tiles.argtypes = [i32p, ctypes.c_int64, ctypes.c_int32,
                               ctypes.c_int32, ctypes.c_int32]
    lib.plan_tiles.restype = ctypes.c_int64
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    lib.gather_rows.argtypes = [ctypes.c_void_p, i64p, ctypes.c_int64,
                                ctypes.c_int64, ctypes.c_void_p,
                                ctypes.c_int32]
    lib.gather_rows.restype = None
    lib.plan_ell.argtypes = [i32p, ctypes.c_int32, ctypes.c_int64,
                             ctypes.c_int64, i64p, i64p, i64p]
    lib.plan_ell.restype = ctypes.c_int32
    lib.fill_ell.argtypes = [i32p, i32p, i32p, ctypes.c_int32,
                             ctypes.c_int64, ctypes.c_int64, i32p, i32p,
                             i32p]
    lib.fill_ell.restype = None
    lib.sample_block.argtypes = [i32p, i32p, i32p, ctypes.c_int32, i64p,
                                 ctypes.c_int64, ctypes.c_int64,
                                 ctypes.c_int32, ctypes.c_uint64,
                                 ctypes.c_int64, ctypes.c_int64, i32p, i32p,
                                 i32p, i64p, i64p]
    lib.sample_block.restype = ctypes.c_int32
    return lib


def gather_rows(src: np.ndarray, ids: np.ndarray,
                num_threads: int = 8) -> np.ndarray:
    """dst[i] = src[ids[i]] via threaded memcpy; numpy fallback when the
    native library is unavailable. ``src`` may be any C-contiguous 2-D+
    array (including np.memmap)."""
    ids = np.ascontiguousarray(ids, dtype=np.int64)
    out = np.empty((len(ids),) + src.shape[1:], dtype=src.dtype)
    native = lib()
    if native is None or not src.flags.c_contiguous or len(ids) == 0:
        if len(ids):
            np.take(src, ids, axis=0, out=out)
        return out
    row_bytes = src.dtype.itemsize * int(np.prod(src.shape[1:], dtype=np.int64))
    native.gather_rows(
        src.ctypes.data, ids, len(ids), row_bytes,
        out.ctypes.data, num_threads,
    )
    return out


def lib() -> Optional[ctypes.CDLL]:
    """The native library, or None when unavailable/disabled."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("DGL1_TPU_NO_NATIVE"):
        return None
    try:
        _LIB = _compile()
    except Exception:
        _LIB = None
    return _LIB


def available() -> bool:
    return lib() is not None
