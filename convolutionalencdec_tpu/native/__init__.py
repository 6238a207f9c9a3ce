"""Native C++ oracle codec, loaded via ctypes.

Builds `libfec_oracle.so` from fec_oracle.cpp on first use (g++ is part of
the baked toolchain).  This is the framework's independent-implementation
ground truth, playing the role MATLAB convenc/vitdec played for the
reference (SURVEY.md §4 item 4).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from ..params import CodeSpec

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "fec_oracle.cpp")
_SO = os.path.join(_HERE, "libfec_oracle.so")
_lock = threading.Lock()
_lib = None


def _build() -> None:
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO],
        check=True, capture_output=True)


def get_lib() -> ctypes.CDLL:
    """Load (building if needed) the oracle shared library."""
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            _build()
        lib = ctypes.CDLL(_SO)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        u64p = ctypes.POINTER(ctypes.c_uint64)
        lib.fec_oracle_encode.restype = ctypes.c_int
        lib.fec_oracle_encode.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, u64p,
            u8p, ctypes.c_int, ctypes.c_int, u8p]
        lib.fec_oracle_decode.restype = ctypes.c_int
        lib.fec_oracle_decode.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, u64p,
            u8p, ctypes.c_int, u8p]
        _lib = lib
        return lib


def _gptr(spec: CodeSpec):
    g = np.asarray(spec.g, dtype=np.uint64)
    return g, g.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def oracle_encode(spec: CodeSpec, bits, terminate: bool = True) -> np.ndarray:
    """Encode 0/1 bits with the C++ oracle.  Returns uint8 segments."""
    lib = get_lib()
    bits = np.ascontiguousarray(np.asarray(bits, dtype=np.uint8).ravel())
    if bits.size % spec.k:
        raise ValueError("bit count not a multiple of k")
    T = bits.size // spec.k + (spec.S if terminate else 0)
    out = np.zeros(T, dtype=np.uint8)
    g, gp = _gptr(spec)
    nt = lib.fec_oracle_encode(
        spec.K, spec.k, spec.n, gp,
        bits.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), bits.size,
        int(terminate), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    assert nt == T
    return out


def oracle_decode(spec: CodeSpec, segments) -> np.ndarray:
    """Hard-decision block decode with the C++ oracle.  Returns uint8 bits."""
    lib = get_lib()
    segments = np.ascontiguousarray(
        np.asarray(segments, dtype=np.uint8).ravel())
    L = (segments.size - spec.S) * spec.k
    out = np.zeros(L, dtype=np.uint8)
    g, gp = _gptr(spec)
    nb = lib.fec_oracle_decode(
        spec.K, spec.k, spec.n, gp,
        segments.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        segments.size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    assert nb == L
    return out
