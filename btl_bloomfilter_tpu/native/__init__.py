"""Native (C++) runtime components, loaded via ctypes.

Compiled on first use with g++ (no pybind11 in this environment); the
shared object is cached next to the source and rebuilt when the source is
newer.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fastaio.cpp")
_SO = os.path.join(_DIR, "_fastaio.so")
_lock = threading.Lock()
_lib = None


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                 "-o", _SO, _SRC],
                check=True, capture_output=True)
        lib = ctypes.CDLL(_SO)
        lib.fasta_open.restype = ctypes.c_void_p
        lib.fasta_open.argtypes = [ctypes.c_char_p]
        lib.fasta_close.argtypes = [ctypes.c_void_p]
        lib.fasta_next_batch.restype = ctypes.c_int64
        lib.fasta_next_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64]
        lib.encode_ascii.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8)]
        _lib = lib
        return lib


class FastaReader:
    """Streaming FASTA -> N-padded code batches (native parser)."""

    def __init__(self, path: str, batch: int, pad: int, k: int):
        self._lib = _load()
        self._h = self._lib.fasta_open(path.encode())
        if not self._h:
            raise FileNotFoundError(path)
        self.batch, self.pad, self.k = batch, pad, k

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        out = np.empty((self.batch, self.pad), dtype=np.uint8)
        n = self._lib.fasta_next_batch(
            self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self.batch, self.pad, self.k)
        if n < 0:
            raise ValueError("bad batch parameters")
        if n == 0:
            self.close()
            raise StopIteration
        return out  # rows beyond n are all-N padding (no valid windows)

    def close(self):
        if getattr(self, "_h", None):
            self._lib.fasta_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def encode_ascii(seq: str | bytes) -> np.ndarray:
    """Native ASCII->code encoding (same table as ops.nthash_tables)."""
    lib = _load()
    if isinstance(seq, str):
        seq = seq.encode("ascii")
    out = np.empty(len(seq), dtype=np.uint8)
    lib.encode_ascii(seq, len(seq),
                     out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out
