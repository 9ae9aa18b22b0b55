"""ctypes bindings for the native (C++) batch chunk assembler.

Builds native/libchunk_assembler.so on first use (g++, cached) and exposes
`assemble_chunks`. Falls back transparently to the numpy path when a
toolchain is unavailable — ChunkedGenerator uses this automatically.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libchunk_assembler.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            if not os.path.exists(_SO_PATH):
                src = os.path.join(_NATIVE_DIR, "chunk_assembler.cpp")
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-fPIC", "-shared",
                     "-std=c++17", "-o", _SO_PATH, src],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO_PATH)
            lib.assemble_chunks.argtypes = [
                ctypes.POINTER(ctypes.c_float),   # seq_data
                ctypes.POINTER(ctypes.c_int64),   # seq_offsets
                ctypes.POINTER(ctypes.c_int64),   # chunks
                ctypes.c_int64,                   # n_chunks
                ctypes.c_int64,                   # chunk_len
                ctypes.c_int64,                   # J
                ctypes.c_int64,                   # C
                ctypes.POINTER(ctypes.c_int32),   # perm
                ctypes.POINTER(ctypes.c_float),   # flip_sign
                ctypes.POINTER(ctypes.c_float),   # out
            ]
            lib.assemble_chunks.restype = None
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available():
    return _load() is not None


class SequenceBank:
    """Sequences flattened into one contiguous float32 buffer + offsets."""

    def __init__(self, sequences):
        self.J, self.C = sequences[0].shape[1:]
        self.offsets = np.zeros(len(sequences) + 1, dtype=np.int64)
        for i, s in enumerate(sequences):
            assert s.shape[1:] == (self.J, self.C)
            self.offsets[i + 1] = self.offsets[i] + s.shape[0]
        self.data = np.ascontiguousarray(
            np.concatenate(sequences, axis=0), dtype=np.float32)


def assemble_chunks(bank: SequenceBank, chunks, chunk_len, perm, flip_sign,
                    out=None):
    """chunks: int64 (n, 4) of (seq_idx, start, end, flip).

    Returns float32 (n, chunk_len, J, C).
    """
    lib = _load()
    assert lib is not None, "native assembler unavailable"
    chunks = np.ascontiguousarray(chunks, dtype=np.int64)
    n = chunks.shape[0]
    if out is None:
        out = np.empty((n, chunk_len, bank.J, bank.C), dtype=np.float32)
    perm = np.ascontiguousarray(perm, dtype=np.int32)
    flip_sign = np.ascontiguousarray(flip_sign, dtype=np.float32)

    fptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    i64 = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
    i32 = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    lib.assemble_chunks(
        fptr(bank.data), i64(bank.offsets), i64(chunks),
        ctypes.c_int64(n), ctypes.c_int64(chunk_len),
        ctypes.c_int64(bank.J), ctypes.c_int64(bank.C),
        i32(perm), fptr(flip_sign), fptr(out))
    return out
