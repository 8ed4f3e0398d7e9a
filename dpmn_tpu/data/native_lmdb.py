"""ctypes binding for the native C++ LMDB reader (native/lmdb_reader.cpp).

Auto-builds the shared library on first use (g++ is part of the toolchain);
falls back to the pure-Python reader when a compiler is unavailable.
`NativeLMDBReader` is API-compatible with lmdb_reader.LMDBReader and adds
`get_batch` for one-call-per-training-batch fetches.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.join(_NATIVE_DIR, "libdpmn_native.so")
    if not os.path.exists(so):
        src = os.path.join(_NATIVE_DIR, "lmdb_reader.cpp")
        if not os.path.exists(src):
            raise FileNotFoundError(src)
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-o", so, src], check=True, capture_output=True
        )
    lib = ctypes.CDLL(so)
    lib.lmdb_open.restype = ctypes.c_void_p
    lib.lmdb_open.argtypes = [ctypes.c_char_p]
    lib.lmdb_close.argtypes = [ctypes.c_void_p]
    lib.lmdb_get.restype = ctypes.c_long
    lib.lmdb_get.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_long,
                             ctypes.c_void_p, ctypes.c_long]
    lib.lmdb_get_batch.restype = ctypes.c_long
    lib.lmdb_get_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_long), ctypes.c_long,
        ctypes.c_void_p, ctypes.c_long, ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
    ]
    _LIB = lib
    return lib


def native_available() -> bool:
    try:
        _load_lib()
        return True
    except Exception:
        return False


class NativeLMDBReader:
    def __init__(self, path: str):
        if os.path.isdir(path):
            path = os.path.join(path, "data.mdb")
        self._lib = _load_lib()
        self._h = self._lib.lmdb_open(path.encode())
        if not self._h:
            raise IOError(f"not an LMDB file: {path}")

    def get(self, key: bytes):
        n = self._lib.lmdb_get(self._h, key, len(key), None, 0)
        if n < 0:
            return None
        buf = ctypes.create_string_buffer(n)
        self._lib.lmdb_get(self._h, key, len(key), buf, n)
        return buf.raw

    def get_batch(self, keys):
        """list of keys → list of bytes-or-None, one native call."""
        packed = b"".join(keys)
        klens = (ctypes.c_long * len(keys))(*[len(k) for k in keys])
        cap = 1 << 24
        out = ctypes.create_string_buffer(cap)
        offs = (ctypes.c_long * len(keys))()
        lens = (ctypes.c_long * len(keys))()
        total = self._lib.lmdb_get_batch(self._h, packed, klens, len(keys), out, cap, offs, lens)
        while any(l < 0 for l in lens) and total >= cap - 1:
            cap *= 4
            out = ctypes.create_string_buffer(cap)
            total = self._lib.lmdb_get_batch(self._h, packed, klens, len(keys), out, cap, offs, lens)
        raw = out.raw
        return [raw[offs[i] : offs[i] + lens[i]] if lens[i] >= 0 else None for i in range(len(keys))]

    def close(self):
        if self._h:
            self._lib.lmdb_close(self._h)
            self._h = None
