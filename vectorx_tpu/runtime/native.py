"""ctypes loader for the native host runtime (native/vxnative.cpp).

Builds the shared library on demand with g++ -O3 (cached next to the
source); every entry point degrades gracefully if no compiler is present
(`available()` -> False) so the pure-JAX path always works.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "native", "vxnative.cpp")
_SO = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libvxnative.so")


@lru_cache(maxsize=None)
def _lib() -> Optional[ctypes.CDLL]:
    src = os.path.abspath(_SRC)
    so = os.path.abspath(_SO)
    if not os.path.exists(src):
        return None
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(src)):
        try:
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", so, src],
                check=True, capture_output=True, timeout=120)
        except Exception:
            return None
    lib = ctypes.CDLL(so)
    lib.vx_gl_mul.restype = ctypes.c_uint64
    lib.vx_gl_mul.argtypes = [ctypes.c_uint64, ctypes.c_uint64]
    lib.vx_gl_add.restype = ctypes.c_uint64
    lib.vx_gl_add.argtypes = [ctypes.c_uint64, ctypes.c_uint64]
    lib.vx_gl_sub.restype = ctypes.c_uint64
    lib.vx_gl_sub.argtypes = [ctypes.c_uint64, ctypes.c_uint64]
    lib.vx_gl_inv.restype = ctypes.c_uint64
    lib.vx_gl_inv.argtypes = [ctypes.c_uint64]
    return lib


def available() -> bool:
    return _lib() is not None


def gl_mul(a: int, b: int) -> int:
    return int(_lib().vx_gl_mul(a, b))


def gl_inv(a: int) -> int:
    return int(_lib().vx_gl_inv(a))


def ntt(values, root: int, inverse: bool = False) -> np.ndarray:
    """In-place-style radix-2 NTT over uint64 values (natural order)."""
    arr = np.ascontiguousarray(np.asarray(values, dtype=np.uint64))
    lib = _lib()
    lib.vx_gl_ntt(arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
                  ctypes.c_size_t(arr.size), ctypes.c_uint64(root),
                  ctypes.c_int(1 if inverse else 0))
    return arr


def poseidon_permute(states: np.ndarray) -> np.ndarray:
    """(batch, 12) uint64 -> permuted, using the Python-side constants."""
    from ..hashes import poseidon as ps
    rc = np.asarray(ps.round_constants(), dtype=np.uint64).reshape(-1)
    mds = np.asarray(ps.mds_matrix(), dtype=np.uint64).reshape(-1)
    arr = np.ascontiguousarray(np.asarray(states, dtype=np.uint64))
    batch = arr.shape[0]
    lib = _lib()
    lib.vx_poseidon_permute(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ctypes.c_size_t(batch),
        rc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        mds.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ctypes.c_int(ps.FULL_ROUNDS), ctypes.c_int(ps.PARTIAL_ROUNDS))
    return arr


def blake2b256(msg: bytes) -> bytes:
    out = np.zeros(32, dtype=np.uint8)
    arr = np.frombuffer(msg, dtype=np.uint8) if msg else np.zeros(0, np.uint8)
    lib = _lib()
    lib.vx_blake2b256(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_size_t(len(msg)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.tobytes()


def blake2b256_batch(msgs_padded: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """(n, stride) uint8 + (n,) uint32 -> (n, 32) uint8 digests."""
    msgs = np.ascontiguousarray(msgs_padded, dtype=np.uint8)
    lens = np.ascontiguousarray(lengths, dtype=np.uint32)
    n, stride = msgs.shape
    out = np.zeros((n, 32), dtype=np.uint8)
    lib = _lib()
    lib.vx_blake2b256_batch(
        msgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.c_size_t(stride), ctypes.c_size_t(n),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def sha256(msg: bytes) -> bytes:
    out = np.zeros(32, dtype=np.uint8)
    arr = np.frombuffer(msg, dtype=np.uint8) if msg else np.zeros(0, np.uint8)
    lib = _lib()
    lib.vx_sha256(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_size_t(len(msg)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.tobytes()
