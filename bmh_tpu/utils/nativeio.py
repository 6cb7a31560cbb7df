"""ctypes bindings to the native runtime library (csrc/bmh_io.cpp).

Loads csrc/build/libbmh_io.so, building it on first use if a toolchain is
available.  Every binding has a pure-Python fallback, so the framework works
without the native library — it is a host-path accelerator, not a
requirement.  (pybind11 is not in this image; the C ABI + ctypes keeps the
binding dependency-free.)
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_CSRC = Path(__file__).resolve().parents[2] / "csrc"
_SO = _CSRC / "build" / "libbmh_io.so"
_lib: ctypes.CDLL | None = None
_tried = False


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _SO.exists():
        try:
            subprocess.run(["make", "-C", str(_CSRC)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    lib.bmh_code_lengths.restype = ctypes.c_int
    lib.bmh_code_lengths.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
    lib.bmh_canonical_codes.restype = ctypes.c_int
    lib.bmh_canonical_codes.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
    lib.bmh_pack_lens.restype = ctypes.c_int
    lib.bmh_pack_lens.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                                  ctypes.c_int]
    lib.bmh_unpack_lens.restype = ctypes.c_int
    lib.bmh_unpack_lens.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                    ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
    lib.bmh_compare_files.restype = ctypes.c_int
    lib.bmh_compare_files.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.bmh_crc32.restype = ctypes.c_uint32
    lib.bmh_crc32.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def code_lengths(freqs: np.ndarray) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    f = np.ascontiguousarray(freqs, dtype=np.int64)
    out = np.zeros(f.size, dtype=np.uint8)
    r = lib.bmh_code_lengths(f.ctypes.data, out.ctypes.data, f.size)
    if r < 0:
        raise ValueError("Huffman depth exceeds 31; shrink the block")
    return out


def canonical_codes(lens: np.ndarray) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    l = np.ascontiguousarray(lens, dtype=np.uint8)
    out = np.zeros(l.size, dtype=np.uint32)
    lib.bmh_canonical_codes(l.ctypes.data, out.ctypes.data, l.size)
    return out


def pack_lens(lens: np.ndarray, present: np.ndarray) -> bytes | None:
    lib = _load()
    if lib is None:
        return None
    l = np.ascontiguousarray(lens, dtype=np.uint8)
    p = np.ascontiguousarray(present, dtype=np.uint8)
    a = l.size
    out = np.zeros((a + 7) // 8 + (5 * a + 7) // 8, dtype=np.uint8)
    n = lib.bmh_pack_lens(l.ctypes.data, p.ctypes.data, out.ctypes.data, a)
    return out[:n].tobytes()


def unpack_lens(buf: bytes, off: int, alphabet: int = 257
                ) -> tuple[np.ndarray, np.ndarray, int] | None:
    lib = _load()
    if lib is None:
        return None
    view = np.frombuffer(buf, dtype=np.uint8)
    lens = np.zeros(alphabet, dtype=np.uint8)
    present = np.zeros(alphabet, dtype=np.uint8)
    n = lib.bmh_unpack_lens(view.ctypes.data + off, view.size - off,
                            lens.ctypes.data, present.ctypes.data, alphabet)
    if n < 0:
        raise ValueError("truncated code-length table")
    return lens, present.astype(bool), off + n


def compare_files(p1: str, p2: str) -> bool | None:
    lib = _load()
    if lib is None:
        return None
    r = lib.bmh_compare_files(str(p1).encode(), str(p2).encode())
    if r < 0:
        raise OSError(f"cannot compare {p1} vs {p2}")
    return bool(r)


def crc32(buf: bytes) -> int | None:
    lib = _load()
    if lib is None:
        return None
    view = np.frombuffer(buf, dtype=np.uint8)
    view = np.ascontiguousarray(view)
    return int(lib.bmh_crc32(view.ctypes.data, view.size))
