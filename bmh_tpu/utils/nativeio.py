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
    for fn in (lib.bmh_rle1_encode, lib.bmh_rle1_decode):
        fn.restype = ctypes.c_uint64
        fn.argtypes = [ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p,
                       ctypes.c_uint64]
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


def _rle1_encode_py(a: np.ndarray) -> np.ndarray:
    """Python specification of bmh_rle1_encode (fallback + test judge)."""
    out = bytearray()
    i, n = 0, a.size
    while i < n:
        j = i + 1
        while j < n and a[j] == a[i]:
            j += 1
        run = j - i
        v = int(a[i])
        while run >= 4:
            take = min(run, 255)
            out.extend([v, v, v, v, take - 4])
            run -= take
        out.extend([v] * run)
        i = j
    return np.frombuffer(bytes(out), dtype=np.uint8)


def _rle1_decode_py(a: np.ndarray) -> np.ndarray:
    out = bytearray()
    i, n = 0, a.size
    while i < n:
        v = int(a[i])
        if i + 3 < n and a[i + 1] == v and a[i + 2] == v and a[i + 3] == v:
            if i + 4 >= n:
                raise ValueError("truncated RLE1 chunk")
            out.extend([v] * (4 + int(a[i + 4])))
            i += 5
        else:
            out.append(v)
            i += 1
    return np.frombuffer(bytes(out), dtype=np.uint8)


def rle1_encode(a: np.ndarray) -> np.ndarray:
    """RLE1 pre-BWT run collapse; native C when built, Python spec else."""
    a = np.ascontiguousarray(a, dtype=np.uint8)
    lib = _load()
    if lib is None:
        return _rle1_encode_py(a)
    cap = a.size + 8
    out = np.empty(cap, dtype=np.uint8)
    m = lib.bmh_rle1_encode(a.ctypes.data, a.size, out.ctypes.data, cap)
    if m >= a.size:
        # not strictly smaller: not applicable — hand back the input itself
        # (callers apply RLE1 only when it shrinks)
        return a
    return out[:m]


def rle1_decode(a: np.ndarray, expect: int) -> np.ndarray:
    a = np.ascontiguousarray(a, dtype=np.uint8)
    lib = _load()
    if lib is None:
        out = _rle1_decode_py(a)
    else:
        buf = np.empty(expect, dtype=np.uint8)
        m = lib.bmh_rle1_decode(a.ctypes.data, a.size, buf.ctypes.data, expect)
        if m > expect:
            raise ValueError("corrupt RLE1 block (overflow)")
        out = buf[:m]
    if out.size != expect:
        raise ValueError(f"RLE1 decoded {out.size} bytes, expected {expect}")
    return out
