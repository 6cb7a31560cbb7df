"""Native C library vs Python fallbacks: identical results on the same inputs."""

import numpy as np
import pytest

from bmh_tpu.models import oracle
from bmh_tpu.utils import nativeio

pytestmark = pytest.mark.skipif(not nativeio.available(),
                                reason="native library not built")


def test_code_lengths_native_matches_python(rng):
    from bmh_tpu.ops.huffman import MAX_LEN

    for _ in range(20):
        k = int(rng.integers(2, 257))
        data = rng.integers(0, k, int(rng.integers(2, 5000))).astype(np.uint8)
        freqs = oracle.histogram(data)
        native = nativeio.code_lengths(freqs)
        # python fallback path (bypass native)
        import bmh_tpu.ops.huffman as h

        saved = nativeio.code_lengths
        try:
            nativeio.code_lengths = lambda f: None
            py = h.code_lengths_from_hist(freqs)
        finally:
            nativeio.code_lengths = saved
        np.testing.assert_array_equal(native, py)
        assert native.max() <= MAX_LEN


def test_canonical_codes_native_matches_python(rng):
    import bmh_tpu.ops.huffman as h

    data = rng.integers(0, 100, 3000).astype(np.uint8)
    lens = nativeio.code_lengths(oracle.histogram(data))
    native = nativeio.canonical_codes(lens)
    saved = nativeio.canonical_codes
    try:
        nativeio.canonical_codes = lambda l: None
        py = h.canonical_code_table(lens)
    finally:
        nativeio.canonical_codes = saved
    np.testing.assert_array_equal(native, py)


def test_pack_unpack_lens_native_roundtrip(rng):
    a = 257  # production RLE0 alphabet
    lens = np.zeros(a, dtype=np.uint8)
    present = np.zeros(a, dtype=bool)
    syms = rng.choice(a, 77, replace=False)
    present[syms] = True
    lens[syms] = rng.integers(1, 32, 77)
    buf = b"\xAA\xBB" + nativeio.pack_lens(lens, present)  # offset test
    lens2, present2, off = nativeio.unpack_lens(buf, 2, alphabet=a)
    assert off == len(buf)
    np.testing.assert_array_equal(lens, lens2)
    np.testing.assert_array_equal(present, present2)


def test_compare_files(tmp_path):
    a = tmp_path / "a"
    b = tmp_path / "b"
    a.write_bytes(b"hello world" * 1000)
    b.write_bytes(b"hello world" * 1000)
    assert nativeio.compare_files(a, b) is True
    b.write_bytes(b"hello worlx" * 1000)
    assert nativeio.compare_files(a, b) is False


def test_crc32():
    import zlib

    data = b"the quick brown fox" * 37
    assert nativeio.crc32(data) == zlib.crc32(data)
