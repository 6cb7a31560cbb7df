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


def test_rle1_native_matches_python_spec(rng):
    from bmh_tpu.utils import nativeio as N

    for _ in range(60):
        n = int(rng.integers(0, 800))
        a = rng.integers(0, 3, n).astype(np.uint8)
        if n > 20 and rng.random() < 0.6:
            a[: n // 2] = 9
        enc_n = N.rle1_encode(a)
        enc_p = N._rle1_encode_py(a)
        if enc_p.size < a.size:
            np.testing.assert_array_equal(enc_n, enc_p)
            np.testing.assert_array_equal(N.rle1_decode(enc_n, n), a)
        else:
            # non-shrinking input: the native wrapper hands back the input
            # itself (callers apply RLE1 only when strictly smaller)
            np.testing.assert_array_equal(enc_n, a)
    # boundary run lengths incl. count byte == value collisions; L=4,5
    # do not shrink (chunk costs 5 bytes) and stay raw
    for L in (4, 5, 254, 255, 256, 259, 510, 511, 1021):
        a = np.full(L, 7, np.uint8)
        enc = N.rle1_encode(a)
        if enc.size < L:
            np.testing.assert_array_equal(N.rle1_decode(enc, L), a)
        else:
            np.testing.assert_array_equal(enc, a)


def test_rle1_roundtrip_through_api(rng):
    """Run-dominated stream: RLE1 flag set in the container, bit-exact."""
    from bmh_tpu import compress_bytes, decompress_bytes
    from bmh_tpu.utils import container

    a = np.zeros(20000, np.uint8)
    a[::97] = rng.integers(1, 255, a[::97].size)  # sparse non-zeros in runs
    data = a.tobytes()
    blob = compress_bytes(data, block_size=8192, backend="jax")
    _, _, raws = container.unpack_file(blob)
    flags = [container.unpack_block(r)[7] < container.unpack_block(r)[0]
             for r in raws]
    assert any(flags), "RLE1 should engage on run-dominated blocks"
    assert decompress_bytes(blob, backend="jax") == data
