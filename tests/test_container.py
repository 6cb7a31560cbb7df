"""Container format and end-to-end oracle-backend API tests."""

import numpy as np

from bmh_tpu import compress_bytes, decompress_bytes
from bmh_tpu.utils import container


def test_lens_pack_roundtrip(rng):
    a = container.ALPHABET
    lens = np.zeros(a, dtype=np.uint8)
    present = np.zeros(a, dtype=bool)
    syms = rng.choice(a, 100, replace=False)
    present[syms] = True
    lens[syms] = rng.integers(1, 32, 100)
    buf = container.pack_lens(lens, present)
    lens2, present2, off = container.unpack_lens(buf, 0)
    assert off == len(buf)
    np.testing.assert_array_equal(present, present2)
    np.testing.assert_array_equal(lens, lens2)


def test_file_pack_roundtrip():
    blocks = [b"aaa", b"bb", b"c" * 300]
    buf = container.pack_file(blocks, 1024, 1234)
    bs, total, blocks2 = container.unpack_file(buf)
    assert (bs, total) == (1024, 1234)
    assert blocks2 == blocks


def test_api_roundtrip_oracle(rng):
    for payload in [b"", b"a", b"ab" * 1000, bytes(rng.integers(0, 256, 5000, dtype=np.uint8)),
                    bytes(1000)]:
        blob = compress_bytes(payload, block_size=1 << 11, backend="oracle")
        back = decompress_bytes(blob, backend="oracle")
        assert back == payload


def test_api_multiblock_oracle(rng):
    payload = bytes(rng.integers(0, 8, 10000, dtype=np.uint8))
    blob = compress_bytes(payload, block_size=1024, backend="oracle")
    assert decompress_bytes(blob, backend="oracle") == payload
    bs, total, blocks = container.unpack_file(blob)
    assert bs == 1024 and total == 10000 and len(blocks) == 10


def test_crc32_integrity_detects_corruption(rng):
    from bmh_tpu import compress_bytes, decompress_bytes

    blob = compress_bytes(bytes(rng.integers(0, 50, 2000, dtype=np.uint8)),
                          backend="oracle")
    bad = bytearray(blob)
    bad[-3] ^= 0x40  # flip a payload bit
    import pytest

    with pytest.raises(ValueError, match="CRC mismatch"):
        decompress_bytes(bytes(bad), backend="oracle")
