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


def test_file_stride_recorded_and_legacy_default():
    blob = container.pack_file([b"x" * 10], 4096, 10)
    from bmh_tpu.utils import config as config_mod

    assert container.file_stride(blob) == config_mod.DEFAULT.cursor_stride
    # legacy round-2 files carry reserved == 0 -> 4096
    legacy = container.FILE_HEADER.pack(container.MAGIC, container.VERSION,
                                        0, 0, 4096, 0, 0)
    assert container.file_stride(legacy) == 4096


def test_cross_stride_decode(tmp_path):
    """A container written at a non-default cursor stride decodes correctly
    (the reader honors the recorded stride, not its own config)."""
    import subprocess
    import sys

    import numpy as np

    rng = np.random.default_rng(5)
    data = bytes(rng.integers(0, 200, 30000, dtype=np.uint8))
    raw = tmp_path / "in.bin"
    raw.write_bytes(data)
    out = tmp_path / "out.bzt"
    env = dict(__import__("os").environ)
    env["BMH_CURSOR_STRIDE"] = "1024"  # non-default: the reader must honor
    # the recorded stride, not its own (4096) config
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    repo = __import__("os").path.dirname(__import__("os").path.dirname(
        __import__("os").path.abspath(__file__)))
    code = (f"import sys; sys.path.insert(0, {repo!r}); import jax; "
            "jax.config.update('jax_platforms', 'cpu'); "
            "from bmh_tpu import api; "
            f"api.compress_file({str(raw)!r}, {str(out)!r}, block_size=8192)")
    subprocess.run([sys.executable, "-c", code], check=True, env=env,
                   timeout=240)
    blob = out.read_bytes()
    assert container.file_stride(blob) == 1024
    from bmh_tpu import decompress_bytes

    assert decompress_bytes(blob, backend="jax") == data


def test_version_compat():
    """Writers stamp v3 (RLE1 block flag); readers accept v2 legacy files
    and reject unknown versions loudly (ADVICE r3: a v2 reader must never
    silently misparse an RLE1-flagged file)."""
    import pytest

    blob = container.pack_file([b"abc"], 4096, 3)
    assert blob[4] == container.VERSION == 3
    # legacy v2 file (no RLE1 blocks) still unpacks
    legacy = bytearray(blob)
    legacy[4] = 2
    bs, total, blocks = container.unpack_file(bytes(legacy))
    assert (bs, total, blocks) == (4096, 3, [b"abc"])
    # unknown future version fails the check
    future = bytearray(blob)
    future[4] = 4
    with pytest.raises(ValueError, match="version"):
        container.unpack_file(bytes(future))
