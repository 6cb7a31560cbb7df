"""Debug printers and full_pipeline parity helpers."""

import numpy as np

from bmh_tpu import compress_bytes
from bmh_tpu.api import full_pipeline
from bmh_tpu.utils import debug


def test_char_to_bin():
    assert debug.char_to_bin(0b10100000) == "10100000"
    assert debug.char_to_bin(1) == "00000001"


def test_format_helpers(rng):
    data = bytes(rng.integers(0, 256, 200, dtype=np.uint8))
    assert "+136 bytes" in debug.format_bytes(data)
    assert len(debug.format_bitstream(data, limit_bits=16).split()) >= 2

    from bmh_tpu.models import oracle
    from bmh_tpu.ops import huffman

    lens = huffman.code_lengths_from_hist(oracle.histogram(np.frombuffer(data, np.uint8)))
    table = debug.format_code_table(lens)
    assert "len" in table

    blob = compress_bytes(data, backend="oracle")
    desc = debug.describe_container(blob)
    assert "1 block(s)" in desc


def test_full_pipeline(tmp_path, rng):
    src = tmp_path / "in.bin"
    src.write_bytes(bytes(rng.integers(0, 100, 3000, dtype=np.uint8)))
    ok = full_pipeline(str(src), str(tmp_path / "x.bzt"), str(tmp_path / "x.out"),
                       backend="oracle")
    assert ok is True
