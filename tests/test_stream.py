"""Resumable streaming writer: durability, torn-block recovery, interop."""

import numpy as np
import pytest

from bmh_tpu import decompress_bytes
from bmh_tpu.utils import container, stream


def test_streaming_roundtrip(tmp_path, rng):
    src = tmp_path / "in.bin"
    out = tmp_path / "out.bzt"
    data = bytes(rng.integers(0, 100, 10000, dtype=np.uint8))
    src.write_bytes(data)
    info = stream.compress_file_resumable(str(src), str(out), block_size=2048,
                                          backend="oracle")
    assert info["blocks"] == 5 and info["resumed_from"] == 0
    assert decompress_bytes(out.read_bytes(), backend="oracle") == data


def test_resume_after_partial(tmp_path, rng):
    src = tmp_path / "in.bin"
    out = tmp_path / "out.bzt"
    data = bytes(rng.integers(0, 100, 10000, dtype=np.uint8))
    src.write_bytes(data)

    # simulate a crashed run: write only the first 2 blocks
    from bmh_tpu.api import get_backend

    blocks = container.split_blocks(np.frombuffer(data, np.uint8), 2048)
    sc = stream.StreamCompressor.create(str(out), 2048)
    be = get_backend("oracle")
    for blk in blocks[:2]:
        r = be.compress_blocks([blk])[0]
        sc.append(container.pack_block(r["orig_len"], r["shift"], r["lens"],
                                       r["freqs"] > 0, r["payload"],
                                       cps=r.get("cps", ()),
                                       rle_len=r["rle_len"]))
    sc._f.close()  # no finalize: crash

    info = stream.compress_file_resumable(str(src), str(out), block_size=2048,
                                          backend="oracle")
    assert info["resumed_from"] == 2
    assert decompress_bytes(out.read_bytes(), backend="oracle") == data


def test_resume_truncates_torn_block(tmp_path, rng):
    src = tmp_path / "in.bin"
    out = tmp_path / "out.bzt"
    data = bytes(rng.integers(0, 100, 6000, dtype=np.uint8))
    src.write_bytes(data)
    stream.compress_file_resumable(str(src), str(out), block_size=2048,
                                   backend="oracle")
    blob = out.read_bytes()
    out.write_bytes(blob[:-7])  # tear the last block mid-payload

    info = stream.compress_file_resumable(str(src), str(out), block_size=2048,
                                          backend="oracle")
    assert info["resumed_from"] == 2  # first two blocks survived
    assert decompress_bytes(out.read_bytes(), backend="oracle") == data
