"""End-to-end JAX backend round-trips, including Calgary acceptance files."""

import numpy as np
import pytest

from bmh_tpu import compress_bytes, decompress_bytes
from bmh_tpu.utils import corpus


def test_jax_roundtrip_random(rng):
    for n in [1, 5, 100, 1000, 10000]:
        data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        blob = compress_bytes(data, backend="jax")
        assert decompress_bytes(blob, backend="jax") == data


def test_jax_roundtrip_structured(rng):
    cases = [
        b"",
        b"a",
        b"abracadabra" * 200,
        bytes(5000),                       # single symbol
        bytes(rng.integers(0, 4, 20000, dtype=np.uint8)),
        bytes(np.tile(np.arange(7, dtype=np.uint8), 999)),
    ]
    for data in cases:
        blob = compress_bytes(data, backend="jax")
        assert decompress_bytes(blob, backend="jax") == data


def test_jax_multiblock(rng):
    data = bytes(rng.integers(0, 64, 50000, dtype=np.uint8))
    blob = compress_bytes(data, block_size=8192, backend="jax")
    assert decompress_bytes(blob, backend="jax") == data


def test_cross_backend_interop(rng):
    # a .bzt produced by either backend decodes on the other (format contract);
    # byte-identical blobs are not required — both Huffman builders are optimal
    # but may pick different (equal-total) code length profiles
    data = bytes(rng.integers(0, 200, 3000, dtype=np.uint8))
    blob_j = compress_bytes(data, backend="jax")
    blob_o = compress_bytes(data, backend="oracle")
    assert decompress_bytes(blob_j, backend="oracle") == data
    assert decompress_bytes(blob_o, backend="jax") == data
    assert len(blob_j) == len(blob_o)  # equal-total-bits invariant


def test_jax_determinism(rng):
    data = bytes(rng.integers(0, 200, 3000, dtype=np.uint8))
    assert compress_bytes(data, backend="jax") == compress_bytes(data, backend="jax")


@pytest.mark.skipif(corpus.corpus_dir() is None, reason="calgary corpus not present")
@pytest.mark.parametrize("name", ["paper1", "progc"])
def test_calgary_acceptance(name):
    data = corpus.read_corpus_file(name)
    blob = compress_bytes(data, backend="jax")
    assert decompress_bytes(blob, backend="jax") == data
    assert len(blob) <= corpus.REFERENCE_SIZES[name], (
        f"{name}: {len(blob)} > reference {corpus.REFERENCE_SIZES[name]}")


def test_bounded_inflight_drain(rng):
    """Streams spanning many dispatches drain the pending window early
    (BMH_INFLIGHT) and still round-trip bit-exact."""
    from bmh_tpu import api
    from bmh_tpu.utils import config as config_mod

    data = bytes(rng.integers(0, 180, 70 * 512).astype(np.uint8))
    old = config_mod.DEFAULT.inflight
    try:
        config_mod.DEFAULT.inflight = 1
        # 70 blocks of 512 B -> >2 dispatches at the 32-block cap
        blob = api.compress_bytes(data, block_size=512)
        assert api.decompress_bytes(blob) == data
    finally:
        config_mod.DEFAULT.inflight = old


def test_compact_upload_inflate_path(rng):
    """Small blocks forced into a large uniform bucket trigger the
    compact-stream upload + device inflate (models/pipeline._upload_batch);
    containers must match the plain-upload path byte for byte."""
    from bmh_tpu import api
    from bmh_tpu.models import pipeline as P

    datas = [bytes(rng.integers(0, 120, 3000 + 17 * i).astype(np.uint8))
             for i in range(30)]
    # uniform=True pads every block to the block_size bucket: 30 blocks of
    # ~3 KB in a 128 KiB bucket -> s + 4Q << b_pad * nmax -> inflate path
    misses0 = P._inflate_prog.cache_info().misses
    blobs_u = api.compress_many(datas, block_size=131072, uniform=True)
    assert P._inflate_prog.cache_info().misses > misses0, \
        "expected the compact-upload inflate path to engage"
    blobs_p = [api.compress_bytes(d, block_size=131072) for d in datas]
    assert [len(b) for b in blobs_u] == [len(b) for b in blobs_p]
    assert blobs_u == blobs_p
    for d, b in zip(datas, blobs_u):
        assert api.decompress_bytes(b) == d


def test_periodic_stream_uses_device_path(monkeypatch):
    """A fully periodic stream ("abc"*N — RLE1 cannot collapse it, every
    block is exactly periodic so cursor checkpoints are undefined) must
    round-trip through the DEVICE periodic route, never the sequential
    pure-Python oracle (~0.1 MB/s, the round-4 cliff)."""
    from bmh_tpu.models import oracle as oracle_mod

    def boom(*a, **k):
        raise AssertionError("oracle.decompress_block used on the jax path")

    monkeypatch.setattr(oracle_mod, "decompress_block", boom)
    data = b"abc" * 16384  # 49152 B; blocks of 12288 = 3*4096, each periodic
    blob = compress_bytes(data, block_size=12288)
    from bmh_tpu.utils import container as C

    _, _, raws = C.unpack_file(blob)
    assert any(C.unpack_block(r)[4] is None for r in raws)  # periodic blocks
    assert decompress_bytes(blob) == data
