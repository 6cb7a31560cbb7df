"""JAX Huffman encode/decode vs the oracle: tables, bitpack, gap decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bmh_tpu.models import oracle
from bmh_tpu.ops import huffman as jhuf


def make_words(payload: bytes, chunk_bits: int) -> np.ndarray:
    """Big-endian uint32 words padded to a multiple of chunk_bits."""
    wbytes = chunk_bits // 8
    pad = (-len(payload)) % wbytes
    if len(payload) + pad == 0:
        pad = wbytes
    buf = payload + b"\x00" * pad
    return np.frombuffer(buf, dtype=">u4").astype(np.uint32)


def gen_cases(rng):
    cases = [
        rng.integers(0, 256, 100).astype(np.uint8),
        rng.integers(0, 2, 1000).astype(np.uint8),
        np.zeros(50, dtype=np.uint8) + 7,  # single symbol -> skipped
        rng.integers(0, 256, 5000).astype(np.uint8),
        np.repeat(np.arange(10, dtype=np.uint8), [1, 1, 2, 3, 5, 8, 13, 21, 34, 55]),  # skewed
        np.array([0, 1], dtype=np.uint8),
    ]
    return cases


def test_code_lengths_match_oracle_totals(rng):
    for data in gen_cases(rng):
        freqs = oracle.histogram(data)
        l1 = oracle.huffman_code_lengths(freqs)
        l2 = jhuf.code_lengths_from_hist(freqs)
        # individual lengths may differ across optimal trees; totals must not
        assert int((freqs * l1).sum()) == int((freqs * l2).sum())
        if (l2 > 0).sum():
            k = sum(2.0 ** -int(x) for x in l2[l2 > 0])
            assert abs(k - 1.0) < 1e-9


def test_histogram(rng):
    data = rng.integers(0, 256, 1000).astype(np.uint8)
    padded = np.zeros(1024, dtype=np.uint8)
    padded[:1000] = data
    h = jhuf.histogram(jnp.asarray(padded), jnp.int32(1000))
    np.testing.assert_array_equal(np.asarray(h), oracle.histogram(data))


def test_encode_matches_oracle_bitstream(rng):
    for data in gen_cases(rng):
        freqs = oracle.histogram(data)
        lens = jhuf.code_lengths_from_hist(freqs)
        if (lens > 0).sum() == 0:
            continue
        codes = jhuf.canonical_code_table(lens)
        ref_payload, ref_bits = oracle.huffman_encode(data, lens, codes)

        nmax = ((data.size + 127) // 128) * 128
        padded = np.zeros(nmax, dtype=np.uint8)
        padded[:data.size] = data
        words, total_bits = jax.jit(jhuf.encode_bitpack)(
            jnp.asarray(padded), jnp.int32(data.size),
            jnp.asarray(lens.astype(np.int32)), jnp.asarray(codes))
        assert int(total_bits) == ref_bits
        got = np.asarray(words).astype(">u4").tobytes()[: (ref_bits + 7) // 8]
        assert got == ref_payload


@pytest.mark.parametrize("chunk_bits", [64, 256, 2048])
def test_gap_decode_roundtrip(rng, chunk_bits):
    for data in gen_cases(rng):
        freqs = oracle.histogram(data)
        lens = jhuf.code_lengths_from_hist(freqs)
        if (lens > 0).sum() == 0:
            continue
        codes = jhuf.canonical_code_table(lens)
        payload, total_bits = oracle.huffman_encode(data, lens, codes)
        words = make_words(payload, chunk_bits)
        tables = {k: jnp.asarray(v) for k, v in jhuf.decode_tables(lens).items()}
        out = jhuf.gap_decode(jnp.asarray(words), tables, jnp.int32(data.size),
                              chunk_bits=chunk_bits)
        np.testing.assert_array_equal(np.asarray(out)[:data.size], data)


def test_gap_decode_long_low_entropy(rng):
    # long runs after MTF: mostly zeros with 1-bit codes -> max symbols/chunk
    data = (rng.random(20000) < 0.02).astype(np.uint8)
    freqs = oracle.histogram(data)
    lens = jhuf.code_lengths_from_hist(freqs)
    codes = jhuf.canonical_code_table(lens)
    payload, _ = oracle.huffman_encode(data, lens, codes)
    words = make_words(payload, 512)
    tables = {k: jnp.asarray(v) for k, v in jhuf.decode_tables(lens).items()}
    out = jhuf.gap_decode(jnp.asarray(words), tables, jnp.int32(data.size), chunk_bits=512)
    np.testing.assert_array_equal(np.asarray(out)[:data.size], data)
