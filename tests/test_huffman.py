"""JAX Huffman encode/decode vs the oracle: tables, bitpack, flat gap decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bmh_tpu.models import oracle
from bmh_tpu.ops import huffman as jhuf


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


def flat_decode(blocks: list[np.ndarray], chunk_bits: int, nmax: int):
    """Encode each block with the oracle, decode all via gap_decode_flat."""
    wbytes = chunk_bits // 8
    words_parts, spans = [], []
    tables, ns = [], []
    maxl = 1
    for d in blocks:
        freqs = oracle.histogram(d)
        lens = jhuf.code_lengths_from_hist(freqs)
        codes = jhuf.canonical_code_table(lens)
        payload, tb = oracle.huffman_encode(d, lens, codes)
        nc_b = max(1, -(-len(payload) // wbytes))
        buf = payload + b"\x00" * (nc_b * wbytes - len(payload))
        words_parts.append(np.frombuffer(buf, dtype=">u4").astype(np.uint32))
        spans.append(nc_b)
        tables.append(jhuf.decode_tables(lens))
        ns.append(d.size)
        maxl = max(maxl, int(lens.max()))
    nc_true = sum(spans)
    nc = -(-nc_true // 8) * 8  # flat path needs a multiple of 8 for phase B
    b = len(blocks)
    words = np.concatenate(words_parts + [np.zeros((nc - nc_true) * wbytes // 4,
                                                   np.uint32)])
    count_t = np.zeros((32, nc), np.int32)
    seg_id = np.full(nc, b, np.int32)
    seg_start = np.zeros(nc, bool)
    seg_start[nc_true:] = True
    seg_start_idx = np.arange(nc, dtype=np.int32)
    sym_tbl = np.zeros((b + 1, 256), np.int32)
    n_arr = np.zeros(b + 1, np.int32)
    c0 = 0
    for i, (t, nc_b) in enumerate(zip(tables, spans)):
        count_t[:, c0:c0 + nc_b] = t["count"][:, None]
        seg_id[c0:c0 + nc_b] = i
        seg_start[c0] = True
        seg_start_idx[c0:c0 + nc_b] = c0
        sym_tbl[i] = t["sym"]
        n_arr[i] = ns[i]
        c0 += nc_b
    out = jhuf.gap_decode_flat(jnp.asarray(words), jnp.asarray(count_t),
                               jnp.asarray(seg_start),
                               jnp.asarray(seg_start_idx), jnp.asarray(seg_id),
                               jnp.asarray(sym_tbl), jnp.asarray(n_arr),
                               nmax, chunk_bits, maxl=maxl)
    return np.asarray(out)


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
def test_gap_decode_flat_roundtrip(rng, chunk_bits):
    blocks = [d for d in gen_cases(rng)
              if (jhuf.code_lengths_from_hist(oracle.histogram(d)) > 0).sum() > 0]
    nmax = 8192
    out = flat_decode(blocks, chunk_bits, nmax)
    for i, d in enumerate(blocks):
        np.testing.assert_array_equal(out[i, :d.size], d)


def test_gap_decode_flat_long_low_entropy(rng):
    # long runs after MTF: mostly zeros with 1-bit codes -> max symbols/chunk
    data = (rng.random(20000) < 0.02).astype(np.uint8)
    out = flat_decode([data], 512, 32768)
    np.testing.assert_array_equal(out[0, :data.size], data)


def test_device_code_lengths_match_host(rng):
    """Device two-queue scan == host two-queue, including ties/degenerates."""
    from bmh_tpu.ops import huffman as H

    A = H.RLE_ALPHABET
    fn = jax.jit(H.code_lengths_device)
    cases = []
    for _ in range(12):
        f = np.zeros(A, dtype=np.int64)
        k = int(rng.integers(1, A))
        syms = rng.choice(A, size=k, replace=False)
        f[syms] = rng.integers(1, 10000, size=k)
        cases.append(f)
    cases.append(np.zeros(A, dtype=np.int64))                 # empty
    one = np.zeros(A, dtype=np.int64); one[7] = 123; cases.append(one)
    two = np.zeros(A, dtype=np.int64); two[1] = 5; two[200] = 5; cases.append(two)
    flat = np.ones(A, dtype=np.int64); cases.append(flat)     # all ties
    for f in cases:
        want = H.code_lengths_from_hist(f[:256]) if f.size == 256 else None
        # host impl accepts any size; call directly
        want = np.asarray([int(x) for x in __import__("bmh_tpu.ops.huffman",
                          fromlist=["x"]).code_lengths_from_hist(f)])
        got = np.asarray(fn(jnp.asarray(f, dtype=jnp.int32)))
        np.testing.assert_array_equal(got, want.astype(np.int32))


def test_device_canonical_codes_match_host(rng):
    from bmh_tpu.ops import huffman as H

    A = H.RLE_ALPHABET
    fn = jax.jit(H.canonical_codes_device)
    for _ in range(8):
        f = np.zeros(A, dtype=np.int64)
        k = int(rng.integers(2, A))
        syms = rng.choice(A, size=k, replace=False)
        f[syms] = rng.integers(1, 1000, size=k)
        lens = H.code_lengths_from_hist(f)
        want = H.canonical_code_table(lens)
        got = np.asarray(fn(jnp.asarray(lens.astype(np.int32))))
        np.testing.assert_array_equal(got, want)


def test_device_decode_tables_match_host(rng):
    from bmh_tpu.ops import huffman as H

    A = H.RLE_ALPHABET
    fn = jax.jit(H.decode_tables_device)
    for _ in range(8):
        f = np.zeros(A, dtype=np.int64)
        k = int(rng.integers(2, A))
        syms = rng.choice(A, size=k, replace=False)
        f[syms] = rng.integers(1, 1000, size=k)
        lens = H.code_lengths_from_hist(f)
        want = H.decode_tables(lens)
        count, sym = fn(jnp.asarray(lens.astype(np.int32)))
        np.testing.assert_array_equal(np.asarray(count), want["count"])
        npres = int((lens > 0).sum())
        np.testing.assert_array_equal(np.asarray(sym)[:npres],
                                      want["sym"][:npres])


def fused_rle0_decode(code_blocks: list[np.ndarray], chunk_bits: int,
                      nmax: int):
    """Oracle-encode each MTF-code block (RLE0 + canonical Huffman), then
    decode the whole batch with the FUSED gap_decode_rle0_flat."""
    from bmh_tpu.ops import rle as jrle

    wbytes = chunk_bits // 8
    words_parts, spans, tables = [], [], []
    ms, ns = [], []
    maxl = 1
    for codes in code_blocks:
        syms = oracle.rle0(codes)
        freqs = oracle.histogram(syms, alphabet=jrle.RLE_ALPHABET)
        lens = jhuf.code_lengths_from_hist(freqs)
        ctab = jhuf.canonical_code_table(lens)
        payload, _ = oracle.huffman_encode(syms, lens, ctab)
        nc_b = max(1, -(-len(payload) // wbytes))
        buf = payload + b"\x00" * (nc_b * wbytes - len(payload))
        words_parts.append(np.frombuffer(buf, dtype=">u4").astype(np.uint32))
        spans.append(nc_b)
        tables.append(jhuf.decode_tables(lens))
        ms.append(syms.size)
        ns.append(codes.size)
        maxl = max(maxl, int(lens.max()))
    nc_true = sum(spans)
    nc = -(-nc_true // 8) * 8
    b = len(code_blocks)
    words = np.concatenate(words_parts + [np.zeros((nc - nc_true) * wbytes // 4,
                                                   np.uint32)])
    A = jrle.RLE_ALPHABET
    count_t = np.zeros((32, nc), np.int32)
    seg_id = np.full(nc, b, np.int32)
    seg_start = np.zeros(nc, bool)
    seg_start[nc_true:] = True
    seg_start_idx = np.arange(nc, dtype=np.int32)
    sym_tbl = np.zeros((b + 1, A), np.int32)
    m_arr = np.zeros(b + 1, np.int32)
    n_arr = np.zeros(b + 1, np.int32)
    c0 = 0
    for i, (t, nc_b) in enumerate(zip(tables, spans)):
        count_t[:, c0:c0 + nc_b] = t["count"][:, None]
        seg_id[c0:c0 + nc_b] = i
        seg_start[c0] = True
        seg_start_idx[c0:c0 + nc_b] = c0
        sym_tbl[i] = t["sym"][:A]
        m_arr[i] = ms[i]
        n_arr[i] = ns[i]
        c0 += nc_b
    out, totals = jhuf.gap_decode_rle0_flat(
        jnp.asarray(words), jnp.asarray(count_t), jnp.asarray(seg_start),
        jnp.asarray(seg_start_idx), jnp.asarray(seg_id), jnp.asarray(sym_tbl),
        jnp.asarray(m_arr), jnp.asarray(n_arr), nmax, chunk_bits, maxl=maxl)
    return np.asarray(out), np.asarray(totals)


def _mtf_code_cases(rng):
    """MTF-code streams with realistic zero dominance + adversarial runs."""
    z = np.zeros(700, dtype=np.uint8)
    mixed = rng.integers(0, 5, 2000).astype(np.uint8)
    mixed[rng.random(2000) < 0.7] = 0
    return [
        mixed,
        np.concatenate([z, np.array([3, 4], np.uint8), z]),  # long runs
        rng.integers(1, 255, 500).astype(np.uint8),  # no zeros at all
        np.concatenate([np.array([9], np.uint8), np.zeros(1499, np.uint8)]),
        rng.integers(0, 2, 3000).astype(np.uint8),  # RUNA/RUNB heavy
    ]


@pytest.mark.parametrize("place", ["sort", "scatter"])
def test_gap_decode_rle0_flat_matches_inputs(rng, place):
    """Fused decode+RLE0⁻¹ reproduces the original MTF codes for a ragged
    batch, under both literal-placement strategies."""
    from bmh_tpu.utils import config as config_mod

    blocks = _mtf_code_cases(rng)
    nmax = 4096
    old = config_mod.DEFAULT.decode_place
    try:
        config_mod.DEFAULT.decode_place = place
        out, totals = fused_rle0_decode(blocks, chunk_bits=256, nmax=nmax)
    finally:
        config_mod.DEFAULT.decode_place = old
    assert out.shape[0] >= len(blocks)
    for i, codes in enumerate(blocks):
        np.testing.assert_array_equal(out[i, :codes.size], codes)
        assert (out[i, codes.size:] == 0).all()
        # the integrity trailer: a well-formed stream's decoded total is
        # exactly the block length
        assert int(totals[i]) == codes.size
