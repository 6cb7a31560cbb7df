"""JAX BWT forward/inverse vs the NumPy oracle, with padding and edge cases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bmh_tpu.models import oracle
from bmh_tpu.ops import bwt as jbwt


def pad_pow2(data, min_size=8):
    n = data.size
    nmax = max(min_size, 1 << (max(n - 1, 1)).bit_length())
    out = np.zeros(nmax, dtype=np.uint8)
    out[:n] = data
    return out


CASES = [
    np.array([1], dtype=np.uint8),
    np.array([5, 5], dtype=np.uint8),
    np.frombuffer(b"banana_bandana", dtype=np.uint8).copy(),
    np.tile(np.arange(3, dtype=np.uint8), 11),      # periodic-ish
    np.zeros(33, dtype=np.uint8),                   # fully periodic
    np.full(64, 7, dtype=np.uint8),                 # periodic, power-of-two n
]


@pytest.mark.parametrize("case", range(len(CASES)))
def test_bwt_forward_matches_oracle(case):
    data = CASES[case]
    n = data.size
    padded = pad_pow2(data)
    last, shift = jax.jit(jbwt.bwt_forward)(jnp.asarray(padded), jnp.int32(n))
    s_ref, l_ref = oracle.bwt(data)
    np.testing.assert_array_equal(np.asarray(last)[:n], l_ref)
    assert int(shift) == s_ref


def test_bwt_forward_random(rng):
    for n in [1, 2, 5, 100, 1000, 4096]:
        for lo_entropy in [False, True]:
            data = rng.integers(0, 4 if lo_entropy else 256, n).astype(np.uint8)
            padded = pad_pow2(data)
            last, shift = jax.jit(jbwt.bwt_forward)(jnp.asarray(padded), jnp.int32(n))
            s_ref, l_ref = oracle.bwt(data)
            np.testing.assert_array_equal(np.asarray(last)[:n], l_ref)
            assert int(shift) == s_ref


def test_bwt_inverse_matches_oracle(rng):
    for n in [1, 2, 5, 100, 1000, 4096]:
        data = rng.integers(0, 256, n).astype(np.uint8)
        s_ref, l_ref = oracle.bwt(data)
        padded = pad_pow2(l_ref)
        out = jax.jit(jbwt.bwt_inverse)(jnp.asarray(padded), jnp.int32(s_ref), jnp.int32(n))
        np.testing.assert_array_equal(np.asarray(out)[:n], data)


def test_bwt_roundtrip_jax(rng):
    for n in [1, 3, 17, 333, 2048]:
        data = rng.integers(0, 8, n).astype(np.uint8)
        padded = pad_pow2(data)
        last, shift = jax.jit(jbwt.bwt_forward)(jnp.asarray(padded), jnp.int32(n))
        back = jax.jit(jbwt.bwt_inverse)(last, shift, jnp.int32(n))
        np.testing.assert_array_equal(np.asarray(back)[:n], data)


def test_bwt_bucket_reuse(rng):
    # same padded size, different true n -> one compilation, correct results
    f = jax.jit(jbwt.bwt_forward)
    for n in [100, 200, 255]:
        data = rng.integers(0, 256, n).astype(np.uint8)
        padded = np.zeros(256, dtype=np.uint8)
        padded[:n] = data
        last, shift = f(jnp.asarray(padded), jnp.int32(n))
        s_ref, l_ref = oracle.bwt(data)
        np.testing.assert_array_equal(np.asarray(last)[:n], l_ref)
        assert int(shift) == s_ref


def _sparse_rank_roundtrip(blocks, ns, h_stop):
    """Run rounds(h_stop) -> host compaction -> sparse_refine on a batch."""
    b, nmax = blocks.shape
    rounds = jax.jit(jax.vmap(lambda d, n: jbwt.bwt_rounds(d, n, h_stop)))
    rank, tied, h, done = rounds(jnp.asarray(blocks), jnp.asarray(ns))
    tied_np = np.asarray(tied).astype(bool)
    blk_idx, pos_idx = np.nonzero(tied_np)
    m_true = blk_idx.size
    if m_true == 0:
        return np.asarray(rank)
    m_pad = 1 << max(m_true - 1, 1).bit_length()
    blk = np.full(m_pad, b, dtype=np.int32)
    pos = np.zeros(m_pad, dtype=np.int32)
    blk[:m_true] = blk_idx
    pos[:m_true] = pos_idx
    hm0 = np.zeros(m_pad, dtype=np.int32)
    hm0[:m_true] = h_stop % ns[blk_idx]
    out = jax.jit(jbwt.sparse_refine)(rank, jnp.asarray(blk),
                                      jnp.asarray(pos), jnp.asarray(hm0),
                                      jnp.asarray(ns), jnp.int32(h_stop))
    return np.asarray(out)


@pytest.mark.parametrize("h_stop", [8, 16, 32])
def test_sparse_refine_matches_full_rounds(rng, h_stop):
    """Sparse refinement must land on the same final ranks as full rounds,
    including ragged lengths, periodic blocks, and text-like repetition."""
    nmax = 2048
    b = 4
    blocks = np.zeros((b, nmax), dtype=np.uint8)
    ns = np.array([2048, 1537, 1024, 900], dtype=np.int32)
    words = rng.integers(0, 5, 600)
    text = b"".join([b"the", b"quick", b"brown", b"fox ", b"jumps"][w] for w in words)
    blocks[0, :2048] = np.frombuffer(text[:2048], dtype=np.uint8)
    blocks[1, :1537] = np.frombuffer(text[100:1637], dtype=np.uint8)
    blocks[2, :1024] = np.tile(np.frombuffer(b"ab", dtype=np.uint8), 512)  # periodic
    blocks[3, :900] = rng.integers(0, 4, 900, dtype=np.uint8)

    got = _sparse_rank_roundtrip(blocks, ns, h_stop)
    full = jax.jit(jax.vmap(lambda d, n: jbwt.bwt_rounds(d, n)[0]))(
        jnp.asarray(blocks), jnp.asarray(ns))
    np.testing.assert_array_equal(got, np.asarray(full))


def test_sparse_pipeline_stage1_matches_fused(rng):
    """The pipeline's sparse stage-1 path == the fused classic stage 1."""
    from bmh_tpu.models import pipeline as P

    nmax = 4096
    blocks = np.zeros((4, nmax), dtype=np.uint8)
    ns = np.array([4096, 4096, 3000, 1], dtype=np.int32)
    text = bytes(rng.integers(97, 105, 9000, dtype=np.uint8).tolist())
    blocks[0] = np.frombuffer(text[:4096], dtype=np.uint8)
    blocks[1] = np.frombuffer(text[4000:8096], dtype=np.uint8)
    blocks[2, :3000] = 65  # single symbol: long run, periodic
    got = P._stage1_sparse(jnp.asarray(blocks), jnp.asarray(ns), ns)
    want = P._batched_stage1(nmax, 4)(jnp.asarray(blocks), jnp.asarray(ns))
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_sparse_refine_tier2_compaction(rng):
    """Large tied sets exercise the quarter-capacity second compaction tier
    (m_pad >= 4*4096 with ties that resolve after two rounds)."""
    nmax, b = 8192, 8
    blocks = rng.integers(0, 3, (b, nmax)).astype(np.uint8)  # tiny alphabet
    ns = np.full(b, nmax, dtype=np.int32)
    ns[-1] = nmax - 777
    got = _sparse_rank_roundtrip(blocks, ns, 8)
    full = jax.jit(jax.vmap(lambda d, n: jbwt.bwt_rounds(d, n)[0]))(
        jnp.asarray(blocks), jnp.asarray(ns))
    np.testing.assert_array_equal(got, np.asarray(full))


def test_sparse_refine_tier2_overflow_fallback(rng):
    """Run-dominated ties that DON'T fit the tier-2 capacity after two
    rounds must fall back to full-capacity rounds and still match."""
    nmax, b = 8192, 8
    motif = rng.integers(0, 200, 32, dtype=np.uint8)
    blocks = np.tile(motif, (b, nmax // 32))  # period 32: ties persist
    blocks[:, -64:] = rng.integers(0, 200, (b, 64))  # break exact periodicity
    ns = np.full(b, nmax, dtype=np.int32)
    got = _sparse_rank_roundtrip(blocks, ns, 8)
    full = jax.jit(jax.vmap(lambda d, n: jbwt.bwt_rounds(d, n)[0]))(
        jnp.asarray(blocks), jnp.asarray(ns))
    np.testing.assert_array_equal(got, np.asarray(full))


def test_forward_cp_ff_runs_near_pad(rng):
    """0xFF 4-grams share the 4-byte packed init's pad sentinel; the
    finish-time pad-rank mask must keep pads out of the real order (a
    corrupt last column here would silently break geo/obj-like inputs)."""
    nmax = 1024
    for n in [1000, 1023, 5, 4]:
        data = rng.integers(0, 256, n).astype(np.uint8)
        data[-min(6, n):] = 255  # 0xFF run ending at the rotation boundary
        if n > 12:
            data[3:9] = 255      # and one mid-block
        pad = np.zeros(nmax, np.uint8)
        pad[:n] = data
        last, shift, cps, aper = jax.jit(jbwt.bwt_forward_cp)(
            jnp.asarray(pad), jnp.int32(n))
        s_ref, l_ref = oracle.bwt(data)
        np.testing.assert_array_equal(np.asarray(last)[:n], l_ref)
        assert int(shift) == s_ref


def test_lf2_walk_matches_lf1(rng):
    """The LF²-packed cursor walk (blocks <= 64 KiB) emits byte-identical
    output to the plain LF walk, across strides, lengths and periodic-free
    inputs."""
    from bmh_tpu.utils import config as config_mod

    for n in [100, 1000, 4095, 4096, 20000, 50000, 65536]:
        data = rng.integers(0, 200, n).astype(np.uint8)
        data[0] = 255  # guard: distinct head so the block is aperiodic-ish
        padded = pad_pow2(data, min_size=256)
        last, shift, cps, aper = jax.jit(jbwt.bwt_forward_cp)(
            jnp.asarray(padded), jnp.int32(n))
        if not bool(aper):
            continue
        outs = {}
        old = config_mod.DEFAULT.lf2
        try:
            for lf2 in (False, True):
                config_mod.DEFAULT.lf2 = lf2
                walk = jax.jit(lambda l, s, c, nn, _v=lf2:
                               jbwt.bwt_inverse_cursors(l, s, c, nn))
                outs[lf2] = np.asarray(walk(last, shift, cps, jnp.int32(n)))
        finally:
            config_mod.DEFAULT.lf2 = old
        np.testing.assert_array_equal(outs[True][:n], data)
        np.testing.assert_array_equal(outs[True], outs[False])


def test_sparse_compact_hm_no_overflow(rng):
    """Regression: the hm0 conditional-subtract ladder masks nb*q products
    that overflow int32 (nb ~ n, q up to nmax) — unmasked, the wrapped
    negative product falsely triggered subtraction and corrupted the
    handoff gap for single-block odd-length batches (paper1/progc)."""
    from bmh_tpu.models import pipeline as P

    nmax = 65536
    n = 53161  # odd length, nb * nmax > 2^31
    data = rng.integers(0, 64, n).astype(np.uint8)
    pad = np.zeros(nmax, np.uint8)
    pad[:n] = data
    a = jnp.asarray(pad)[None, :]
    ns = jnp.asarray([n], jnp.int32)
    rank_full, _, _, _ = jax.jit(jbwt.bwt_rounds)(jnp.asarray(pad),
                                                  jnp.int32(n))
    rank, tied, h, done, cnt = P._batched_rounds(nmax, 1)(a, ns)
    ref = P._sparse_refine_compact(rank, tied, ns, 1, nmax,
                                   P._sparse_cap(1, nmax),
                                   h0=jnp.int32(32))
    np.testing.assert_array_equal(np.asarray(ref[0])[:n],
                                  np.asarray(rank_full)[:n])
