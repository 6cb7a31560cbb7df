"""TPU-native RLE0: zero-run coding of the MTF stream (bzip2-style RUNA/RUNB).

Maximal runs of MTF code 0 are rewritten in bijective base 2 over run symbols
RUNA=0 / RUNB=1 (run length r = sum of (1+b_i)*2^i, digits LSB-first); every
non-zero MTF code c becomes symbol c+1, so the Huffman alphabet is 257.  The
post-BWT/MTF stream is zero-dominated; plain Huffman pays >= 1 bit per zero
while RLE0 pays ~log2(r) bits per run — this is how the codec's compressed
sizes strictly beat the reference's (/root/reference/README.md:19-36), which
has no run stage at all.

Both directions are parallel scan/gather formulations: a run's length is
recovered per position from the distance between its start (running max of
run-start positions) and the next non-zero; digit validity and values are
pure bit arithmetic; stream compaction is a single scatter.  Sequential
semantics live in models/oracle.py (rle0/rle0_inverse), the unit-test judge.

All shapes static: (Nmax,) padded arrays with traced true lengths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

RLE_ALPHABET = 257
MAX_LOG = 26  # supports runs (and blocks) up to 2**26


def _floor_log2_p1(r: jax.Array) -> jax.Array:
    """floor(log2(r+1)) for 0 <= r < 2^24-1, elementwise.

    One int->f32 convert + exponent extract (exact: every value below 2^24
    is representable) instead of a MAX_LOG-deep unrolled compare chain —
    run lengths are bounded by the block size (<= 2^21)."""
    rp = r + 1
    exp = (jax.lax.bitcast_convert_type(rp.astype(jnp.float32), jnp.int32)
           >> 23) - 127
    return jnp.where(rp > 0, exp, 0).astype(r.dtype)


def rle0_encode(codes: jax.Array, n: jax.Array) -> tuple[jax.Array, jax.Array]:
    """MTF codes -> RLE0 symbols.

    codes: (Nmax,) uint8, first n valid.  Returns (syms (Nmax,) int32 with
    values in [0, 256], m int32 = true symbol count).  Positions >= m are 0.
    """
    nmax = codes.shape[0]
    pos = jnp.arange(nmax, dtype=jnp.int32)
    valid = pos < n
    c = codes.astype(jnp.int32)
    z = (c == 0) & valid
    z_prev = jnp.concatenate([jnp.zeros(1, bool), z[:-1]])
    run_start = z & jnp.logical_not(z_prev)

    start_pos = jax.lax.cummax(jnp.where(run_start, pos, -1))
    # next non-zero-or-invalid position at/after i (runs end at n too);
    # a native reverse scan, not flip-scan-flip (two 4M reversal copies)
    nz = jnp.logical_not(z)
    nxt = jax.lax.cummin(jnp.where(nz, pos, nmax), reverse=True)

    r = nxt - start_pos            # run length, valid on zero positions
    j = pos - start_pos            # index within the run
    d = _floor_log2_p1(r)          # digit count
    bits = r + 1 - (jnp.int32(1) << d)
    b = (bits >> j) & 1            # j-th digit value (0=RUNA, 1=RUNB)

    emit = valid & jnp.where(z, j < d, True)
    sym = jnp.where(z, b, c + 1)
    out_idx = jnp.cumsum(emit.astype(jnp.int32)) - emit
    m = jnp.sum(emit.astype(jnp.int32))

    if nmax <= (1 << 22):
        # stream compaction by ONE packed single-array sort (out_idx 23
        # bits | sym 9 bits): a 4M-element single-array sort runs ~3x
        # faster than the ragged scatter lowering it replaces (TRACE_r03
        # fusion.26, ~20 ms/corpus pass)
        key = jnp.where(emit, (out_idx.astype(jnp.uint32) << 9)
                        | sym.astype(jnp.uint32), jnp.uint32(0xFFFFFFFF))
        srt = jax.lax.sort(key, is_stable=False)  # keys distinct/sentinel
        return jnp.where(pos < m, (srt & jnp.uint32(511)).astype(jnp.int32),
                         0), m
    target = jnp.where(emit, out_idx, nmax)
    out = jnp.zeros(nmax + 1, dtype=jnp.int32)
    out = out.at[target].set(sym, mode="drop")
    return out[:nmax], m


def rle0_decoded_len(syms: jax.Array, m: jax.Array,
                     n: jax.Array | None = None) -> jax.Array:
    """Exact decoded length of an RLE0 symbol stream (first m of syms).

    The integrity counterpart of `rle0_decode`: a container whose `rle_len`
    or payload lies about the stream decodes to a total != the recorded
    block length, and the decompress paths compare this total against `n`
    to fail closed instead of returning silently wrong bytes of the right
    length (the reference's equivalent corruption is undefined behaviour,
    /root/reference/io_utilities.h:40-51).

    With `n` given, the result is wrap-proof in pure int32 (jnp int64
    silently downcasts without x64): a hostile stream whose prefix sum
    wraps mod 2^32 must pass through an intermediate inclusive prefix in
    [2^31 - 2^27, 2^31) — far above any valid n — so the max prefix is
    checked and wrapped streams return the poison value n+1."""
    nmax = syms.shape[0]
    pos = jnp.arange(nmax, dtype=jnp.int32)
    valid = pos < m
    s = syms.astype(jnp.int32)
    isrun = (s <= 1) & valid
    prev = jnp.concatenate([jnp.zeros(1, bool), isrun[:-1]])
    grp_start = isrun & jnp.logical_not(prev)
    start_pos = jax.lax.cummax(jnp.where(grp_start, pos, -1))
    j = jnp.clip(pos - start_pos, 0, MAX_LOG)
    contrib = jnp.where(valid, jnp.where(isrun, (1 + s) << j, 1), 0)
    incl = jnp.cumsum(contrib)
    total = jnp.sum(contrib).astype(jnp.int32)
    if n is None:
        return total
    maxv = jnp.max(jnp.where(valid, incl, -1))
    poison = jnp.where(n < jnp.int32(2**31 - 1), n + 1, 0)
    return jnp.where(maxv <= n, total, poison).astype(jnp.int32)


def rle0_decode(syms: jax.Array, m: jax.Array, n: jax.Array) -> jax.Array:
    """RLE0 symbols -> MTF codes.

    syms: (Nmax,) int32 in [0, 256], first m valid; n = decoded length.
    Returns (Nmax,) uint8 (zeros are the scatter fill — runs cost nothing).
    """
    nmax = syms.shape[0]
    pos = jnp.arange(nmax, dtype=jnp.int32)
    valid = pos < m
    s = syms.astype(jnp.int32)
    isrun = (s <= 1) & valid
    prev = jnp.concatenate([jnp.zeros(1, bool), isrun[:-1]])
    grp_start = isrun & jnp.logical_not(prev)
    start_pos = jax.lax.cummax(jnp.where(grp_start, pos, -1))
    j = pos - start_pos

    contrib = jnp.where(valid, jnp.where(isrun, (1 + s) << j, 1), 0)
    out_pos = jnp.cumsum(contrib) - contrib  # exclusive

    lit = valid & jnp.logical_not(isrun)
    target = jnp.where(lit & (out_pos < n), out_pos, nmax)
    out = jnp.zeros(nmax + 1, dtype=jnp.int32)
    out = out.at[target].set(s - 1, mode="drop")
    return out[:nmax].astype(jnp.uint8)
