"""TPU-native canonical Huffman: scan-based bit packing and parallel decode.

The reference builds a pointer tree with a priority queue and writes the
payload one bit at a time (/root/reference/main.cpp:229-257, 158-172,
io_utilities.h:87-94), then decodes bit-by-bit with a hashmap probe per bit
(main.cpp:259-281).  Here:

* Code *lengths* come from a two-queue merge over the 256-bin histogram
  (host-side; 256 entries is far below any device-worthy size).  Codes are
  canonical — (length, symbol)-ordered — so no tree exists anywhere.
* Encode: per-symbol (code, length) lookup, an exclusive scan of bit
  offsets, then each symbol ORs its code into at most two uint32 lanes via
  sorted segment sums.  O(N), fully parallel, MSB-first bit order identical
  to the reference cursor.
* Decode: the payload is cut into fixed CHUNK_BITS chunks.  Every chunk is
  decoded speculatively from each of the G=32 possible codeword-boundary
  offsets ("gaps") by a branch-free canonical FSM; per-chunk entry->exit gap
  maps are composed with a log-depth associative scan to find each chunk's
  true entry gap; a second pass re-decodes only the winning lane per chunk
  and scatters symbols to their global positions.  Exact (no probabilistic
  resynchronisation), zero container overhead, and embarrassingly parallel
  — this replaces the reference's inherently serial hot loop #4.

Shapes are static given (Nmax, padded word count); true lengths are traced.
"""

from __future__ import annotations

from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

ALPHABET = 256
RLE_ALPHABET = 257    # MTF alphabet + RUNA/RUNB (ops/rle.py)
MAX_LEN = 31          # code lengths fit 5 container bits
GAPS = 32             # possible codeword-boundary offsets at a chunk cut


def _use_pallas_decode() -> bool:
    import jax as _jax

    from ..utils import config as config_mod

    if not config_mod.DEFAULT.pallas_decode:
        return False
    try:
        on_tpu = _jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    return on_tpu


# ---------------------------------------------------------------------------
# Host-side table construction (256-entry work; not a device op)
# ---------------------------------------------------------------------------

def code_lengths_from_hist(freqs: np.ndarray) -> np.ndarray:
    """Optimal prefix-code lengths via the two-queue method (O(S log S)).

    Independent of the oracle's heapq construction; both are optimal Huffman
    solutions, hence identical total payload bits (the size-parity invariant
    vs the reference's pointer-tree tie-breaking).  Prefers the native C
    implementation (csrc/bmh_io.cpp) when built; this Python version is the
    fallback and its semantic specification.
    """
    from ..utils import nativeio

    freqs = np.asarray(freqs)
    if freqs.size == ALPHABET:
        native = nativeio.code_lengths(np.asarray(freqs, dtype=np.int64))
        if native is not None:
            return native
    syms = np.nonzero(freqs > 0)[0]
    s = syms.size
    lens = np.zeros(freqs.size, dtype=np.uint8)
    if s <= 1:
        return lens  # zero/one distinct symbol: empty codeword
    order = np.argsort(freqs[syms], kind="stable")
    leaves = syms[order]
    weights = np.zeros(2 * s - 1, dtype=np.int64)
    weights[:s] = freqs[leaves]
    parent = np.full(2 * s - 1, -1, dtype=np.int32)
    q1 = deque(range(s))
    q2: deque[int] = deque()
    nxt = s

    def pop_min() -> int:
        if q1 and (not q2 or weights[q1[0]] <= weights[q2[0]]):
            return q1.popleft()
        return q2.popleft()

    for _ in range(s - 1):
        a = pop_min()
        b = pop_min()
        weights[nxt] = weights[a] + weights[b]
        parent[a] = nxt
        parent[b] = nxt
        q2.append(nxt)
        nxt += 1
    depth = np.zeros(2 * s - 1, dtype=np.int32)
    for i in range(2 * s - 3, -1, -1):  # parents always have larger ids
        depth[i] = depth[parent[i]] + 1
    if depth[:s].max() > MAX_LEN:
        raise ValueError(f"Huffman depth {depth[:s].max()} > {MAX_LEN}; shrink the block")
    lens[leaves] = depth[:s]
    return lens


def canonical_code_table(lens: np.ndarray) -> np.ndarray:
    """(256,) uint32 canonical code values; symbols ordered by (len, symbol)."""
    from ..utils import nativeio

    if np.asarray(lens).size == ALPHABET:
        native = nativeio.canonical_codes(np.asarray(lens, dtype=np.uint8))
        if native is not None:
            return native
    lens = np.asarray(lens, dtype=np.int64)
    order = sorted((s for s in range(lens.size) if lens[s] > 0), key=lambda s: (lens[s], s))
    codes = np.zeros(lens.size, dtype=np.uint32)
    code = 0
    prev = 0
    for s in order:
        code <<= int(lens[s]) - prev
        prev = int(lens[s])
        codes[s] = code
        code += 1
    return codes


def decode_tables(lens: np.ndarray) -> dict[str, np.ndarray]:
    """Canonical decode tables: per-length codeword counts + symbol list.

    The gap-decode FSM carries first/offset as in-register recurrences
    (ops/pallas_decode.py docstring), so only `count` (32,) and the
    (len, symbol)-ordered `sym` list (256,) are materialised.
    """
    lens = np.asarray(lens, dtype=np.int64)
    count = np.zeros(MAX_LEN + 1, dtype=np.int64)
    for s in range(lens.size):
        if lens[s] > 0:
            count[lens[s]] += 1
    order = sorted((s for s in range(lens.size) if lens[s] > 0), key=lambda s: (lens[s], s))
    sym_table = np.zeros(max(lens.size, ALPHABET), dtype=np.int32)
    sym_table[:len(order)] = order
    return {
        "count": count.astype(np.int32),
        "sym": sym_table,
    }


# ---------------------------------------------------------------------------
# Device-side table construction: the same two-queue method as
# code_lengths_from_hist, expressed as a 256-step lax.scan so the whole
# compress pipeline (stage 1 -> lengths -> codes -> bitpack) is ONE device
# dispatch per batch — no host round-trip between histogram and encode
# (the reference rebuilds a pointer tree on the host per file,
# /root/reference/main.cpp:229-257; here 257 symbols x B blocks run as
# vmapped scalar lanes, ~1 ms per batch).
# ---------------------------------------------------------------------------

def code_lengths_device(freqs: jax.Array) -> jax.Array:
    """(A,) int32/int64 histogram -> (A,) int32 optimal code lengths.

    Bit-identical to code_lengths_from_hist: leaves sorted by (freq, sym)
    stable; pop_min prefers the leaf queue on ties.  Internal-node weights
    are created in non-decreasing order (the two-queue invariant), so both
    queues are plain arrays with head pointers.
    """
    a = freqs.shape[0]
    # int32 throughout (jax x64 is off): weights are bounded by the block
    # size (<= 2^21), so a 2^30 sentinel never collides with a real weight;
    # sentinel+sentinel overflow can only happen in inactive scan steps,
    # whose results are discarded
    f = freqs.astype(jnp.int32)
    big = jnp.int32(1) << 30
    iota = jnp.arange(a, dtype=jnp.int32)
    leafw, leafsym = jax.lax.sort(
        (jnp.where(f > 0, f, big), iota), num_keys=1, is_stable=True)
    s = jnp.sum((f > 0).astype(jnp.int32))

    # parent pointers over 2a-1 node slots: leaves 0..a-1 (sorted order),
    # internal node born at merge t is slot a+t; unmerged slots self-parent
    n_nodes = 2 * a - 1
    parent0 = jnp.arange(n_nodes, dtype=jnp.int32)
    q2_0 = jnp.full(a - 1, big, dtype=jnp.int32)

    def pick(i, j, k, q2):
        lw = leafw[jnp.clip(i, 0, a - 1)]
        lw = jnp.where(i < a, lw, big)
        iw = jnp.where(j < k, q2[jnp.clip(j, 0, a - 2)], big)
        take_leaf = lw <= iw  # tie -> leaf, as in the host pop_min
        w = jnp.where(take_leaf, lw, iw)
        node = jnp.where(take_leaf, i, a + j)
        return (jnp.where(take_leaf, i + 1, i),
                jnp.where(take_leaf, j, j + 1), w, node)

    q_iota = jnp.arange(a - 1, dtype=jnp.int32)
    p_iota = jnp.arange(n_nodes, dtype=jnp.int32)

    def step(carry, t):
        i, j, k, q2, parent = carry
        active = t < s - 1
        i1, j1, aw, an = pick(i, j, k, q2)
        i2, j2, bw, bn = pick(i1, j1, k, q2)
        nid = a + t
        # iota-compare selects, not .at[] scatters: a per-lane scatter per
        # scan step costs ~0.1ms of dispatch each on TPU; a 257/513-wide
        # select is fused VPU work
        q2n = jnp.where(q_iota == k, aw + bw, q2)
        pn = jnp.where((p_iota == an) | (p_iota == bn), nid, parent)
        return (jnp.where(active, i2, i), jnp.where(active, j2, j),
                jnp.where(active, k + 1, k),
                jnp.where(active, q2n, q2),
                jnp.where(active, pn, parent)), None

    (_, _, _, _, parent), _ = jax.lax.scan(
        step, (jnp.int32(0), jnp.int32(0), jnp.int32(0), q2_0, parent0),
        jnp.arange(a - 1, dtype=jnp.int32))

    # leaf depth = #proper ancestors, by pointer doubling (max depth 256 < 2^9)
    jump = parent
    dist = (parent != jnp.arange(n_nodes, dtype=jnp.int32)).astype(jnp.int32)
    for _ in range(9):
        dist = dist + dist[jump]
        jump = jump[jump]
    lens = jnp.zeros(a, dtype=jnp.int32).at[leafsym].set(dist[:a])
    return lens


def canonical_codes_device(lens: jax.Array) -> jax.Array:
    """(A,) int32 lengths -> (A,) uint32 canonical code values
    ((len, symbol)-ordered, same assignment as canonical_code_table)."""
    a = lens.shape[0]
    ls = jnp.arange(1, MAX_LEN + 1, dtype=jnp.int32)  # (31,)
    onehot = lens[None, :] == ls[:, None]              # (31, A)
    count = jnp.sum(onehot, axis=1).astype(jnp.uint32)
    # first[l] = canonical first code of length l: code=0; for l: first[l]=code;
    # code=(code+count[l])<<1 — a tiny 31-step scan
    def fstep(code, c):
        return (code + c) << 1, code
    _, first = jax.lax.scan(fstep, jnp.uint32(0), count)
    rank_in_len = (jnp.cumsum(onehot.astype(jnp.uint32), axis=1) - onehot)
    sel = jnp.sum(jnp.where(onehot, first[:, None] + rank_in_len, 0),
                  axis=0, dtype=jnp.uint32)
    return jnp.where(lens > 0, sel, 0).astype(jnp.uint32)


def decode_tables_device(lens: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(A,) int32 lengths -> (count (32,) int32 per-length codeword counts,
    sym (A,) int32 (len, symbol)-ordered symbol list) — the device analogue
    of decode_tables, so decompress needs no host-side per-block table
    loop."""
    a = lens.shape[0]
    iota = jnp.arange(a, dtype=jnp.int32)
    count = jnp.sum(lens[None, :] == jnp.arange(32, dtype=jnp.int32)[:, None],
                    axis=1, dtype=jnp.int32)
    count = count.at[0].set(0)
    _, sym = jax.lax.sort(
        (jnp.where(lens > 0, lens, jnp.int32(64)), iota),
        num_keys=1, is_stable=True)
    return count, sym


def histogram(data: jax.Array, n: jax.Array, bins: int = ALPHABET) -> jax.Array:
    """Masked histogram (reference: main.cpp:235-237).

    Sort + bin-edge search: pads take a sentinel bin, one unstable sort
    orders the symbols, and count[k] is the difference of adjacent
    searchsorted edges — ~5 ms/corpus-pass cheaper than the previous
    (bins, N) compare-and-reduce, which itself replaced TPU scatter-add
    (tools/microbench_r5.py hist_mask vs hist_sort).
    """
    pos = jnp.arange(data.shape[0], dtype=jnp.int32)
    sym = jnp.where(pos < n, data.astype(jnp.int32), bins)
    srt = jax.lax.sort(sym, is_stable=False)
    edges = jnp.searchsorted(srt, jnp.arange(bins + 1, dtype=jnp.int32))
    return jnp.diff(edges).astype(jnp.int32)


def words_cap(nmax: int) -> int:
    """Static uint32 word capacity of the bitpack output for Nmax symbols."""
    return (10 * nmax + 31) // 32 + 1


def encode_bitpack(data: jax.Array, n: jax.Array, len_tbl: jax.Array,
                   code_tbl: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Pack canonical codes MSB-first into uint32 big-endian-bit words.

    data: (Nmax,) int; len_tbl (A,) int32; code_tbl (A,) uint32.
    Returns (words (W,) uint32 with W = words_cap(Nmax), total_bits int32).
    W is static: optimal-code average length < H+1 <= log2(257)+1 < 10 b/sym.
    """
    nmax = data.shape[0]
    w_out = words_cap(nmax)
    pos = jnp.arange(nmax, dtype=jnp.int32)
    sym = data.astype(jnp.int32)
    # table lookups as compare-select reductions, not gathers: a 4M random
    # gather costs ~42 ms on TPU while an (N, A) compare+masked-sum fuses
    # into a few-ms VPU pass (same structure as `histogram` below); both
    # sums share the one compare mask
    a_iota = jnp.arange(len_tbl.shape[0], dtype=jnp.int32)
    eq = sym[:, None] == a_iota[None, :]
    ln = jnp.sum(jnp.where(eq, len_tbl[None, :], 0), axis=1)
    code = jnp.sum(jnp.where(eq, code_tbl[None, :], jnp.uint32(0)), axis=1,
                   dtype=jnp.uint32)
    ln = jnp.where(pos < n, ln, 0)
    code = jnp.where(pos < n, code, jnp.uint32(0))
    offs = jnp.cumsum(ln) - ln  # exclusive
    total_bits = jnp.sum(ln).astype(jnp.int32)

    r = (offs & 31).astype(jnp.uint32)
    rr = r + ln.astype(jnp.uint32)  # bits consumed in the 64-bit window
    word = (offs >> 5).astype(jnp.int32)

    # split each code into a high word and a spill into the next word
    sh_hi1 = jnp.clip(32 - rr.astype(jnp.int32), 0, 31).astype(jnp.uint32)
    hi1 = code << sh_hi1                                     # rr <= 32 case
    sh_hi2 = jnp.clip(rr.astype(jnp.int32) - 32, 0, 31).astype(jnp.uint32)
    hi2 = code >> sh_hi2                                     # rr > 32 case
    spill_bits = jnp.clip(rr.astype(jnp.int32) - 32, 0, 31)
    lo_mask = (jnp.uint32(1) << spill_bits.astype(jnp.uint32)) - jnp.uint32(1)
    sh_lo = jnp.clip(64 - rr.astype(jnp.int32), 0, 31).astype(jnp.uint32)
    lo2 = (code & lo_mask) << sh_lo

    straddles = rr > 32
    hi = jnp.where(ln > 0, jnp.where(straddles, hi2, hi1), jnp.uint32(0))
    lo = jnp.where(ln > 0, jnp.where(straddles, lo2, jnp.uint32(0)), jnp.uint32(0))

    # Per-word reduction WITHOUT scatter-adds: bits of distinct symbols
    # never overlap within a word, so sum == OR and a wraparound uint32
    # prefix sum turns each word's total into a difference of two prefix
    # samples at consecutive word boundaries.  The boundary samples ride
    # the sorts as payloads: merge the (sorted) symbol offsets with the
    # uniform word boundaries carrying (hi, lo), cumsum the merged
    # payloads (every boundary slot then holds its prefix sample
    # directly), and compact the boundary slots with a second sort —
    # no 1.3M-element p[c[k]] gathers (TRACE_r04: 2 x 26 ms/pass).
    # Key ties occur only among pad symbols (ln == 0 -> equal offs and
    # zero payloads), so stability is irrelevant.
    key = jnp.concatenate([
        (offs << 1) | 1,
        (32 * jnp.arange(w_out + 1, dtype=jnp.int32)) << 1,
    ])
    zpad = jnp.zeros(w_out + 1, jnp.uint32)
    merged, hi_s, lo_s = jax.lax.sort(
        (key, jnp.concatenate([hi, zpad]), jnp.concatenate([lo, zpad])),
        num_keys=1, is_stable=False)
    ph = jnp.cumsum(hi_s)  # at a boundary slot: sum of hi with offs < 32k
    pl = jnp.cumsum(lo_s)
    is_b = (merged & 1) == 0
    k_rank = jnp.cumsum(is_b.astype(jnp.int32)) - is_b  # boundary index k
    _, s_hi, s_lo = jax.lax.sort(
        (jnp.where(is_b, k_rank, jnp.int32(1) << 30), ph, pl), num_keys=1,
        is_stable=False)  # boundary keys distinct; sentinel region unused
    seg_hi = s_hi[1: w_out + 1] - s_hi[: w_out]     # sum of hi with word == w
    lo_by_word = s_lo[1: w_out + 1] - s_lo[: w_out]  # sum of lo with word == w
    seg_lo = jnp.concatenate([jnp.zeros(1, jnp.uint32), lo_by_word[:-1]])
    return (seg_hi + seg_lo).astype(jnp.uint32), total_bits



def unpack_bit_tiles_flat(words: jax.Array, chunk_bits: int) -> jax.Array:
    """(W,) uint32 -> (chunk_bits + GAPS, NC) int32 bit tiles, time-major.

    W*32 must be a multiple of chunk_bits.  Each chunk's tile carries its own
    bits plus the first GAPS bits of the following chunk (codewords may
    straddle the cut).  When `words` is the concatenation of several blocks'
    payloads (each padded to a chunk multiple), the GAPS-bit lookahead of a
    block's last chunk leaks into the next block — harmless: it is consumed
    only by pad bits past that block's symbol count, which the caller drops.
    Time-major so the per-step FSM row is a contiguous lane vector.
    """
    nwords = words.shape[0]
    nc = nwords * 32 // chunk_bits
    assert nc * chunk_bits == nwords * 32, "pad words to a multiple of chunk_bits"
    shifts = (31 - jnp.arange(32, dtype=jnp.uint32))
    bits = ((words[:, None] >> shifts[None, :]) & jnp.uint32(1)).astype(jnp.int32)
    tile = bits.reshape(nc, chunk_bits)
    nxt = jnp.concatenate([tile[1:, :GAPS], jnp.zeros((1, GAPS), tile.dtype)], axis=0)
    return jnp.concatenate([tile, nxt], axis=1).T  # (steps, NC)


def _decode_phases(words, count_t, seg_start, seg_start_idx,
                   chunk_bits: int, maxl: int):
    """Shared gap-decode front end: phase A, segmented composition of exit
    maps into per-chunk entry gaps, phase B.

    Returns (idxs (steps, NC) int32 emitted canonical indices or -1,
    out_off (NC,) int32 exclusive symbol offset of each chunk within its
    block, entry (NC,) int32 entry gaps).
    """
    from . import pallas_decode

    nc = count_t.shape[1]
    if _use_pallas_decode():
        wext = pallas_decode.words_ext(words, chunk_bits)
        cnt_map, exit_map = pallas_decode.phase_a(
            wext, count_t, chunk_bits=chunk_bits, maxl=maxl, interpret=False)
    else:
        tiles = unpack_bit_tiles_flat(words, chunk_bits)
        cnt_map, exit_map = pallas_decode.phase_a_scan(
            tiles, count_t, chunk_bits=chunk_bits, maxl=maxl)

    # segmented prefix composition of exit maps -> per-chunk entry gap
    maps = exit_map.T  # (NC, GAPS); maps[c][g] = exit gap of chunk c entered at g
    flags = seg_start.astype(jnp.int32)
    g_iota = jnp.arange(GAPS, dtype=jnp.int32)

    def combine(a, bgrp):
        ma, fa = a
        mb, fb = bgrp
        # composed[i, g] = mb[i, ma[i, g]] as a compare-select over the 32
        # gaps: take_along_axis lowers to a random gather (~10 ns/elem on
        # TPU — NC*GAPS gathers per scan level), while the (NC, 32, 32)
        # masked sum fuses into VPU work
        composed = jnp.sum(jnp.where(ma[:, :, None] == g_iota[None, None, :],
                                     mb[:, None, :], 0), axis=-1)
        return jnp.where(fb[:, None] > 0, mb, composed), fa | fb

    if nc > 1:
        pmaps, _ = jax.lax.associative_scan(combine, (maps, flags), axis=0)
        prev = jnp.concatenate([jnp.zeros(1, jnp.int32), pmaps[:-1, 0]])
    else:
        prev = jnp.zeros(1, jnp.int32)
    entry = jnp.where(seg_start, 0, prev).astype(jnp.int32)

    counts_sel = jnp.sum(
        jnp.where(entry[None, :] == g_iota[:, None], cnt_map, 0), axis=0)
    g = jnp.cumsum(counts_sel)
    ex = g - counts_sel  # exclusive global cumsum
    out_off = ex - ex[seg_start_idx]  # exclusive cumsum within each block

    if _use_pallas_decode():
        idxs = pallas_decode.phase_b(
            wext, count_t, entry, chunk_bits=chunk_bits, maxl=maxl,
            interpret=False)
    else:
        idxs = pallas_decode.phase_b_scan(
            tiles, count_t, entry, chunk_bits=chunk_bits, maxl=maxl)
    return idxs, out_off, entry


def _seg_scan_chunks(vals, seg_start, op: str, init):
    """Exclusive segmented scan over the (NC,) chunk axis: returns, per
    chunk, the op-combine of all earlier chunks in the same block (init at
    each block's first chunk).  op in {"sum", "max"}."""
    flags = seg_start.astype(jnp.int32)

    if op == "sum":
        def combine(a, bgrp):
            va, fa = a
            vb, fb = bgrp
            return jnp.where(fb > 0, vb, va + vb), fa | fb
    else:
        def combine(a, bgrp):
            va, fa = a
            vb, fb = bgrp
            return jnp.where(fb > 0, vb, jnp.maximum(va, vb)), fa | fb

    inc, _ = jax.lax.associative_scan(combine, (vals, flags), axis=0)
    prev = jnp.concatenate([jnp.full((1,), init, vals.dtype), inc[:-1]])
    return jnp.where(seg_start, jnp.array(init, vals.dtype), prev)


def gap_decode_rle0_flat(words: jax.Array, count_t: jax.Array,
                         seg_start: jax.Array, seg_start_idx: jax.Array,
                         seg_id: jax.Array, sym_tbl: jax.Array,
                         ms: jax.Array, ns: jax.Array,
                         nmax: int, chunk_bits: int,
                         maxl: int = MAX_LEN,
                         place_mode: str | None = None) -> jax.Array:
    """Fused parallel Huffman gap decode + RLE0 inverse over the flat chunk
    axis: (packed payload words of a whole batch) -> (B, nmax) MTF codes.

    Replaces the two chained placements of the split formulation — the
    symbol-placement scatter into a dense (B, nmax) RLE0-symbol plane
    (XLA lowers it as sort+segment, ~58 ms/corpus pass) and rle0_decode's
    literal scatter — with run-length logic computed directly in the
    (steps, NC) emission layout via two-level segmented scans (down each
    chunk column, then a tiny (NC,) segmented scan carrying chunk totals
    across each block), so only the surviving LITERALS are placed, by one
    packed single-array sort + an indices-sorted scatter (or a direct
    scatter when the packed key would not fit 32 bits).

    Reference hot loops replaced: the bit-serial decode
    /root/reference/main.cpp:259-281 and the (absent there) run stage.
    ms: (B+1,) true RLE0 symbol counts; ns: (B+1,) decoded byte lengths.
    Returns ((B, nmax) uint8 MTF codes for the b_real = seg rows (runs are
    the zero fill), (B,) int32 exact decoded totals per block — != ns[b]
    exactly when the payload/rle_len/lens lie about the stream, the
    integrity signal the drain uses to fail closed on corrupt containers).
    """
    idxs, out_off, _ = _decode_phases(words, count_t, seg_start,
                                      seg_start_idx, chunk_bits, maxl)
    b = sym_tbl.shape[0]  # b_pad + 1 (last row backs pad chunks)
    b_real = b - 1
    flat_cap = b_real * nmax

    valid = idxs >= 0
    local = jnp.cumsum(valid.astype(jnp.int32), axis=0) - valid  # exclusive
    within = out_off[None, :] + local        # symbol index within the block
    keep = valid & (within < ms[seg_id][None, :])

    # canonical index -> RLE0 symbol, per chunk's block: compare-select
    # over the 257-entry tables (sym_tbl[seg_id] is an (NC, A) row gather
    # of contiguous 1 KiB rows — cheap, unlike per-element gathers)
    amax = sym_tbl.shape[1] - 1
    ci = jnp.clip(idxs, 0, amax)
    sym_t = sym_tbl[seg_id]                  # (NC, A)
    a_iota = jnp.arange(sym_tbl.shape[1], dtype=jnp.int32)
    s = jnp.sum(jnp.where(ci[:, :, None] == a_iota[None, None, :],
                          sym_t[None, :, :], 0), axis=-1)

    isrun = keep & (s <= 1)
    islit = keep & (s > 1)

    # j = index within the current zero-run group = within - (last literal's
    # within) - 1; two-level segmented cummax in symbol (chunk-major) order
    lit_pos = jnp.where(islit, within, -1)
    cm = jax.lax.cummax(lit_pos, axis=0)
    carry_max = _seg_scan_chunks(cm[-1], seg_start, "max", -1)
    lastlit = jnp.maximum(cm, carry_max[None, :])
    j = within - lastlit - 1

    # decoded-position contribution of each symbol (bijective base 2 for
    # runs, 1 for literals; ops/rle.py rle0_decode semantics).  j is clipped
    # to 22: well-formed zero-run groups never exceed log2(nmax) <= 21
    # symbols, and at 30 a corrupt payload's (1+s) << j wraps int32 negative
    # — the place < ns guard keeps that memory-safe but silently wrong,
    # whereas <= (3 << 22) contributions stay positive and out of range
    contrib = jnp.where(islit, 1,
                        jnp.where(isrun, (1 + s) << jnp.clip(j, 0, 22), 0))
    cs = jnp.cumsum(contrib, axis=0)
    carry_sum = _seg_scan_chunks(cs[-1], seg_start, "sum", 0)
    out_pos = cs - contrib + carry_sum[None, :]  # exclusive, within block

    # exact decoded total per block: at each block's LAST chunk, the carry
    # into the chunk plus the chunk's own contribution sum (one tiny
    # (NC,)-sized scatter; each block has exactly one last chunk).
    #
    # WRAP DEFENSE (int32-only; jnp int64 silently downcasts without
    # jax_enable_x64): a hostile payload can pack enough max-size run
    # contributions that the int32 prefix sum wraps mod 2^32 back onto the
    # expected total.  But each contribution is <= 3*2^22, so crossing any
    # multiple of 2^32 necessarily leaves an intermediate inclusive prefix
    # in [2^31 - 2^24, 2^31) — a large POSITIVE int32 far above any valid
    # block length.  Checking the segmented MAX of the inclusive prefixes
    # against ns therefore catches every wrap; wrapped blocks poison their
    # trailer total to ns+1 so the host check fails closed.
    incl = cs + carry_sum[None, :]
    pc_max = jnp.max(jnp.where(keep, incl, -1), axis=0)        # (NC,)
    carry_max2 = _seg_scan_chunks(pc_max, seg_start, "max", -1)
    blk_max = jnp.maximum(carry_max2, pc_max)
    is_last = jnp.concatenate([seg_start[1:], jnp.ones(1, dtype=seg_start.dtype)])
    ns_c = ns[seg_id]
    chunk_tot = jnp.where(blk_max <= ns_c, carry_sum + cs[-1],
                          jnp.where(ns_c < jnp.int32(2**31 - 1), ns_c + 1, 0))
    totals = jnp.zeros(b, dtype=jnp.int32).at[
        jnp.where(is_last, seg_id, b)].set(chunk_tot, mode="drop")[:b_real]

    place = islit & (out_pos < ns[seg_id][None, :])
    target = jnp.where(place, seg_id[None, :] * nmax + out_pos, flat_cap)
    val = jnp.clip(s - 1, 0, 255)

    if place_mode is None:
        from ..utils import config as config_mod

        place_mode = config_mod.DEFAULT.decode_place
    use_sort = place_mode == "sort" and flat_cap <= (1 << 22)
    out = jnp.zeros(flat_cap + 1, dtype=jnp.int32)
    if use_sort:
        # ONE packed single-array sort (target 23 bits | value 9 bits)
        # compacts the ragged literal lanes into ascending-target order;
        # the follow-up scatter then carries sorted, unique indices —
        # the lowering XLA would otherwise synthesize inside the scatter,
        # done here by the cheaper single-array sort
        key = jnp.where(place, (target.astype(jnp.uint32) << 9)
                        | val.astype(jnp.uint32), jnp.uint32(0xFFFFFFFF))
        srt = jax.lax.sort(key.reshape(-1), is_stable=False)[:flat_cap]
        tgt2 = (srt >> 9).astype(jnp.int32)   # sentinels -> >= flat_cap
        out = out.at[tgt2].set(                # OOB sentinels are dropped
            (srt & jnp.uint32(511)).astype(jnp.int32),
            mode="drop", indices_are_sorted=True)
    else:
        out = out.at[target.reshape(-1)].set(val.reshape(-1), mode="drop")
    return out[:flat_cap].reshape(b_real, nmax).astype(jnp.uint8), totals


def gap_decode_flat(words: jax.Array, count_t: jax.Array,
                    seg_start: jax.Array, seg_start_idx: jax.Array,
                    seg_id: jax.Array, sym_tbl: jax.Array, n: jax.Array,
                    nmax: int, chunk_bits: int,
                    maxl: int = MAX_LEN) -> jax.Array:
    """Parallel canonical Huffman decode over a flattened chunk axis.

    All blocks of a batch contribute their chunks to one flat axis — no
    per-block padding to a common chunk count.  Phase A decodes every
    (gap, chunk) lane; a *segmented* associative scan chains exit gaps
    within each block; phase B re-decodes the winning lane and symbols are
    scattered straight into the (B, nmax) code matrix.  On TPU the Pallas
    kernels unpack bits in VMEM from the packed words (words_ext layout);
    the XLA scan fallback unpacks to bit tiles.

    words:     (NC * chunk_bits/32,) uint32 packed payload words
    count_t:   (32, NC) int32 — each chunk's block's per-length counts
    seg_start: (NC,) bool — True at each block's first chunk
    seg_start_idx: (NC,) int32 — index of own block's first chunk
    seg_id:    (NC,) int32 — block row in [0, B)
    sym_tbl:   (B, 256) int32 canonical-order symbol lists
    n:         (B,) int32 true symbol counts
    Returns (B, nmax) uint8 MTF codes (pad positions zero-filled).
    """
    idxs, out_off, _seg = _decode_phases(words, count_t, seg_start,
                                         seg_start_idx, chunk_bits, maxl)
    b = sym_tbl.shape[0]
    valid = idxs >= 0
    local = jnp.cumsum(valid.astype(jnp.int32), axis=0) - valid  # exclusive
    within = out_off[None, :] + local
    keep = valid & (within < n[seg_id][None, :])
    flat_cap = b * nmax
    target = jnp.where(keep, seg_id[None, :] * nmax + within, flat_cap)

    out = jnp.zeros(flat_cap + 1, dtype=jnp.int32)
    out = out.at[target.reshape(-1)].set(idxs.reshape(-1), mode="drop")
    cidx = out[:flat_cap].reshape(b, nmax)
    # canonical index -> symbol, per block, as a compare-select reduction
    # over the 257-row table (a 4M per-row gather traced at 44 ms; the
    # fused (B, nmax, A) masked sum runs in a few ms) — pad rows resolve to
    # sym_tbl[b][0], masked downstream by n
    amax = sym_tbl.shape[1] - 1
    ci = jnp.clip(cidx, 0, amax)
    a_iota = jnp.arange(sym_tbl.shape[1], dtype=jnp.int32)
    codes = jnp.sum(jnp.where(ci[:, :, None] == a_iota[None, None, :],
                              sym_tbl[:, None, :], 0), axis=-1)
    return codes.astype(jnp.int32)
