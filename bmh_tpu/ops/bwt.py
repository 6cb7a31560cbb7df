"""TPU-native Burrows-Wheeler transform: prefix doubling + permutation doubling.

Replaces the reference's O(N^2 logN) rotation comparator sort
(/root/reference/main.cpp:46-59,77-91) with O(N log^2 N) prefix doubling over
`jax.lax.sort`, and the sequential N-step inverse walk
(/root/reference/main.cpp:61-75) with log N rounds of permutation doubling.
Semantics match the reference exactly, including the cyclic-rotation ordering
and the stable index tie-break for periodic inputs (equal rotations keep
ascending start-index order, which `std::stable_sort` guarantees there).

All functions take fixed-shape padded arrays plus a traced true length `n`
so one compilation serves a whole padded-size bucket; padded positions carry
+inf-like keys and never mix with real data.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INT32_BIG = jnp.int32(2**31 - 1)

# The Pallas bitonic network needs all planes + partner temporaries in VMEM;
# past 2^18 elements it would spill, so larger blocks use XLA's sort.
_PALLAS_SORT_MAX = 1 << 18


def _use_pallas_sort(n: int) -> bool:
    import jax as _jax

    from ..utils import config as config_mod

    if not config_mod.DEFAULT.pallas_sort:
        # XLA's HBM bitonic sort measured ~2x faster than the VMEM network
        # at batched (32, 128K) production shapes on v5e; keep the kernel
        # behind BMH_PALLAS_SORT=1 for small-block experiments.
        return False
    try:
        on_tpu = _jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    # min 1024 = 8 sublanes x 128 lanes: smaller tiles give Mosaic an
    # unaligned vector<Sx128xi32> dynamic_rotate (verified failing at S=2)
    return on_tpu and n <= _PALLAS_SORT_MAX and (n & (n - 1)) == 0 and n >= 1024


def _stable_sort3(key1, key2, payload, stable: bool = True):
    """Lexicographic sort by (key1, key2); returns permuted payload + keys.

    stable=False is sound wherever downstream logic is invariant to the
    within-tie-group order (head-index rank rounds, sparse refinement) —
    XLA's unstable lowering measured ~2x faster at production shapes
    (tools/microbench.py sort2_1key_{un,}stable).

    On TPU with VMEM-sized blocks this runs the Pallas bitonic network
    (pallas_sort.sort3); payload must then be a permutation, which holds for
    every call site (payload is always an iota).
    """
    if _use_pallas_sort(key1.shape[-1]):
        from . import pallas_sort

        return pallas_sort.sort3(key1, key2, payload, interpret=False)
    k1, k2, p = jax.lax.sort((key1, key2, payload), num_keys=2,
                             is_stable=stable)
    return k1, k2, p


# Cursor stride of the checkpointed inverse walk: the forward transform
# records rank[(j*CURSOR_STRIDE) % n] so the inverse can run one independent
# LF-walk cursor per stride instead of the O(N log N) permutation doubling.
# Config-driven (BMH_CURSOR_STRIDE); the container records each file's
# stride so decoders never guess.
from ..utils import config as _config_mod

CURSOR_STRIDE = _config_mod.DEFAULT.cursor_stride


def _init_rank(data: jax.Array, n: jax.Array) -> jax.Array:
    """Initial ranks: the first FOUR bytes of each rotation packed into 32
    bits, sign-bias-mapped into int32 order (v ^ 0x80000000) — two fewer
    doubling rounds than a single-byte init; the first round at h=4 then
    covers 8-byte prefixes directly.  Cyclic next-bytes come from rolls
    (dynamic slices, not gathers — a clip-gather formulation of the same
    read traced at 45 ms).

    Pads share the int32-max sentinel and so tie with each other (and,
    rarely, with a real 0xFFFFFFFF 4-gram — harmless: rank2 separates
    them in the first sort); _round_body masks the tied flag to the real
    region so pad ties never reach the sparse compaction."""
    nmax = data.shape[0]
    pos = jnp.arange(nmax, dtype=jnp.int32)
    real = pos < n

    def cyc(j):
        # data[(p + j) mod n] via rolls (dynamic slices, not gathers):
        # roll -j covers p+j < n, roll n-j one wrap, roll 2n-j the double
        # wrap (reachable only for n < 4; for n == 1 the j == 3 byte is
        # garbage, harmless — a single rotation needs no ordering and the
        # finish path masks rank[0] for n <= 1)
        r1 = jnp.roll(data, -j)
        r2 = jnp.roll(data, n - j)
        r3 = jnp.roll(data, 2 * n - j)
        return jnp.where(pos < n - j, r1,
                         jnp.where(pos < 2 * n - j, r2, r3)).astype(jnp.uint32)

    v = ((data.astype(jnp.uint32) << 24) | (cyc(1) << 16) | (cyc(2) << 8)
         | cyc(3))
    biased = jax.lax.bitcast_convert_type(v ^ jnp.uint32(0x80000000),
                                          jnp.int32)
    return jnp.where(real, biased, INT32_BIG)


def _round_body(state, n, nmax):
    """One prefix-doubling round.

    Ranks use the *head-index* convention from the first round on: rank[i] =
    sorted position of the first member of i's tie group.  Unlike dense
    cumsum ranks, head-index ranks of resolved positions never change again,
    which is what lets `sparse_refine` later update only tied positions.
    Also carries a per-position `tied` mask (is i in a group of size > 1)
    so the caller can compact unresolved positions without extra passes.
    """
    rank, _, h, _ = state
    pos = jnp.arange(nmax, dtype=jnp.int32)
    real = pos < n
    # rank2[i] = rank[(i + h) mod n] for the real region.  Two notes:
    # *  `%` by a traced divisor lowers to a ~35ms software sequence per
    #    786K elements on TPU; h mod n is one scalar division instead.
    # *  a cyclic shift is two dynamic slices (jnp.roll), not a random
    #    gather: roll(rank, -h) covers i < n-h, roll(rank, n-h) covers the
    #    wrapped tail i in [n-h, n) — both read within the real region.
    h_mod = h % jnp.maximum(n, 1)
    lo = jnp.roll(rank, -h_mod)            # rank[i + h]        (i < n - h)
    hi = jnp.roll(rank, n - h_mod)         # rank[i + h - n]    (i >= n - h)
    rank2 = jnp.where(pos < n - h_mod, lo, hi)
    rank2 = jnp.where(real, rank2, INT32_BIG)
    # head-index ranks and the tied mask depend only on key equality, never
    # on the within-tie-group payload order -> unstable sort is sound
    k1, k2, order = _stable_sort3(rank, rank2, pos, stable=False)
    changed = jnp.concatenate([
        jnp.zeros(1, dtype=jnp.bool_),
        (k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1]),
    ])
    # head-index rank: sorted index of the tie group's first member
    new_rank_sorted = jax.lax.cummax(jnp.where(changed, pos, 0))
    eq_prev = jnp.logical_not(changed) & (pos > 0)
    tied_sorted = eq_prev | jnp.concatenate([eq_prev[1:], jnp.zeros(1, jnp.bool_)])
    # pads share the init sentinel rank and tie with each other; only REAL
    # positions may enter the sparse compaction
    tied_sorted = tied_sorted & (order < n)
    # inverse-permute back to position order by *sorting* on the (unique)
    # position payload: a second sort is ~2x cheaper than the 4M-element
    # random scatter it replaces (traced: 20.5 ms/round scatter fusion vs
    # 5.6+3.8 ms for the round's sort pair).  rank and tied share one
    # packed payload (rank < nmax <= 2^21 always) so the sort moves two
    # arrays, not three.
    _, packed = jax.lax.sort(
        (order, (new_rank_sorted << 1) | tied_sorted.astype(jnp.int32)),
        num_keys=1, is_stable=False)  # keys are a permutation: no ties
    new_rank = packed >> 1
    tied = packed & 1
    n_distinct = jnp.sum(jnp.where(real, changed, False).astype(jnp.int32))
    done = n_distinct >= n - 1
    return new_rank, tied, h * 2, done


def bwt_rounds(data: jax.Array, n: jax.Array, h_stop: int | None = None):
    """Prefix-doubling rounds until ranks are distinct (or h >= h_stop).

    Returns (rank (Nmax,) int32 head-index ranks, tied (Nmax,) int32 mask of
    positions in tie groups of size > 1, h int32 next gap, done bool).
    With h_stop=None this runs to full convergence (or h >= Nmax).
    """
    nmax = data.shape[0]
    rank = _init_rank(data, n)
    h_cap = nmax if h_stop is None else min(h_stop, nmax)

    def cond(state):
        _, _, h, done = state
        return jnp.logical_and(h < h_cap, jnp.logical_not(done))

    # initial done: n <= 1 means ranks are trivially distinct already (also
    # keeps the carry's mesh-varying type stable under shard_map); h starts
    # at 4 because the initial ranks already order 4-byte prefixes — one
    # fewer executed round than the 2-byte init for the same h_stop
    state = (rank, jnp.zeros(nmax, jnp.int32), jnp.int32(4), n <= 1)
    return jax.lax.while_loop(cond, lambda s: _round_body(s, n, nmax), state)


def round_step(rank: jax.Array, tied: jax.Array, h: jax.Array,
               n: jax.Array):
    """Exactly ONE prefix-doubling round from (rank, tied) at gap h.

    The adaptive-handoff continuation (models/pipeline._compress_core) runs
    these one at a time at the batch level while the batch's tie total
    still exceeds the sparse compact capacity — full-array sort rounds are
    ~9 ms each, an order cheaper than capacity-sized compact refinement at
    high tie counts (measured: a 4x-capacity compact tier cost ~2x a full
    resume on text batches).  Returns (rank, tied, 2h, done)."""
    nmax = rank.shape[0]
    return _round_body((rank, tied, h, jnp.bool_(False)), n, nmax)


def bwt_rounds_resume(rank: jax.Array, tied: jax.Array, h: jax.Array,
                      done: jax.Array, n: jax.Array,
                      h_stop: int | None = None):
    """Continue full doubling rounds from a (rank, tied, h, done) state."""
    nmax = rank.shape[0]
    h_cap = nmax if h_stop is None else min(h_stop, nmax)

    def cond(state):
        _, _, hh, dd = state
        return jnp.logical_and(hh < h_cap, jnp.logical_not(dd))

    return jax.lax.while_loop(cond, lambda s: _round_body(s, n, nmax),
                              (rank, tied, h, done))


def sparse_refine(rank: jax.Array, blk: jax.Array, pos: jax.Array,
                  hm0: jax.Array, ns: jax.Array, h0: jax.Array,
                  tier1_rounds: int = 2, tier2_div: int = 4) -> jax.Array:
    """Finish prefix doubling by refining only the tied positions.

    After a few full rounds, text blocks leave ~1-5% of positions in tie
    groups (measured per ARCHITECTURE.md); a tie group at gap 2h consists
    only of positions tied at gap h, so later rounds need only sort the
    compacted tied set — O(M log M) per round instead of O(N log N).  The
    host compacts (block, position) pairs across the whole batch into one
    padded (M,) set; this refines ranks in place until all compact
    subgroups are singletons (or the gap exceeds the padded block size,
    the periodic-block case).

    rank: (B, Nmax) int32 head-index ranks (see _round_body) — the head
          convention is what makes in-place group refinement sound: the
          head rank r1 of a group IS the group's first global sorted index,
          so refined ranks are r1 + (subgroup offset within the group).
    blk/pos: (M,) int32 compact entries; pads carry blk == B.
    hm0:  (M,) int32 = h0 mod ns[blk], computed host-side (a vector `%` by
          a traced divisor is a ~35ms software sequence on TPU; the loop
          then maintains it with one conditional subtract per round).
    ns:   (B,) int32 true block lengths.  h0: scalar int32 starting gap.
    Returns the refined (B, Nmax) rank array.
    """
    b, nmax = rank.shape
    m = blk.shape[0]
    midx = jnp.arange(m, dtype=jnp.int32)
    valid = blk < b
    nb = ns[jnp.clip(blk, 0, b - 1)]
    flat_pos = jnp.clip(blk, 0, b - 1) * nmax + pos
    pad_key = jnp.int32(b * nmax) + midx  # distinct, sorts last

    # Ranks stay COMPACT through the loop: resolved positions' ranks never
    # change, so the full (B*Nmax) plane is read-only inside the loop and
    # a COMBINED routing plane — the rank itself for resolved positions,
    # the compact index with bit 30 set for tied ones (ranks < 2^23) —
    # serves rank[p2] reads with ONE M-gather per iteration instead of a
    # compact-index gather plus a rank-plane gather (each ~4.3 ms/iter at
    # M=256K, TRACE_r04 fusion.379).
    rank_flat = rank.reshape(-1)
    safe_pos = jnp.where(valid, flat_pos, 0)
    comb = jnp.concatenate([rank_flat, jnp.zeros(1, jnp.int32)])
    comb = comb.at[jnp.where(valid, flat_pos, b * nmax)].set(
        jnp.int32(1 << 30) | midx, mode="drop")[: b * nmax]
    rc0 = rank_flat[safe_pos]  # compact working ranks

    tag = jnp.int32(1 << 30)
    cmask = jnp.int32((1 << 30) - 1)

    def body(state):
        """One refinement round over the full compact set; also emits a
        per-entry still-tied flag (rides the inverse scatter packed into
        the rank's low bit — ranks < 2^23)."""
        rc, _, hm, h, _ = state
        p2 = pos + hm
        p2 = jnp.where(p2 >= nb, p2 - nb, p2)
        f2 = jnp.clip(blk, 0, b - 1) * nmax + p2
        g2 = comb[f2]
        r2 = jnp.where(g2 >= tag, rc[jnp.clip(g2 & cmask, 0, m - 1)], g2)
        k1 = jnp.where(valid, blk * nmax + rc, pad_key)
        k2 = jnp.where(valid, r2, 0)
        # head1/head12 read only key-equality group boundaries -> unstable
        sk1, sk2, sidx = _stable_sort3(k1, k2, midx, stable=False)
        ch1 = jnp.concatenate([jnp.zeros(1, jnp.bool_), sk1[1:] != sk1[:-1]])
        ch12 = ch1 | jnp.concatenate([jnp.zeros(1, jnp.bool_), sk2[1:] != sk2[:-1]])
        head1 = jax.lax.cummax(jnp.where(ch1, midx, 0))
        head12 = jax.lax.cummax(jnp.where(ch12, midx, 0))
        blk_s = blk[sidx]
        r1_s = sk1 - blk_s * nmax
        new_rank_s = r1_s + (head12 - head1)
        eq12 = jnp.logical_not(ch12) & (midx > 0)
        tied_s = eq12 | jnp.concatenate([eq12[1:], jnp.zeros(1, jnp.bool_)])
        packed = jnp.zeros(m, jnp.int32).at[sidx].set(
            (new_rank_s << 1) | tied_s.astype(jnp.int32))
        done = jnp.all(ch12 | (midx == 0))
        hm2 = hm * 2
        hm = jnp.where(hm2 >= nb, hm2 - nb, hm2)
        return packed >> 1, packed & 1, hm, h * 2, done

    def cond(state):
        _, _, _, h, done = state
        return jnp.logical_and(h < nmax, jnp.logical_not(done))

    state0 = (rc0, jnp.ones(m, jnp.int32), hm0, h0, jnp.bool_(False))
    m2 = min(max(m // tier2_div, 4096), m)
    if m2 >= m:
        rc, _, _, _, _ = jax.lax.while_loop(cond, body, state0)
    else:
        # TIER 1: `tier1_rounds` rounds at full capacity (the tied set
        # roughly halves per round on text), then re-compact the survivors
        # into a 1/tier2_div-capacity TIER 2 — per-round cost is
        # capacity-sized (static shapes), so the tail rounds run cheaper.
        # Overflow falls back to full-capacity rounds (correct, slower).
        t1_mult = 1 << tier1_rounds

        def cond1(state):
            _, _, _, h, done = state
            return jnp.logical_and(h < h0 * t1_mult, jnp.logical_not(done))

        state1 = jax.lax.while_loop(cond1, body, state0)
        rc1, tied1, hm1, h1, done1 = state1
        tied_cnt = jnp.sum(tied1)
        big = jnp.int32(1 << 30)
        midx2 = jnp.arange(m2, dtype=jnp.int32)
        pad_key2 = jnp.int32(b * nmax) + midx2

        def tier2(args):
            rc, tied, hm, h, done = args
            key = jnp.where(tied > 0, midx, big)
            sk, blk2, pos2, hm2c, oidx = jax.lax.sort(
                (key, blk, pos, hm, midx), num_keys=1, is_stable=False)
            inval = sk[:m2] >= big
            blk2 = jnp.where(inval, b, blk2[:m2])
            pos2 = pos2[:m2]
            hm2c = hm2c[:m2]
            oidx = jnp.where(inval, m, oidx[:m2])  # pads scatter out of bounds
            nb2 = ns[jnp.clip(blk2, 0, b - 1)]

            def body2(state):
                rc, hmc, h, _ = state
                p2 = pos2 + hmc
                p2 = jnp.where(p2 >= nb2, p2 - nb2, p2)
                f2 = jnp.clip(blk2, 0, b - 1) * nmax + p2
                g2 = comb[f2]
                r2 = jnp.where(g2 >= tag,
                               rc[jnp.clip(g2 & cmask, 0, m - 1)], g2)
                rself = rc[jnp.clip(oidx, 0, m - 1)]
                k1 = jnp.where(blk2 < b, blk2 * nmax + rself, pad_key2)
                k2 = jnp.where(blk2 < b, r2, 0)
                sk1, sk2, sidx = _stable_sort3(k1, k2, midx2, stable=False)
                ch1 = jnp.concatenate([jnp.zeros(1, jnp.bool_),
                                       sk1[1:] != sk1[:-1]])
                ch12 = ch1 | jnp.concatenate([jnp.zeros(1, jnp.bool_),
                                              sk2[1:] != sk2[:-1]])
                head1 = jax.lax.cummax(jnp.where(ch1, midx2, 0))
                head12 = jax.lax.cummax(jnp.where(ch12, midx2, 0))
                r1_s = sk1 - blk2[sidx] * nmax
                new_rank_s = r1_s + (head12 - head1)
                rc = rc.at[oidx[sidx]].set(new_rank_s, mode="drop")
                done = jnp.all(ch12 | (midx2 == 0))
                hm2x = hmc * 2
                hmc = jnp.where(hm2x >= nb2, hm2x - nb2, hm2x)
                return rc, hmc, h * 2, done

            def cond2(state):
                _, _, h, done = state
                return jnp.logical_and(h < nmax, jnp.logical_not(done))

            rc, _, _, _ = jax.lax.while_loop(
                cond2, body2, (rc, hm2c, h, done))
            return rc

        def full_tail(args):
            rc, tied, hm, h, done = args
            rc, _, _, _, _ = jax.lax.while_loop(
                cond, body, (rc, tied, hm, h, done))
            return rc

        rc = jax.lax.cond(tied_cnt <= m2, tier2, full_tail, state1)
    target = jnp.where(valid, flat_pos, b * nmax)
    rank_flat = rank_flat.at[target].set(rc, mode="drop")
    return rank_flat.reshape(b, nmax)


def _bwt_ranks(data: jax.Array, n: jax.Array):
    """Shared prefix-doubling core: returns (rank, order, real mask, pos)."""
    nmax = data.shape[0]
    pos = jnp.arange(nmax, dtype=jnp.int32)
    real = pos < n
    rank, _, _, _ = bwt_rounds(data, n)
    # final order: by rank, ties by index (stable) — equal full rotations
    _, order = jax.lax.sort((rank, pos), num_keys=1, is_stable=True)
    return rank, order, real, pos


def bwt_forward(data: jax.Array, n: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Cyclic-rotation BWT.

    Args:
      data: (Nmax,) uint8, first `n` entries valid.
      n:    scalar int32 true length (>= 1).

    Returns:
      (last_col (Nmax,) uint8 — first n valid, zeros after;
       shift int32 — sorted position of rotation 0, the reference's
       `shift_position` (main.cpp:85-89)).
    """
    nmax = data.shape[0]
    rank, order, real, pos = _bwt_ranks(data, n)
    prev_idx = jnp.where(order == 0, n - 1, order - 1)
    last = jnp.where(real, data[jnp.clip(prev_idx, 0, nmax - 1)], 0).astype(jnp.uint8)
    shift = jnp.sum(jnp.where(order == 0, pos, 0)).astype(jnp.int32)
    return last, shift


def bwt_forward_cp(data: jax.Array, n: jax.Array) -> tuple[jax.Array, jax.Array,
                                                           jax.Array, jax.Array]:
    """BWT forward that additionally samples inverse-walk checkpoints.

    For aperiodic inputs (all rotations distinct) the decode-side LF walk
    satisfies orbit[t] = rank[(t+1) mod n], so sampling rank at the fixed
    stride positions j*CURSOR_STRIDE gives the inverse transform one cursor
    start per stride — no permutation doubling at decode.  Periodic inputs
    (rank not a bijection — e.g. an exactly repeated word filling the whole
    block) break the identity; they are flagged and the caller falls back.

    Returns (last, shift, cps (Nmax//CURSOR_STRIDE or 1,) int32, aperiodic
    bool).  cps[j] = rank[((j+1)*CURSOR_STRIDE) % n]; entries past
    ceil(n/CURSOR_STRIDE)-1 are don't-care.
    """
    rank, _, _, _ = bwt_rounds(data, n)
    return bwt_finish_cp(data, n, rank)


def bwt_finish_cp(data: jax.Array, n: jax.Array, rank: jax.Array):
    """bwt_forward_cp tail for precomputed final ranks (the sparse-doubling
    pipeline runs bwt_rounds / sparse_refine separately, then this).

    Gather-free: the previous byte of every rotation rides through the
    final sort as its payload (so the last column needs no 4M random
    gather — traced 45 ms), the sorted keys themselves serve the
    aperiodicity test (another 43 ms gather gone), and the shift is just
    rank[0] — with head-index ranks and the stable (rank, pos) order,
    rotation 0 (pos 0) is the first member of its tie group, whose head
    index IS its sorted position."""
    nmax = data.shape[0]
    k = max(nmax // CURSOR_STRIDE, 1)
    pos = jnp.arange(nmax, dtype=jnp.int32)
    real = pos < n
    # prev[i] = data[(i-1) mod n] — a roll plus one scalar fix-up
    prev = jnp.roll(data, 1).at[0].set(data[jnp.clip(n - 1, 0, nmax - 1)])
    # force pad ranks out of the real range before the final sort: with the
    # 4-byte packed init, pads share the int32-max sentinel and a real
    # 0xFFFFFFFF 4-gram can drag the pad tie group to a REAL-range head
    # index that sparse refinement never re-assigns (pads are masked out of
    # the compact set) — unmasked, such pads would interleave with real
    # rows in the final order and corrupt the last column
    rank = jnp.where(real, rank, INT32_BIG)
    rank_sorted, _, last_sorted = _stable_sort3(rank, pos, prev.astype(jnp.int32))
    last = jnp.where(real, last_sorted, 0).astype(jnp.uint8)
    # n <= 1 blocks skip the rounds loop entirely, so their rank is still
    # the raw 4-byte biased init (not head-index); their shift is trivially 0
    shift = jnp.where(n <= 1, 0, rank[0]).astype(jnp.int32)

    # aperiodic <=> real ranks are pairwise distinct <=> sorted real ranks
    # strictly increase (pads hold distinct ranks in [n, nmax) and sort last)
    adj_equal = (rank_sorted[1:] == rank_sorted[:-1]) & (pos[1:] < n)
    aperiodic = jnp.logical_not(jnp.any(adj_equal))

    j = (jnp.arange(k, dtype=jnp.int32) + 1) * CURSOR_STRIDE
    jmod = j % jnp.maximum(n, 1)
    cps = rank[jnp.clip(jmod, 0, nmax - 1)].astype(jnp.int32)
    return last, shift, cps, aperiodic


_LF_MASK = jnp.uint32((1 << 23) - 1)


def _lf_map_packed(last: jax.Array, n: jax.Array) -> jax.Array:
    """LF mapping (the reference's l_shift, main.cpp:65-67) as ONE packed
    single-array sort: key = (byte | 256-for-pads) << 23 | position.  The
    position payload rides in the key's low bits (Nmax <= 2^23 always —
    blocks cap at 2 MiB), so the sort moves one uint32 array instead of a
    (key, payload) pair and ties need no stability flag — keys are distinct
    and position order within equal bytes is the stable order by
    construction.

    The packed form doubles as the walk table: entry r is
    (last[l_shift[r]] << 23) | l_shift[r], so one gather per LF step yields
    both the next row AND the byte that step emits — the separate 4M
    random output gather (traced 45 ms) disappears."""
    nmax = last.shape[0]
    assert nmax <= (1 << 23), "packed LF sort needs Nmax <= 2^23"
    pos = jnp.arange(nmax, dtype=jnp.uint32)
    key = jnp.where(pos < n.astype(jnp.uint32), last.astype(jnp.uint32),
                    jnp.uint32(256))
    # keys carry the position in their low bits: all distinct -> unstable
    return jax.lax.sort((key << 23) | pos, is_stable=False)


def _lf_map(last: jax.Array, n: jax.Array) -> jax.Array:
    return (_lf_map_packed(last, n) & _LF_MASK).astype(jnp.int32)


def _compose_packed(tbl: jax.Array) -> jax.Array:
    """g[r] = tbl[next[r]] (next = tbl's low-23-bit row field) by TWO
    unstable sorts instead of an Nmax-element random gather.

    The walk table's row links are a permutation (pads are fixed points),
    so composition is permutation application: sorting (next, iota) puts
    next⁻¹[p] at position p, and sorting (next⁻¹, tbl) puts tbl[next[r]]
    at position r.  Two 64K sorts cost ~1/8th of the equivalent random
    gather at the TPU's ~10 ns/element gather roofline — this is what makes
    the LF² walk a net win (composing via `tbl[next]` would spend the same
    gather traffic the halved walk saves)."""
    nmax = tbl.shape[0]
    pos = jnp.arange(nmax, dtype=jnp.int32)
    nxt = (tbl & _LF_MASK).astype(jnp.int32)
    _, inv = jax.lax.sort((nxt, pos), num_keys=1, is_stable=False)
    _, g = jax.lax.sort((inv, tbl), num_keys=1, is_stable=False)
    return g


def bwt_inverse_cursors(last: jax.Array, shift: jax.Array, cps: jax.Array,
                        n: jax.Array, stride: int | None = None) -> jax.Array:
    """Inverse BWT via checkpointed parallel LF-walk cursors.

    Cursor j reproduces output positions [j*CURSOR_STRIDE, (j+1)*CURSOR_STRIDE):
    it starts from rank[(j*CURSOR_STRIDE) % n] (cursor 0 from `shift`) and
    follows the LF map CURSOR_STRIDE times.  Replaces the reference's single
    sequential N-step walk (main.cpp:70-73) with Nmax/CURSOR_STRIDE
    independent lanes of a CURSOR_STRIDE-step scan — and unlike permutation
    doubling it performs only O(N) total gather work.

    For blocks of <= 64 KiB (BMH_LF2, default on) the walk runs over the
    SELF-COMPOSED map: entry r packs (byte[r] << 24) | (byte[next r] << 16)
    | next²[r] into one uint32 (two emitted bytes + a 16-bit row — exactly
    why 2^16 is the envelope), so the dependent gather chain — the
    random-gather-roofline cost that dominates decompress — is half as
    long for the same output.  The composition itself is two sorts, not a
    gather (`_compose_packed`).
    """
    nmax = last.shape[0]
    stride = CURSOR_STRIDE if stride is None else stride
    k = max(nmax // stride, 1)
    assert nmax % k == 0, "Nmax must be a power of two"
    steps = nmax // k  # = stride, or Nmax itself when Nmax < stride
    pos = jnp.arange(nmax, dtype=jnp.int32)
    real = pos < n
    packed = _lf_map_packed(last, n)  # (byte << 23) | next-row, per row

    starts = jnp.concatenate([shift[None].astype(jnp.int32), cps[: k - 1]])
    starts = jnp.clip(starts, 0, nmax - 1)

    if nmax <= (1 << 16) and steps % 2 == 0 and _config_mod.DEFAULT.lf2:
        g = _compose_packed(packed)
        # (byte0 | byte1 | next²): real rows' bytes are < 256 and their rows
        # < n <= 2^16; pad rows (byte 256, masked to 8 bits here) are never
        # reached by a real cursor
        t2 = ((((packed >> 23) & 0xFF) << 24) | (((g >> 23) & 0xFF) << 16)
              | (g & jnp.uint32(0xFFFF)))

        def step2(rows, _):
            gg = t2[rows]
            return (gg & 0xFFFF).astype(jnp.int32), gg >> 16

        _, em = jax.lax.scan(step2, starts, None, length=steps // 2)
        # em[t, j] = byte0 << 8 | byte1 for output positions j*steps + 2t(+1)
        pair = jnp.stack([(em >> 8) & 0xFF, em & 0xFF], axis=-1)
        bytes_flat = jnp.transpose(pair, (1, 0, 2)).reshape(nmax)
        return jnp.where(real, bytes_flat, 0).astype(jnp.uint8)

    def step(rows, _):
        g = packed[rows]
        return (g & _LF_MASK).astype(jnp.int32), g >> 23

    _, emitted = jax.lax.scan(step, starts, None, length=steps)  # (steps, k)
    bytes_flat = emitted.T.reshape(nmax)  # cursor-major == output order
    out = jnp.where(real, bytes_flat, 0).astype(jnp.uint8)
    return out


def bwt_inverse(last: jax.Array, shift: jax.Array, n: jax.Array) -> jax.Array:
    """Inverse BWT via LF mapping + permutation doubling.

    l_shift = indices stable-sorted by BWT value (main.cpp:65-67); the output
    is bwt[l_shift^(i+1)(shift)] (main.cpp:70-73), computed here in
    ceil(log2 Nmax) doubling rounds instead of an N-step sequential walk.
    """
    nmax = last.shape[0]
    pos = jnp.arange(nmax, dtype=jnp.int32)
    real = pos < n
    # l_shift[r] = original index of r-th smallest; maps real ranks -> real idx
    p_m = _lf_map(last, n)
    orbit = jnp.zeros(nmax, dtype=jnp.int32)
    orbit = orbit.at[0].set(p_m[jnp.clip(shift, 0, nmax - 1)])

    # Unrolled doubling with static per-round sizes: the orbit-update gather
    # at round k reads only 2^k elements (total ~= nmax over all rounds, vs
    # nmax per round for the dynamic-m formulation), and the final
    # composition is skipped.  Gathers dominate iBWT on TPU (~10ns/elem), so
    # this halves its cost.
    m = 1
    while m < nmax:
        upd = p_m[jax.lax.slice_in_dim(orbit, 0, m)]  # (m,) gather
        orbit = jax.lax.dynamic_update_slice_in_dim(orbit, upd, m, axis=0)
        m *= 2
        if m < nmax:
            p_m = p_m[p_m]  # full composition, needed for the next round only

    out = jnp.where(real, last[orbit], 0).astype(jnp.uint8)
    return out
