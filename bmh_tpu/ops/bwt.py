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

import math

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


def _stable_sort3(key1, key2, payload):
    """Stable lexicographic sort by (key1, key2); returns permuted payload + keys.

    On TPU with VMEM-sized blocks this runs the Pallas bitonic network
    (pallas_sort.sort3); payload must then be a permutation, which holds for
    every call site (payload is always an iota).
    """
    if _use_pallas_sort(key1.shape[-1]):
        from . import pallas_sort

        return pallas_sort.sort3(key1, key2, payload, interpret=False)
    k1, k2, p = jax.lax.sort((key1, key2, payload), num_keys=2, is_stable=True)
    return k1, k2, p


# Cursor stride of the checkpointed inverse walk: the forward transform
# records rank[(j*CURSOR_STRIDE) % n] so the inverse can run one independent
# LF-walk cursor per stride instead of the O(N log N) permutation doubling.
CURSOR_STRIDE = 4096


def _bwt_ranks(data: jax.Array, n: jax.Array):
    """Shared prefix-doubling core: returns (rank, order, real mask, pos)."""
    nmax = data.shape[0]
    pos = jnp.arange(nmax, dtype=jnp.int32)
    real = pos < n
    # initial ranks: the first TWO bytes of each rotation packed into 16 bits
    # (one fewer doubling round than single-byte init); pads get huge
    # distinct ranks so they sort last
    nxt1 = jnp.where(pos + 1 >= n, pos + 1 - n, pos + 1)
    pair = data.astype(jnp.int32) * 256 + data[jnp.clip(nxt1, 0, nmax - 1)].astype(jnp.int32)
    rank = jnp.where(real, pair, 65536 + pos)

    def round_body(state):
        rank, h, _ = state
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
        k1, k2, order = _stable_sort3(rank, rank2, pos)
        changed = jnp.concatenate([
            jnp.zeros(1, dtype=jnp.int32),
            ((k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1])).astype(jnp.int32),
        ])
        new_rank_sorted = jnp.cumsum(changed)
        # inverse-permute rank back to position order by *sorting* on the
        # (unique) position payload: a second sort is ~2x cheaper than the
        # 4M-element random scatter it replaces (traced: 20.5 ms/round
        # scatter fusion vs 5.6+3.8 ms for the round's sort pair).
        _, new_rank = jax.lax.sort((order, new_rank_sorted), num_keys=1)
        n_real_ranks = new_rank_sorted[jnp.maximum(n - 1, 0)]  # rank of last real element
        done = n_real_ranks >= n - 1
        return new_rank, h * 2, done

    def cond(state):
        _, h, done = state
        return jnp.logical_and(h < nmax, jnp.logical_not(done))

    # initial done: n <= 1 means ranks are trivially distinct already (also
    # keeps the carry's mesh-varying type stable under shard_map); h starts
    # at 2 because the initial ranks already order 2-byte prefixes
    rank, _, _ = jax.lax.while_loop(cond, round_body, (rank, jnp.int32(2), n <= 1))

    # final order: by rank, ties by index (stable) — equal full rotations
    _, _, order = _stable_sort3(rank, pos, pos)
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
    nmax = data.shape[0]
    k = max(nmax // CURSOR_STRIDE, 1)
    rank, order, real, pos = _bwt_ranks(data, n)
    prev_idx = jnp.where(order == 0, n - 1, order - 1)
    last = jnp.where(real, data[jnp.clip(prev_idx, 0, nmax - 1)], 0).astype(jnp.uint8)
    shift = jnp.sum(jnp.where(order == 0, pos, 0)).astype(jnp.int32)

    # aperiodic <=> real ranks are pairwise distinct <=> sorted real ranks
    # strictly increase (order holds positions sorted by (rank, pos))
    rank_sorted = rank[order]
    adj_equal = (rank_sorted[1:] == rank_sorted[:-1]) & (pos[1:] < n)
    aperiodic = jnp.logical_not(jnp.any(adj_equal))

    j = (jnp.arange(k, dtype=jnp.int32) + 1) * CURSOR_STRIDE
    jmod = j % jnp.maximum(n, 1)
    cps = rank[jnp.clip(jmod, 0, nmax - 1)].astype(jnp.int32)
    return last, shift, cps, aperiodic


def bwt_inverse_cursors(last: jax.Array, shift: jax.Array, cps: jax.Array,
                        n: jax.Array) -> jax.Array:
    """Inverse BWT via checkpointed parallel LF-walk cursors.

    Cursor j reproduces output positions [j*CURSOR_STRIDE, (j+1)*CURSOR_STRIDE):
    it starts from rank[(j*CURSOR_STRIDE) % n] (cursor 0 from `shift`) and
    follows the LF map CURSOR_STRIDE times.  Replaces the reference's single
    sequential N-step walk (main.cpp:70-73) with Nmax/CURSOR_STRIDE
    independent lanes of a CURSOR_STRIDE-step scan — and unlike permutation
    doubling it performs only O(N) total gather work.
    """
    nmax = last.shape[0]
    k = max(nmax // CURSOR_STRIDE, 1)
    assert nmax % k == 0, "Nmax must be a power of two"
    steps = nmax // k  # = CURSOR_STRIDE, or Nmax itself when Nmax < stride
    pos = jnp.arange(nmax, dtype=jnp.int32)
    real = pos < n
    key = jnp.where(real, last.astype(jnp.int32), INT32_BIG)
    _, _, l_shift = _stable_sort3(key, pos, pos)
    p = jnp.clip(l_shift, 0, nmax - 1)

    starts = jnp.concatenate([shift[None].astype(jnp.int32), cps[: k - 1]])
    starts = jnp.clip(starts, 0, nmax - 1)

    def step(rows, _):
        nxt = p[rows]
        return nxt, nxt

    _, orbit = jax.lax.scan(step, starts, None, length=steps)  # (steps, k)
    orbit_flat = orbit.T.reshape(nmax)  # cursor-major == output order
    out = jnp.where(real, last[orbit_flat], 0).astype(jnp.uint8)
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
    key = jnp.where(real, last.astype(jnp.int32), INT32_BIG)
    _, _, l_shift = _stable_sort3(key, pos, pos)
    # l_shift[r] = original index of r-th smallest; maps real ranks -> real idx

    p_m = jnp.clip(l_shift, 0, nmax - 1)
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
