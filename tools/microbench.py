"""TPU microbenchmarks for the hot primitive choices.

Times competing formulations of the two hottest primitives at the production
batch shape so kernel-routing decisions are measured, not guessed:

* encode bitpack: segment-sum scatter-add vs cumsum+searchsorted variants
* the doubling-round sort: 3-array 2-key vs packed 2-array 1-key vs a
  single packed array, plus the LF-map packed 1-array sort

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/microbench.py
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    # block_until_ready is a no-op through the axon tunnel; a device_get of
    # one result leaf is the only reliable completion barrier
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf))


def _reduce(out):
    """Strided sum so timed fns return ~a scalar: full compute is kept (a
    strided sample of every output element group cannot be simplified away)
    but the tunnel transfers 4 bytes instead of the 16 MB result."""
    leaves = jax.tree_util.tree_leaves(out)
    return sum(jnp.sum(l.reshape(-1)[:: 1001].astype(jnp.float32)) for l in leaves)


BASELINE = [0.0]


def timeit(fn, *args, reps=5, label=""):
    import sys
    print(f"# compiling {label}", file=sys.stderr, flush=True)
    g = jax.jit(lambda *a: _reduce(fn(*a)))
    out = g(*args)
    _sync(out)  # compile + warm
    print(f"# running {label}", file=sys.stderr, flush=True)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _sync(g(*args))
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - BASELINE[0], 0.0)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from bmh_tpu.ops import huffman as H

    res = {"platform": jax.devices()[0].platform}
    B, nmax = 32, 131072
    # per-dispatch tunnel latency baseline (trivial program, synced)
    null_in = jnp.zeros(8, jnp.int32)
    nullf = jax.jit(lambda x: x + 1)
    _sync(nullf(null_in))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        _sync(nullf(null_in))
        ts.append(time.perf_counter() - t0)
    BASELINE[0] = min(ts)
    res["null_dispatch"] = BASELINE[0]
    rng = np.random.default_rng(0)

    # --- bitpack variants ---------------------------------------------------
    syms = rng.integers(0, 257, (B, nmax)).astype(np.int32)
    ns = np.full(B, nmax - 7, np.int32)
    lens = np.zeros((B, 257), np.int32)
    lens[:, :] = rng.integers(2, 18, (B, 257))
    codes = np.zeros((B, 257), np.uint32)
    for b in range(B):
        codes[b] = H.canonical_code_table(
            H.code_lengths_from_hist(rng.integers(1, 1000, 257)))
        lens[b] = H.code_lengths_from_hist(rng.integers(1, 1000, 257))
    a_syms, a_ns = jnp.asarray(syms), jnp.asarray(ns)
    a_lens, a_codes = jnp.asarray(lens), jnp.asarray(codes)

    def bitpack_segsum(data, n, len_tbl, code_tbl):
        nmax = data.shape[0]
        w_out = H.words_cap(nmax)
        pos = jnp.arange(nmax, dtype=jnp.int32)
        sym = data.astype(jnp.int32)
        ln = jnp.where(pos < n, len_tbl[sym], 0)
        code = jnp.where(pos < n, code_tbl[sym], jnp.uint32(0))
        offs = jnp.cumsum(ln) - ln
        total_bits = jnp.sum(ln).astype(jnp.int32)
        r = (offs & 31).astype(jnp.uint32)
        rr = r + ln.astype(jnp.uint32)
        word = (offs >> 5).astype(jnp.int32)
        sh_hi1 = jnp.clip(32 - rr.astype(jnp.int32), 0, 31).astype(jnp.uint32)
        hi1 = code << sh_hi1
        sh_hi2 = jnp.clip(rr.astype(jnp.int32) - 32, 0, 31).astype(jnp.uint32)
        hi2 = code >> sh_hi2
        spill_bits = jnp.clip(rr.astype(jnp.int32) - 32, 0, 31)
        lo_mask = (jnp.uint32(1) << spill_bits.astype(jnp.uint32)) - jnp.uint32(1)
        sh_lo = jnp.clip(64 - rr.astype(jnp.int32), 0, 31).astype(jnp.uint32)
        lo2 = (code & lo_mask) << sh_lo
        straddles = rr > 32
        hi = jnp.where(ln > 0, jnp.where(straddles, hi2, hi1), jnp.uint32(0))
        lo = jnp.where(ln > 0, jnp.where(straddles, lo2, jnp.uint32(0)), jnp.uint32(0))
        seg_hi = jax.ops.segment_sum(hi, word, num_segments=w_out,
                                     indices_are_sorted=True)
        seg_lo = jax.ops.segment_sum(lo, word + 1, num_segments=w_out,
                                     indices_are_sorted=True)
        return (seg_hi + seg_lo).astype(jnp.uint32), total_bits

    f_old = jax.jit(jax.vmap(bitpack_segsum))
    res["bitpack_segment_sum"] = timeit(f_old, a_syms, a_ns, a_lens, a_codes, label="bitpack_segment_sum")

    # bitpack cost components: the 4M-from-257 table gathers vs one-hot matmul
    def tbl_gather(data, len_tbl):
        return len_tbl[data]

    res["table_gather_4M"] = timeit(jax.jit(tbl_gather), a_syms, a_lens)

    def cumsum_only(data, n, len_tbl):
        pos = jnp.arange(data.shape[-1], dtype=jnp.int32)
        ln = jnp.where(pos[None] < n[:, None], 1 + (data & 15), 0)
        return jnp.cumsum(ln, axis=-1)

    res["lenlookup_free_cumsum"] = timeit(jax.jit(cumsum_only), a_syms, a_ns, a_lens, label="lenlookup_free_cumsum")

    # --- sort variants ------------------------------------------------------
    k1 = rng.integers(0, nmax, (B, nmax)).astype(np.int32)
    k2 = rng.integers(0, nmax, (B, nmax)).astype(np.int32)
    pos = np.broadcast_to(np.arange(nmax, dtype=np.int32), (B, nmax)).copy()
    a_k1, a_k2, a_pos = jnp.asarray(k1), jnp.asarray(k2), jnp.asarray(pos)

    def sort3(x, y, p):
        return jax.lax.sort((x, y, p), num_keys=2, is_stable=True)

    def sort2_packed(x, y, p):
        # 64K-block simulation: (k1 17b | k2 17b) cannot pack in 32; pack
        # 16-bit halves to measure the 1-key-2-array shape cost
        key = (x.astype(jnp.uint32) << 16) | (y.astype(jnp.uint32) & 0xFFFF)
        return jax.lax.sort((key, p), num_keys=1, is_stable=True)

    def sort1_packed(x, y, p):
        key = (x.astype(jnp.uint32) << 17) | p.astype(jnp.uint32)
        return jax.lax.sort(key)

    def sort2_unstable(x, y, p):
        key = (x.astype(jnp.uint32) << 16) | (y.astype(jnp.uint32) & 0xFFFF)
        return jax.lax.sort((key, p), num_keys=1, is_stable=False)

    res["sort3_2key_stable"] = timeit(jax.jit(sort3), a_k1, a_k2, a_pos, label="sort3_2key_stable")
    res["sort2_1key_stable"] = timeit(jax.jit(sort2_packed), a_k1, a_k2, a_pos, label="sort2_1key_stable")
    res["sort2_1key_unstable"] = timeit(jax.jit(sort2_unstable), a_k1, a_k2, a_pos, label="sort2_1key_unstable")
    res["sort1_packed"] = timeit(jax.jit(sort1_packed), a_k1, a_k2, a_pos, label="sort1_packed")

    # LF-map: packed single-array vs 3-array
    last = rng.integers(0, 256, (B, nmax)).astype(np.uint8)
    a_last = jnp.asarray(last)

    def lf_sort3(lastb):
        p = jnp.arange(nmax, dtype=jnp.int32)
        key = lastb.astype(jnp.int32)
        _, _, l = jax.lax.sort((key, p, p), num_keys=2, is_stable=True)
        return l

    def lf_packed(lastb):
        p = jnp.arange(nmax, dtype=jnp.uint32)
        packed = (lastb.astype(jnp.uint32) << 23) | p
        return jax.lax.sort(packed) & jnp.uint32((1 << 23) - 1)

    res["lf_sort3"] = timeit(jax.jit(jax.vmap(lf_sort3)), a_last, label="lf_sort3")
    res["lf_packed"] = timeit(jax.jit(jax.vmap(lf_packed)), a_last, label="lf_packed")

    # cumsum & scatter & gather reference points
    big = jnp.asarray(rng.integers(0, 2**30, (B, nmax)).astype(np.uint32))
    res["cumsum_4M_u32"] = timeit(jax.jit(lambda x: jnp.cumsum(x, axis=-1)), big)
    idx = jnp.asarray(rng.integers(0, nmax, (B, nmax)).astype(np.int32))
    res["gather_4M_random"] = timeit(
        jax.jit(lambda x, i: jnp.take_along_axis(x, i, axis=-1)), big, idx)
    res["scatter_4M_random"] = timeit(
        jax.jit(lambda x, i: jnp.zeros_like(x).at[
            jnp.arange(x.shape[0], dtype=jnp.int32)[:, None], i].set(x)),
        big, idx)

    # --- counting/radix rank-sort round (VERDICT r3 item 4) -----------------
    # A Manber-Myers round as a stable counting sort: ranks are dense in
    # [0, n), so a round is two 9-bit digit passes (17-bit keys at 128 KiB
    # blocks), each needing (a) stable within-digit ranks and (b) a 4M
    # permutation scatter into HBM.  (b) alone [scatter_4M_random above]
    # lower-bounds ANY radix/counting formulation — Pallas tiles can build
    # the histograms in VMEM but the final data-dependent permutation write
    # still goes through the same HBM scatter path Mosaic cannot vectorize.
    # One full 9-bit pass (XLA onehot-cumsum ranks + scatter) is timed for
    # the record; compare 2x this (and 2x scatter_4M_random as the floor)
    # against sort3_2key_stable + sort2_1key_stable (the current round pair).
    def radix9_pass(keys, vals):
        d = (keys & jnp.uint32(511)).astype(jnp.int32)
        b_iota = jnp.arange(512, dtype=jnp.int32)
        onehot = d[None, :] == b_iota[:, None]
        counts = jnp.sum(onehot, axis=1)
        starts = jnp.cumsum(counts) - counts
        within = jnp.cumsum(onehot.astype(jnp.int32), axis=1) - onehot
        myrank = jnp.sum(jnp.where(onehot, within, 0), axis=0)
        dest = starts[d] + myrank
        ok = jnp.zeros_like(keys).at[dest].set(keys, mode="drop",
                                               unique_indices=True)
        ov = jnp.zeros_like(vals).at[dest].set(vals, mode="drop",
                                               unique_indices=True)
        return ok, ov

    res["radix9_one_pass"] = timeit(jax.jit(jax.vmap(radix9_pass)), big, idx,
                                    label="radix9_one_pass")

    # --- decode gap-map composition: gather vs compare-select ---------------
    NC = 16384
    maps_np = rng.integers(0, 32, (NC, 32)).astype(np.int32)
    flags_np = (rng.random(NC) < 0.002).astype(np.int32)
    a_maps, a_flags = jnp.asarray(maps_np), jnp.asarray(flags_np)

    def compose_gather(maps, flags):
        def combine(a, b):
            ma, fa = a
            mb, fb = b
            comp = jnp.take_along_axis(mb, ma, axis=-1)
            return jnp.where(fb[:, None] > 0, mb, comp), fa | fb

        return jax.lax.associative_scan(combine, (maps, flags), axis=0)[0]

    def compose_select(maps, flags):
        g_iota = jnp.arange(32, dtype=jnp.int32)

        def combine(a, b):
            ma, fa = a
            mb, fb = b
            comp = jnp.sum(jnp.where(ma[:, :, None] == g_iota[None, None, :],
                                     mb[:, None, :], 0), axis=-1)
            return jnp.where(fb[:, None] > 0, mb, comp), fa | fb

        return jax.lax.associative_scan(combine, (maps, flags), axis=0)[0]

    res["compose_16K_gather"] = timeit(jax.jit(compose_gather), a_maps,
                                       a_flags, label="compose_16K_gather")
    res["compose_16K_select"] = timeit(jax.jit(compose_select), a_maps,
                                       a_flags, label="compose_16K_select")

    # --- decode literal placement: ragged scatter vs packed sort + sorted
    # scatter (ops/huffman.gap_decode_rle0_flat's two strategies) ------------
    steps_nc = 8718336 // 4  # ~2.2M literal lanes per corpus pass
    cap = B * nmax
    tgt = np.sort(rng.choice(cap, steps_nc, replace=False)).astype(np.int32)
    lanes = rng.permutation(np.concatenate([
        (tgt.astype(np.uint32) << 9) | 7,
        np.full(2 * steps_nc, 0xFFFFFFFF, np.uint32)]))
    a_lanes = jnp.asarray(lanes)

    def place_sort(k):
        srt = jax.lax.sort(k)[:cap]
        t2 = (srt >> 9).astype(jnp.int32)
        out = jnp.zeros(cap + 1, jnp.int32)
        return out.at[t2].set((srt & jnp.uint32(511)).astype(jnp.int32),
                              mode="drop", indices_are_sorted=True)

    def place_scatter(k):
        t2 = jnp.where(k == jnp.uint32(0xFFFFFFFF), jnp.int32(cap + 1),
                       (k >> 9).astype(jnp.int32))
        out = jnp.zeros(cap + 1, jnp.int32)
        return out.at[t2].set((k & jnp.uint32(511)).astype(jnp.int32),
                              mode="drop")

    res["place_sort_sorted_scatter"] = timeit(
        jax.jit(place_sort), a_lanes, label="place_sort_sorted_scatter")
    res["place_ragged_scatter"] = timeit(
        jax.jit(place_scatter), a_lanes, label="place_ragged_scatter")

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
