"""Per-stage TPU timing of the production pipeline at the bench shape.

Builds the same (B, 128K) Calgary batch the bench dispatches, then times each
jitted stage separately (warm, block_until_ready).  Run on the real chip:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_stages.py
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
    out = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(out))


def timeit(fn, *args, reps=5):
    out = fn(*args)
    _sync(out)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)  # dispatches queue on one stream; one barrier covers all
    return (time.perf_counter() - t0) / reps, out


def main(block_size=131072):
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    from bmh_tpu.models import pipeline as P
    from bmh_tpu.ops import bwt as ops_bwt
    from bmh_tpu.ops import huffman as ops_huf
    from bmh_tpu.ops import mtf as ops_mtf
    from bmh_tpu.ops import rle as ops_rle
    from bmh_tpu.utils import corpus

    datas = [corpus.read_corpus_file(n) for n in corpus.CALGARY_FILES]
    blocks = []
    for d in datas:
        a = np.frombuffer(d, dtype=np.uint8)
        for i in range(0, len(a), block_size):
            blocks.append(a[i:i + block_size])
    # production applies the RLE1 pre-pass before the device pipeline
    # (api._rle1_blocks); profile the same bytes the kernels actually see,
    # so stage times sum to something comparable with the bench wall
    from bmh_tpu.utils import nativeio

    blocks = [enc if (enc := nativeio.rle1_encode(blk)).size < blk.size
              else blk for blk in blocks]
    b_real = len(blocks)
    b_pad = 1 << (b_real - 1).bit_length()
    nmax = block_size
    batch = np.zeros((b_pad, nmax), dtype=np.uint8)
    ns = np.ones(b_pad, dtype=np.int32)
    for i, blk in enumerate(blocks):
        batch[i, : blk.size] = blk
        ns[i] = blk.size
    batch_d = jnp.asarray(batch)
    ns_d = jnp.asarray(ns)
    res = {"b_real": b_real, "b_pad": b_pad, "nmax": nmax,
           "platform": jax.devices()[0].platform}

    # --- compress stages ---
    bwt_fn = jax.jit(jax.vmap(ops_bwt.bwt_forward_cp))
    t, (last, shift, cps, aper) = timeit(bwt_fn, batch_d, ns_d)
    res["bwt_forward"] = t

    mtf_fn = jax.jit(jax.vmap(lambda x, n: ops_mtf.mtf_forward(x, n, P.MTF_CHUNK)))
    t, codes = timeit(mtf_fn, last, ns_d)
    res["mtf_forward"] = t

    rle_fn = jax.jit(jax.vmap(ops_rle.rle0_encode))
    t, (syms, ms) = timeit(rle_fn, codes, ns_d)
    res["rle0_encode"] = t

    hist_fn = jax.jit(jax.vmap(
        lambda s, m: ops_huf.histogram(s, m, bins=ops_rle.RLE_ALPHABET)))
    t, freqs = timeit(hist_fn, syms, ms)
    res["histogram"] = t

    t, _ = timeit(P._batched_stage1(nmax, b_pad), batch_d, ns_d)
    res["stage1_fused"] = t

    # production sparse-doubling path pieces
    t, (rank_d, tied_d, _, _, cnt_d) = timeit(P._batched_rounds(nmax, b_pad),
                                              batch_d, ns_d)
    res["bwt_rounds_partial"] = t
    res["tied_frac"] = float(np.asarray(cnt_d).sum()) / (b_pad * nmax)
    rank_full = P._sparse_ranks(batch_d, ns_d, ns)
    _sync(rank_full)  # warm (compiles excluded from the stage time)
    t0 = time.perf_counter()
    rank_full = P._sparse_ranks(batch_d, ns_d, ns)
    _sync(rank_full)
    res["sparse_ranks_total"] = time.perf_counter() - t0
    t, _ = timeit(P._batched_finish_full(nmax, b_pad), batch_d, ns_d,
                  rank_full)
    res["finish_full_fused"] = t
    t, _ = timeit(P._batched_full(nmax, b_pad), batch_d, ns_d)
    res["compress_full_fused"] = t
    t, _ = timeit(P._batched_compress_one_dispatch(nmax, b_pad), batch_d, ns_d)
    res["compress_one_dispatch"] = t  # the production program

    freqs_np = np.asarray(freqs)
    t0 = time.perf_counter()
    A = ops_rle.RLE_ALPHABET
    lens_all = np.zeros((b_pad, A), dtype=np.uint8)
    code_tbls = np.zeros((b_pad, A), dtype=np.uint32)
    for row in range(b_real):
        lens_all[row] = ops_huf.code_lengths_from_hist(freqs_np[row])
        if (lens_all[row] > 0).any():
            code_tbls[row] = ops_huf.canonical_code_table(lens_all[row])
    res["host_huffman"] = time.perf_counter() - t0

    t, _ = timeit(jax.jit(jax.vmap(ops_huf.code_lengths_device)),
                  jnp.asarray(freqs_np.astype(np.int32)))
    res["device_huffman_lengths"] = t

    t, (words, total_bits) = timeit(
        P._batched_stage2(nmax, b_pad), syms, ms,
        jnp.asarray(lens_all.astype(np.int32)), jnp.asarray(code_tbls))
    res["encode_bitpack"] = t

    # count doubling rounds per block (numpy oracle of convergence)
    rounds = []
    for blk in blocks:
        n = blk.size
        r = np.zeros(n, dtype=np.int64)
        r = blk.astype(np.int64) * 256 + blk[(np.arange(n) + 1) % n]
        h = 2
        cnt = 0
        while h < n:
            if np.unique(r).size == n:
                break
            r2 = r[(np.arange(n) + h) % n]
            key = r * (r2.max() + 1) + r2
            o = np.argsort(key, kind="stable")
            ks = key[o]
            nr = np.zeros(n, dtype=np.int64)
            nr[o] = np.cumsum(np.r_[0, (ks[1:] != ks[:-1]).astype(np.int64)])
            r = nr
            h *= 2
            cnt += 1
        rounds.append(cnt)
    res["doubling_rounds"] = rounds
    res["max_rounds"] = max(rounds)

    # --- decompress via the production grouped path, end to end ---
    from bmh_tpu import api
    blob = api.compress_many([bytes(d) for d in datas], block_size=block_size,
                             uniform=True)
    t0 = time.perf_counter()
    out = api.decompress_many(blob, uniform=True)
    res["decompress_cold"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = api.decompress_many(blob, uniform=True)
    res["decompress_warm"] = time.perf_counter() - t0
    assert all(bytes(a) == b for a, b in zip(datas, out))

    # --- decompress sub-stages at the flat shape ---
    # rebuild the flat decode inputs exactly as decompress_blocks does
    from bmh_tpu.utils import container as C
    blks = []
    for bl in blob:
        _, _, raw_blocks = C.unpack_file(bl)
        for raw in raw_blocks:
            orig_len, shift, lens, present, cps_b, rle_len, payload, _pre = C.unpack_block(raw)
            blks.append({"orig_len": _pre, "shift": shift, "lens": lens,
                         "present": present, "cps": cps_b, "rle_len": rle_len,
                         "payload": payload})  # pre_len = the codec stream length
    # reuse the pipeline's grouping exactly: multi-symbol blocks, capped at
    # MAX_DISPATCH_BLOCKS per dispatch (profile the first such dispatch), nc
    # rounded with the pipeline's own _next_pow2 so profiled shapes match
    # what decompress_blocks actually compiles and runs
    d_in = [b for b in blks if int(np.asarray(b["present"]).sum()) > 1]
    d_in = d_in[: P.config_mod.DEFAULT.max_dispatch]
    wbytes = P.DECODE_CHUNK_BITS // 8
    spans, nc_true, maxl = [], 0, 0
    for b in d_in:
        nc_b = max(1, -(-len(b["payload"]) // wbytes))
        spans.append((nc_true, nc_b))
        nc_true += nc_b
        maxl = max(maxl, int(np.asarray(b["lens"]).max()))
    maxl = min(max(8, -(-maxl // 8) * 8), 31)
    from bmh_tpu.ops.pallas_decode import CHUNK_ALIGN
    nc = P._next_pow2(-(-nc_true // CHUNK_ALIGN)) * CHUNK_ALIGN
    res["nc_true"], res["nc_pad"], res["maxl"] = nc_true, nc, maxl

    bb = P._next_pow2(len(d_in))
    stride = ops_bwt.CURSOR_STRIDE
    words_h = np.zeros(nc * wbytes // 4, dtype=np.uint32)
    lens_all = np.zeros((bb + 1, A), dtype=np.int32)
    count_t = np.zeros((32, nc), dtype=np.int32)
    seg_id = np.full(nc, bb, dtype=np.int32)
    seg_start = np.zeros(nc, dtype=bool)
    seg_start[nc_true:] = True
    seg_start_idx = np.arange(nc, dtype=np.int32)
    sym_tbl = np.zeros((bb + 1, A), dtype=np.int32)
    ns2 = np.ones(bb + 1, dtype=np.int32)
    ms2 = np.ones(bb + 1, dtype=np.int32)
    ms2[bb] = 0
    shifts = np.zeros(bb, dtype=np.int32)
    fn, kcp = P._decode_flat(nc, nmax, bb, P.DECODE_CHUNK_BITS, maxl, stride)
    cps2 = np.zeros((bb, kcp), dtype=np.int32)
    for row, (b, (c0, nc_b)) in enumerate(zip(d_in, spans)):
        buf = b["payload"] + b"\x00" * (nc_b * wbytes - len(b["payload"]))
        words_h[c0 * wbytes // 4:(c0 + nc_b) * wbytes // 4] = np.frombuffer(
            buf, dtype=">u4").astype(np.uint32)
        lens_all[row, : np.asarray(b["lens"]).size] = np.asarray(b["lens"])
        tt = ops_huf.decode_tables(np.asarray(b["lens"]))
        count_t[:, c0:c0 + nc_b] = tt["count"][:, None]
        seg_id[c0:c0 + nc_b] = row
        seg_start[c0] = True
        seg_start_idx[c0:c0 + nc_b] = c0
        sym_tbl[row] = tt["sym"][:A]
        ns2[row] = int(b["orig_len"])
        ms2[row] = int(b["rle_len"])
        shifts[row] = int(b["shift"])
        bc = b.get("cps")
        if bc is not None and len(bc) > 0:
            cc = np.asarray(bc, dtype=np.int32)[:kcp]
            cps2[row, : cc.size] = cc

    args = [jnp.asarray(x) for x in
            (words_h, lens_all, seg_start, seg_start_idx, seg_id,
             ms2, ns2, shifts, cps2)]
    t, _ = timeit(fn, *args)
    res["decode_flat_fused"] = t

    # pieces
    from bmh_tpu.ops import pallas_decode as PD
    a_words = jnp.asarray(words_h)
    a_count = jnp.asarray(count_t)
    a_sym = jnp.asarray(sym_tbl)
    wext_fn = jax.jit(lambda w: PD.words_ext(w, P.DECODE_CHUNK_BITS))
    t, wext = timeit(wext_fn, a_words)
    res["words_ext"] = t
    pa = jax.jit(lambda we, ct: PD.phase_a(we, ct, chunk_bits=P.DECODE_CHUNK_BITS,
                                           maxl=maxl, interpret=False))
    t, (cnt_map, exit_map) = timeit(pa, wext, a_count)
    res["phase_a"] = t
    gd = jax.jit(lambda w, ct, ss, ssi, si, st, m: ops_huf.gap_decode_flat(
        w, ct, ss, ssi, si, st, m, nmax, P.DECODE_CHUNK_BITS, maxl))
    t, syms_dec = timeit(gd, a_words, a_count, args[2], args[3], args[4],
                         a_sym, args[5])
    res["gap_decode_split"] = t  # the pre-r4 split formulation, for the delta
    rled = jax.jit(jax.vmap(ops_rle.rle0_decode))
    t, codes_dec = timeit(rled, syms_dec[:bb], args[5][:bb], args[6][:bb])
    res["rle0_decode_split"] = t
    gdr = jax.jit(lambda w, ct, ss, ssi, si, st, m, n:
                  ops_huf.gap_decode_rle0_flat(
                      w, ct, ss, ssi, si, st, m, n, nmax,
                      P.DECODE_CHUNK_BITS, maxl)[0])
    t, codes_dec = timeit(gdr, a_words, a_count, args[2], args[3], args[4],
                          a_sym, args[5], args[6])
    res["gap_decode_rle0_fused"] = t  # the production r4 path
    imtf = jax.jit(jax.vmap(lambda c, n: ops_mtf.mtf_inverse(c, n, P.MTF_CHUNK)))
    t, last_dec = timeit(imtf, codes_dec, args[6][:bb])
    res["mtf_inverse"] = t
    ibwt = jax.jit(jax.vmap(lambda l, sh, cp, n: ops_bwt.bwt_inverse_cursors(
        l, sh, cp, n, stride=stride)))
    t, _ = timeit(ibwt, last_dec, args[7], args[8], args[6][:bb])
    res["ibwt_cursors"] = t

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
