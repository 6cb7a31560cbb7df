"""Batched, jitted TPU block-codec pipeline — the production backend.

Compress: bwt_forward_cp -> mtf_forward -> histogram (one fused jit),
host-side 256-entry canonical code-length build, then the jitted bitpack
encoder.  Decompress: one fused dispatch — flat Pallas gap decode over the
concatenated chunk axis of the whole batch, then vmapped inverse MTF +
checkpointed cursor-walk inverse BWT.

Blocks are padded into power-of-two size buckets and batched per bucket, so
a handful of XLA compilations serve arbitrary inputs and many blocks run as
one device dispatch (the data-parallel axis of SURVEY §2.4).  True lengths
are traced scalars.  This mirrors the reference pipelines
compress/decompress (/root/reference/main.cpp:300-345) with every hot loop
replaced by a parallel device kernel (SURVEY §2.3 build obligations).
"""

from __future__ import annotations

import functools
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import bwt as ops_bwt
from ..ops import huffman as ops_huf
from ..ops import mtf as ops_mtf
from ..ops import rle as ops_rle
from ..ops.pallas_decode import CHUNK_ALIGN
from ..utils import config as config_mod

MIN_BUCKET = config_mod.DEFAULT.min_bucket
MTF_CHUNK = config_mod.DEFAULT.mtf_chunk
DECODE_CHUNK_BITS = config_mod.DEFAULT.decode_chunk_bits


def _next_pow2(x: int) -> int:
    return 1 << max(x - 1, 1).bit_length()


def _bucket(n: int) -> int:
    return max(MIN_BUCKET, _next_pow2(n))


def _n_cps(n: int) -> int:
    """Checkpoints stored for a block of true length n."""
    return max(-(-n // ops_bwt.CURSOR_STRIDE) - 1, 0)


# Device dispatches are capped at this many blocks: one (32, 128K) stage-1
# batch already saturates the chip, larger batches only grow the working set
# (a 256 MB stream would otherwise be one 2048-block dispatch and OOM), and
# the cap keeps the set of compiled batch shapes small.
MAX_DISPATCH_BLOCKS = 32

# Prefix doubling exits when every block's ranks are distinct, so one
# pathological block (long runs: LCP in the tens of KB) forces max rounds on
# the whole batch.  Blocks whose sampled self-similarity at distance 2048
# exceeds this go into their own small batch (Calgary: pic blocks measure
# 0.6-0.83, every other file <= 0.3; text converges in 4-10 rounds, runs
# need 14-15).
_PATHOLOGICAL_SELF_SIM = 0.45


def _looks_pathological(blk: np.ndarray) -> bool:
    if blk.size < 8192:
        return False
    return float(np.mean(blk[:-2048:37] == blk[2048::37])) > _PATHOLOGICAL_SELF_SIM


# ---------------------------------------------------------------------------
# Jitted batched stages (cached per static shape)
# ---------------------------------------------------------------------------

def compress_stage1_fn(data, n):
    """(nmax,) uint8, scalar n -> (RLE0 symbols, their count m, 257-bin
    histogram, bwt shift, iBWT cursor checkpoints, aperiodic flag)."""
    last, shift, cps, aperiodic = ops_bwt.bwt_forward_cp(data, n)
    codes = ops_mtf.mtf_forward(last, n, MTF_CHUNK)
    syms, m = ops_rle.rle0_encode(codes, n)
    freqs = ops_huf.histogram(syms, m, bins=ops_rle.RLE_ALPHABET)
    return syms, m, freqs, shift, cps, aperiodic


def decompress_stage2_fn(syms, m, shift, n):
    """(nmax,) int32 RLE0 symbols -> original block bytes (doubling iBWT)."""
    codes = ops_rle.rle0_decode(syms, m, n)
    last = ops_mtf.mtf_inverse(codes, n, MTF_CHUNK)
    return ops_bwt.bwt_inverse(last, shift, n)


@functools.lru_cache(maxsize=128)
def _batched_stage1(nmax: int, batch: int):
    return jax.jit(jax.vmap(compress_stage1_fn))


@functools.lru_cache(maxsize=128)
def _batched_stage2(nmax: int, batch: int):
    return jax.jit(jax.vmap(ops_huf.encode_bitpack))


@functools.lru_cache(maxsize=128)
def _batched_decode2(nmax: int, batch: int):
    return jax.jit(jax.vmap(decompress_stage2_fn))


@functools.lru_cache(maxsize=128)
def _decode_flat(nc: int, nmax: int, batch: int, chunk_bits: int, maxl: int):
    """Fused flat Huffman gap decode + inverse MTF + cursor iBWT."""
    kcp = max(max(nmax // ops_bwt.CURSOR_STRIDE, 1) - 1, 1)

    @jax.jit
    def f(words_flat, count_t, seg_start, seg_start_idx, seg_id, sym_tbl,
          ms, ns, shifts, cps):
        tiles = ops_huf.unpack_bit_tiles_flat(words_flat, chunk_bits)
        syms = ops_huf.gap_decode_flat(tiles, count_t, seg_start,
                                       seg_start_idx, seg_id, sym_tbl, ms,
                                       nmax, chunk_bits, maxl)

        def per_block(syms_b, m, shift, cp, n):
            codes_b = ops_rle.rle0_decode(syms_b, m, n)
            last = ops_mtf.mtf_inverse(codes_b, n, MTF_CHUNK)
            return ops_bwt.bwt_inverse_cursors(last, shift, cp, n)

        # syms has a trailing dummy row (pad chunks' segment); drop it
        b_real_rows = shifts.shape[0]
        return jax.vmap(per_block)(syms[:b_real_rows], ms[:b_real_rows],
                                   shifts, cps, ns[:b_real_rows])

    return f, kcp


# ---------------------------------------------------------------------------
# Backend
# ---------------------------------------------------------------------------

class JaxBackend:
    """Block codec on the default JAX device (TPU when present).

    Blocks are grouped by padded-size bucket and processed as one batched
    dispatch per group; batch sizes are padded to powers of two so compiled
    programs are reused across calls.
    """

    name = "jax"

    def compress_blocks(self, blocks: list[np.ndarray],
                        bucket: int | None = None) -> list[dict]:
        """bucket: force one padded size for every block (fewer compiled
        shapes, one dispatch for a whole multi-stream batch)."""
        results: list[dict | None] = [None] * len(blocks)
        groups: dict[tuple[int, bool], list[int]] = defaultdict(list)
        arrs = [np.asarray(b, dtype=np.uint8) for b in blocks]
        for i, blk in enumerate(arrs):
            nmax = max(bucket, _bucket(blk.size)) if bucket else _bucket(blk.size)
            groups[(nmax, _looks_pathological(blk))].append(i)

        for (nmax, _hard), all_idxs in groups.items():
          for c0 in range(0, len(all_idxs), MAX_DISPATCH_BLOCKS):
            idxs = all_idxs[c0:c0 + MAX_DISPATCH_BLOCKS]
            b_real = len(idxs)
            b_pad = _next_pow2(b_real)
            batch = np.zeros((b_pad, nmax), dtype=np.uint8)
            ns = np.ones(b_pad, dtype=np.int32)  # dummy rows compress n=1
            for row, i in enumerate(idxs):
                batch[row, : arrs[i].size] = arrs[i]
                ns[row] = arrs[i].size
            syms, ms, freqs, shifts, cps, aper = _batched_stage1(nmax, b_pad)(
                jnp.asarray(batch), jnp.asarray(ns))
            freqs_np = np.asarray(freqs)
            shifts_np = np.asarray(shifts)
            ms_np = np.asarray(ms)
            cps_np = np.asarray(cps)
            aper_np = np.asarray(aper)

            A = ops_rle.RLE_ALPHABET
            lens_all = np.zeros((b_pad, A), dtype=np.uint8)
            code_tbls = np.zeros((b_pad, A), dtype=np.uint32)
            for row in range(b_real):
                lens_all[row] = ops_huf.code_lengths_from_hist(freqs_np[row])
                if (lens_all[row] > 0).any():
                    code_tbls[row] = ops_huf.canonical_code_table(lens_all[row])
            words, total_bits = _batched_stage2(nmax, b_pad)(
                syms, ms,
                jnp.asarray(lens_all.astype(np.int32)), jnp.asarray(code_tbls))
            words_np = np.asarray(words)
            bits_np = np.asarray(total_bits)

            for row, i in enumerate(idxs):
                tb = int(bits_np[row])
                n = int(ns[row])
                payload = (words_np[row].astype(">u4").tobytes()[: (tb + 7) // 8]
                           if (lens_all[row] > 0).any() else b"")
                results[i] = {
                    "orig_len": n,
                    "shift": int(shifts_np[row]),
                    "lens": lens_all[row],
                    "freqs": freqs_np[row],
                    "payload": payload,
                    "total_bits": tb,
                    "rle_len": int(ms_np[row]),
                    "cps": cps_np[row, : _n_cps(n)] if aper_np[row] else None,
                }
        return results  # type: ignore[return-value]

    def decompress_blocks(self, blocks: list[dict],
                          bucket: int | None = None,
                          chunk_bucket: int | None = None) -> list[np.ndarray]:
        """bucket: force a uniform padded block size so a heterogeneous batch
        becomes one dispatch.  (chunk_bucket is accepted for API compat; the
        flat chunk axis makes it unnecessary.)"""
        results: list[np.ndarray | None] = [None] * len(blocks)

        def blk_bucket(n: int) -> int:
            return max(bucket, _bucket(n)) if bucket else _bucket(n)

        # multi-symbol cursor-eligible blocks: flat gap decode + iMTF + cursor
        # iBWT, grouped by block bucket.  Single-symbol blocks skip Huffman;
        # periodic blocks (no valid checkpoints, > one stride) fall back to
        # the doubling iBWT path.
        fgroups: dict[int, list[int]] = defaultdict(list)
        sgroups: dict[int, list[int]] = defaultdict(list)
        pgroups: dict[int, list[int]] = defaultdict(list)
        for i, b in enumerate(blocks):
            n = int(b["orig_len"])
            present = np.asarray(b["present"])
            if n == 0:
                results[i] = np.zeros(0, dtype=np.uint8)
            elif int(present.sum()) == 1:
                sgroups[blk_bucket(n)].append(i)
            elif b.get("cps") is None and n > ops_bwt.CURSOR_STRIDE:
                pgroups[blk_bucket(n)].append(i)
            else:
                fgroups[blk_bucket(n)].append(i)

        wbytes = DECODE_CHUNK_BITS // 8

        for nmax, f_idxs in fgroups.items():
          for f0 in range(0, len(f_idxs), MAX_DISPATCH_BLOCKS):
            idxs = f_idxs[f0:f0 + MAX_DISPATCH_BLOCKS]
            b_real = len(idxs)
            b_pad = _next_pow2(b_real)
            # flat chunk layout
            spans = []  # (start_chunk, n_chunks) per block
            nc_true = 0
            maxl = 0
            for i in idxs:
                b = blocks[i]
                nc_b = max(1, -(-len(b["payload"]) // wbytes))
                spans.append((nc_true, nc_b))
                nc_true += nc_b
                maxl = max(maxl, int(np.asarray(b["lens"]).max()))
            maxl = min(max(8, -(-maxl // 8) * 8), 31)
            nc = _next_pow2(-(-nc_true // CHUNK_ALIGN)) * CHUNK_ALIGN

            A = ops_rle.RLE_ALPHABET
            words = np.zeros(nc * wbytes // 4, dtype=np.uint32)
            count_t = np.zeros((32, nc), dtype=np.int32)
            seg_id = np.full(nc, b_pad, dtype=np.int32)
            seg_start = np.zeros(nc, dtype=bool)
            seg_start[nc_true:] = True
            seg_start_idx = np.arange(nc, dtype=np.int32)
            sym_tbl = np.zeros((b_pad + 1, A), dtype=np.int32)
            ns = np.ones(b_pad + 1, dtype=np.int32)
            ms = np.ones(b_pad + 1, dtype=np.int32)
            ms[b_pad] = 0
            shifts = np.zeros(b_pad, dtype=np.int32)
            fn, kcp = _decode_flat(nc, nmax, b_pad, DECODE_CHUNK_BITS, maxl)
            cps = np.zeros((b_pad, kcp), dtype=np.int32)

            for row, (i, (c0, nc_b)) in enumerate(zip(idxs, spans)):
                b = blocks[i]
                buf = b["payload"] + b"\x00" * (nc_b * wbytes - len(b["payload"]))
                words[c0 * wbytes // 4:(c0 + nc_b) * wbytes // 4] = np.frombuffer(
                    buf, dtype=">u4").astype(np.uint32)
                t = ops_huf.decode_tables(np.asarray(b["lens"]))
                count_t[:, c0:c0 + nc_b] = t["count"][:, None]
                seg_id[c0:c0 + nc_b] = row
                seg_start[c0] = True
                seg_start_idx[c0:c0 + nc_b] = c0
                sym_tbl[row] = t["sym"][:A]
                ns[row] = int(b["orig_len"])
                ms[row] = int(b["rle_len"])
                shifts[row] = int(b["shift"])
                bc = b.get("cps")
                if bc is not None and len(bc) > 0:
                    cc = np.asarray(bc, dtype=np.int32)[:kcp]
                    cps[row, : cc.size] = cc

            data = fn(jnp.asarray(words), jnp.asarray(count_t),
                      jnp.asarray(seg_start), jnp.asarray(seg_start_idx),
                      jnp.asarray(seg_id), jnp.asarray(sym_tbl),
                      jnp.asarray(ms), jnp.asarray(ns), jnp.asarray(shifts),
                      jnp.asarray(cps))
            data_np = np.asarray(data)
            for row, i in enumerate(idxs):
                results[i] = data_np[row, : int(ns[row])]

        # periodic blocks (rare, degenerate): exact sequential oracle
        for nmax, idxs in pgroups.items():
            from . import oracle

            for i in idxs:
                b = blocks[i]
                results[i] = oracle.decompress_block(
                    b["payload"], np.asarray(b["lens"]), int(b["shift"]),
                    int(b["orig_len"]), int(b["rle_len"]))

        # single-symbol blocks: materialise the constant RLE0 stream, then
        # inverse transforms only (doubling iBWT — degenerate inputs may be
        # periodic, where cursor checkpoints are undefined)
        for nmax, s_idxs in sgroups.items():
          for s0 in range(0, len(s_idxs), MAX_DISPATCH_BLOCKS):
            idxs = s_idxs[s0:s0 + MAX_DISPATCH_BLOCKS]
            b_real = len(idxs)
            b_pad = _next_pow2(b_real)
            batch = np.zeros((b_pad, nmax), dtype=np.int32)
            ns = np.ones(b_pad, dtype=np.int32)
            ms = np.ones(b_pad, dtype=np.int32)
            shifts = np.zeros(b_pad, dtype=np.int32)
            for row, i in enumerate(idxs):
                b = blocks[i]
                n = int(b["orig_len"])
                m = int(b["rle_len"])
                sym = int(np.nonzero(np.asarray(b["present"]))[0][0])
                batch[row, :m] = sym
                ns[row] = n
                ms[row] = m
                shifts[row] = int(b["shift"])
            data = _batched_decode2(nmax, b_pad)(
                jnp.asarray(batch), jnp.asarray(ms), jnp.asarray(shifts),
                jnp.asarray(ns))
            data_np = np.asarray(data)
            for row, i in enumerate(idxs):
                results[i] = data_np[row, : int(ns[row])]
        return results  # type: ignore[return-value]
