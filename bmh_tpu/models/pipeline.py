"""Batched, jitted TPU block-codec pipeline — the production backend.

Compress: partial doubling rounds -> device-compacted sparse rank
refinement -> ONE fused dispatch for everything else (BWT finish -> MTF ->
RLE0 -> histogram -> device two-queue Huffman lengths -> canonical codes ->
bitpack -> payload flatten); run-dominated batches use the classic fused
full-rounds program instead.  Decompress: one fused dispatch — flat Pallas
gap decode over the concatenated chunk axis of the whole batch
(device-built decode tables), then vmapped RLE0⁻¹ + Pallas inverse MTF +
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


def _chunks(seq: list, size: int | None = None):
    """Split a group's index list into dispatch-sized chunks.

    The cap (BMH_MAX_DISPATCH / CodecConfig.max_dispatch, read at call time
    so runtime config mutation takes effect) bounds each device dispatch:
    one (32, 128K) stage-1 batch already saturates the chip, larger batches
    only grow the working set (a 256 MB stream would otherwise be one
    2048-block dispatch and OOM), and the cap keeps the set of compiled
    batch shapes small."""
    size = size or config_mod.DEFAULT.max_dispatch
    return [seq[i:i + size] for i in range(0, len(seq), size)]

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


def compress_finish_fn(data, n, rank):
    """compress_stage1_fn tail for precomputed final BWT ranks (the
    sparse-doubling path: bwt_rounds -> host compaction -> sparse_refine ->
    this)."""
    last, shift, cps, aperiodic = ops_bwt.bwt_finish_cp(data, n, rank)
    codes = ops_mtf.mtf_forward(last, n, MTF_CHUNK)
    syms, m = ops_rle.rle0_encode(codes, n)
    freqs = ops_huf.histogram(syms, m, bins=ops_rle.RLE_ALPHABET)
    return syms, m, freqs, shift, cps, aperiodic


def encode_tail_fn(syms, m, freqs):
    """Device-side Huffman: two-queue code lengths + canonical codes +
    bitpack, fused onto the stage-1 outputs so compress is one dispatch
    per batch (the host Huffman loop and its device round-trip are gone)."""
    lens = ops_huf.code_lengths_device(freqs)
    codes = ops_huf.canonical_codes_device(lens)
    words, total_bits = ops_huf.encode_bitpack(syms, m, lens, codes)
    return words, total_bits, lens


def compress_full_fn(data, n):
    """Whole compress for one block in one jit: raw bytes -> packed words."""
    syms, m, freqs, shift, cps, aperiodic = compress_stage1_fn(data, n)
    words, total_bits, lens = encode_tail_fn(syms, m, freqs)
    return words, total_bits, lens, freqs, m, shift, cps, aperiodic


def compress_finish_full_fn(data, n, rank):
    syms, m, freqs, shift, cps, aperiodic = compress_finish_fn(data, n, rank)
    words, total_bits, lens = encode_tail_fn(syms, m, freqs)
    return words, total_bits, lens, freqs, m, shift, cps, aperiodic


def decompress_stage2_fn(syms, m, shift, n):
    """(nmax,) int32 RLE0 symbols -> original block bytes (doubling iBWT)."""
    codes = ops_rle.rle0_decode(syms, m, n)
    last = ops_mtf.mtf_inverse(codes, n, MTF_CHUNK)
    return ops_bwt.bwt_inverse(last, shift, n)


@functools.lru_cache(maxsize=128)
def _batched_stage1(nmax: int, batch: int):
    return jax.jit(jax.vmap(compress_stage1_fn))


# --- sparse-doubling BWT path (text batches) -------------------------------
# Full rounds stop at h_stop = 2^(full_rounds+1); the host then compacts the
# batch's tied positions and a small sparse dispatch finishes the ranks.
FULL_ROUNDS = config_mod.DEFAULT.full_rounds
_SPARSE_H0 = 1 << (FULL_ROUNDS + 1)
# minimum padded compact size (amortizes compile shapes); above half the
# batch the sparse sort stops paying and full rounds resume instead
_SPARSE_MIN = 4096


@functools.lru_cache(maxsize=128)
def _batched_rounds(nmax: int, batch: int):
    def f(data, n):
        rank, tied, h, done = ops_bwt.bwt_rounds(data, n, _SPARSE_H0)
        return rank, tied, h, done, jnp.sum(tied)

    return jax.jit(jax.vmap(f))


@functools.lru_cache(maxsize=128)
def _batched_resume(nmax: int, batch: int):
    def f(rank, n):
        # restart at h = h_stop with a fresh not-done flag; tied recomputed
        rank, _, _, _ = ops_bwt.bwt_rounds_resume(
            rank, jnp.zeros_like(rank), jnp.int32(_SPARSE_H0),
            jnp.bool_(False), n)
        return rank

    return jax.jit(jax.vmap(f))


def _sparse_refine_compact(rank, tied, ns, b: int, nmax: int, m_cap: int,
                           h0=None):
    """Device-side compaction + sparse refinement: the tied mask never
    leaves the device (a (B, nmax) mask pull costs ~100 ms through the
    tunnel).  h0 is the gap the doubling rounds handed off at — a traced
    scalar under the adaptive continuation, _SPARSE_H0 otherwise."""
    flat = tied.reshape(-1) != 0
    if b * nmax <= (1 << 23):
        # compaction by ONE packed single-array sort: tied positions
        # keep their index order in the low bits and sort first; the
        # jnp.nonzero lowering this replaces is a 4M scatter-add
        # (traced 37 ms vs ~7 ms for the sort)
        pidx = jnp.arange(b * nmax, dtype=jnp.uint32)
        key = jnp.where(flat, pidx, pidx | jnp.uint32(1 << 23))
        srt = jax.lax.sort(key, is_stable=False)[:m_cap]  # keys distinct
        idx = jnp.where((srt >> 23) == 0, srt & jnp.uint32((1 << 23) - 1),
                        jnp.uint32(b * nmax)).astype(jnp.int32)
    else:
        idx = jnp.nonzero(flat, size=m_cap,
                          fill_value=b * nmax)[0].astype(jnp.int32)
    blk = idx // nmax  # static power-of-two divisor -> shift; pads -> b
    pos = idx - blk * nmax
    nb = ns[jnp.clip(blk, 0, b - 1)]
    # hm0 = h0 mod nb by binary conditional subtraction: the quotient is
    # <= h0 (nb >= 1), so subtracting nb * {nmax/2, ..., 2, 1} suffices
    # and avoids the ~35ms-per-786K software integer `%` lowering.  The
    # static unroll bound is nmax (not _SPARSE_H0) because the adaptive
    # continuation can hand off at any h0 <= nmax.
    if h0 is None:
        h0 = jnp.int32(_SPARSE_H0)
    hm = jnp.full(m_cap, 0, dtype=jnp.int32) + h0
    q = 1
    while q * 2 <= nmax:
        q *= 2
    while q >= 1:
        # nb*q overflows int32 once q approaches nmax (nb can be ~2^21);
        # such products can never be <= hm <= nmax anyway, so mask them to
        # int32-max instead of comparing against the wrapped value
        prod = jnp.where(nb <= nmax // q, nb * q, jnp.int32(2**31 - 1))
        hm = jnp.where(hm >= prod, hm - prod, hm)
        q //= 2
    return ops_bwt.sparse_refine(rank, blk, pos, hm, ns, h0,
                                 tier1_rounds=config_mod.DEFAULT.tier1_rounds,
                                 tier2_div=config_mod.DEFAULT.tier2_div)


def _tier_key() -> tuple[int, int]:
    """Tier-shape knobs folded into every cached compress program's key so
    runtime/env mutation recompiles instead of hitting a stale program."""
    return (config_mod.DEFAULT.tier1_rounds, config_mod.DEFAULT.tier2_div)


@functools.lru_cache(maxsize=128)
def _sparse_fn(b: int, nmax: int, m_cap: int, tiers: tuple = (2, 4)):
    return jax.jit(lambda rank, tied, ns: _sparse_refine_compact(
        rank, tied, ns, b, nmax, m_cap))


@functools.lru_cache(maxsize=128)
def _batched_finish(nmax: int, batch: int):
    return jax.jit(jax.vmap(compress_finish_fn))


def _flatten_payloads(words, bits):
    """(B, W) per-block packed words + per-block bit counts -> one compact
    word stream (device-side), so the host pulls ~the compressed size
    instead of the full padded words buffer (5.2 MB -> ~1 MB per corpus
    batch through the ~40 MB/s tunnel).

    Returns (flat (B*W,) uint32 — first total_words valid, laid out as each
    block's word-aligned payload back to back; nw (B,) int32 words per
    block; total_words int32)."""
    b, w = words.shape
    cap = b * w
    nw = (bits + 31) // 32                      # (B,) words per block
    woffs = jnp.cumsum(nw) - nw                 # exclusive
    total_words = jnp.sum(nw)
    # ragged concat as ONE 2-array sort: each (row, slot)'s flat
    # destination is elementwise (woffs[row] + slot, or cap for padding),
    # and sorting (dest, word) compacts valid words to the front in order
    # — the marks/cummax/2-D-gather formulation this replaces cost
    # ~14 ms/pass in the 1.3M-element row gather (TRACE_r04 pipeline:237)
    slot = jnp.arange(w, dtype=jnp.int32)[None, :]
    dest = jnp.where(slot < nw[:, None], woffs[:, None] + slot, cap)
    _, flat = jax.lax.sort((dest.reshape(-1), words.reshape(-1)), num_keys=1,
                           is_stable=False)  # valid dests unique; pads sliced
    return flat, nw.astype(jnp.int32), total_words.astype(jnp.int32)


# meta matrix layout (one int32 row per block — ONE tunnel pull carries
# every per-block field; each np.asarray round trip costs ~23 ms of tunnel
# latency, and the split outputs cost ~10 of them per batch):
#   col 0 bits | 1 nw | 2 shift | 3 rle_len | 4 aperiodic |
#   5..13  present bitmap (257 bits in 9 words, little-endian bits) |
#   14..78 code lengths (257 x 8-bit, 4 per word, little-endian bytes) |
#   79..   iBWT cursor checkpoints (nmax-dependent count)
_META_FIXED = 79


def meta_cols(nmax: int) -> int:
    return _META_FIXED + max(nmax // ops_bwt.CURSOR_STRIDE, 1)


def _pack_meta(bits, nw, shifts, ms, aper, lens, freqs, cps):
    """Per-block metadata -> (B, meta_cols) int32, built on device."""
    b = bits.shape[0]
    present = (freqs > 0).astype(jnp.int32)          # (B, 257)
    present = jnp.pad(present, ((0, 0), (0, 288 - present.shape[1])))
    pw = jnp.sum(present.reshape(b, 9, 32)
                 << jnp.arange(32, dtype=jnp.int32)[None, None, :], axis=-1)
    lens8 = jnp.pad(lens.astype(jnp.int32), ((0, 0), (0, 260 - lens.shape[1])))
    lw = jnp.sum(lens8.reshape(b, 65, 4)
                 << (8 * jnp.arange(4, dtype=jnp.int32))[None, None, :], axis=-1)
    head = jnp.stack([bits.astype(jnp.int32), nw.astype(jnp.int32),
                      shifts.astype(jnp.int32), ms.astype(jnp.int32),
                      aper.astype(jnp.int32)], axis=1)
    return jnp.concatenate([head, pw, lw, cps.astype(jnp.int32)], axis=1)


def _merge_out(flat, meta):
    """[meta | payload] as ONE uint32 stream, so the single-device drain
    can fetch the metadata AND (a bound on) the payload in ONE tunnel pull
    (~23 ms of pure round-trip latency per pull; VERDICT r4 item 1's
    budget).  Meta values are non-negative int32 -> bitcast is lossless."""
    return jnp.concatenate([
        jax.lax.bitcast_convert_type(meta, jnp.uint32).reshape(-1), flat])


def _compress_core(data, ns, b: int, nmax: int, hard: bool,
                   merged: bool = False):
    """The whole batched compress as one traced program.

    hard=True: run-dominated blocks — classic fused full-rounds program
    (skips the sparse machinery).  hard=False: partial doubling rounds, then
    a device-side `lax.cond` on the batch-total tied count picks sparse
    refinement or classic resume (scalar predicate — one branch executes),
    then the fused finish/encode/flatten tail.  No host decision points.

    Returns (flat (B*W,) uint32 compacted payload words, meta (B, meta_cols)
    int32 — see _pack_meta); with merged=True, one (B*meta_cols + B*W,)
    uint32 array [meta | flat] instead (see _merge_out).
    """
    if hard:
        words, bits, lens, freqs, ms, shifts, cps, aper = jax.vmap(
            compress_full_fn)(data, ns)
        flat, nw, _ = _flatten_payloads(words, bits)
        meta = _pack_meta(bits, nw, shifts, ms, aper, lens, freqs, cps)
        return _merge_out(flat, meta) if merged else (flat, meta)

    m_cap = _sparse_cap(b, nmax)
    rank, tied, h, done, cnt = jax.vmap(
        lambda d, n: (lambda r, t, hh, dd: (r, t, hh, dd, jnp.sum(t)))(
            *ops_bwt.bwt_rounds(d, n, _SPARSE_H0)))(data, ns)
    total_tied = jnp.sum(cnt)

    # ADAPTIVE HANDOFF: keep running cheap full-array doubling rounds (one
    # batch-level round ≈ 9 ms) while the batch's tie total still exceeds
    # the sparse compact capacity, then hand the (now small) set to the
    # compact refinement at whatever gap h_s the loop reached.  Text-heavy
    # batches (enwik-like streams: 370-690K tied at the corpus-tuned 262K
    # cap) previously fell all the way back to full resume (~250 ms); a
    # 4x-capacity compact tier was measured even WORSE (~2x resume) —
    # capacity-sized gather/scatter rounds lose to XLA's full-array sorts.
    # Blocks whose h stopped early (done) are re-roundable no-ops.
    def cont_cond(st):
        _, _, h_s, tt = st
        return jnp.logical_and(tt > m_cap, h_s < nmax)

    def cont_body(st):
        rank, tied, h_s, _ = st

        def one(r, t, n):
            r2, t2, _, _ = ops_bwt.round_step(r, t, h_s, n)
            return r2, t2

        rank, tied = jax.vmap(one)(rank, tied, ns)
        return rank, tied, h_s * 2, jnp.sum(tied)

    rank, tied, h_s, total_tied = jax.lax.while_loop(
        cont_cond, cont_body,
        (rank, tied, jnp.int32(_SPARSE_H0), total_tied))

    def sparse_branch(args):
        rank, tied, ns = args
        return _sparse_refine_compact(rank, tied, ns, b, nmax, m_cap,
                                      h0=h_s)

    def resume_branch(args):
        # unreachable except for h_s >= nmax with residual ties (exactly
        # periodic blocks) — by then doubling has covered the whole block
        # and ranks are final, so this is an immediate-exit loop
        rank, _, ns = args

        def rr(r, n):
            r2, _, _, _ = ops_bwt.bwt_rounds_resume(
                r, jnp.zeros_like(r), h_s, jnp.bool_(False), n)
            return r2

        return jax.vmap(rr)(rank, ns)

    rank = jax.lax.cond(total_tied <= m_cap, sparse_branch, resume_branch,
                        (rank, tied, ns))
    words, bits, lens, freqs, ms, shifts, cps, aper = jax.vmap(
        compress_finish_full_fn)(data, ns, rank)
    flat, nw, _ = _flatten_payloads(words, bits)
    meta = _pack_meta(bits, nw, shifts, ms, aper, lens, freqs, cps)
    return _merge_out(flat, meta) if merged else (flat, meta)


@functools.lru_cache(maxsize=128)
def _batched_full(nmax: int, batch: int):
    return jax.jit(lambda data, ns: _compress_core(data, ns, batch, nmax,
                                                   True, merged=True))


@functools.lru_cache(maxsize=128)
def _batched_finish_full(nmax: int, batch: int):
    def g(data, ns, rank):
        words, bits, lens, freqs, ms, shifts, cps, aper = jax.vmap(
            compress_finish_full_fn)(data, ns, rank)
        flat, nw, total_words = _flatten_payloads(words, bits)
        return flat, nw, total_words, bits, lens, freqs, ms, shifts, cps, aper

    return jax.jit(g)


def _sparse_cap(b_pad: int, nmax: int) -> int:
    """Static compact-set capacity: (batch/sparse_cap_div) of the batch
    (text leaves ~4.5% tied after 4 full rounds at the corpus shape), with
    a floor for tiny batches (clamped to the batch itself)."""
    div = config_mod.DEFAULT.sparse_cap_div
    return min(max((b_pad * nmax) // div, _SPARSE_MIN), b_pad * nmax)


def _sparse_ranks(batch_j, ns_j, ns_np):
    """Final BWT ranks for a (B, nmax) batch via sparse doubling.  The one
    host sync reads only per-block tied *counts*; compaction of the tied
    positions happens on device (fixed capacity), so neither the rank
    planes nor the mask ever cross the tunnel."""
    b_pad, nmax = batch_j.shape
    rank, tied, h, done, cnt = _batched_rounds(nmax, b_pad)(batch_j, ns_j)
    m_true = int(np.asarray(cnt).sum())
    if config_mod.DEFAULT.debug_sparse:
        import sys

        print(f"[sparse] b={b_pad} nmax={nmax} tied={m_true} "
              f"cap={_sparse_cap(b_pad, nmax)}", file=sys.stderr, flush=True)
    if m_true:
        if m_true > _sparse_cap(b_pad, nmax):
            # over-capacity batch: resume classic full rounds (the split
            # path is test/profiler plumbing; the production one-dispatch
            # program instead runs the adaptive handoff in _compress_core)
            rank = _batched_resume(nmax, b_pad)(rank, ns_j)
        else:
            rank = _sparse_fn(b_pad, nmax, _sparse_cap(b_pad, nmax),
                              _tier_key())(rank, tied, ns_j)
    return rank


# Upload quantum for the compact batch transfer: ragged/RLE1'd blocks leave
# ~30% padding in a (B, nmax) upload (~1.3 MB = ~30 ms of tunnel on the
# corpus batch); instead the host ships one compact byte stream padded to
# a multiple of this quantum, and a small device program re-inflates it to
# the padded batch via per-block dynamic slices (copies, ~1 ms).  The
# quantum bounds the number of compiled reshape programs per batch shape.
_UPLOAD_QUANTUM = 1 << 19


@functools.lru_cache(maxsize=128)
def _inflate_prog(s: int, nmax: int, batch: int):
    """(S,) uint8 compact stream + (B,) offsets + (B,) lengths ->
    (B, nmax) uint8 padded batch (zeros past each block's length)."""

    @jax.jit
    def f(flat, offs, ns):
        def one(off, n):
            row = jax.lax.dynamic_slice(flat, (jnp.clip(off, 0, s - nmax),),
                                        (nmax,))
            pos = jnp.arange(nmax, dtype=jnp.int32)
            return jnp.where(pos < n, row, 0)

        return jax.vmap(one)(offs, ns)

    return f


def _upload_batch(arrs, idxs, ns, nmax: int, b_pad: int):
    """Stage a dispatch batch on device: compact-stream upload + device
    inflate when it saves meaningful transfer; plain (B, nmax) upload
    otherwise."""
    total = int(sum(arrs[i].size for i in idxs))
    s = max(-(-(total + nmax) // _UPLOAD_QUANTUM) * _UPLOAD_QUANTUM,
            _UPLOAD_QUANTUM)
    # the inflate is an extra dispatch (~23 ms tunnel latency), so it only
    # pays when the padding saved exceeds ~2 MB of transfer (measured: the
    # corpus batch's 1.3 MB padding is a wash) — heavily RLE1-collapsed or
    # ragged-tail batches are the winners
    if s + 4 * _UPLOAD_QUANTUM >= b_pad * nmax:
        batch = np.zeros((b_pad, nmax), dtype=np.uint8)
        for row, i in enumerate(idxs):
            batch[row, : arrs[i].size] = arrs[i]
        return jnp.asarray(batch)
    flat = np.zeros(s, dtype=np.uint8)
    offs = np.zeros(b_pad, dtype=np.int32)
    off = 0
    for row, i in enumerate(idxs):
        flat[off: off + arrs[i].size] = arrs[i]
        offs[row] = off
        off += arrs[i].size
    # dummy rows (row >= len(idxs)) read offset 0 with length 1 -> zeros-ish
    return _inflate_prog(s, nmax, b_pad)(jnp.asarray(flat), jnp.asarray(offs),
                                         jnp.asarray(ns))


@functools.lru_cache(maxsize=128)
def _batched_compress_one_dispatch(nmax: int, batch: int,
                                   tiers: tuple = (2, 4)):
    """The WHOLE compress for a batch as ONE jitted program (see
    _compress_core) — the two mid-compress host syncs of the split
    formulation (~25 ms tunnel round trip each) disappear.  Output is the
    merged [meta | payload] stream (one drain pull)."""
    return jax.jit(lambda data, ns: _compress_core(data, ns, batch, nmax,
                                                   False, merged=True))


# ---------------------------------------------------------------------------
# Production multi-device dispatch (SURVEY §2.4): the same one-dispatch
# compress program, shard_mapped over a 1-D local-device mesh.  Blocks are
# independent (own BWT shift, own Huffman table), so the program is purely
# block-parallel — no collectives; each device's compacted payload words
# come back in its own region of the block-sharded flat output.  The
# reference is a single main() on one core (/root/reference/main.cpp:415-457);
# this is the layer it lacks, now on the path api.compress_bytes uses.
# ---------------------------------------------------------------------------

# observability: the last compress/decompress device fan-out (asserted by
# the multichip dryrun and the sharding unit tests)
LAST_DISPATCH = {"compress_ndev": 1, "decompress_ndev": 1}


def _ndev_for(b_pad: int) -> int:
    """Devices to shard a b_pad-block dispatch over: largest power of two
    <= min(local devices, BMH_DEVICES cap, b_pad).  1 = single-device."""
    cap = config_mod.DEFAULT.devices
    if cap == 1:
        return 1
    try:
        nd = len(jax.local_devices())
    except Exception:
        return 1
    if cap > 0:
        nd = min(nd, cap)
    nd = min(nd, b_pad)
    return 1 << max(nd.bit_length() - 1, 0)


@functools.lru_cache(maxsize=128)
def _sharded_compress(nmax: int, batch: int, ndev: int, hard: bool,
                      tiers: tuple = (2, 4)):
    """_compress_core shard_mapped over ndev local devices (batch % ndev
    == 0).  Each device runs the identical program on its batch/ndev blocks;
    per-shard scalars (total_words) come back as (ndev,) so the host can
    pull exactly each device's compacted words."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel import mesh as mesh_mod

    mesh = mesh_mod.make_mesh(ndev, local=True)
    b_loc = batch // ndev

    def local(data, ns):
        return _compress_core(data, ns, b_loc, nmax, hard)

    sharded = shard_map(local, mesh=mesh,
                        in_specs=(P(mesh_mod.BLOCK_AXIS), P(mesh_mod.BLOCK_AXIS)),
                        out_specs=(P(mesh_mod.BLOCK_AXIS), P(mesh_mod.BLOCK_AXIS)),
                        check_vma=False)
    return jax.jit(sharded)


def _stage1_sparse(batch_j, ns_j, ns_np):
    """Batched stage 1 via sparse doubling (compress_stage1_fn outputs)."""
    b_pad, nmax = batch_j.shape
    rank = _sparse_ranks(batch_j, ns_j, ns_np)
    return _batched_finish(nmax, b_pad)(batch_j, ns_j, rank)


@functools.lru_cache(maxsize=128)
def _batched_stage2(nmax: int, batch: int):
    return jax.jit(jax.vmap(ops_huf.encode_bitpack))


@functools.lru_cache(maxsize=128)
def _batched_decode2(nmax: int, batch: int):
    return jax.jit(jax.vmap(decompress_stage2_fn))


def _compact_rows_diag(data, nsr, totals):
    """Device-side ragged row compaction + integrity trailer.

    Compacts the (B, nmax) padded output rows to a dense byte stream (the
    host pulls sum(ns) bytes instead of the padded plane), then appends one
    little-endian 4-byte decoded-total per row.  The trailer rides the SAME
    sort and the same single pull, so the corrupt-container check costs no
    extra tunnel round trip."""
    b_rows, nmax = data.shape
    offs = jnp.cumsum(nsr) - nsr
    total = jnp.sum(nsr)
    cap = b_rows * nmax + 4 * b_rows
    i_iota = jnp.arange(nmax, dtype=jnp.int32)[None, :]
    dest = jnp.where(i_iota < nsr[:, None], offs[:, None] + i_iota, cap)
    rows = jnp.arange(b_rows, dtype=jnp.int32)[:, None]
    kb = jnp.arange(4, dtype=jnp.int32)[None, :]
    dest_d = total + 4 * rows + kb
    val_d = ((totals[:, None] >> (8 * kb)) & 255).astype(data.dtype)
    dest_all = jnp.concatenate([dest.reshape(-1), dest_d.reshape(-1)])
    val_all = jnp.concatenate([data.reshape(-1), val_d.reshape(-1)])
    # data dests are unique in [0, total), trailer dests in [total,
    # total + 4B); only the cap sentinels tie -> unstable sort is sound
    _, flat = jax.lax.sort((dest_all, val_all), num_keys=1, is_stable=False)
    return flat


@functools.lru_cache(maxsize=128)
def _decode_flat(nc: int, nmax: int, batch: int, chunk_bits: int, maxl: int,
                 stride: int = ops_bwt.CURSOR_STRIDE,
                 place_mode: str = "sort"):
    """Fused flat Huffman gap decode + inverse MTF + cursor iBWT.

    Takes per-block code lengths; the canonical decode tables (per-length
    counts, symbol lists) are built on device (decode_tables_device), so
    the host does no per-block table work and ships (B, 257) lens instead
    of a (32, NC) broadcast table.  `stride` is the encoding file's cursor
    checkpoint spacing (container.file_stride); `place_mode` is the literal
    placement strategy (part of the cache key, so runtime config mutation
    of decode_place takes effect instead of hitting a stale program)."""
    kcp = max(max(nmax // stride, 1) - 1, 1)

    @jax.jit
    def f(words_flat, lens_all, seg_start, seg_start_idx, seg_id,
          ms, ns, shifts, cps):
        count_b, sym_b = jax.vmap(ops_huf.decode_tables_device)(lens_all)
        count_t = count_b[seg_id].T  # (32, NC)
        # fused gap decode + RLE0 inverse: MTF codes come out placed, with
        # run positions as the zero fill — no dense RLE0-symbol plane and
        # no symbol-placement scatter (VERDICT r3 item 2)
        codes, totals = ops_huf.gap_decode_rle0_flat(
            words_flat, count_t, seg_start, seg_start_idx, seg_id, sym_b,
            ms, ns, nmax, chunk_bits, maxl, place_mode=place_mode)

        def per_block(codes_b, shift, cp, n):
            last = ops_mtf.mtf_inverse(codes_b, n, MTF_CHUNK)
            return ops_bwt.bwt_inverse_cursors(last, shift, cp, n,
                                               stride=stride)

        b_real_rows = shifts.shape[0]
        data = jax.vmap(per_block)(codes[:b_real_rows], shifts, cps,
                                   ns[:b_real_rows])
        # compact ragged rows to the front (dest-sort, ~5 ms device) so the
        # host pulls sum(ns) bytes instead of the padded (B, nmax) plane —
        # RLE1'd corpus batches carry ~0.9 MB of padding (~22 ms of tunnel);
        # the decoded-total trailer rides the same sort/pull
        return _compact_rows_diag(data, ns[:b_real_rows],
                                  totals[:b_real_rows])

    return f, kcp


@functools.lru_cache(maxsize=128)
def _decode_flat_periodic(nc: int, nmax: int, batch: int, chunk_bits: int,
                          maxl: int):
    """Fused flat Huffman gap decode + RLE0⁻¹ + Pallas iMTF + permutation-
    doubling iBWT, for PERIODIC blocks (cursor checkpoints undefined: rank
    is not a bijection, ops/bwt.py bwt_forward_cp).  Same flat-chunk batch
    layout as `_decode_flat`; only the inverse-BWT tail differs.  This is
    the device route that replaced the sequential pure-Python oracle
    fallback, whose ~0.1 MB/s made a fully periodic stream (e.g. "abc"*N —
    RLE1 cannot collapse it) an accidental denial-of-service input."""

    @jax.jit
    def f(words_flat, lens_all, seg_start, seg_start_idx, seg_id,
          ms, ns, shifts):
        count_b, sym_b = jax.vmap(ops_huf.decode_tables_device)(lens_all)
        count_t = count_b[seg_id].T
        syms = ops_huf.gap_decode_flat(
            words_flat, count_t, seg_start, seg_start_idx, seg_id, sym_b,
            ms, nmax, chunk_bits, maxl)
        b_real = shifts.shape[0]
        totals = jax.vmap(ops_rle.rle0_decoded_len)(syms[:b_real],
                                                    ms[:b_real],
                                                    ns[:b_real])
        data = jax.vmap(decompress_stage2_fn)(syms[:b_real], ms[:b_real],
                                              shifts, ns[:b_real])
        return _compact_rows_diag(data, ns[:b_real], totals)

    return f


def _stage_flat_np(blocks: list[dict], idxs: list[int]):
    """Host-side staging shared by the flat-chunk decode dispatches: pack
    the batch's payload words plus per-block tables/scalars into the flat
    chunk layout (`_decode_flat` docstring).  Returns the np arrays plus
    the derived static shape parameters (nc, maxl, b_pad)."""
    wbytes = DECODE_CHUNK_BITS // 8
    b_pad = _next_pow2(len(idxs))
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
    lens_all = np.zeros((b_pad + 1, A), dtype=np.int32)
    seg_id = np.full(nc, b_pad, dtype=np.int32)
    seg_start = np.zeros(nc, dtype=bool)
    seg_start[nc_true:] = True
    seg_start_idx = np.arange(nc, dtype=np.int32)
    ns = np.ones(b_pad + 1, dtype=np.int32)
    ms = np.ones(b_pad + 1, dtype=np.int32)
    ms[b_pad] = 0
    shifts = np.zeros(b_pad, dtype=np.int32)
    for row, (i, (c0, nc_b)) in enumerate(zip(idxs, spans)):
        b = blocks[i]
        buf = b["payload"] + b"\x00" * (nc_b * wbytes - len(b["payload"]))
        words[c0 * wbytes // 4:(c0 + nc_b) * wbytes // 4] = np.frombuffer(
            buf, dtype=">u4").astype(np.uint32)
        lens_all[row, : np.asarray(b["lens"]).size] = np.asarray(b["lens"])
        seg_id[c0:c0 + nc_b] = row
        seg_start[c0] = True
        seg_start_idx[c0:c0 + nc_b] = c0
        ns[row] = int(b["orig_len"])
        ms[row] = int(b["rle_len"])
        shifts[row] = int(b["shift"])
    return (words, lens_all, seg_start, seg_start_idx, seg_id, ms, ns,
            shifts, nc, maxl, b_pad)


def _payload_bound_words(ns) -> int:
    """Speculative payload pull size for the merged [meta | payload] drain.

    The bound trades over-pull bytes against a saved ~23 ms pull latency:
    at the tunnel's ~24-37 MB/s, every MB of overshoot costs 27-42 ms, so
    the bound must sit just above the TYPICAL batch ratio, not the worst
    case.  Multi-file corpus batches compress to ~0.30x; 0.35x covers them
    with ~9% overshoot, and a batch compressing above it (Calgary: geo,
    obj-heavy single-file batches) pays one exact top-up pull — i.e.
    exactly the old two-pull cost."""
    return int(ns.sum()) * 7 // 80 + 64  # 0.35 * bytes / 4 bytes-per-word


def _drain_compress(entry, results, annotate):
    """Pull one pending compress dispatch's outputs and assemble per-block
    result dicts.

    Single-device dispatches return the merged [meta | payload] uint32
    stream: ONE tunnel round trip fetches the meta matrix plus a
    0.35x-input-size payload bound (each pull costs ~23 ms of pure
    latency — TRACE_r04 measured ten split pulls at 230 ms/pass); only a
    batch compressing above the bound pays a second, exactly-sized pull.
    Sharded dispatches keep the (flat, meta) pair: per-device regions must
    be pulled separately anyway."""
    idxs, ns, out, ndev, nmax = entry
    with annotate("compress_assemble"):
        if ndev == 1:
            b_pad = _next_pow2(len(idxs))
            cols = meta_cols(nmax)
            msize = b_pad * cols
            k0 = min(_payload_bound_words(ns),
                     int(out.shape[0]) - msize)
            head = np.asarray(out[: msize + k0])  # pull 1 (usually the only)
            meta_np = head[:msize].view(np.int32).reshape(b_pad, cols)
        else:
            flat, meta = out
            meta_np = np.asarray(meta)  # pull 1
        bits_np = meta_np[:, 0]
        nw_np = meta_np[:, 1]
        shifts_np = meta_np[:, 2]
        ms_np = meta_np[:, 3]
        aper_np = meta_np[:, 4]
        present_np = ((meta_np[:, 5:14, None] >> np.arange(32)) & 1) \
            .reshape(meta_np.shape[0], 288)[:, :257].astype(bool)
        lens_np = ((meta_np[:, 14:79, None] >> (8 * np.arange(4))) & 0xFF) \
            .reshape(meta_np.shape[0], 260)[:, :257].astype(np.uint8)
        cps_np = meta_np[:, _META_FIXED:]
        if ndev > 1:
            # block-sharded layout: device d's compacted words occupy
            # flat[d*b_loc*W : d*b_loc*W + its own total]; pull exactly
            # those regions and rebase per-row offsets onto their
            # concatenation
            b_pad_out = nw_np.size
            b_loc = b_pad_out // ndev
            w_cap = flat.shape[0] // b_pad_out
            nw2 = nw_np.reshape(ndev, b_loc)
            tw = nw2.sum(axis=1)
            flat_np = np.concatenate([
                np.asarray(flat[d * b_loc * w_cap:
                                d * b_loc * w_cap + int(tw[d])])
                for d in range(ndev)]).astype(">u4")
            base = np.concatenate([[0], np.cumsum(tw)[:-1]])
            woffs_np = (np.cumsum(nw2, axis=1) - nw2
                        + base[:, None]).reshape(-1)
        else:
            woffs_np = np.cumsum(nw_np) - nw_np
            total_w = int(nw_np.sum())
            if total_w <= k0:
                flat_np = head[msize: msize + total_w].astype(">u4")
            else:
                # payload exceeded the speculative bound: one exact top-up
                tail = np.asarray(out[msize + k0: msize + total_w])
                flat_np = np.concatenate([head[msize:], tail]).astype(">u4")

        for row, i in enumerate(idxs):
            tb = int(bits_np[row])
            n = int(ns[row])
            w0 = int(woffs_np[row])
            payload = (flat_np[w0: w0 + int(nw_np[row])]
                       .tobytes()[: (tb + 7) // 8]
                       if (lens_np[row] > 0).any() else b"")
            results[i] = {
                "orig_len": n,
                "shift": int(shifts_np[row]),
                "lens": lens_np[row],
                "present": present_np[row],
                "payload": payload,
                "total_bits": tb,
                "rle_len": int(ms_np[row]),
                "cps": cps_np[row, : _n_cps(n)] if aper_np[row] else None,
            }


def _drain_decompress(entry, results):
    """Pull one pending flat-decode dispatch (a compacted byte stream —
    sum(ns) bytes plus a 4-byte/row decoded-total trailer, not the padded
    (B, nmax) plane), verify each real block's total, and slice per block.

    The total check is what turns a CRC-valid container with lying fields
    (rle_len, payload, lens) into a clean ValueError instead of silently
    wrong bytes of the right length."""
    idxs, ns, flat = entry
    nsr = ns[: ns.size - 1]  # drop the pad-chunk dummy row
    offs = np.cumsum(nsr) - nsr
    total = int(nsr.sum())
    flat_np = np.asarray(flat[: total + 4 * nsr.size])
    totals = np.frombuffer(flat_np[total:].tobytes(), dtype="<u4")
    for row, i in enumerate(idxs):
        if int(totals[row]) != int(nsr[row]):
            raise ValueError(
                f"corrupt container: block {i}'s RLE0 stream decodes to "
                f"{int(totals[row])} bytes, expected {int(nsr[row])}")
        results[i] = flat_np[offs[row]: offs[row] + int(nsr[row])]


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
        shapes; dispatches are still capped at config.max_dispatch blocks,
        so a large multi-stream batch runs as a short sequence of
        fixed-shape dispatches)."""
        results: list[dict | None] = [None] * len(blocks)
        groups: dict[tuple[int, bool], list[int]] = defaultdict(list)
        arrs = [np.asarray(b, dtype=np.uint8) for b in blocks]
        for i, blk in enumerate(arrs):
            nmax = max(bucket, _bucket(blk.size)) if bucket else _bucket(blk.size)
            groups[(nmax, _looks_pathological(blk))].append(i)

        # Phase 1 — dispatch every chunk's device work (async): the whole
        # encode (BWT -> MTF -> RLE0 -> histogram -> two-queue lengths ->
        # canonical codes -> bitpack) is one fused program per batch.
        from ..utils.tracing import annotate

        pending = []
        for (nmax, _hard), all_idxs in groups.items():
          for idxs in _chunks(all_idxs):
            b_real = len(idxs)
            b_pad = _next_pow2(b_real)
            ns = np.ones(b_pad, dtype=np.int32)  # dummy rows compress n=1
            for row, i in enumerate(idxs):
                ns[row] = arrs[i].size
            batch_j = _upload_batch(arrs, idxs, ns, nmax, b_pad)
            ns_j = jnp.asarray(ns)
            ndev = _ndev_for(b_pad)
            LAST_DISPATCH["compress_ndev"] = ndev
            with annotate(f"compress_dispatch_b{b_pad}"):
              if ndev > 1:
                # multi-chip host: shard the batch over the local mesh
                # (_hard picks the full-rounds program per shard)
                out = _sharded_compress(nmax, b_pad, ndev, _hard,
                                        _tier_key())(batch_j, ns_j)
              elif _hard:
                # run-dominated blocks (many doubling rounds, most positions
                # tied for a long time): the classic fused full-rounds
                # program skips the sparse machinery entirely
                out = _batched_full(nmax, b_pad)(batch_j, ns_j)
              else:
                out = _batched_compress_one_dispatch(
                    nmax, b_pad, _tier_key())(batch_j, ns_j)
            pending.append((idxs, ns, out, ndev, nmax))
            # bound the in-flight dispatch window: with hundreds of batches
            # (a 1 GiB stream is 256), an unbounded pending list pins every
            # batch's padded outputs in HBM at once (measured: 1 GiB
            # decompress degraded 1.5x vs 4x256 MB); draining the oldest
            # keeps a few batches overlapping host assembly with device work
            while len(pending) > config_mod.DEFAULT.inflight:
                _drain_compress(pending.pop(0), results, annotate)

        # Phase 2 — pull the remaining results; later chunks keep executing
        # on the device while earlier ones are packaged here.  Only the
        # first total_words of the compacted word stream cross the tunnel
        # (~ the compressed size), not the padded (B, W) buffer.
        for entry in pending:
            _drain_compress(entry, results, annotate)
        return results  # type: ignore[return-value]
    def decompress_blocks(self, blocks: list[dict],
                          bucket: int | None = None) -> list[np.ndarray]:
        """bucket: force a uniform padded block size so a heterogeneous batch
        shares one compiled shape; dispatches are capped at
        config.max_dispatch blocks each."""
        results: list[np.ndarray | None] = [None] * len(blocks)

        def blk_bucket(n: int) -> int:
            return max(bucket, _bucket(n)) if bucket else _bucket(n)

        # multi-symbol cursor-eligible blocks: flat gap decode + iMTF + cursor
        # iBWT, grouped by block bucket.  Single-symbol blocks skip Huffman;
        # periodic blocks (no valid checkpoints, > one stride) take the same
        # flat decode with a permutation-doubling iBWT tail.
        fgroups: dict[int, list[int]] = defaultdict(list)
        sgroups: dict[int, list[int]] = defaultdict(list)
        pgroups: dict[int, list[int]] = defaultdict(list)
        for i, b in enumerate(blocks):
            n = int(b["orig_len"])
            stride_b = int(b.get("stride", ops_bwt.CURSOR_STRIDE))
            present = np.asarray(b["present"])
            if n == 0:
                results[i] = np.zeros(0, dtype=np.uint8)
            elif int(present.sum()) == 1:
                sgroups[blk_bucket(n)].append(i)
            elif b.get("cps") is None and n > stride_b:
                pgroups[blk_bucket(n)].append(i)
            else:
                fgroups[(blk_bucket(n), stride_b)].append(i)

        # multi-chip host: successive dispatches round-robin over the local
        # devices (each dispatch is one committed-input jit call; blocks are
        # independent so no collectives are needed and the per-dispatch
        # program is unchanged — a 1-chip host behaves exactly as before)
        try:
            devs = jax.local_devices()
        except Exception:
            devs = [None]
        cap = config_mod.DEFAULT.devices
        if cap > 0:
            devs = devs[:cap]

        pending = []  # dispatched flat-decode chunks awaiting their pull
        n_dispatched = 0          # monotonic: round-robin device index (the
        used_devs: set = set()    # len(pending)-based index degenerated to one
        for (nmax, stride_g), f_idxs in fgroups.items():  # device once the inflight window saturated)
          for idxs in _chunks(f_idxs):
            (words, lens_all, seg_start, seg_start_idx, seg_id, ms, ns,
             shifts, nc, maxl, b_pad) = _stage_flat_np(blocks, idxs)
            fn, kcp = _decode_flat(nc, nmax, b_pad, DECODE_CHUNK_BITS, maxl,
                                   stride_g, config_mod.DEFAULT.decode_place)
            cps = np.zeros((b_pad, kcp), dtype=np.int32)
            for row, i in enumerate(idxs):
                bc = blocks[i].get("cps")
                if bc is not None and len(bc) > 0:
                    cc = np.asarray(bc, dtype=np.int32)[:kcp]
                    cps[row, : cc.size] = cc

            dev = devs[n_dispatched % len(devs)]
            n_dispatched += 1
            used_devs.add(id(dev))
            put = ((lambda x: jax.device_put(x, dev)) if dev is not None
                   else jnp.asarray)
            data = fn(put(words), put(lens_all),
                      put(seg_start), put(seg_start_idx), put(seg_id),
                      put(ms), put(ns), put(shifts), put(cps))
            pending.append((idxs, ns, data))
            # bound in-flight outputs (see compress_blocks): keep at least
            # one dispatch per device in flight so round-robin still overlaps
            while len(pending) > max(config_mod.DEFAULT.inflight, len(devs)):
                _drain_decompress(pending.pop(0), results)

        # periodic blocks (degenerate, e.g. "abc"*N filling a block — RLE1
        # does not collapse it): same flat decode front end, permutation-
        # doubling iBWT tail.  A device dispatch like any other — the
        # sequential pure-Python oracle fallback this replaces decoded at
        # ~0.1 MB/s (VERDICT r4 weak #3)
        for nmax, p_idxs in pgroups.items():
          for idxs in _chunks(p_idxs):
            (words, lens_all, seg_start, seg_start_idx, seg_id, ms, ns,
             shifts, nc, maxl, b_pad) = _stage_flat_np(blocks, idxs)
            fn = _decode_flat_periodic(nc, nmax, b_pad, DECODE_CHUNK_BITS,
                                       maxl)
            dev = devs[n_dispatched % len(devs)]
            n_dispatched += 1
            used_devs.add(id(dev))
            put = ((lambda x: jax.device_put(x, dev)) if dev is not None
                   else jnp.asarray)
            data = fn(put(words), put(lens_all),
                      put(seg_start), put(seg_start_idx), put(seg_id),
                      put(ms), put(ns), put(shifts))
            pending.append((idxs, ns, data))
            while len(pending) > max(config_mod.DEFAULT.inflight, len(devs)):
                _drain_decompress(pending.pop(0), results)
        LAST_DISPATCH["decompress_ndev"] = max(1, len(used_devs))

        for entry in pending:
            _drain_decompress(entry, results)

        # single-symbol blocks: materialise the constant RLE0 stream, then
        # inverse transforms only (doubling iBWT — degenerate inputs may be
        # periodic, where cursor checkpoints are undefined)
        for nmax, s_idxs in sgroups.items():
          for idxs in _chunks(s_idxs):
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
