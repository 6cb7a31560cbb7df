"""shard_map data parallelism over blocks + collective gather of results.

The codec's scaling story (SURVEY §2.4): shard a batch of independent blocks
over a 1-D mesh, compress locally with *real per-block Huffman tables*
(device histogram -> host canonical code lengths -> device encode/decode),
then reduce with XLA collectives — per-device byte-match counts psum'd over
the block axis and compressed bit counts all_gather'd in block order (the
container-assembly communication pattern).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..models.pipeline import compress_stage1_fn, decompress_stage2_fn
from ..ops import bwt as ops_bwt
from ..ops import huffman as ops_huf
from ..ops import mtf as ops_mtf
from ..ops import rle as ops_rle
from .mesh import BLOCK_AXIS

A = ops_rle.RLE_ALPHABET


def make_sharded_stage1(mesh, nmax: int):
    """Batched compress stage 1, block-sharded over the mesh.

    (B, nmax) uint8, (B,) int32 -> (syms, ms, freqs, shifts, cps,
    aperiodic), all leading-B sharded.  B must be divisible by mesh size.
    """
    fn = jax.vmap(compress_stage1_fn)
    sharded = shard_map(fn, mesh=mesh,
                        in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS)),
                        out_specs=tuple(P(BLOCK_AXIS) for _ in range(6)),
                        check_vma=False)
    return jax.jit(sharded)


def make_sharded_encode(mesh, nmax: int):
    fn = jax.vmap(ops_huf.encode_bitpack)
    sharded = shard_map(fn, mesh=mesh,
                        in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS)),
                        out_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS)),
                        check_vma=False)
    return jax.jit(sharded)


def make_sharded_decode2(mesh, nmax: int):
    fn = jax.vmap(decompress_stage2_fn)
    sharded = shard_map(fn, mesh=mesh,
                        in_specs=(P(BLOCK_AXIS),) * 4,
                        out_specs=P(BLOCK_AXIS), check_vma=False)
    return jax.jit(sharded)


def host_tables(freqs: np.ndarray):
    """Per-block canonical tables from a (B, 256) histogram batch.

    The host-side step of the distributed flow (256-entry work per block —
    not device-worthy).  Returns dict of (B, ...) arrays for the round-trip
    step: encode lens/codes + decode count/sym.
    """
    b = freqs.shape[0]
    enc_len = np.zeros((b, A), np.int32)
    enc_code = np.zeros((b, A), np.uint32)
    count = np.zeros((b, 32), np.int32)
    sym = np.zeros((b, A), np.int32)
    maxl = 1
    for row in range(b):
        lens = ops_huf.code_lengths_from_hist(freqs[row])
        enc_len[row] = lens.astype(np.int32)
        if (lens > 0).any():
            enc_code[row] = ops_huf.canonical_code_table(lens)
            maxl = max(maxl, int(lens.max()))
        t = ops_huf.decode_tables(lens)
        count[row] = t["count"]
        sym[row] = t["sym"][:A]
    return {"enc_len": enc_len, "enc_code": enc_code, "count": count,
            "sym": sym, "maxl": maxl}


def make_roundtrip_step(mesh, nmax: int, chunk_bits: int = 256,
                        mtf_chunk: int = 128):
    """Full on-device round-trip over a sharded block batch with real tables.

    step(data (B,nmax) u8, ns (B,), enc_len (B,257), enc_code (B,257),
         count (B,32), sym (B,257)) ->
        (decoded (B,nmax), total_ok scalar, all_bits (B,))

    Per device: BWT+MTF -> canonical bitpack with that block's table ->
    flattened gap decode (ops/huffman.gap_decode_flat, scan fallback off-TPU)
    -> inverse MTF -> checkpointed cursor iBWT — i.e. the production kernel
    path, not a uniform-table stand-in.  Collectives: psum of byte-match
    counts, tiled all_gather of compressed bit counts over ICI.
    """
    w_enc = ops_huf.words_cap(nmax)
    # pad so each block's chunk count is a multiple of 8 (flat-decode tiling)
    align_bits = 8 * chunk_bits
    nc_b = (w_enc * 32 + align_bits - 1) // align_bits * 8
    w_pad = nc_b * chunk_bits // 32

    def local(data, ns, enc_len, enc_code, count, sym):
        bl = data.shape[0]
        nc = bl * nc_b
        syms, ms, freqs, shifts, cps, aper = jax.vmap(compress_stage1_fn)(data, ns)
        words, bits = jax.vmap(ops_huf.encode_bitpack)(syms, ms, enc_len, enc_code)
        words = jnp.pad(words, ((0, 0), (0, w_pad - w_enc)))

        # flat decode across this device's blocks
        count_t = jnp.repeat(count.T, nc_b, axis=1)            # (32, nc)
        cidx = jnp.arange(nc, dtype=jnp.int32)
        seg_id = cidx // nc_b
        seg_start = (cidx % nc_b) == 0
        seg_start_idx = seg_id * nc_b
        dec_syms = ops_huf.gap_decode_flat(
            words.reshape(-1), count_t, seg_start, seg_start_idx, seg_id,
            sym, ms, nmax, chunk_bits)

        def per_block(syms_b, m, shift, cp, n):
            codes_b = ops_rle.rle0_decode(syms_b, m, n)
            last = ops_mtf.mtf_inverse(codes_b, n, mtf_chunk)
            return ops_bwt.bwt_inverse_cursors(last, shift, cp, n)

        out = jax.vmap(per_block)(dec_syms[:bl], ms, shifts, cps, ns)
        pos = jnp.arange(nmax, dtype=jnp.int32)[None, :]
        ok = jnp.sum((out == data) & (pos < ns[:, None]))
        total_ok = jax.lax.psum(ok, BLOCK_AXIS)
        all_bits = jax.lax.all_gather(bits, BLOCK_AXIS, tiled=True)
        return out, total_ok, all_bits

    sharded = shard_map(local, mesh=mesh,
                        in_specs=(P(BLOCK_AXIS),) * 6,
                        out_specs=(P(BLOCK_AXIS), P(), P()), check_vma=False)
    return jax.jit(sharded)
