"""shard_map data parallelism over blocks + collective gather of results.

The codec's scaling story (SURVEY §2.4): shard a batch of independent blocks
over a 1-D mesh, compress locally, then gather (lengths, padded payloads) in
block order with XLA collectives so host 0 can assemble the container.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from ..models.pipeline import compress_stage1_fn, decompress_stage2_fn
from ..ops import huffman as ops_huf
from .mesh import BLOCK_AXIS


def _uniform_tables():
    """The trivial 8-bit canonical code (code[s] = s): a valid Huffman table
    for the uniform histogram, used where a fixed on-device table is needed
    (dry runs, warmup) without the host code-length step."""
    import numpy as np

    lens = np.full(256, 8, dtype=np.uint8)
    enc_len = jnp.asarray(lens.astype(np.int32))
    enc_code = jnp.asarray(np.arange(256, dtype=np.uint32))
    t = ops_huf.decode_tables(lens)
    dec = {k: jnp.asarray(v) for k, v in t.items()}
    return enc_len, enc_code, dec


def make_sharded_stage1(mesh, nmax: int):
    """Batched compress stage 1, block-sharded over the mesh.

    (B, nmax) uint8, (B,) int32 -> (codes (B,nmax), freqs (B,256), shifts (B,)).
    B must be divisible by mesh size.
    """
    fn = jax.vmap(compress_stage1_fn)
    sharded = shard_map(fn, mesh=mesh,
                        in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS)),
                        out_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS)),
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
                        in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS)),
                        out_specs=P(BLOCK_AXIS), check_vma=False)
    return jax.jit(sharded)


def make_roundtrip_step(mesh, nmax: int, chunk_bits: int = 256):
    """Full on-device round-trip over a sharded block batch.

    Compress (BWT -> MTF -> bitpack with the fixed uniform table), decode it
    all back, verify, and reduce with collectives: per-device byte-match
    counts are psum'd over the block axis and compressed bit counts
    all_gather'd in block order (the container-assembly communication
    pattern).  This is the "training step" analogue the multi-chip dry run
    compiles and executes.
    """
    enc_len, enc_code, dec_tbl = _uniform_tables()
    w_enc = (9 * nmax + 31) // 32 + 1
    w_pad = ((w_enc * 32 + chunk_bits - 1) // chunk_bits) * chunk_bits // 32

    def local(data, ns):
        codes, freqs, shifts = jax.vmap(compress_stage1_fn)(data, ns)
        lens_b = jnp.broadcast_to(enc_len, (data.shape[0], 256))
        code_b = jnp.broadcast_to(enc_code, (data.shape[0], 256))
        words, bits = jax.vmap(ops_huf.encode_bitpack)(codes, ns, lens_b, code_b)
        words = jnp.pad(words, ((0, 0), (0, w_pad - w_enc)))
        dec_codes = jax.vmap(
            lambda w, n: ops_huf.gap_decode(w, dec_tbl, n, chunk_bits=chunk_bits)
        )(words, ns)
        dec_codes = dec_codes[:, :nmax]
        out = jax.vmap(decompress_stage2_fn)(dec_codes, shifts, ns)
        pos = jnp.arange(nmax, dtype=jnp.int32)[None, :]
        ok = jnp.sum((out == data) & (pos < ns[:, None]))
        total_ok = jax.lax.psum(ok, BLOCK_AXIS)
        all_bits = jax.lax.all_gather(bits, BLOCK_AXIS, tiled=True)
        return out, total_ok, all_bits

    sharded = shard_map(local, mesh=mesh,
                        in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS)),
                        out_specs=(P(BLOCK_AXIS), P(), P()), check_vma=False)
    return jax.jit(sharded)
