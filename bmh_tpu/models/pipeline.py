"""Batched, jitted TPU block-codec pipeline — the production backend.

Compress: bwt_forward -> mtf_forward -> histogram (one fused jit), host-side
256-entry canonical code-length build, then the jitted bitpack encoder.
Decompress: jitted gap decoder, then fused inverse MTF + inverse BWT.

Blocks are padded into power-of-two size buckets so a handful of XLA
compilations serve arbitrary inputs; true lengths are traced scalars.
This mirrors the reference pipelines compress/decompress
(/root/reference/main.cpp:300-345) with every hot loop replaced by a
parallel device kernel (SURVEY §2.3 build obligations).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import bwt as ops_bwt
from ..ops import huffman as ops_huf
from ..ops import mtf as ops_mtf

MIN_BUCKET = 256
MTF_CHUNK = 128
DECODE_CHUNK_BITS = 2048


def _next_pow2(x: int) -> int:
    return 1 << max(x - 1, 1).bit_length()


def _bucket(n: int) -> int:
    return max(MIN_BUCKET, _next_pow2(n))


@functools.lru_cache(maxsize=64)
def _compress_stage1(nmax: int):
    @jax.jit
    def f(data, n):
        last, shift = ops_bwt.bwt_forward(data, n)
        codes = ops_mtf.mtf_forward(last, n, MTF_CHUNK)
        freqs = ops_huf.histogram(codes, n)
        return codes, freqs, shift

    return f


@functools.lru_cache(maxsize=64)
def _compress_stage2(nmax: int):
    @jax.jit
    def f(codes, n, len_tbl, code_tbl):
        return ops_huf.encode_bitpack(codes, n, len_tbl, code_tbl)

    return f


@functools.lru_cache(maxsize=64)
def _decompress_stage1(nwords: int, chunk_bits: int):
    @jax.jit
    def f(words, count, first, offset, sym, n):
        tables = {"count": count, "first": first, "offset": offset, "sym": sym}
        return ops_huf.gap_decode(words, tables, n, chunk_bits=chunk_bits)

    return f


@functools.lru_cache(maxsize=64)
def _decompress_stage2(nmax: int):
    @jax.jit
    def f(codes, shift, n):
        last = ops_mtf.mtf_inverse(codes, n, MTF_CHUNK)
        return ops_bwt.bwt_inverse(last, shift, n)

    return f


class JaxBackend:
    """Block codec on the default JAX device (TPU when present)."""

    name = "jax"

    def compress_blocks(self, blocks: list[np.ndarray]) -> list[dict]:
        out = []
        for blk in blocks:
            blk = np.asarray(blk, dtype=np.uint8)
            n = blk.size
            nmax = _bucket(n)
            padded = np.zeros(nmax, dtype=np.uint8)
            padded[:n] = blk
            codes, freqs, shift = _compress_stage1(nmax)(jnp.asarray(padded), jnp.int32(n))
            freqs_np = np.asarray(freqs)
            lens = ops_huf.code_lengths_from_hist(freqs_np)
            if (lens > 0).sum() == 0:
                # zero or one distinct symbol: empty payload
                out.append({
                    "orig_len": n,
                    "shift": int(shift),
                    "lens": lens,
                    "freqs": freqs_np,
                    "payload": b"",
                    "total_bits": 0,
                })
                continue
            code_tbl = ops_huf.canonical_code_table(lens)
            words, total_bits = _compress_stage2(nmax)(
                codes, jnp.int32(n),
                jnp.asarray(lens.astype(np.int32)), jnp.asarray(code_tbl))
            tb = int(total_bits)
            payload = np.asarray(words).astype(">u4").tobytes()[: (tb + 7) // 8]
            out.append({
                "orig_len": n,
                "shift": int(shift),
                "lens": lens,
                "freqs": freqs_np,
                "payload": payload,
                "total_bits": tb,
            })
        return out

    def decompress_blocks(self, blocks: list[dict]) -> list[np.ndarray]:
        out = []
        for b in blocks:
            n = int(b["orig_len"])
            if n == 0:
                out.append(np.zeros(0, dtype=np.uint8))
                continue
            nmax = _bucket(n)
            present = np.asarray(b["present"])
            lens = np.asarray(b["lens"])
            if int(present.sum()) == 1:
                sym = int(np.nonzero(present)[0][0])
                codes_padded = np.zeros(nmax, dtype=np.uint8)
                codes_padded[:n] = sym
                codes_dev = jnp.asarray(codes_padded)
            else:
                payload = b["payload"]
                chunk_bits = DECODE_CHUNK_BITS
                wbytes = chunk_bits // 8
                # pad payload to a pow2 number of chunks to bound compilations
                nchunks = max(1, -(-len(payload) // wbytes))
                nchunks = _next_pow2(nchunks) if nchunks > 1 else 1
                buf = payload + b"\x00" * (nchunks * wbytes - len(payload))
                words = np.frombuffer(buf, dtype=">u4").astype(np.uint32)
                tbl = ops_huf.decode_tables(lens)
                decoded = _decompress_stage1(words.size, chunk_bits)(
                    jnp.asarray(words), jnp.asarray(tbl["count"]), jnp.asarray(tbl["first"]),
                    jnp.asarray(tbl["offset"]), jnp.asarray(tbl["sym"]), jnp.int32(n))
                dec_np = np.asarray(decoded)
                codes_padded = np.zeros(nmax, dtype=np.uint8)
                codes_padded[:n] = dec_np[:n]
                codes_dev = jnp.asarray(codes_padded)
            data = _decompress_stage2(nmax)(codes_dev, jnp.int32(b["shift"]), jnp.int32(n))
            out.append(np.asarray(data)[:n])
        return out
