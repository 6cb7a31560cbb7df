"""Batched, jitted TPU block-codec pipeline — the production backend.

Compress: bwt_forward -> mtf_forward -> histogram (one fused jit), host-side
256-entry canonical code-length build, then the jitted bitpack encoder.
Decompress: jitted gap decoder, then fused inverse MTF + inverse BWT.

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

MIN_BUCKET = 256
MTF_CHUNK = 128
DECODE_CHUNK_BITS = 512


def _next_pow2(x: int) -> int:
    return 1 << max(x - 1, 1).bit_length()


def _bucket(n: int) -> int:
    return max(MIN_BUCKET, _next_pow2(n))


# ---------------------------------------------------------------------------
# Jitted batched stages (cached per static shape)
# ---------------------------------------------------------------------------

def compress_stage1_fn(data, n):
    """(nmax,) uint8, scalar n -> (mtf codes, 256-histogram, bwt shift)."""
    last, shift = ops_bwt.bwt_forward(data, n)
    codes = ops_mtf.mtf_forward(last, n, MTF_CHUNK)
    freqs = ops_huf.histogram(codes, n)
    return codes, freqs, shift


def decompress_stage2_fn(codes, shift, n):
    """(nmax,) uint8 MTF codes -> original block bytes."""
    last = ops_mtf.mtf_inverse(codes, n, MTF_CHUNK)
    return ops_bwt.bwt_inverse(last, shift, n)


@functools.lru_cache(maxsize=128)
def _batched_stage1(nmax: int, batch: int):
    return jax.jit(jax.vmap(compress_stage1_fn))


@functools.lru_cache(maxsize=128)
def _batched_stage2(nmax: int, batch: int):
    return jax.jit(jax.vmap(ops_huf.encode_bitpack))


@functools.lru_cache(maxsize=128)
def _batched_decode_full(nwords: int, nmax: int, batch: int, chunk_bits: int):
    """Fused Huffman gap decode + inverse MTF + inverse BWT: one dispatch."""
    nout = nwords * 32 // chunk_bits * chunk_bits
    keep = min(nout, nmax)

    def f(words, count, first, offset, sym, shift, n):
        tables = {"count": count, "first": first, "offset": offset, "sym": sym}
        dec = ops_huf.gap_decode(words, tables, n, chunk_bits=chunk_bits)
        codes = jnp.zeros(nmax, dtype=jnp.uint8).at[:keep].set(dec[:keep])
        return decompress_stage2_fn(codes, shift, n)

    return jax.jit(jax.vmap(f))


@functools.lru_cache(maxsize=128)
def _batched_decode2(nmax: int, batch: int):
    return jax.jit(jax.vmap(decompress_stage2_fn))


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
        groups: dict[int, list[int]] = defaultdict(list)
        arrs = [np.asarray(b, dtype=np.uint8) for b in blocks]
        for i, blk in enumerate(arrs):
            groups[max(bucket, _bucket(blk.size)) if bucket else _bucket(blk.size)].append(i)

        for nmax, idxs in groups.items():
            b_real = len(idxs)
            b_pad = _next_pow2(b_real)
            batch = np.zeros((b_pad, nmax), dtype=np.uint8)
            ns = np.ones(b_pad, dtype=np.int32)  # dummy rows compress n=1
            for row, i in enumerate(idxs):
                batch[row, : arrs[i].size] = arrs[i]
                ns[row] = arrs[i].size
            codes, freqs, shifts = _batched_stage1(nmax, b_pad)(
                jnp.asarray(batch), jnp.asarray(ns))
            freqs_np = np.asarray(freqs)
            shifts_np = np.asarray(shifts)

            lens_all = np.zeros((b_pad, 256), dtype=np.uint8)
            code_tbls = np.zeros((b_pad, 256), dtype=np.uint32)
            for row in range(b_real):
                lens_all[row] = ops_huf.code_lengths_from_hist(freqs_np[row])
                if (lens_all[row] > 0).any():
                    code_tbls[row] = ops_huf.canonical_code_table(lens_all[row])
            words, total_bits = _batched_stage2(nmax, b_pad)(
                codes, jnp.asarray(ns),
                jnp.asarray(lens_all.astype(np.int32)), jnp.asarray(code_tbls))
            words_np = np.asarray(words)
            bits_np = np.asarray(total_bits)

            for row, i in enumerate(idxs):
                tb = int(bits_np[row])
                payload = (words_np[row].astype(">u4").tobytes()[: (tb + 7) // 8]
                           if (lens_all[row] > 0).any() else b"")
                results[i] = {
                    "orig_len": int(ns[row]),
                    "shift": int(shifts_np[row]),
                    "lens": lens_all[row],
                    "freqs": freqs_np[row],
                    "payload": payload,
                    "total_bits": tb,
                }
        return results  # type: ignore[return-value]

    def decompress_blocks(self, blocks: list[dict],
                          bucket: int | None = None,
                          chunk_bucket: int | None = None) -> list[np.ndarray]:
        """bucket / chunk_bucket: force uniform padded block / payload-chunk
        sizes so a heterogeneous batch becomes one dispatch."""
        results: list[np.ndarray | None] = [None] * len(blocks)

        def blk_bucket(n: int) -> int:
            return max(bucket, _bucket(n)) if bucket else _bucket(n)

        # multi-symbol blocks: fused gap decode + iMTF + iBWT, grouped by
        # (padded chunk count, block bucket); single-symbol blocks skip the
        # Huffman stage and only need the inverse transforms
        dgroups: dict[tuple[int, int], list[int]] = defaultdict(list)
        sgroups: dict[int, list[int]] = defaultdict(list)
        for i, b in enumerate(blocks):
            n = int(b["orig_len"])
            present = np.asarray(b["present"])
            if n == 0:
                results[i] = np.zeros(0, dtype=np.uint8)
            elif int(present.sum()) == 1:
                sgroups[blk_bucket(n)].append(i)
            else:
                wbytes = DECODE_CHUNK_BITS // 8
                nchunks = max(1, -(-len(b["payload"]) // wbytes))
                nchunks = _next_pow2(nchunks) if nchunks > 1 else 1
                if chunk_bucket:
                    nchunks = max(nchunks, chunk_bucket)
                dgroups[(nchunks, blk_bucket(n))].append(i)

        for (nchunks, nmax), idxs in dgroups.items():
            wbytes = DECODE_CHUNK_BITS // 8
            nwords = nchunks * wbytes // 4
            b_real = len(idxs)
            b_pad = _next_pow2(b_real)
            words = np.zeros((b_pad, nwords), dtype=np.uint32)
            ns = np.ones(b_pad, dtype=np.int32)
            shifts = np.zeros(b_pad, dtype=np.int32)
            tb = {k: np.zeros((b_pad, *np.shape(v)), dtype=np.asarray(v).dtype)
                  for k, v in ops_huf.decode_tables(np.zeros(256)).items()}
            for row, i in enumerate(idxs):
                b = blocks[i]
                buf = b["payload"] + b"\x00" * (nchunks * wbytes - len(b["payload"]))
                words[row] = np.frombuffer(buf, dtype=">u4").astype(np.uint32)
                ns[row] = int(b["orig_len"])
                shifts[row] = int(b["shift"])
                t = ops_huf.decode_tables(np.asarray(b["lens"]))
                for k in t:
                    tb[k][row] = t[k]
            data = _batched_decode_full(nwords, nmax, b_pad, DECODE_CHUNK_BITS)(
                jnp.asarray(words), jnp.asarray(tb["count"]), jnp.asarray(tb["first"]),
                jnp.asarray(tb["offset"]), jnp.asarray(tb["sym"]),
                jnp.asarray(shifts), jnp.asarray(ns))
            data_np = np.asarray(data)
            for row, i in enumerate(idxs):
                results[i] = data_np[row, : int(ns[row])]

        # single-symbol blocks: materialise codes, inverse transforms only
        for nmax, idxs in sgroups.items():
            b_real = len(idxs)
            b_pad = _next_pow2(b_real)
            batch = np.zeros((b_pad, nmax), dtype=np.uint8)
            ns = np.ones(b_pad, dtype=np.int32)
            shifts = np.zeros(b_pad, dtype=np.int32)
            for row, i in enumerate(idxs):
                b = blocks[i]
                n = int(b["orig_len"])
                sym = int(np.nonzero(np.asarray(b["present"]))[0][0])
                batch[row, :n] = sym
                ns[row] = n
                shifts[row] = int(b["shift"])
            data = _batched_decode2(nmax, b_pad)(
                jnp.asarray(batch), jnp.asarray(shifts), jnp.asarray(ns))
            data_np = np.asarray(data)
            for row, i in enumerate(idxs):
                results[i] = data_np[row, : int(ns[row])]
        return results  # type: ignore[return-value]
