"""Pallas FSM decode kernels vs the XLA scan path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bmh_tpu.models import oracle
from bmh_tpu.ops import huffman as H
from bmh_tpu.ops import pallas_decode as PD


def _prep(rng, n_syms, chunk_bits):
    data = rng.integers(0, 64, n_syms).astype(np.uint8)
    lens = H.code_lengths_from_hist(oracle.histogram(data))
    codes = H.canonical_code_table(lens)
    payload, _ = oracle.huffman_encode(data, lens, codes)
    wbytes = chunk_bits // 8
    nchunks = max(1, -(-len(payload) // wbytes))
    nchunks = 1 << (nchunks - 1).bit_length()
    buf = payload + b"\x00" * (nchunks * wbytes - len(payload))
    words = np.frombuffer(buf, dtype=">u4").astype(np.uint32)
    tables = {k: jnp.asarray(v) for k, v in H.decode_tables(lens).items()}
    return data, words, tables, lens


def test_pallas_phases_match_scan(rng):
    chunk_bits = 256
    data, words, tables, lens = _prep(rng, 4000, chunk_bits)
    tiles = H._unpack_bit_tiles(jnp.asarray(words), chunk_bits)
    steps, nc = tiles.shape
    count_tbl = tables["count"].astype(jnp.int32)
    count_rows = jnp.broadcast_to(count_tbl[None, :], (nc, 32)) + 0

    # scan reference
    gaps = jnp.arange(32, dtype=jnp.int32)[None, :]
    t_axis = jnp.arange(steps, dtype=jnp.int32)

    def body_a(st, xs):
        t, row = xs
        st2, _ = H._fsm_step(row[:, None], gaps, t, chunk_bits, count_tbl, st)
        return st2, None

    z = jnp.zeros((nc, 32), dtype=jnp.int32)
    st = (z.astype(jnp.uint32), z, z.astype(jnp.uint32), z, z.astype(bool), z, z)
    (_, _, _, _, _, cnt_ref, exit_ref), _ = jax.lax.scan(body_a, st, (t_axis, tiles))

    cnt_p, exit_p = PD.phase_a(tiles, count_rows, chunk_bits=chunk_bits, interpret=True)
    np.testing.assert_array_equal(np.asarray(cnt_p), np.asarray(cnt_ref))
    np.testing.assert_array_equal(np.asarray(exit_p), np.asarray(exit_ref))

    # phase B with true entries
    prefix = jax.lax.associative_scan(
        lambda a, b: jnp.take_along_axis(b, a, axis=-1), exit_p, axis=0)
    entry = jnp.concatenate([jnp.zeros(1, jnp.int32), prefix[:-1, 0]]).astype(jnp.int32)

    def body_b(st, xs):
        t, row = xs
        return H._fsm_step(row, entry, t, chunk_bits, count_tbl, st)

    zb = jnp.zeros((nc,), dtype=jnp.int32)
    stb = (zb.astype(jnp.uint32), zb, zb.astype(jnp.uint32), zb, zb.astype(bool), zb, zb)
    _, idx_ref = jax.lax.scan(body_b, stb, (t_axis, tiles))

    idx_p = PD.phase_b(tiles, count_rows, entry[None, :],
                       chunk_bits=chunk_bits, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_ref))
