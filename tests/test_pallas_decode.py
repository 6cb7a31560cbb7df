"""Pallas FSM decode kernels vs the XLA scan fallback (interpret mode on CPU).

Semantic equivalence gate: phase_a/phase_b (the TPU kernels, run in
interpret mode here) must match phase_a_scan/phase_b_scan bit for bit; the
scan path itself is validated against the oracle in test_huffman.py.
Compiled-mode lowering is covered by tests/test_tpu_compile.py on a real
chip.
"""

import jax.numpy as jnp
import numpy as np

from bmh_tpu.models import oracle
from bmh_tpu.ops import huffman as H
from bmh_tpu.ops import pallas_decode as PD


def _prep(rng, n_syms, chunk_bits, nc_align):
    data = rng.integers(0, 64, n_syms).astype(np.uint8)
    lens = H.code_lengths_from_hist(oracle.histogram(data))
    codes = H.canonical_code_table(lens)
    payload, _ = oracle.huffman_encode(data, lens, codes)
    wbytes = chunk_bits // 8
    nchunks = max(1, -(-len(payload) // wbytes))
    nchunks = -(-nchunks // nc_align) * nc_align
    buf = payload + b"\x00" * (nchunks * wbytes - len(payload))
    words = np.frombuffer(buf, dtype=">u4").astype(np.uint32)
    t = H.decode_tables(lens)
    count_t = np.broadcast_to(t["count"][:, None], (32, nchunks)).copy()
    return data, words, jnp.asarray(count_t), int(lens.max())


def test_pallas_phases_match_scan(rng):
    chunk_bits = 256
    data, words, count_t, maxl = _prep(rng, 4000, chunk_bits, nc_align=8)
    tiles = H.unpack_bit_tiles_flat(jnp.asarray(words), chunk_bits)
    wext = PD.words_ext(jnp.asarray(words), chunk_bits)

    cnt_s, exit_s = PD.phase_a_scan(tiles, count_t, chunk_bits=chunk_bits)
    cnt_p, exit_p = PD.phase_a(wext, count_t, chunk_bits=chunk_bits,
                               interpret=True)
    np.testing.assert_array_equal(np.asarray(cnt_p), np.asarray(cnt_s))
    np.testing.assert_array_equal(np.asarray(exit_p), np.asarray(exit_s))

    # phase B with the true chained entries (single segment); chain
    # sequentially on host as an independent reference for the device scan
    exit_np = np.asarray(exit_s)
    nc = exit_np.shape[1]
    entry_np = np.zeros(nc, np.int32)
    g = 0
    for c in range(nc):
        entry_np[c] = g
        g = exit_np[g, c]
    entry = jnp.asarray(entry_np)

    idx_s = PD.phase_b_scan(tiles, count_t, entry, chunk_bits=chunk_bits)
    idx_p = PD.phase_b(wext, count_t, entry, chunk_bits=chunk_bits,
                       interpret=True)
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_s))


def test_phase_b_maxl_variants_agree_on_true_lane(rng):
    """A trimmed maxl unroll must not change the winning-lane decode.

    (Wrong-gap lanes may reset earlier under a smaller maxl — don't-care —
    so only phase B's entry-lane output is compared.)
    """
    chunk_bits = 128
    data, words, count_t, maxl = _prep(rng, 1500, chunk_bits, nc_align=8)
    tiles = H.unpack_bit_tiles_flat(jnp.asarray(words), chunk_bits)
    _, exit_s = PD.phase_a_scan(tiles, count_t, chunk_bits=chunk_bits)
    exit_np = np.asarray(exit_s)
    nc = exit_np.shape[1]
    entry_np = np.zeros(nc, np.int32)
    g = 0
    for c in range(nc):
        entry_np[c] = g
        g = exit_np[g, c]
    entry = jnp.asarray(entry_np)
    full = PD.phase_b_scan(tiles, count_t, entry, chunk_bits=chunk_bits, maxl=31)
    trimmed = max(8, -(-maxl // 8) * 8)
    part = PD.phase_b_scan(tiles, count_t, entry, chunk_bits=chunk_bits,
                           maxl=trimmed)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(part))


def test_pallas_ibwt_walk_matches_xla(rng):
    """Interpret-mode correctness of the VMEM iBWT walk kernel (a recorded
    negative result for TPU compilation — see ops/pallas_ibwt.py docstring;
    this keeps the kernel's semantics pinned should the toolchain gain
    support)."""
    import jax
    import jax.numpy as jnp

    from bmh_tpu.ops import bwt as B
    from bmh_tpu.ops import pallas_ibwt as PI

    nmax, n = 2048, 2000
    b = 8
    lfs, starts, refs, ns = [], [], [], []
    for i in range(b):
        data = rng.integers(0, 5, n - i).astype(np.uint8)
        pad = np.zeros(nmax, np.uint8)
        pad[: data.size] = data
        last, shift, cps, aper = jax.jit(B.bwt_forward_cp)(
            jnp.asarray(pad), jnp.int32(data.size))
        assert bool(aper)
        packed = B._lf_map_packed(jnp.asarray(last), jnp.int32(data.size))
        k = max(nmax // B.CURSOR_STRIDE, 1)
        st = jnp.concatenate([shift[None].astype(jnp.int32), cps[: k - 1]])
        lfs.append(packed)
        starts.append(jnp.clip(st, 0, nmax - 1))
        refs.append(np.asarray(jax.jit(B.bwt_inverse_cursors)(
            jnp.asarray(last), shift, cps, jnp.int32(data.size))))
        ns.append(data.size)
    k = max(nmax // B.CURSOR_STRIDE, 1)
    out = PI.ibwt_walk(jnp.stack(lfs), jnp.stack(starts), steps=nmax // k,
                       interpret=True)
    got = np.asarray(out)
    for i in range(b):
        walk = got[i].T.reshape(nmax)[: ns[i]].astype(np.uint8)
        np.testing.assert_array_equal(walk, refs[i][: ns[i]])
