"""Real-TPU compile/lowering smoke tests (VERDICT r1: interpret-only suites
let a Mosaic scf.for legalization failure ship as the round snapshot).

Run with:  BMH_TEST_TPU=1 python -m pytest -m tpu tests/test_tpu_compile.py
Skipped entirely off-TPU or under the default CPU-pinned suite.
"""

import os

import pytest

pytestmark = pytest.mark.tpu


def _on_tpu() -> bool:
    if not os.environ.get("BMH_TEST_TPU"):
        return False
    import jax

    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


requires_tpu = pytest.mark.skipif(not _on_tpu(), reason="needs a real TPU "
                                  "(set BMH_TEST_TPU=1)")


@requires_tpu
def test_pallas_decode_phases_compile_and_match_scan():
    import jax.numpy as jnp
    import numpy as np

    from bmh_tpu.models import oracle
    from bmh_tpu.ops import huffman as H
    from bmh_tpu.ops import pallas_decode as PD

    rng = np.random.default_rng(0)
    chunk_bits = 512
    data = rng.integers(0, 64, 60000).astype(np.uint8)
    lens = H.code_lengths_from_hist(oracle.histogram(data))
    codes = H.canonical_code_table(lens)
    payload, _ = oracle.huffman_encode(data, lens, codes)
    wbytes = chunk_bits // 8
    nchunks = -(-max(1, -(-len(payload) // wbytes)) // PD.CHUNK_ALIGN) * PD.CHUNK_ALIGN
    buf = payload + b"\x00" * (nchunks * wbytes - len(payload))
    words = np.frombuffer(buf, dtype=">u4").astype(np.uint32)
    t = H.decode_tables(lens)
    count_t = jnp.asarray(np.broadcast_to(t["count"][:, None], (32, nchunks)).copy())
    tiles = H.unpack_bit_tiles_flat(jnp.asarray(words), chunk_bits)
    wext = PD.words_ext(jnp.asarray(words), chunk_bits)

    cnt_p, exit_p = PD.phase_a(wext, count_t, chunk_bits=chunk_bits,
                               interpret=False)  # compiled on the chip
    cnt_s, exit_s = PD.phase_a_scan(tiles, count_t, chunk_bits=chunk_bits)
    np.testing.assert_array_equal(np.asarray(cnt_p), np.asarray(cnt_s))
    np.testing.assert_array_equal(np.asarray(exit_p), np.asarray(exit_s))

    entry = jnp.zeros(nchunks, jnp.int32)  # gap-0 entries suffice for lowering
    idx_p = PD.phase_b(wext, count_t, entry, chunk_bits=chunk_bits,
                       interpret=False)
    idx_s = PD.phase_b_scan(tiles, count_t, entry, chunk_bits=chunk_bits)
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_s))


@requires_tpu
def test_pallas_sort_compiles():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bmh_tpu.ops import pallas_sort

    rng = np.random.default_rng(1)
    n = 4096
    k1 = jnp.asarray(rng.integers(0, 64, n).astype(np.int32))
    k2 = jnp.asarray(rng.integers(0, 64, n).astype(np.int32))
    idx = jnp.arange(n, dtype=jnp.int32)
    a, b, c = pallas_sort.sort3(k1, k2, idx, interpret=False)
    r1, r2, rp = jax.lax.sort((k1, k2, idx), num_keys=2, is_stable=True)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(rp))


@requires_tpu
def test_roundtrip_bench_shapes_on_tpu():
    """One compress+decompress at the bench block size, bit-exact on-chip."""
    import numpy as np

    from bmh_tpu import api

    rng = np.random.default_rng(2)
    data = bytes(rng.integers(32, 96, 200000).astype(np.uint8))
    blob = api.compress_bytes(data, block_size=131072, backend="jax")
    assert api.decompress_bytes(blob, backend="jax") == data
