"""Multi-device (virtual 8-CPU mesh) shard_map tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bmh_tpu.models import oracle
from bmh_tpu.parallel import dataparallel, mesh as mesh_mod


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual CPU devices"
    return mesh_mod.make_mesh(8)


def test_sharded_stage1_matches_oracle(mesh8, rng):
    nmax, b = 256, 8
    batch = np.zeros((b, nmax), dtype=np.uint8)
    ns = np.zeros(b, dtype=np.int32)
    datas = []
    for i in range(b):
        n = int(rng.integers(50, nmax + 1))
        d = rng.integers(0, 256, n).astype(np.uint8)
        batch[i, :n] = d
        ns[i] = n
        datas.append(d)
    f = dataparallel.make_sharded_stage1(mesh8, nmax)
    syms, ms, freqs, shifts, cps, aper = f(jnp.asarray(batch), jnp.asarray(ns))
    for i, d in enumerate(datas):
        s_ref, l_ref = oracle.bwt(d)
        want = oracle.rle0(oracle.mtf(l_ref))
        m = int(np.asarray(ms)[i])
        assert m == want.size
        np.testing.assert_array_equal(np.asarray(syms)[i, :m], want)
        assert int(np.asarray(shifts)[i]) == s_ref


def test_roundtrip_step_all_devices(mesh8, rng):
    nmax, b = 256, 16  # 2 blocks per device
    batch = np.zeros((b, nmax), dtype=np.uint8)
    ns = np.full(b, nmax, dtype=np.int32)
    for i in range(b):
        batch[i] = rng.integers(0, 200, nmax).astype(np.uint8)
    stage1 = dataparallel.make_sharded_stage1(mesh8, nmax)
    _, _, freqs, _, _, _ = stage1(jnp.asarray(batch), jnp.asarray(ns))
    tbl = dataparallel.host_tables(np.asarray(freqs))
    step = dataparallel.make_roundtrip_step(mesh8, nmax)
    out, total_ok, all_bits = step(
        jnp.asarray(batch), jnp.asarray(ns),
        jnp.asarray(tbl["enc_len"]), jnp.asarray(tbl["enc_code"]),
        jnp.asarray(tbl["count"]), jnp.asarray(tbl["sym"]))
    np.testing.assert_array_equal(np.asarray(out), batch)
    assert int(total_ok) == b * nmax
    assert np.asarray(all_bits).shape == (b,)
    assert (np.asarray(all_bits) > 0).all()


@pytest.mark.slow
def test_roundtrip_step_production_block_size(mesh8):
    """The sharded round-trip step at the bench block size (128 KiB, one
    block per device, real corpus text) — VERDICT r2 item 8."""
    from bmh_tpu.utils import corpus

    nmax, b = 131072, 8
    try:
        text = corpus.read_corpus_file("book1")
    except Exception:
        pytest.skip("corpus unavailable")
    buf = (text * (b * nmax // len(text) + 1))[: b * nmax]
    batch = np.frombuffer(buf, dtype=np.uint8).reshape(b, nmax).copy()
    ns = np.full(b, nmax, dtype=np.int32)
    ns[-1] = nmax - 4321
    stage1 = dataparallel.make_sharded_stage1(mesh8, nmax)
    _, _, freqs, _, _, _ = stage1(jnp.asarray(batch), jnp.asarray(ns))
    tbl = dataparallel.host_tables(np.asarray(freqs))
    step = dataparallel.make_roundtrip_step(mesh8, nmax, chunk_bits=256)
    out, total_ok, all_bits = step(
        jnp.asarray(batch), jnp.asarray(ns),
        jnp.asarray(tbl["enc_len"]), jnp.asarray(tbl["enc_code"]),
        jnp.asarray(tbl["count"]), jnp.asarray(tbl["sym"]))
    out = np.asarray(out)
    assert int(total_ok) == int(ns.sum())
    for row in range(b):
        np.testing.assert_array_equal(out[row, : ns[row]], batch[row, : ns[row]])


def test_production_backend_shards_over_devices(rng):
    """api.compress_bytes must dispatch sharded batches over all local
    devices (VERDICT r3 item 1) with results byte-identical to the
    single-device path, and decompress must round-robin its dispatches."""
    from bmh_tpu import api
    from bmh_tpu.models import pipeline
    from bmh_tpu.utils import config as config_mod

    data = bytes(rng.integers(0, 200, 16 * 1024).astype(np.uint8))
    assert config_mod.DEFAULT.devices == 0  # auto
    blob_multi = api.compress_bytes(data, block_size=1024)
    assert pipeline.LAST_DISPATCH["compress_ndev"] == 8
    assert api.decompress_bytes(blob_multi) == data

    old = config_mod.DEFAULT.devices
    try:
        config_mod.DEFAULT.devices = 1
        blob_single = api.compress_bytes(data, block_size=1024)
        assert pipeline.LAST_DISPATCH["compress_ndev"] == 1
    finally:
        config_mod.DEFAULT.devices = old
    assert blob_multi == blob_single


def test_production_backend_partial_batch_shards(rng):
    """Batches smaller than the device count shard over a power-of-two
    subset (b_pad=4 blocks -> 4 devices), and ragged tails round-trip."""
    from bmh_tpu import api
    from bmh_tpu.models import pipeline

    data = bytes(rng.integers(0, 256, 3 * 1024 + 123).astype(np.uint8))
    blob = api.compress_bytes(data, block_size=1024)
    assert pipeline.LAST_DISPATCH["compress_ndev"] >= 2
    assert api.decompress_bytes(blob) == data


@pytest.mark.slow
def test_production_multibatch_sharded_stream(rng):
    """A ~4 MB stream spanning two dispatch chunks round-trips through the
    sharded production path (8-way main batch + power-of-two remainder)."""
    from bmh_tpu import api
    from bmh_tpu.utils import corpus

    try:
        text = corpus.read_corpus_file("book2") * 7  # ~4.3 MB, 33 blocks
    except Exception:
        text = bytes(rng.integers(0, 200, 4 << 20).astype(np.uint8))
    blob = api.compress_bytes(text, block_size=131072)
    assert api.decompress_bytes(blob) == text
