"""Device RLE0 vs the sequential oracle (ops/rle.py vs models/oracle.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bmh_tpu.models import oracle
from bmh_tpu.ops import rle as R


@pytest.mark.parametrize("kind", ["mixed", "zeros", "nonzero", "runs"])
def test_rle0_encode_matches_oracle(rng, kind):
    nmax = 2048
    enc = jax.jit(R.rle0_encode)
    for _ in range(8):
        n = int(rng.integers(1, nmax))
        if kind == "mixed":
            codes = ((rng.random(n) < 0.7) * rng.integers(0, 255, n)).astype(np.uint8)
        elif kind == "zeros":
            codes = np.zeros(n, np.uint8)
        elif kind == "nonzero":
            codes = rng.integers(1, 255, n).astype(np.uint8)
        else:
            codes = np.r_[np.zeros(n // 2), rng.integers(0, 3, n - n // 2)].astype(np.uint8)
        pad = np.zeros(nmax, np.uint8)
        pad[:n] = codes
        syms, m = enc(jnp.asarray(pad), jnp.int32(n))
        want = oracle.rle0(codes)
        assert int(m) == want.size
        np.testing.assert_array_equal(np.asarray(syms)[: int(m)], want)


def test_rle0_roundtrip_device(rng):
    nmax = 4096
    enc = jax.jit(R.rle0_encode)
    dec = jax.jit(R.rle0_decode)
    for _ in range(20):
        n = int(rng.integers(1, nmax))
        codes = ((rng.random(n) < 0.6) * rng.integers(0, 255, n)).astype(np.uint8)
        pad = np.zeros(nmax, np.uint8)
        pad[:n] = codes
        syms, m = enc(jnp.asarray(pad), jnp.int32(n))
        back = dec(syms, m, jnp.int32(n))
        np.testing.assert_array_equal(np.asarray(back)[:n], codes)


def test_rle0_shrinks_zero_heavy_streams(rng):
    # the whole point: a run of r zeros costs ~log2(r) symbols
    nmax = 8192
    codes = np.zeros(nmax, np.uint8)
    syms, m = jax.jit(R.rle0_encode)(jnp.asarray(codes), jnp.int32(nmax))
    assert int(m) <= 14  # floor(log2(8193)) + 1
