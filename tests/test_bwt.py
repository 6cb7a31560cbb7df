"""JAX BWT forward/inverse vs the NumPy oracle, with padding and edge cases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bmh_tpu.models import oracle
from bmh_tpu.ops import bwt as jbwt


def pad_pow2(data, min_size=8):
    n = data.size
    nmax = max(min_size, 1 << (max(n - 1, 1)).bit_length())
    out = np.zeros(nmax, dtype=np.uint8)
    out[:n] = data
    return out


CASES = [
    np.array([1], dtype=np.uint8),
    np.array([5, 5], dtype=np.uint8),
    np.frombuffer(b"banana_bandana", dtype=np.uint8).copy(),
    np.tile(np.arange(3, dtype=np.uint8), 11),      # periodic-ish
    np.zeros(33, dtype=np.uint8),                   # fully periodic
    np.full(64, 7, dtype=np.uint8),                 # periodic, power-of-two n
]


@pytest.mark.parametrize("case", range(len(CASES)))
def test_bwt_forward_matches_oracle(case):
    data = CASES[case]
    n = data.size
    padded = pad_pow2(data)
    last, shift = jax.jit(jbwt.bwt_forward)(jnp.asarray(padded), jnp.int32(n))
    s_ref, l_ref = oracle.bwt(data)
    np.testing.assert_array_equal(np.asarray(last)[:n], l_ref)
    assert int(shift) == s_ref


def test_bwt_forward_random(rng):
    for n in [1, 2, 5, 100, 1000, 4096]:
        for lo_entropy in [False, True]:
            data = rng.integers(0, 4 if lo_entropy else 256, n).astype(np.uint8)
            padded = pad_pow2(data)
            last, shift = jax.jit(jbwt.bwt_forward)(jnp.asarray(padded), jnp.int32(n))
            s_ref, l_ref = oracle.bwt(data)
            np.testing.assert_array_equal(np.asarray(last)[:n], l_ref)
            assert int(shift) == s_ref


def test_bwt_inverse_matches_oracle(rng):
    for n in [1, 2, 5, 100, 1000, 4096]:
        data = rng.integers(0, 256, n).astype(np.uint8)
        s_ref, l_ref = oracle.bwt(data)
        padded = pad_pow2(l_ref)
        out = jax.jit(jbwt.bwt_inverse)(jnp.asarray(padded), jnp.int32(s_ref), jnp.int32(n))
        np.testing.assert_array_equal(np.asarray(out)[:n], data)


def test_bwt_roundtrip_jax(rng):
    for n in [1, 3, 17, 333, 2048]:
        data = rng.integers(0, 8, n).astype(np.uint8)
        padded = pad_pow2(data)
        last, shift = jax.jit(jbwt.bwt_forward)(jnp.asarray(padded), jnp.int32(n))
        back = jax.jit(jbwt.bwt_inverse)(last, shift, jnp.int32(n))
        np.testing.assert_array_equal(np.asarray(back)[:n], data)


def test_bwt_bucket_reuse(rng):
    # same padded size, different true n -> one compilation, correct results
    f = jax.jit(jbwt.bwt_forward)
    for n in [100, 200, 255]:
        data = rng.integers(0, 256, n).astype(np.uint8)
        padded = np.zeros(256, dtype=np.uint8)
        padded[:n] = data
        last, shift = f(jnp.asarray(padded), jnp.int32(n))
        s_ref, l_ref = oracle.bwt(data)
        np.testing.assert_array_equal(np.asarray(last)[:n], l_ref)
        assert int(shift) == s_ref
