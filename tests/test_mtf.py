"""JAX parallel MTF vs the sequential oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bmh_tpu.models import oracle
from bmh_tpu.ops import mtf as jmtf


def pad_to(data, mult=128):
    n = data.size
    nmax = ((max(n, 1) + mult - 1) // mult) * mult
    out = np.zeros(nmax, dtype=np.uint8)
    out[:n] = data
    return out


def gen_cases(rng):
    cases = [
        np.array([1, 1, 0, 2, 2, 1], dtype=np.uint8),
        np.zeros(5, dtype=np.uint8),
        np.arange(256, dtype=np.uint8),
        np.arange(255, -1, -1, dtype=np.uint8),
    ]
    for n in [1, 127, 128, 129, 1000, 4096]:
        cases.append(rng.integers(0, 256, n).astype(np.uint8))
        cases.append(rng.integers(0, 3, n).astype(np.uint8))
    # BWT-like runs
    cases.append(np.repeat(rng.integers(0, 256, 40).astype(np.uint8), 50))
    return cases


def test_mtf_forward_matches_oracle(rng):
    f = jax.jit(jmtf.mtf_forward, static_argnums=2)
    for data in gen_cases(rng):
        padded = pad_to(data)
        got = np.asarray(f(jnp.asarray(padded), jnp.int32(data.size), 128))[:data.size]
        want = oracle.mtf(data)
        np.testing.assert_array_equal(got, want)


def test_mtf_inverse_matches_oracle(rng):
    f = jax.jit(jmtf.mtf_inverse, static_argnums=2)
    for data in gen_cases(rng):
        codes = oracle.mtf(data)
        padded = pad_to(codes)
        got = np.asarray(f(jnp.asarray(padded), jnp.int32(codes.size), 128))[:codes.size]
        np.testing.assert_array_equal(got, data)


def test_mtf_roundtrip_various_chunks(rng):
    data = rng.integers(0, 50, 777).astype(np.uint8)
    for chunk in [64, 128, 256]:
        padded = pad_to(data, chunk)
        codes = jmtf.mtf_forward(jnp.asarray(padded), jnp.int32(data.size), chunk)
        back = jmtf.mtf_inverse(codes, jnp.int32(data.size), chunk)
        np.testing.assert_array_equal(np.asarray(back)[:data.size], data)


def test_pallas_imtf_kernel_matches_scan(rng):
    """imtf_chunks (interpret mode) == the lax.scan in-chunk formulation."""
    import jax
    import jax.numpy as jnp

    from bmh_tpu.ops import mtf as M
    from bmh_tpu.ops import pallas_mtf as PM

    m, k = 64, PM.TILE
    codes = rng.integers(0, 256, (m, k)).astype(np.int32)
    ys, q = PM.imtf_chunks(jnp.asarray(codes), interpret=True)

    ident = jnp.broadcast_to(jnp.arange(256, dtype=jnp.int32), (k, 256))

    def step(qq, c):
        y = M._step_select(qq, c)
        return M._rot_apply(qq, c, y), y

    pi_full, ys_ref = jax.lax.scan(step, ident, jnp.asarray(codes))
    np.testing.assert_array_equal(np.asarray(ys), np.asarray(ys_ref))
    np.testing.assert_array_equal(np.asarray(q), np.asarray(pi_full).T)
