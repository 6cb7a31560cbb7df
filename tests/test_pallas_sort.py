"""Pallas bitonic sort vs jax.lax.sort (interpret mode on the CPU suite)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bmh_tpu.ops import pallas_sort


@pytest.mark.parametrize("n", [1024, 2048, 4096])
def test_sort3_matches_lax_sort(rng, n):
    for trial in range(3):
        k1 = rng.integers(0, max(4, n // 8), n).astype(np.int32)  # many ties
        k2 = rng.integers(0, 16, n).astype(np.int32)
        idx = np.arange(n, dtype=np.int32)
        s1, s2, s3 = pallas_sort.sort3(jnp.asarray(k1), jnp.asarray(k2), jnp.asarray(idx),
                                       interpret=True)
        r1, r2, r3 = jax.lax.sort((jnp.asarray(k1), jnp.asarray(k2), jnp.asarray(idx)),
                                  num_keys=2, is_stable=True)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(r1))
        np.testing.assert_array_equal(np.asarray(s2), np.asarray(r2))
        np.testing.assert_array_equal(np.asarray(s3), np.asarray(r3))


def test_sort3_vmapped(rng):
    n, b = 1024, 4
    k1 = rng.integers(0, 50, (b, n)).astype(np.int32)
    k2 = rng.integers(0, 50, (b, n)).astype(np.int32)
    idx = np.broadcast_to(np.arange(n, dtype=np.int32), (b, n)).copy()
    f = jax.vmap(lambda a, c, i: pallas_sort.sort3(a, c, i, interpret=True))
    s1, s2, s3 = f(jnp.asarray(k1), jnp.asarray(k2), jnp.asarray(idx))
    for r in range(b):
        r1, r2, r3 = jax.lax.sort(
            (jnp.asarray(k1[r]), jnp.asarray(k2[r]), jnp.asarray(idx[r])),
            num_keys=2, is_stable=True)
        np.testing.assert_array_equal(np.asarray(s1[r]), np.asarray(r1))
        np.testing.assert_array_equal(np.asarray(s3[r]), np.asarray(r3))
