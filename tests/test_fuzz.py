"""Seeded fuzz round-trips: every input class the reference mishandles or
that has bitten a round (0xFF runs vs the 4-byte init sentinel, periodic
blocks, single-symbol streams, ragged tails) x block sizes, jax backend
vs bytes and vs the oracle backend's containers."""

import numpy as np
import pytest

from bmh_tpu import api


def _cases(rng):
    out = []
    for n in [1, 2, 3, 4, 5, 63, 64, 257, 1000, 4097]:
        out.append(rng.integers(0, 256, n).astype(np.uint8))        # random
        out.append(np.full(n, int(rng.integers(0, 256)), np.uint8))  # 1-symbol
        out.append(np.resize(rng.integers(0, 256, 7).astype(np.uint8), n))  # periodic
        ff = rng.integers(0, 256, n).astype(np.uint8)
        ff[: min(8, n)] = 255                                        # 0xFF runs
        ff[-min(5, n):] = 255
        out.append(ff)
        two = rng.integers(0, 2, n).astype(np.uint8) * 200           # 2-symbol runs
        out.append(two)
    return out


@pytest.mark.parametrize("block_size", [256, 1024, 8192])
def test_fuzz_roundtrip_jax(rng, block_size):
    for i, case in enumerate(_cases(rng)):
        data = case.tobytes()
        blob = api.compress_bytes(data, block_size=block_size)
        assert api.decompress_bytes(blob) == data, (i, case[:16], block_size)


def test_fuzz_oracle_agreement(rng):
    """jax and oracle backends accept each other's containers."""
    for case in _cases(rng)[:12]:
        data = case.tobytes()
        bj = api.compress_bytes(data, block_size=1024, backend="jax")
        bo = api.compress_bytes(data, block_size=1024, backend="oracle")
        assert api.decompress_bytes(bj, backend="oracle") == data
        assert api.decompress_bytes(bo, backend="jax") == data
