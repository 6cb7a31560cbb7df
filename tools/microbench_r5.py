"""Round-5 microbenchmarks: histogram formulations, LF¹ vs LF² walk at
64 KiB blocks, and two-tier sparse-refinement shapes — measured standalone
so each candidate costs one small remote compile instead of a full-pipeline
re-warm.

Run: PYTHONPATH=/root/repo:/root/.axon_site python tools/microbench_r5.py [case ...]
Cases: hist ibwt sparse   (default: all)
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo/tools")
from microbench import BASELINE, _sync, timeit  # noqa: E402


def _book_batch(b: int, nmax: int, rng) -> np.ndarray:
    """Realistic text batch: tiled book1 slices (the bench's statistics)."""
    from bmh_tpu.utils import corpus

    base = np.frombuffer(corpus.read_corpus_file("book1"), dtype=np.uint8)
    out = np.zeros((b, nmax), dtype=np.uint8)
    for i in range(b):
        st = int(rng.integers(0, max(base.size - nmax, 1)))
        chunk = base[st:st + nmax]
        out[i, : chunk.size] = chunk
        if chunk.size < nmax:
            out[i, chunk.size:] = base[: nmax - chunk.size]
    return out


def bench_hist(res, rng):
    from bmh_tpu.ops import huffman as H
    from bmh_tpu.ops import rle as R

    B, nmax = 32, 131072
    syms = rng.integers(0, 257, (B, nmax)).astype(np.int32)
    ns = np.full(B, nmax - 9, np.int32)
    a_syms, a_ns = jnp.asarray(syms), jnp.asarray(ns)

    def hist_mask(data, n):
        return jax.vmap(lambda d, m: H.histogram(d, m, bins=R.RLE_ALPHABET))(
            data, n)

    def hist_sort(data, n):
        def one(d, m):
            pos = jnp.arange(d.shape[0], dtype=jnp.int32)
            s = jnp.where(pos < m, d, R.RLE_ALPHABET)
            srt = jax.lax.sort(s, is_stable=False)
            edges = jnp.searchsorted(srt, jnp.arange(R.RLE_ALPHABET + 1,
                                                     dtype=jnp.int32))
            return jnp.diff(edges)

        return jax.vmap(one)(data, n)

    res["hist_mask"] = timeit(hist_mask, a_syms, a_ns, label="hist_mask")
    res["hist_sort"] = timeit(hist_sort, a_syms, a_ns, label="hist_sort")


def bench_ibwt(res, rng):
    from bmh_tpu.ops import bwt as BW
    from bmh_tpu.utils import config as config_mod

    B, nmax = 64, 65536
    data = _book_batch(B, nmax, rng)
    ns = np.full(B, nmax, np.int32)
    a_data, a_ns = jnp.asarray(data), jnp.asarray(ns)

    fwd = jax.jit(jax.vmap(BW.bwt_forward_cp))
    last, shift, cps, aper = fwd(a_data, a_ns)
    _sync(last)
    assert bool(np.asarray(aper).all()), "book1 batch should be aperiodic"

    old = config_mod.DEFAULT.lf2
    try:
        for name, flag in (("ibwt_lf1", False), ("ibwt_lf2", True)):
            config_mod.DEFAULT.lf2 = flag
            walk = jax.vmap(lambda l, s, c, n, _v=flag:
                            BW.bwt_inverse_cursors(l, s, c, n))
            res[name] = timeit(walk, last, shift, cps, a_ns, label=name)
    finally:
        config_mod.DEFAULT.lf2 = old


def bench_sparse(res, rng):
    from bmh_tpu.models import pipeline as P
    from bmh_tpu.utils import corpus

    B, nmax = 32, 131072
    # the REAL production batch: per-file split + RLE1 + pathological
    # filter, exactly as bench.py's compress_many stages it, so the
    # tied-set size matches what the bench's sparse dispatch actually sees
    from bmh_tpu import api
    from bmh_tpu.models.pipeline import _looks_pathological
    from bmh_tpu.utils import container

    blocks = []
    for name in corpus.CALGARY_FILES:
        raw = corpus.read_corpus_file(name)
        blks, _ = api._rle1_blocks(container.split_blocks(
            np.frombuffer(raw, dtype=np.uint8), nmax))
        blocks += [b for b in blks if not _looks_pathological(b)]
    blocks = blocks[:B]
    data = np.zeros((B, nmax), dtype=np.uint8)
    ns = np.ones(B, np.int32)
    for i, b in enumerate(blocks):
        data[i, : b.size] = b
        ns[i] = b.size
    a_data, a_ns = jnp.asarray(data), jnp.asarray(ns)
    rank, tied, h, done, cnt = P._batched_rounds(nmax, B)(a_data, a_ns)
    _sync(cnt)
    m_true = int(np.asarray(cnt).sum())
    m_cap = P._sparse_cap(B, nmax)
    res["sparse_tied"] = m_true
    res["sparse_cap"] = m_cap

    for t1, t2d in [(2, 4), (1, 4), (2, 8), (1, 2), (3, 8)]:
        # call through the real compact+refine trace with explicit tiers
        # (config is read at trace time inside sparse_refine, so setting it
        # around the traced call bakes the variant into this program)
        def sparse(rk, td, n, _t1=t1, _t2=t2d):
            from bmh_tpu.utils import config as config_mod

            old = (config_mod.DEFAULT.tier1_rounds,
                   config_mod.DEFAULT.tier2_div)
            config_mod.DEFAULT.tier1_rounds = _t1
            config_mod.DEFAULT.tier2_div = _t2
            try:
                return P._sparse_refine_compact(rk, td, n, B, nmax, m_cap)
            finally:
                (config_mod.DEFAULT.tier1_rounds,
                 config_mod.DEFAULT.tier2_div) = old

        res[f"sparse_t1={t1}_t2d={t2d}"] = timeit(
            sparse, rank, tied, a_ns, label=f"sparse {t1}/{t2d}")


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    cases = sys.argv[1:] or ["hist", "ibwt", "sparse"]
    res = {"platform": jax.devices()[0].platform}
    null_in = jnp.zeros(8, jnp.int32)
    nullf = jax.jit(lambda x: x + 1)
    _sync(nullf(null_in))
    import time

    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        _sync(nullf(null_in))
        ts.append(time.perf_counter() - t0)
    BASELINE[0] = min(ts)
    res["null_dispatch"] = BASELINE[0]
    rng = np.random.default_rng(5)
    if "hist" in cases:
        bench_hist(res, rng)
    if "ibwt" in cases:
        bench_ibwt(res, rng)
    if "sparse" in cases:
        bench_sparse(res, rng)
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
