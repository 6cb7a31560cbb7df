"""Calgary round-trip benchmark — prints ONE JSON line for the driver.

Metric: corpus round-trip throughput (compress + decompress, bit-exact
verified) in MB/s on the default JAX device.  Baseline: the reference C++
binary round-trips the 14-file corpus (3,141,622 bytes each way) in 11.06 s
= 0.568 MB/s on one CPU core (BASELINE.md, measured — the reference
publishes no throughput numbers).

A full warm pass first triggers all XLA compilations; five timed passes
follow.  The headline `value` is the MEDIAN pass (the honest steady-state
estimate through a tunnel with ~±20% run-to-run wall variance);
`best_MBps` records the fastest pass alongside it.
"""

from __future__ import annotations

import json
import sys
import time

REFERENCE_ROUNDTRIP_MBPS = 2 * 3141622 / 11.06 / 1e6  # 0.568
REFERENCE_TOTAL_OUT = 1006498  # summed reference .bzap sizes (README table)


def _enable_compile_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knob: just skip caching


def calibrate_tunnel(size_mb: float = 4.0, reps: int = 8) -> dict:
    """Same-session tunnel calibration: null-RPC latency plus host->device
    and device->host bandwidth, measured with the exact primitives the
    pipeline uses (device_put / np.asarray).  The tunnel drifts by the hour
    (identical code measured 10.4-13.5 MB/s corpus medians across one day,
    README); these fields let a reader decompose any two runs' delta into
    tunnel-side vs code-side (VERDICT r4 item 1).

    jax.block_until_ready is a no-op through the tunnel, so every timing
    syncs via a pulled np.asarray result."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = int(size_mb * (1 << 20))
    add1 = jax.jit(lambda x: x + 1)
    tiny = jnp.zeros((8,), jnp.int32)
    np.asarray(add1(tiny))  # compile + first-dispatch costs out of the timings

    nulls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(add1(tiny))
        nulls.append(time.perf_counter() - t0)
    null_ms = sorted(nulls)[len(nulls) // 2] * 1e3

    big_sum = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
    host_buf = np.zeros(n, dtype=np.uint8)
    np.asarray(big_sum(jax.device_put(host_buf)))  # warm the (n,) programs
    ups = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(big_sum(jax.device_put(host_buf)))
        ups.append(time.perf_counter() - t0)
    up_s = sorted(ups)[1] - null_ms / 1e3  # median minus dispatch latency

    # distinct arrays per rep: np.asarray on the same jax.Array returns its
    # cached host copy after the first pull, which times as ~infinite MB/s
    fill = jax.jit(lambda i: jnp.full((n,), i, dtype=jnp.uint8))
    bufs = [fill(i) for i in range(3)]
    for buf in bufs:
        np.asarray(buf[:8])  # barrier: materialized on device, not pulled
    pulls = []
    for buf in bufs:
        t0 = time.perf_counter()
        np.asarray(buf)
        pulls.append(time.perf_counter() - t0)
    pull_s = sorted(pulls)[1] - null_ms / 1e3
    return {
        "null_rpc_ms": round(null_ms, 2),
        "upload_MBps": round(size_mb / max(up_s, 1e-6), 1),
        "pull_MBps": round(size_mb / max(pull_s, 1e-6), 1),
        "calib_mb": size_mb,
    }


def run(block_size: int = 131072, backend: str = "jax", files=None) -> dict:
    _enable_compile_cache()
    from bmh_tpu import api
    from bmh_tpu.utils import corpus

    d = corpus.corpus_dir()
    if d is None:
        return {"metric": "calgary_roundtrip_throughput", "value": 0.0,
                "unit": "MB/s", "vs_baseline": 0.0, "error": "corpus not found"}
    names = files or corpus.CALGARY_FILES
    datas = [corpus.read_corpus_file(n) for n in names]
    total_in = sum(len(x) for x in datas)

    # warm pass: compile everything (and sanity-check round trip)
    blobs = api.compress_many(datas, block_size=block_size, backend=backend, uniform=True)
    backs = api.decompress_many(blobs, backend=backend, uniform=True)
    ok = all(a == b for a, b in zip(datas, backs))

    # timed passes (steady state): 5 passes; the MEDIAN is the headline
    # (best-of-N is a favorable statistic through a ~±20%-variance tunnel;
    # VERDICT r3 item 7).  BMH_TRACE_DIR=/path captures an xprof trace.
    from bmh_tpu.utils.tracing import device_trace

    passes = []
    with device_trace():
        for _ in range(5):
            t0 = time.perf_counter()
            blobs = api.compress_many(datas, block_size=block_size,
                                      backend=backend, uniform=True)
            t1 = time.perf_counter()
            backs = api.decompress_many(blobs, backend=backend, uniform=True)
            t2 = time.perf_counter()
            ok = ok and all(a == b for a, b in zip(datas, backs))
            passes.append((t2 - t0, t1 - t0, t2 - t1))
    all_passes = [[round(w, 3), round(c, 3), round(d, 3)] for w, c, d in passes]
    passes.sort()
    wall, t_comp, t_dec = passes[len(passes) // 2]  # median pass
    best_wall = passes[0][0]
    total_out = sum(len(b) for b in blobs)
    mbps = 2 * total_in / wall / 1e6
    calib = calibrate_tunnel()  # same session as the timed passes
    return {
        "metric": "calgary_roundtrip_throughput",
        "value": round(mbps, 3),
        "unit": "MB/s",
        "vs_baseline": round(mbps / REFERENCE_ROUNDTRIP_MBPS, 2),
        "bit_exact": ok,
        "median_MBps": round(mbps, 3),
        "best_MBps": round(2 * total_in / best_wall / 1e6, 3),
        "compress_s": round(t_comp, 3),
        "decompress_s": round(t_dec, 3),
        "compressed_bytes": total_out,
        "ratio": round(total_out / total_in, 4),
        "ratio_vs_reference": round(total_out / REFERENCE_TOTAL_OUT, 4),
        "block_size": block_size,
        "backend": backend,
        "passes_s": all_passes,  # every (wall, compress, decompress), in run order
        **calib,
    }


def _enwik_like_stream(n: int, rng) -> bytes:
    """Genuinely enwik-like stream: random slices of Calgary book1 (English
    prose — the same statistics class as enwik's Wikipedia text) spliced at
    random offsets so the stream is aperiodic at every scale.  Falls back to
    a skewed synthetic alphabet when the corpus is absent."""
    import numpy as np

    from bmh_tpu.utils import corpus

    try:
        base = np.frombuffer(corpus.read_corpus_file("book1"), dtype=np.uint8)
    except Exception:
        probs = np.exp(-0.25 * np.arange(64))
        probs /= probs.sum()
        sym = rng.choice(64, n, p=probs).astype(np.uint8) + 32
        sym[rng.random(n) < 0.05] = 32
        return sym.tobytes()
    parts = []
    got = 0
    while got < n:
        ln = int(rng.integers(4096, 65536))
        st = int(rng.integers(0, max(base.size - ln, 1)))
        parts.append(base[st:st + ln])
        got += parts[-1].size
    return np.concatenate(parts)[:n].tobytes()


def run_synthetic(total_mb: int = 64, block_size: int = 131072,
                  backend: str = "jax") -> dict:
    """BASELINE config-5 harness: enwik-style stream throughput.

    Builds an English-text stream (book1 slices — enwik statistics class),
    compresses and decompresses it through the block pipeline, and reports
    round-trip MB/s.  Sized by --mb so the same harness scales from smoke
    test to the 1 GiB target as kernel throughput grows.
    """
    import numpy as np

    from bmh_tpu import api

    _enable_compile_cache()
    rng = np.random.default_rng(42)
    n = total_mb << 20
    data = _enwik_like_stream(n, rng)

    blob = api.compress_bytes(data, block_size=block_size, backend=backend)  # warm
    back = api.decompress_bytes(blob, backend=backend)
    ok = back == data
    t0 = time.perf_counter()
    blob = api.compress_bytes(data, block_size=block_size, backend=backend)
    t1 = time.perf_counter()
    back = api.decompress_bytes(blob, backend=backend)
    t2 = time.perf_counter()
    ok = ok and back == data
    mbps = 2 * n / (t2 - t0) / 1e6
    calib = calibrate_tunnel()
    return {
        **calib,
        "metric": "synthetic_roundtrip_throughput",
        "value": round(mbps, 3),
        "unit": "MB/s",
        "vs_baseline": round(mbps / REFERENCE_ROUNDTRIP_MBPS, 2),
        "bit_exact": ok,
        "compress_s": round(t1 - t0, 3),
        "decompress_s": round(t2 - t1, 3),
        "stream_mb": total_mb,
        "ratio": round(len(blob) / n, 4),
        "block_size": block_size,
    }


if __name__ == "__main__":
    args = sys.argv[1:]
    if args and args[0] == "--synthetic":
        mb = int(args[1]) if len(args) > 1 else 64
        print(json.dumps(run_synthetic(total_mb=mb)))
    else:
        block_size = int(args[0]) if args else 131072
        print(json.dumps(run(block_size=block_size)))
