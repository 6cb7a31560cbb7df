"""Multi-host module tests: single-process degenerate path in-suite, plus a
real 2-process jax.distributed CPU round-trip in subprocesses (SURVEY §4)."""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from bmh_tpu import api, compress_bytes, decompress_bytes
from bmh_tpu.parallel import distributed


def test_single_process_compress_decompress_stream(rng):
    data = bytes(rng.integers(0, 64, 9000, dtype=np.uint8))
    be = api.get_backend("oracle")
    blob = distributed.compress_stream(data, 2048, be)
    assert blob is not None
    # interoperates with the plain API in both directions
    assert decompress_bytes(blob, backend="oracle") == data
    assert distributed.decompress_stream(blob, be) == data
    blob2 = compress_bytes(data, block_size=2048, backend="oracle")
    assert distributed.decompress_stream(blob2, be) == data


_WORKER = textwrap.dedent("""
    import os, sys
    import numpy as np

    os.environ.pop("PYTHONSTARTUP", None)
    os.environ["BMH_GATHER_CHUNK_BLOCKS"] = "2"  # force the chunked gather loop
    import jax

    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1])

    sys.path.insert(0, {repo!r})
    from bmh_tpu import api
    from bmh_tpu.parallel import distributed

    distributed.initialize(coordinator_address="localhost:{port}",
                           num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()

    import importlib
    from bmh_tpu.parallel import distributed as _d
    importlib.reload(_d)  # pick up the chunk-size env override
    rng = np.random.default_rng(77)
    data = bytes(rng.integers(0, 50, 9000, dtype=np.uint8))
    be = api.get_backend("oracle")
    blob = _d.compress_stream(data, 2048, be)
    if pid != 0:
        assert blob is None, "only process 0 may materialize the container"
    # decompress path: process 0 shares the container via a file
    if pid == 0:
        assert blob is not None
        with open({blobpath!r}, "wb") as f:
            f.write(blob)
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("blob-written")
    with open({blobpath!r}, "rb") as f:
        shared = f.read()
    back = _d.decompress_stream(shared, be)
    if pid == 0:
        assert back == data, "distributed round-trip mismatch"
        print("DIST_OK")
    else:
        assert back is None, "only process 0 may materialize the stream"
""")


def _run_two_procs(script: str, extra_env: dict | None = None,
                   timeout: int = 300):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env.update(extra_env or {})
    procs = [subprocess.Popen([sys.executable, "-c", script, str(pid)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              env=env, text=True)
             for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append((p.returncode, out))
    assert outs[0][0] == 0, outs[0][1]
    assert outs[1][0] == 0, outs[1][1]
    return outs


@pytest.mark.slow
def test_two_process_distributed_roundtrip(tmp_path):
    port = 9717
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    blobpath = str(tmp_path / "shared.bzt")
    script = _WORKER.format(repo=repo, port=port, blobpath=blobpath)
    outs = _run_two_procs(script)
    assert "DIST_OK" in outs[0][1], outs[0][1]


_WORKER_JAX = textwrap.dedent("""
    import os, sys
    import numpy as np

    os.environ.pop("PYTHONSTARTUP", None)
    # 4 virtual CPU devices PER PROCESS: the jax backend must shard each
    # process's compress dispatches over its own local devices
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1])

    sys.path.insert(0, {repo!r})
    from bmh_tpu import api
    from bmh_tpu.parallel import distributed

    distributed.initialize(coordinator_address="localhost:{port}",
                           num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.local_devices()) == 4, jax.local_devices()

    rng = np.random.default_rng(78)
    data = bytes(rng.integers(0, 50, 40000, dtype=np.uint8))
    be = api.get_backend("jax")
    blob = distributed.compress_stream(data, 2048, be)
    from bmh_tpu.models import pipeline
    assert pipeline.LAST_DISPATCH["compress_ndev"] == 4, pipeline.LAST_DISPATCH
    if pid == 0:
        assert blob is not None
        with open({blobpath!r}, "wb") as f:
            f.write(blob)
    else:
        assert blob is None
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("blob-written")
    with open({blobpath!r}, "rb") as f:
        shared = f.read()
    back = distributed.decompress_stream(shared, be)
    if pid == 0:
        assert back == data, "distributed jax round-trip mismatch"
        print("DIST_JAX_OK")
    else:
        assert back is None
""")


@pytest.mark.slow
def test_two_process_distributed_jax_backend(tmp_path):
    """The composition VERDICT r4 weak #5 flagged untested: jax.distributed
    block striping ON TOP OF the multi-device shard_map JaxBackend — each
    process shards its stripe over its own 4 virtual devices, and process 0
    assembles a byte-exact container/stream."""
    port = 9718
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    blobpath = str(tmp_path / "shared_jax.bzt")
    script = _WORKER_JAX.format(repo=repo, port=port, blobpath=blobpath)
    outs = _run_two_procs(script, timeout=600)
    assert "DIST_JAX_OK" in outs[0][1], outs[0][1]
