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


@pytest.mark.slow
def test_two_process_distributed_roundtrip(tmp_path):
    port = 9717
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    blobpath = str(tmp_path / "shared.bzt")
    script = _WORKER.format(repo=repo, port=port, blobpath=blobpath)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen([sys.executable, "-c", script, str(pid)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              env=env, text=True)
             for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append((p.returncode, out))
    assert outs[0][0] == 0, outs[0][1]
    assert outs[1][0] == 0, outs[1][1]
    assert "DIST_OK" in outs[0][1], outs[0][1]
