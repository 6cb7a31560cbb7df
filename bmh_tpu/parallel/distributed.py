"""Multi-host runtime: initialization, block distribution, ordered assembly.

The reference has no distributed communication backend at all (SURVEY §5:
the only I/O in the tree is fstream).  The TPU-native equivalent: the
multi-host JAX runtime over ICI+DCN.  Blocks are distributed round-robin
over processes, compressed locally with the batched backend, and the
variable-length results are gathered to process 0 as (lengths, padded
payload) pairs — the standard ragged-gather pattern — for container
assembly.  On one process everything degenerates to the local path, which
is how the unit suite exercises it.
"""

from __future__ import annotations

import os

import numpy as np

from ..utils import container


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """jax.distributed.initialize with env fallbacks (no-op if single)."""
    import jax

    num = num_processes if num_processes is not None else int(os.environ.get("BMH_NUM_PROCESSES", "1"))
    if num <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address or os.environ.get("BMH_COORDINATOR", "localhost:9711"),
        num_processes=num,
        process_id=process_id if process_id is not None else int(os.environ.get("BMH_PROCESS_ID", "0")),
    )


def process_info() -> tuple[int, int]:
    import jax

    return jax.process_index(), jax.process_count()


def compress_stream(data: bytes | np.ndarray, block_size: int, backend) -> bytes | None:
    """Distributed compress: every process handles its block stripe.

    Returns the container bytes on process 0, None elsewhere.  With one
    process this is exactly the local path.
    """
    pid, pcount = process_info()
    arr = (np.frombuffer(data, dtype=np.uint8)
           if isinstance(data, (bytes, bytearray)) else np.asarray(data, dtype=np.uint8))
    blocks = container.split_blocks(arr, block_size)
    mine = [(i, b) for i, b in enumerate(blocks) if i % pcount == pid]
    results = backend.compress_blocks([b for _, b in mine])

    local_packed: dict[int, bytes] = {}
    for (i, _), r in zip(mine, results):
        present = r["freqs"] > 0
        local_packed[i] = container.pack_block(r["orig_len"], r["shift"], r["lens"],
                                               present, r["payload"],
                                               cps=r.get("cps", ()),
                                               rle_len=r["rle_len"])

    if pcount == 1:
        packed = [local_packed[i] for i in range(len(blocks))]
        return container.pack_file(packed, block_size, arr.size)

    # ragged gather to process 0: all_gather fixed-size (max_len) buffers +
    # true lengths, then reassemble in block order
    from jax.experimental import multihost_utils

    max_len = max((len(b) for b in local_packed.values()), default=0)
    max_count = -(-len(blocks) // pcount)
    buf = np.zeros((max_count, 0 if max_len == 0 else max_len), dtype=np.uint8)
    lens = np.zeros(max_count, dtype=np.int64)
    ids = np.full(max_count, -1, dtype=np.int64)
    for row, (i, _) in enumerate(mine):
        raw = np.frombuffer(local_packed[i], dtype=np.uint8)
        buf[row, : raw.size] = raw
        lens[row] = raw.size
        ids[row] = i
    # pad second dim to the global max across processes
    gmax = int(multihost_utils.process_allgather(np.int64(max_len)).max())
    if gmax > buf.shape[1]:
        buf = np.pad(buf, ((0, 0), (0, gmax - buf.shape[1])))
    all_buf = multihost_utils.process_allgather(buf)      # (P, max_count, gmax)
    all_lens = multihost_utils.process_allgather(lens)    # (P, max_count)
    all_ids = multihost_utils.process_allgather(ids)      # (P, max_count)

    if pid != 0:
        return None
    packed_by_id: dict[int, bytes] = {}
    for p in range(all_ids.shape[0]):
        for row in range(all_ids.shape[1]):
            i = int(all_ids[p, row])
            if i >= 0:
                packed_by_id[i] = all_buf[p, row, : int(all_lens[p, row])].tobytes()
    packed = [packed_by_id[i] for i in range(len(blocks))]
    return container.pack_file(packed, block_size, arr.size)


def decompress_stream(blob: bytes, backend) -> bytes | None:
    """Distributed decompress: every process decodes its block stripe.

    All processes must pass the same container bytes (e.g. each read the
    same file); decoded blocks are ragged-gathered to process 0 in block
    order.  Returns the stream bytes on process 0, None elsewhere.  With
    one process this is exactly the local path.
    """
    pid, pcount = process_info()
    block_size, total_size, raw_blocks = container.unpack_file(blob)
    infos = []
    for raw in raw_blocks:
        orig_len, shift, lens, present, cps, rle_len, payload = container.unpack_block(raw)
        infos.append({"orig_len": orig_len, "shift": shift, "lens": lens,
                      "present": present, "cps": cps, "rle_len": rle_len,
                      "payload": payload})
    mine = [(i, info) for i, info in enumerate(infos) if i % pcount == pid]
    parts = backend.decompress_blocks([info for _, info in mine])

    if pcount == 1:
        out = b"".join(p.tobytes() for p in parts)
        if len(out) != total_size:
            raise ValueError(f"decoded {len(out)} bytes, expected {total_size}")
        return out

    from jax.experimental import multihost_utils

    max_count = -(-len(infos) // pcount)
    buf = np.zeros((max_count, block_size), dtype=np.uint8)
    lens_arr = np.zeros(max_count, dtype=np.int64)
    ids = np.full(max_count, -1, dtype=np.int64)
    for row, ((i, _), part) in enumerate(zip(mine, parts)):
        buf[row, : part.size] = part
        lens_arr[row] = part.size
        ids[row] = i
    all_buf = multihost_utils.process_allgather(buf)
    all_lens = multihost_utils.process_allgather(lens_arr)
    all_ids = multihost_utils.process_allgather(ids)

    if pid != 0:
        return None
    by_id: dict[int, bytes] = {}
    for p in range(all_ids.shape[0]):
        for row in range(all_ids.shape[1]):
            i = int(all_ids[p, row])
            if i >= 0:
                by_id[i] = all_buf[p, row, : int(all_lens[p, row])].tobytes()
    out = b"".join(by_id[i] for i in range(len(infos)))
    if len(out) != total_size:
        raise ValueError(f"decoded {len(out)} bytes, expected {total_size}")
    return out
