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


# Ragged gathers run in bounded-memory chunks of this many block slots per
# process: peak transient buffer = GATHER_CHUNK_BLOCKS x max_item x P on
# each host instead of the whole stream everywhere (the round-2 shape was
# one O(stream x P) allgather).  Traffic is still allgather-shaped (that is
# the collective JAX exposes across hosts); only process 0 retains data.
GATHER_CHUNK_BLOCKS = int(os.environ.get("BMH_GATHER_CHUNK_BLOCKS", "256"))


def _ragged_gather_to0(local_items: dict[int, bytes], n_total: int,
                       pid: int, pcount: int):
    """Gather {block_id: bytes} from every process to process 0, in block
    chunks so no host ever materializes more than a chunk of the stream.

    Returns the ordered list of byte strings on process 0, None elsewhere.
    """
    from jax.experimental import multihost_utils

    out: list[bytes] = []
    span = GATHER_CHUNK_BLOCKS * pcount
    for c0 in range(0, max(n_total, 1), span):
        ids_chunk = list(range(c0, min(c0 + span, n_total)))
        mine = [i for i in ids_chunk if i % pcount == pid]
        max_len = max((len(local_items[i]) for i in mine), default=0)
        gmax = int(multihost_utils.process_allgather(np.int64(max_len)).max())
        rows = GATHER_CHUNK_BLOCKS
        buf = np.zeros((rows, gmax), dtype=np.uint8)
        lens = np.zeros(rows, dtype=np.int64)
        ids = np.full(rows, -1, dtype=np.int64)
        for row, i in enumerate(mine):
            raw = np.frombuffer(local_items[i], dtype=np.uint8)
            buf[row, : raw.size] = raw
            lens[row] = raw.size
            ids[row] = i
        all_buf = multihost_utils.process_allgather(buf)    # (P, rows, gmax)
        all_lens = multihost_utils.process_allgather(lens)  # (P, rows)
        all_ids = multihost_utils.process_allgather(ids)    # (P, rows)
        if pid == 0:
            by_id: dict[int, bytes] = {}
            for p in range(all_ids.shape[0]):
                for row in range(all_ids.shape[1]):
                    i = int(all_ids[p, row])
                    if i >= 0:
                        by_id[i] = all_buf[p, row, : int(all_lens[p, row])].tobytes()
            out.extend(by_id[i] for i in ids_chunk)
        del all_buf, all_lens, all_ids, buf
    return out if pid == 0 else None


def compress_stream(data: bytes | np.ndarray, block_size: int, backend) -> bytes | None:
    """Distributed compress: every process handles its block stripe.

    Returns the container bytes on process 0, None elsewhere.  With one
    process this is exactly the local path.
    """
    from ..api import _rle1_blocks

    pid, pcount = process_info()
    arr = (np.frombuffer(data, dtype=np.uint8)
           if isinstance(data, (bytes, bytearray)) else np.asarray(data, dtype=np.uint8))
    blocks = container.split_blocks(arr, block_size)
    mine = [(i, b) for i, b in enumerate(blocks) if i % pcount == pid]
    pre, raw_lens = _rle1_blocks([b for _, b in mine])
    results = backend.compress_blocks(pre)

    local_packed: dict[int, bytes] = {}
    for (i, _), r, raw_len in zip(mine, results, raw_lens):
        from ..api import _present
        present = _present(r)
        local_packed[i] = container.pack_block(raw_len, r["shift"], r["lens"],
                                               present, r["payload"],
                                               cps=r.get("cps", ()),
                                               rle_len=r["rle_len"],
                                               pre_len=r["orig_len"])

    if pcount == 1:
        packed = [local_packed[i] for i in range(len(blocks))]
        return container.pack_file(packed, block_size, arr.size)

    packed = _ragged_gather_to0(local_packed, len(blocks), pid, pcount)
    if packed is None:
        return None
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
    stride = container.file_stride(blob)
    from ..api import _rle1_restore

    infos = []
    raw_lens = []
    for raw in raw_blocks:
        orig_len, shift, lens, present, cps, rle_len, payload, pre_len =             container.unpack_block(raw)
        raw_lens.append(orig_len)
        infos.append({"orig_len": pre_len, "shift": shift, "lens": lens,
                      "present": present, "cps": cps, "rle_len": rle_len,
                      "payload": payload, "stride": stride})
    mine = [(i, info) for i, info in enumerate(infos) if i % pcount == pid]
    parts = [_rle1_restore(p, raw_lens[i])
             for (i, _), p in zip(mine, backend.decompress_blocks(
                 [info for _, info in mine]))]

    if pcount == 1:
        out = b"".join(p.tobytes() for p in parts)
        if len(out) != total_size:
            raise ValueError(f"decoded {len(out)} bytes, expected {total_size}")
        return out

    local_parts = {i: part.tobytes() for (i, _), part in zip(mine, parts)}
    gathered = _ragged_gather_to0(local_parts, len(infos), pid, pcount)
    if gathered is None:
        return None
    out = b"".join(gathered)
    if len(out) != total_size:
        raise ValueError(f"decoded {len(out)} bytes, expected {total_size}")
    return out
