"""Resumable streaming compression — the checkpoint/resume subsystem.

The reference has no recovery story: a crashed run restarts from scratch
(SURVEY §5).  Here the container's streaming layout (FLAG_STREAMING:
u32-length-prefixed, self-delimiting blocks) makes every completed block a
durable checkpoint: a `StreamCompressor` appends blocks as they finish,
fsyncs, and `resume()` re-opens a partial file, validates the complete
prefix, and continues from the first missing block.  Every layout detail
lives in utils/container.py; this module only sequences writes.
"""

from __future__ import annotations

import os
import struct

import numpy as np

from . import container


class StreamCompressor:
    """Append-only .bzt writer with crash recovery.

    Usage:
        sc = StreamCompressor.create(path, block_size)   # or .resume(path)
        for blk in blocks[sc.blocks_done:]:
            sc.append(compress_one(blk))
        sc.finalize(total_size)
    """

    def __init__(self, path: str, block_size: int, blocks_done: int, mode: str):
        self.path = path
        self.block_size = block_size
        self.blocks_done = blocks_done
        self._f = open(path, mode)

    @classmethod
    def create(cls, path: str, block_size: int) -> "StreamCompressor":
        # stride comes from the encoder's frozen value (api._codec_stride),
        # not a pack-time config re-read, so the recorded stride always
        # matches the checkpoints the appended blocks were encoded with
        from ..api import _codec_stride

        header = container.FILE_HEADER.pack(
            container.MAGIC, container.VERSION, container.FLAG_STREAMING,
            container._stride_code(_codec_stride()), block_size, 0, 0)
        with open(path, "wb") as f:
            f.write(header)
            f.flush()
            os.fsync(f.fileno())
        return cls(path, block_size, 0, "r+b")

    @classmethod
    def resume(cls, path: str) -> "StreamCompressor":
        """Re-open a partial streaming file; truncate any torn final block."""
        with open(path, "rb") as f:
            buf = f.read()
        if len(buf) < container.FILE_HEADER.size:
            raise ValueError("not a resumable .bzt: missing header")
        magic, version, flags, _res, block_size, _nb, _ts = \
            container.FILE_HEADER.unpack_from(buf, 0)
        if magic != container.MAGIC or not (flags & container.FLAG_STREAMING):
            raise ValueError("not a streaming .bzt file")
        off = container.FILE_HEADER.size
        done = 0
        while off + 4 <= len(buf):
            (sz,) = struct.unpack_from("<I", buf, off)
            if off + 4 + sz > len(buf):
                break  # torn block: rewrite it
            off += 4 + sz
            done += 1
        with open(path, "r+b") as f:
            f.truncate(off)
        sc = cls(path, block_size, done, "r+b")
        sc._f.seek(off)
        return sc

    def append(self, packed_block: bytes) -> None:
        self._f.seek(0, os.SEEK_END)
        self._f.write(struct.pack("<I", len(packed_block)))
        self._f.write(packed_block)
        self._f.flush()
        os.fsync(self._f.fileno())
        self.blocks_done += 1

    def finalize(self, total_size: int) -> None:
        """Patch the header with the final block count and stream length."""
        from ..api import _codec_stride

        header = container.FILE_HEADER.pack(
            container.MAGIC, container.VERSION, container.FLAG_STREAMING,
            container._stride_code(_codec_stride()), self.block_size,
            self.blocks_done, total_size)
        self._f.seek(0)
        self._f.write(header)
        self._f.flush()
        os.fsync(self._f.fileno())
        self._f.close()


def compress_file_resumable(in_path: str, out_path: str,
                            block_size: int = container.DEFAULT_BLOCK_SIZE,
                            backend: str = "jax") -> dict:
    """Compress with per-block durability; resumes automatically if out_path
    holds a partial run over the same input."""
    from ..api import get_backend

    with open(in_path, "rb") as f:
        data = np.frombuffer(f.read(), dtype=np.uint8)
    blocks = container.split_blocks(data, block_size)

    if os.path.exists(out_path):
        try:
            sc = StreamCompressor.resume(out_path)
            if sc.block_size != block_size or sc.blocks_done > len(blocks):
                sc._f.close()
                sc = StreamCompressor.create(out_path, block_size)
        except ValueError:
            sc = StreamCompressor.create(out_path, block_size)
    else:
        sc = StreamCompressor.create(out_path, block_size)

    todo = blocks[sc.blocks_done:]
    resumed_from = sc.blocks_done
    be = get_backend(backend)
    from ..api import _rle1_blocks

    for blk in todo:  # one block per append: each is a durable checkpoint
        (pre,), (raw_len,) = _rle1_blocks([blk])
        r = be.compress_blocks([pre])[0]
        from ..api import _present
        present = _present(r)
        sc.append(container.pack_block(raw_len, r["shift"], r["lens"],
                                       present, r["payload"], cps=r.get("cps", ()),
                                       rle_len=r["rle_len"],
                                       pre_len=r["orig_len"]))
    sc.finalize(data.size)
    return {"blocks": len(blocks), "resumed_from": resumed_from,
            "encoded_file_size": os.path.getsize(out_path)}
