"""High-level compress/decompress API over pluggable backends.

Capability contract mirrors the reference pipelines `compress`/`decompress`
(`/root/reference/main.cpp:300-345`): whole-stream lossless round-trip with
per-block {bwt shift, original length, code table} metadata, but multi-block
and backend-pluggable (NumPy oracle vs batched JAX/TPU).
"""

from __future__ import annotations

import numpy as np

from .utils import container
from .utils.config import DEFAULT as CONFIG

DEFAULT_BLOCK_SIZE = CONFIG.block_size
MAX_BLOCK_SIZE = 1 << 21  # CodecConfig.validate's bound (code lengths <= 31)


def _validate_block_size(block_size: int) -> None:
    """Fail fast at compress time: device primitives assume blocks <= 2 MiB
    (RLE0's f32-exponent log2 is exact below 2^24, packed sort payloads
    assume rank < 2^21, and code lengths must fit 5 container bits) — an
    out-of-envelope size would silently produce wrong compressed bits."""
    if not 1 <= block_size <= MAX_BLOCK_SIZE:
        raise ValueError(
            f"block_size {block_size} out of range [1, {MAX_BLOCK_SIZE}]")


def _present(r: dict):
    """Present-symbol mask of a backend result (JaxBackend packs it in the
    device meta matrix; the oracle backend derives it from its histogram)."""
    return r["present"] if "present" in r else r["freqs"] > 0


def _codec_stride() -> int:
    """The iBWT cursor stride the encoder's checkpoints were computed with
    (ops.bwt freezes it at import) — recorded in the file header so the
    recorded stride provably matches the encoded checkpoints even if the
    config object is mutated later."""
    from .ops.bwt import CURSOR_STRIDE

    return CURSOR_STRIDE


class OracleBackend:
    """Sequential NumPy backend — the correctness judge, not a hot path."""

    name = "oracle"

    def compress_blocks(self, blocks: list[np.ndarray]) -> list[dict]:
        from .models import oracle

        return [oracle.compress_block(b) for b in blocks]

    def decompress_blocks(self, blocks: list[dict]) -> list[np.ndarray]:
        from .models import oracle

        out = []
        for b in blocks:
            present = b["present"]
            if b["orig_len"] == 0:
                out.append(np.zeros(0, dtype=np.uint8))
            elif int(present.sum()) == 1:
                sym = int(np.nonzero(present)[0][0])
                out.append(oracle.decompress_block(
                    b["payload"], b["lens"], b["shift"], b["orig_len"],
                    b["rle_len"], single_symbol=sym))
            else:
                out.append(oracle.decompress_block(
                    b["payload"], b["lens"], b["shift"], b["orig_len"],
                    b["rle_len"]))
        return out


_BACKENDS: dict[str, object] = {}


def get_backend(name: str):
    if name not in _BACKENDS:
        if name == "oracle":
            _BACKENDS[name] = OracleBackend()
        elif name == "jax":
            from .models.pipeline import JaxBackend

            _BACKENDS[name] = JaxBackend()
        else:
            raise ValueError(f"unknown backend {name!r}")
    return _BACKENDS[name]


def _rle1_blocks(blocks: list[np.ndarray]) -> tuple[list[np.ndarray], list[int]]:
    """Per-block RLE1 pre-pass (utils/nativeio): returns the (possibly
    collapsed) blocks the codec sees plus each block's raw length.  A block
    keeps its raw bytes when RLE1 would not strictly shrink it."""
    from .utils import nativeio

    if not CONFIG.rle1:
        return blocks, [b.size for b in blocks]
    out = []
    raw_lens = []
    for b in blocks:
        enc = nativeio.rle1_encode(b)
        out.append(enc if enc.size < b.size else b)
        raw_lens.append(b.size)
    return out, raw_lens


def _rle1_restore(part: np.ndarray, raw_len: int) -> np.ndarray:
    from .utils import nativeio

    if part.size == raw_len:
        return part
    return nativeio.rle1_decode(part, raw_len)


def compress_bytes(data: bytes | np.ndarray, block_size: int = DEFAULT_BLOCK_SIZE,
                   backend: str = "jax") -> bytes:
    _validate_block_size(block_size)
    arr = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray)) else np.asarray(data, dtype=np.uint8)
    blocks, raw_lens = _rle1_blocks(container.split_blocks(arr, block_size))
    results = get_backend(backend).compress_blocks(blocks)
    packed = []
    for raw_len, r in zip(raw_lens, results):
        present = _present(r)
        packed.append(
            container.pack_block(raw_len, r["shift"], r["lens"], present,
                                 r["payload"], cps=r.get("cps", ()),
                                 rle_len=r["rle_len"], pre_len=r["orig_len"])
        )
    return container.pack_file(packed, block_size, arr.size,
                               stride=_codec_stride())


def _validate_block_info(orig_len: int, pre_len: int, rle_len: int,
                         cps, lens: np.ndarray, present: np.ndarray,
                         payload: bytes, block_size: int, stride: int,
                         shift: int = 0) -> None:
    """Cross-field consistency checks on an unpacked block.

    The container CRC only proves the bytes are the writer's bytes; a
    hostile writer can stamp a fresh CRC over internally inconsistent
    fields.  Everything checkable without decoding is checked here (the
    rest — a payload whose symbols decode to the wrong total — is caught
    by the device pipelines' decoded-total trailer).  The reference's
    behaviour on all of these is undefined (io_utilities.h:40-51)."""
    if orig_len == 0:
        return
    if orig_len > block_size:
        raise ValueError(f"corrupt block: orig_len {orig_len} exceeds "
                         f"block_size {block_size}")
    if not 1 <= pre_len <= orig_len:
        raise ValueError(f"corrupt block: pre_len {pre_len} outside "
                         f"[1, {orig_len}]")
    if not 1 <= rle_len <= pre_len:
        raise ValueError(f"corrupt block: rle_len {rle_len} outside "
                         f"[1, {pre_len}]")
    npres = int(present.sum())
    if npres == 0:
        raise ValueError("corrupt block: no symbols present")
    if not 0 <= shift < pre_len:
        raise ValueError(f"corrupt block: bwt shift {shift} outside "
                         f"[0, {pre_len})")
    if cps is not None:
        want = max(-(-pre_len // stride) - 1, 0)
        if len(cps) != want:
            raise ValueError(f"corrupt block: {len(cps)} checkpoints, "
                             f"expected {want}")
        cc = np.asarray(cps)
        if cc.size and (int(cc.min()) < 0 or int(cc.max()) >= pre_len):
            raise ValueError("corrupt block: checkpoint out of range")
    plens = lens[present]
    if npres == 1:
        if int(plens[0]) != 0 or payload:
            raise ValueError("corrupt block: single-symbol block must have "
                             "length 0 and empty payload")
        # a single-present-symbol stream is rle_len copies of s, so its
        # decoded length is closed-form: run digits (s<=1) decode to
        # (1+s)*(2^m - 1) bytes, a repeated literal to m bytes — the
        # single-symbol decode path has no device totals trailer, so this
        # is its lying-rle_len check (Python ints: 2^m may be huge)
        s = int(np.nonzero(present)[0][0])
        want = (1 + s) * ((1 << min(rle_len, 40)) - 1) if s <= 1 else rle_len
        if want != pre_len:
            raise ValueError(
                f"corrupt block: single-symbol stream of {rle_len} x "
                f"symbol {s} decodes to {want} bytes, expected {pre_len}")
        return
    if (plens == 0).any():
        raise ValueError("corrupt block: present symbol with code length 0")
    # complete canonical code: Kraft sum over present symbols must be exact
    if int(np.sum(1 << (31 - plens.astype(np.int64)))) != (1 << 31):
        raise ValueError("corrupt block: code lengths violate Kraft equality")
    if len(payload) * 8 < rle_len * int(plens.min()):
        raise ValueError("corrupt block: payload shorter than rle_len "
                         "symbols can occupy")


def decompress_bytes(buf: bytes, backend: str = "jax") -> bytes:
    block_size, total_size, raw_blocks = container.unpack_file(buf)
    # the DECODE side must apply the codec envelope too: a hostile header
    # claiming a multi-GB block_size would otherwise reach device dispatch
    # as a giant allocation / unhandled jit OverflowError, not a clean error
    _validate_block_size(block_size)
    stride = container.file_stride(buf)
    infos = []
    raw_lens = []
    for raw in raw_blocks:
        orig_len, shift, lens, present, cps, rle_len, payload, pre_len =             container.unpack_block(raw)
        _validate_block_info(orig_len, pre_len, rle_len, cps, lens, present,
                             payload, block_size, stride, shift)
        raw_lens.append(orig_len)
        infos.append({
            "orig_len": pre_len,  # the codec round-trips the RLE1'd bytes
            "shift": shift,
            "lens": lens,
            "present": present,
            "cps": cps,
            "rle_len": rle_len,
            "payload": payload,
            "stride": stride,
        })
    if not infos:
        return b""
    parts = get_backend(backend).decompress_blocks(infos)
    out = b"".join(_rle1_restore(p, rl).tobytes()
                   for p, rl in zip(parts, raw_lens))
    if len(out) != total_size:
        raise ValueError(f"decoded {len(out)} bytes, expected {total_size}")
    return out


def compress_many(datas: list[bytes | np.ndarray], block_size: int = DEFAULT_BLOCK_SIZE,
                  backend: str = "jax", uniform: bool = False) -> list[bytes]:
    """Compress several independent streams in one batched backend dispatch.

    All blocks of all streams are flattened into a single compress_blocks
    call so the device sees one large batch (better MXU/VPU occupancy than
    stream-at-a-time), then containers are reassembled per stream.  With
    uniform=True every block pads to the block_size bucket: one compiled
    shape and one dispatch for the whole batch (throughput mode).
    """
    _validate_block_size(block_size)
    arrs = [np.frombuffer(d, dtype=np.uint8) if isinstance(d, (bytes, bytearray))
            else np.asarray(d, dtype=np.uint8) for d in datas]
    flat_blocks: list[np.ndarray] = []
    flat_raw_lens: list[int] = []
    spans: list[tuple[int, int]] = []
    for arr in arrs:
        blocks, raw_lens = _rle1_blocks(container.split_blocks(arr, block_size))
        spans.append((len(flat_blocks), len(blocks)))
        flat_blocks.extend(blocks)
        flat_raw_lens.extend(raw_lens)
    be = get_backend(backend)
    if uniform and hasattr(be, "name") and be.name == "jax":
        from .models.pipeline import _bucket

        results = be.compress_blocks(flat_blocks, bucket=_bucket(block_size))
    else:
        results = be.compress_blocks(flat_blocks)
    out = []
    for arr, (start, cnt) in zip(arrs, spans):
        packed = []
        for r, raw_len in zip(results[start:start + cnt],
                              flat_raw_lens[start:start + cnt]):
            present = _present(r)
            packed.append(container.pack_block(raw_len, r["shift"], r["lens"],
                                               present, r["payload"],
                                               cps=r.get("cps", ()),
                                               rle_len=r["rle_len"],
                                               pre_len=r["orig_len"]))
        out.append(container.pack_file(packed, block_size, arr.size,
                                       stride=_codec_stride()))
    return out


def decompress_many(bufs: list[bytes], backend: str = "jax",
                    uniform: bool = False) -> list[bytes]:
    """Decompress several .bzt containers in one batched backend dispatch."""
    infos: list[dict] = []
    raw_lens: list[int] = []
    spans: list[tuple[int, int, int]] = []
    max_block = 0
    for buf in bufs:
        bs, total, raw_blocks = container.unpack_file(buf)
        _validate_block_size(bs)  # decode-side envelope (see decompress_bytes)
        stride = container.file_stride(buf)
        max_block = max(max_block, bs)
        spans.append((len(infos), len(raw_blocks), total))
        for raw in raw_blocks:
            orig_len, shift, lens, present, cps, rle_len, payload, pre_len =                 container.unpack_block(raw)
            _validate_block_info(orig_len, pre_len, rle_len, cps, lens,
                                 present, payload, bs, stride, shift)
            raw_lens.append(orig_len)
            infos.append({"orig_len": pre_len, "shift": shift, "lens": lens,
                          "present": present, "cps": cps, "rle_len": rle_len,
                          "payload": payload, "stride": stride})
    be = get_backend(backend)
    if not infos:
        parts = []
    elif uniform and be.name == "jax":
        from .models.pipeline import _bucket

        # round the shared bucket to a power of two: a non-pow2 file
        # block_size (which compress_many accepts — ITS bucket is rounded)
        # would otherwise reach the device kernels' pow2 shape asserts
        parts = be.decompress_blocks(infos, bucket=_bucket(max_block))
    else:
        parts = be.decompress_blocks(infos)
    out = []
    for start, cnt, total in spans:
        data = b"".join(_rle1_restore(p, rl).tobytes()
                        for p, rl in zip(parts[start:start + cnt],
                                         raw_lens[start:start + cnt]))
        if len(data) != total:
            raise ValueError(f"decoded {len(data)} bytes, expected {total}")
        out.append(data)
    return out


def compress_file(in_path: str, out_path: str, block_size: int = DEFAULT_BLOCK_SIZE,
                  backend: str = "jax") -> dict:
    with open(in_path, "rb") as f:
        data = f.read()
    blob = compress_bytes(data, block_size=block_size, backend=backend)
    with open(out_path, "wb") as f:
        f.write(blob)
    return {"initial_data_size": len(data), "encoded_file_size": len(blob),
            "header_size": container.header_bytes(blob)}


def full_pipeline(in_path: str, enc_path: str, dec_path: str,
                  block_size: int = DEFAULT_BLOCK_SIZE, backend: str = "jax") -> bool:
    """Compress then decompress through the real files on disk and verify.

    The reference's `full_pipeline` (main.cpp:347-380) round-trips through
    the container on disk so the file format is exercised, not just the
    in-memory transforms; same contract here.  Returns bit-exact verdict.
    """
    compress_file(in_path, enc_path, block_size=block_size, backend=backend)
    decompress_file(enc_path, dec_path, backend=backend)
    from .utils import nativeio

    equal = nativeio.compare_files(in_path, dec_path)
    if equal is None:
        with open(in_path, "rb") as f1, open(dec_path, "rb") as f2:
            equal = f1.read() == f2.read()
    return bool(equal)


def decompress_file(in_path: str, out_path: str, backend: str = "jax") -> dict:
    with open(in_path, "rb") as f:
        blob = f.read()
    data = decompress_bytes(blob, backend=backend)
    with open(out_path, "wb") as f:
        f.write(data)
    return {"encoded_file_size": len(blob), "decoded_size": len(data)}
