"""The `.bzt` container format (multi-block successor of the reference `.bzap`).

The reference container (`/root/reference/io_utilities.h:7-55`) stores one
whole-file block with a 24-byte native-endian header {bwt shift, original
size, tree size} followed by a pre-order bit-serialised Huffman tree
(10 bits per present symbol) and the bit-packed payload.

`.bzt` carries the same information *per block* plus a file-level header so
that blocks are independent (data-parallel across TPU chips) and locatable
without parsing:

    file header (24 B, little-endian):
        magic      4s   = b"BZT1"
        version    u8   = 3
        flags      u8   = 0
        reserved   u16  = 0
        block_size u32  nominal uncompressed block length
        n_blocks   u32
        total_size u64  original stream length
    block table: u32 compressed byte length per block
    blocks, concatenated:
        orig_len   u32  uncompressed length of this block (<= block_size)
        bwt_shift  u32  sorted position of rotation 0
        n_cps      u16  inverse-walk checkpoint count; 0xFFFF = periodic
                   block (no checkpoints valid — decoder must fall back to
                   a sequential-equivalent inverse)
        rle_len    u32  RLE0 symbol count (the Huffman-coded stream length;
                   <= orig_len since zero runs collapse)
        cps        n_cps x u32 — rank[(j*CURSOR_STRIDE) % n] for j=1..n_cps,
                   the parallel-iBWT cursor starts (ops/bwt.py)
        bitmap     33 B present-symbol bitmap over the 257-symbol RLE0
                   alphabet (bit s = byte s>>3, bit s&7)
        lens       ceil(5*S/8) B — 5-bit code lengths of the S present
                   symbols in ascending symbol order, MSB-first
        payload    ceil(total_bits/8) B — MSB-first canonical Huffman bits

The code-length table replaces the reference's 10-bit-per-symbol tree
serialisation: 33 + ceil(5S/8) bytes vs ceil((10S-1)/8) — and the RLE0 run
stage (absent in the reference) more than repays the bitmap/checkpoint
overhead, so `.bzt` files undercut the reference `.bzap` sizes.
A block whose 256-bin histogram has exactly one present symbol stores that
symbol's length as 0 and an empty payload.  An empty input stream is a valid
file with n_blocks == 0.
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"BZT1"
# v3 = v2 + the RLE1 block flag (orig_len bit 31 + conditional u32 pre_len);
# v2 readers would misparse RLE1-flagged blocks instead of failing the
# version check, so writers always stamp 3 and readers accept both.
VERSION = 3
COMPAT_VERSIONS = (2, 3)
FLAG_STREAMING = 0x01  # blocks are u32-length-prefixed; no up-front table
FLAG_CRC32 = 0x02      # u32 IEEE CRC of the block region follows the table
FILE_HEADER = struct.Struct("<4sBBHIIQ")
BLOCK_HEADER = struct.Struct("<IIHI")
PERIODIC_SENTINEL = 0xFFFF  # n_cps value marking a periodic block
ALPHABET = 257  # RLE0 alphabet: RUNA, RUNB, MTF codes 1..255 shifted (+1)
BITMAP_BYTES = (ALPHABET + 7) // 8
DEFAULT_BLOCK_SIZE = 1 << 20


def pack_lens(lens: np.ndarray, present: np.ndarray) -> bytes:
    """Bitmap + packed 5-bit lengths for present symbols (ascending symbol)."""
    from . import nativeio

    native = nativeio.pack_lens(lens, present)
    if native is not None:
        return native
    bitmap = bytearray((np.asarray(lens).size + 7) // 8)
    for s in np.nonzero(present)[0]:
        bitmap[s >> 3] |= 1 << (s & 7)
    syms = np.nonzero(present)[0]
    nbits = 5 * syms.size
    packed = bytearray((nbits + 7) // 8)
    bitpos = 0
    for s in syms:
        v = int(lens[s])
        for k in range(4, -1, -1):
            if (v >> k) & 1:
                packed[bitpos >> 3] |= 0x80 >> (bitpos & 7)
            bitpos += 1
    return bytes(bitmap) + bytes(packed)


def unpack_lens(buf: bytes, off: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Returns (lens (A,) uint8, present mask (A,) bool, new offset)."""
    from . import nativeio

    native = nativeio.unpack_lens(buf, off, ALPHABET)
    if native is not None:
        return native
    bitmap = buf[off:off + BITMAP_BYTES]
    off += BITMAP_BYTES
    present = np.zeros(ALPHABET, dtype=bool)
    for s in range(ALPHABET):
        if (bitmap[s >> 3] >> (s & 7)) & 1:
            present[s] = True
    syms = np.nonzero(present)[0]
    nbits = 5 * syms.size
    nbytes = (nbits + 7) // 8
    packed = buf[off:off + nbytes]
    off += nbytes
    lens = np.zeros(ALPHABET, dtype=np.uint8)
    bitpos = 0
    for s in syms:
        v = 0
        for _ in range(5):
            v = (v << 1) | ((packed[bitpos >> 3] >> (7 - (bitpos & 7))) & 1)
            bitpos += 1
        lens[s] = v
    return lens, present, off


RLE1_FLAG = 0x80000000  # orig_len bit 31: block was RLE1-collapsed pre-BWT


def pack_block(orig_len: int, bwt_shift: int, lens: np.ndarray,
               present: np.ndarray, payload: bytes,
               cps: np.ndarray | None = (), rle_len: int = 0,
               pre_len: int | None = None) -> bytes:
    """cps: iBWT cursor checkpoints (possibly empty); None marks a periodic
    block whose checkpoints are undefined (decoder falls back).
    rle_len: RLE0 symbol count of the Huffman stream.
    pre_len: post-RLE1 length when the run-collapse pre-pass was applied
    (bit 31 of orig_len flags it; a u32 pre_len follows the header)."""
    rle1 = pre_len is not None and pre_len != orig_len
    len_field = orig_len | (RLE1_FLAG if rle1 else 0)
    pre_bytes = struct.pack("<I", pre_len) if rle1 else b""
    if cps is None:
        head = BLOCK_HEADER.pack(len_field, bwt_shift, PERIODIC_SENTINEL, rle_len)
        cp_bytes = b""
    else:
        cps = np.asarray(cps, dtype=np.uint32)
        if cps.size >= PERIODIC_SENTINEL:
            raise ValueError(f"too many checkpoints ({cps.size}); shrink the block")
        head = BLOCK_HEADER.pack(len_field, bwt_shift, cps.size, rle_len)
        cp_bytes = cps.astype("<u4").tobytes()
    return head + pre_bytes + cp_bytes + pack_lens(lens, present) + payload


def unpack_block(buf: bytes) -> tuple[int, int, np.ndarray, np.ndarray,
                                      np.ndarray | None, int, bytes, int]:
    """Returns (orig_len, bwt_shift, lens, present, cps, rle_len, payload,
    pre_len).

    cps is None for a periodic block (decoder must not use cursor starts).
    pre_len == orig_len unless the RLE1 pre-pass flag is set.
    """
    len_field, bwt_shift, n_cps, rle_len = BLOCK_HEADER.unpack_from(buf, 0)
    orig_len = len_field & ~RLE1_FLAG
    off = BLOCK_HEADER.size
    if len_field & RLE1_FLAG:
        (pre_len,) = struct.unpack_from("<I", buf, off)
        off += 4
    else:
        pre_len = orig_len
    if n_cps == PERIODIC_SENTINEL:
        cps = None
    else:
        cps = np.frombuffer(buf, dtype="<u4", count=n_cps, offset=off).astype(np.int32)
        off += 4 * n_cps
    lens, present, off = unpack_lens(buf, off)
    return orig_len, bwt_shift, lens, present, cps, rle_len, buf[off:], pre_len


def _crc32(data: bytes) -> int:
    from . import nativeio

    c = nativeio.crc32(data)
    if c is None:
        import zlib

        c = zlib.crc32(data) & 0xFFFFFFFF
    return c


def _stride_code(stride: int | None) -> int:
    """log2 of the iBWT cursor stride, carried in the header's reserved
    u16 (0 = legacy 4096, so round-2 files decode unchanged)."""
    if stride is None:
        from . import config as config_mod

        stride = config_mod.DEFAULT.cursor_stride
    return stride.bit_length() - 1


def file_stride(buf: bytes) -> int:
    """Cursor stride recorded in a .bzt header (reserved==0 -> legacy 4096)."""
    if len(buf) < FILE_HEADER.size:
        raise ValueError(f"truncated .bzt file: {len(buf)} bytes < header")
    _, _, _, res, _, _, _ = FILE_HEADER.unpack_from(buf, 0)
    return (1 << res) if res else 4096


def pack_file(blocks: list[bytes], block_size: int, total_size: int,
              crc: bool = True, stride: int | None = None) -> bytes:
    """crc=True appends a u32 IEEE CRC of the block region (integrity check
    the reference has no analogue of — its only failure mode is UB)."""
    flags = FLAG_CRC32 if crc else 0
    header = FILE_HEADER.pack(MAGIC, VERSION, flags, _stride_code(stride),
                              block_size, len(blocks), total_size)
    table = struct.pack(f"<{len(blocks)}I", *(len(b) for b in blocks))
    body = b"".join(blocks)
    trailer = struct.pack("<I", _crc32(body)) if crc else b""
    return header + table + trailer + body


def unpack_file(buf: bytes) -> tuple[int, int, list[bytes]]:
    """Returns (block_size, total_size, list of raw block buffers)."""
    if len(buf) < FILE_HEADER.size:
        raise ValueError(f"truncated .bzt file: {len(buf)} bytes < header")
    magic, version, flags, _res, block_size, n_blocks, total_size = FILE_HEADER.unpack_from(buf, 0)
    if magic != MAGIC:
        raise ValueError(f"bad magic {magic!r}; not a .bzt file")
    if version not in COMPAT_VERSIONS:
        raise ValueError(f"unsupported .bzt version {version}")
    off = FILE_HEADER.size
    if flags & FLAG_STREAMING:
        # self-delimiting length-prefixed blocks (resumable writer layout)
        blocks = []
        for _ in range(n_blocks):
            if len(buf) < off + 4:
                raise ValueError("truncated .bzt file: streaming block prefix")
            (sz,) = struct.unpack_from("<I", buf, off)
            off += 4
            if len(buf) < off + sz:
                raise ValueError("truncated .bzt file: streaming block data")
            blocks.append(buf[off:off + sz])
            off += sz
        return block_size, total_size, blocks
    if len(buf) < off + 4 * n_blocks:
        raise ValueError("truncated .bzt file: block table incomplete")
    sizes = struct.unpack_from(f"<{n_blocks}I", buf, off)
    off += 4 * n_blocks
    if flags & FLAG_CRC32:
        if len(buf) < off + 4:
            raise ValueError("truncated .bzt file: missing CRC trailer")
        (want_crc,) = struct.unpack_from("<I", buf, off)
        off += 4
        if len(buf) < off + sum(sizes):
            raise ValueError("truncated .bzt file: block data incomplete")
        if _crc32(buf[off:off + sum(sizes)]) != want_crc:
            raise ValueError("corrupt .bzt file: block CRC mismatch")
    if len(buf) < off + sum(sizes):
        raise ValueError("truncated .bzt file: block data incomplete")
    blocks = []
    for sz in sizes:
        blocks.append(buf[off:off + sz])
        off += sz
    return block_size, total_size, blocks


def header_bytes(buf: bytes) -> int:
    """Total non-payload (metadata) bytes of a .bzt container.

    The reference prints `header size:` per file (main.cpp:319-321) = its
    24-byte fixed header + serialized tree; the analogue here is everything
    except the Huffman payload bits: file header, block table, per-block
    headers, checkpoints, and code-length tables.
    """
    _, _, raw_blocks = unpack_file(buf)
    payload = sum(len(unpack_block(raw)[6]) for raw in raw_blocks)
    return len(buf) - payload


def split_blocks(data: bytes | np.ndarray, block_size: int = DEFAULT_BLOCK_SIZE) -> list[np.ndarray]:
    arr = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray)) else np.asarray(data, dtype=np.uint8)
    return [arr[i:i + block_size] for i in range(0, arr.size, block_size)]
