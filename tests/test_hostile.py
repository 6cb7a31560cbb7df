"""Hostile-container fuzzing: CRC-valid .bzt files with internally
inconsistent fields must fail CLOSED — a clean ValueError (or provably
wrong-length output), never silently wrong bytes of the right length.

The reference's behaviour on any of these is undefined
(/root/reference/io_utilities.h:40-51 reads attacker-controlled sizes
straight into allocations and loops); here every case below is pinned.
Two defence layers are exercised: host-side cross-field validation
(api._validate_block_info) and the device pipelines' decoded-total
trailer (models/pipeline._compact_rows_diag + _drain_decompress).
"""

import numpy as np
import pytest

from bmh_tpu import api
from bmh_tpu.utils import container


def _mutate_block(blob: bytes, idx: int = 0, **overrides) -> bytes:
    """Re-pack `blob` with block `idx`'s fields overridden and a FRESH CRC
    (the attacker model: a writer that lies consistently)."""
    bs, total, raws = container.unpack_file(blob)
    stride = container.file_stride(blob)
    blocks = []
    for i, raw in enumerate(raws):
        (orig_len, shift, lens, present, cps, rle_len, payload,
         pre_len) = container.unpack_block(raw)
        if i == idx:
            f = dict(orig_len=orig_len, bwt_shift=shift, lens=lens,
                     present=present, payload=payload, cps=cps,
                     rle_len=rle_len, pre_len=pre_len)
            f.update(overrides)
            raw = container.pack_block(
                f["orig_len"], f["bwt_shift"], f["lens"], f["present"],
                f["payload"], cps=f["cps"], rle_len=f["rle_len"],
                pre_len=f["pre_len"])
        blocks.append(raw)
    return container.pack_file(blocks, bs, total, stride=stride)


@pytest.fixture(scope="module")
def text_blob():
    rng = np.random.default_rng(7)
    words = [b"the ", b"quick ", b"brown ", b"fox ", b"lazy ", b"dog ",
             b"jumps ", b"over "]
    data = b"".join(words[i] for i in rng.integers(0, 8, 2800))[:12000]
    blob = api.compress_bytes(data, block_size=16384)  # > stride: cps exist
    assert api.decompress_bytes(blob) == data  # sanity: the base is valid
    return data, blob


@pytest.fixture(scope="module")
def periodic_blob():
    data = b"xyz" * 700  # one exactly periodic block (cps is None)
    blob = api.compress_bytes(data, block_size=2100)
    assert api.decompress_bytes(blob) == data
    _, _, raws = container.unpack_file(blob)
    assert container.unpack_block(raws[0])[4] is None  # really periodic
    return data, blob


def _fields(blob, idx=0):
    _, _, raws = container.unpack_file(blob)
    return container.unpack_block(raws[idx])


def test_rle_len_too_large_host_check(text_blob):
    data, blob = text_blob
    (orig_len, _, _, _, _, rle_len, _, pre_len) = _fields(blob)
    bad = _mutate_block(blob, rle_len=pre_len + 5)
    with pytest.raises(ValueError, match="rle_len"):
        api.decompress_bytes(bad)


def test_rle_len_lying_small_device_totals(text_blob):
    """rle_len passes the host range check but truncates the symbol stream:
    the device decoded-total trailer catches it."""
    data, blob = text_blob
    (_, _, _, _, _, rle_len, _, _) = _fields(blob)
    assert rle_len > 4
    bad = _mutate_block(blob, rle_len=rle_len - 3)
    with pytest.raises(ValueError, match="corrupt"):
        api.decompress_bytes(bad)


def test_rle_len_one_device_totals(text_blob):
    data, blob = text_blob
    bad = _mutate_block(blob, rle_len=1)
    with pytest.raises(ValueError, match="corrupt"):
        api.decompress_bytes(bad)


def test_truncated_cps(text_blob):
    data, blob = text_blob
    (_, _, _, _, cps, _, _, _) = _fields(blob)
    if cps is None or len(cps) == 0:
        pytest.skip("base block has no checkpoints at this stride")
    bad = _mutate_block(blob, cps=cps[:-1])
    with pytest.raises(ValueError, match="checkpoint"):
        api.decompress_bytes(bad)


def test_oversized_cps(text_blob):
    data, blob = text_blob
    (_, _, _, _, cps, _, _, _) = _fields(blob)
    extra = np.concatenate([np.asarray(cps if cps is not None else [],
                                       dtype=np.int32),
                            np.arange(40, dtype=np.int32)])
    bad = _mutate_block(blob, cps=extra)
    with pytest.raises(ValueError, match="checkpoint"):
        api.decompress_bytes(bad)


def test_cps_value_out_of_range(text_blob):
    data, blob = text_blob
    (_, _, _, _, cps, _, _, pre_len) = _fields(blob)
    if cps is None or len(cps) == 0:
        pytest.skip("base block has no checkpoints at this stride")
    cc = np.asarray(cps, dtype=np.int32).copy()
    cc[0] = pre_len + 10
    bad = _mutate_block(blob, cps=cc)
    with pytest.raises(ValueError, match="checkpoint"):
        api.decompress_bytes(bad)


def test_kraft_violation(text_blob):
    data, blob = text_blob
    (_, _, lens, present, _, _, _, _) = _fields(blob)
    lens2 = np.asarray(lens, dtype=np.uint8).copy()
    sym = int(np.nonzero(np.asarray(present))[0][0])
    lens2[sym] += 1  # over-full/under-full code
    bad = _mutate_block(blob, lens=lens2)
    with pytest.raises(ValueError, match="Kraft|corrupt"):
        api.decompress_bytes(bad)


def test_zero_length_present_symbol(text_blob):
    data, blob = text_blob
    (_, _, lens, present, _, _, _, _) = _fields(blob)
    lens2 = np.asarray(lens, dtype=np.uint8).copy()
    sym = int(np.nonzero(np.asarray(present))[0][0])
    lens2[sym] = 0
    bad = _mutate_block(blob, lens=lens2)
    with pytest.raises(ValueError, match="length 0|Kraft|corrupt"):
        api.decompress_bytes(bad)


def test_truncated_payload(text_blob):
    data, blob = text_blob
    (_, _, _, _, _, _, payload, _) = _fields(blob)
    bad = _mutate_block(blob, payload=payload[: len(payload) // 2])
    with pytest.raises(ValueError, match="corrupt"):
        api.decompress_bytes(bad)


def test_orig_len_exceeds_block_size(text_blob):
    data, blob = text_blob
    bad = _mutate_block(blob, orig_len=1 << 20, pre_len=1 << 20)
    with pytest.raises(ValueError, match="corrupt|orig_len"):
        api.decompress_bytes(bad)


def test_shift_out_of_range(text_blob):
    data, blob = text_blob
    (_, _, _, _, _, _, _, pre_len) = _fields(blob)
    bad = _mutate_block(blob, bwt_shift=pre_len + 3)
    with pytest.raises(ValueError, match="shift"):
        api.decompress_bytes(bad)


def test_periodic_block_lying_rle_len(periodic_blob):
    """The periodic device route carries the same decoded-total trailer."""
    data, blob = periodic_blob
    (_, _, _, _, _, rle_len, _, _) = _fields(blob)
    assert rle_len > 3
    bad = _mutate_block(blob, rle_len=rle_len - 2)
    with pytest.raises(ValueError, match="corrupt"):
        api.decompress_bytes(bad)


def test_garbage_payload_bits(text_blob):
    """Payload bytes replaced wholesale (fresh CRC): the decode desyncs and
    the decoded total cannot land on the block length for this case."""
    data, blob = text_blob
    (_, _, _, _, _, _, payload, _) = _fields(blob)
    garbage = bytes((b ^ 0x5A) for b in payload)
    bad = _mutate_block(blob, payload=garbage)
    with pytest.raises(ValueError, match="corrupt"):
        api.decompress_bytes(bad)


def test_single_symbol_lying_rle_len():
    """Single-symbol blocks have no device totals trailer; the host-side
    closed-form check must catch a lying rle_len."""
    data = b"\x00" * 3  # RLE0 stream = 2 x RUNA, decodes to 3 bytes
    blob = api.compress_bytes(data, block_size=2048)
    assert api.decompress_bytes(blob) == data
    (_, _, _, _, _, rle_len, _, _) = _fields(blob)
    bad = _mutate_block(blob, rle_len=rle_len + 1)
    with pytest.raises(ValueError, match="single-symbol|corrupt"):
        api.decompress_bytes(bad)


def test_hostile_block_size_header():
    """A header claiming a multi-GB block_size must fail the envelope check
    cleanly, not reach device dispatch as a giant allocation."""
    data = b"hello world " * 100
    blob = api.compress_bytes(data, block_size=2048)
    bs, total, raws = container.unpack_file(blob)
    bad = container.pack_file(raws, 1 << 30, total)
    with pytest.raises(ValueError, match="block_size"):
        api.decompress_bytes(bad)
    with pytest.raises(ValueError, match="block_size"):
        api.decompress_many([bad])


def test_decoded_len_sum_cannot_wrap_int32():
    """A hostile RLE0 stream whose int32 prefix sum wraps mod 2^32 must
    poison the total (max-prefix defense), never alias a plausible value.
    The wrapped int32 sum of this stream is 402,653,182 — without the
    defense an attacker tuning digit counts can land any target."""
    import jax.numpy as jnp

    from bmh_tpu.ops import rle

    m = 60  # 60 RUNB digits in one group: contributions reach 2^27 each
    syms = jnp.ones(256, jnp.int32)
    n = jnp.int32(402653182)  # exactly the wrapped int32 alias
    total = int(rle.rle0_decoded_len(syms, jnp.int32(m), n))
    assert total == 402653183  # poison n+1: the max-prefix check fired


def test_non_pow2_block_size_uniform_roundtrip():
    """compress_many accepts a non-power-of-two block_size; the uniform
    decompress bucket must round to a power of two instead of tripping the
    device kernels' shape asserts."""
    rng = np.random.default_rng(11)
    data = bytes(rng.integers(0, 64, 150000, dtype=np.uint8))
    blobs = api.compress_many([data], block_size=100000, uniform=True)
    assert api.decompress_many(blobs, uniform=True) == [data]


def test_fused_decode_totals_wrap_aliasing_container():
    """End-to-end pin of the wrap defense: a CRC-valid container whose
    RLE0 digit stream's int32 contribution sum is exactly pre_len + 2^32
    (so a naive 32-bit total would alias pre_len) must fail closed via the
    max-prefix poison, not decode to silently wrong bytes."""
    n = 3000
    target = n + (1 << 32)
    # digits b_j, contributions (1+b_j) << min(j, 22): base (all RUNA) +
    # flips chosen so the true sum is exactly `target`
    m = 535
    base = ((1 << 22) - 1) + (m - 22) * (1 << 22)
    extra = target - base
    hi_flips = min(extra // (1 << 22), m - 22)
    rem = extra - hi_flips * (1 << 22)
    assert 0 <= rem < (1 << 22), "construction arithmetic drifted"
    bits = []
    for j in range(m):
        if j < 22:
            bits.append((rem >> j) & 1)
        else:
            bits.append(1 if (j - 22) < hi_flips else 0)
    total = sum((1 + b) << min(j, 22) for j, b in enumerate(bits))
    assert total == target and total % (1 << 32) == n  # aliases pre_len
    # canonical 1-bit codes for the 2-symbol alphabet {RUNA, RUNB}:
    # code(RUNA)=0, code(RUNB)=1 -> the payload bits ARE the digits
    payload = bytearray((m + 7) // 8)
    for j, b in enumerate(bits):
        if b:
            payload[j >> 3] |= 0x80 >> (j & 7)
    lens = np.zeros(container.ALPHABET, np.uint8)
    present = np.zeros(container.ALPHABET, bool)
    lens[0] = lens[1] = 1
    present[0] = present[1] = True
    raw = container.pack_block(n, 7, lens, present, bytes(payload),
                               cps=(), rle_len=m, pre_len=n)
    blob = container.pack_file([raw], 4096, n)
    with pytest.raises(ValueError, match="corrupt"):
        api.decompress_bytes(blob)
