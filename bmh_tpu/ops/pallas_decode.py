"""Pallas TPU kernels for the gap-decode canonical Huffman FSM.

Replaces the reference's bit-at-a-time tree-walk decoder
(/root/reference/main.cpp:259-281, io_utilities.h:57-66) — a hashmap probe
per bit — with a branch-free canonical FSM over a *flattened* chunk axis:
all chunks of all blocks in a batch share one (steps, NC) bit-tile array, so
no per-block padding waste and one kernel launch decodes a whole batch.

State layout is (GAPS, TILE) int32 — lane dim = chunks (multiple of 128),
sublane dim = the 32 speculative entry gaps — and lives in VMEM scratch
refs, not fori_loop carries (large loop-carried vector tuples fail Mosaic
scf.for legalization; scratch loads/stores do not).

The FSM carries a slim recurrence instead of (value, first, offset) planes:
with r = val - first[len] and c = count[len], canonical-code identities give

    r' = 2*(r - c) + bit        (append one bit)
    complete  <=>  0 <= r' < count[len+1]
    emitted canonical index = offset[len+1] + r'   (offset carried as o+c)

so phase A needs 5 planes (r, len, c, cnt, exit) and phase B 5
(r, len, c, o, done).  Only count[len+1] needs a table lookup — an unrolled
compare-select over lengths 1..maxl (maxl static, padded to 8).

Two kernels mirror ops.huffman.gap_decode's phases:
  * phase A: all (gap, chunk) lanes -> exit-gap map + symbol counts
  * phase B: the winning lane per chunk -> per-step emitted table indices

Off-TPU the kernels run in interpret mode (CPU unit suite).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GAPS = 32
MAX_LEN = 31
AMAX = 256  # canonical-index clip ceiling (257-symbol RLE0 alphabet)
TILE_A = 1024   # chunks per phase-A grid step (lanes = 32 gaps x TILE_A)
TILE_B = 128    # phase-B lane-tile; 8 sublane rows x TILE_B chunks per step
CHUNK_ALIGN = 8 * TILE_B  # callers pad NC to this (also a TILE_A divisor)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _count_at(ln, count_rows, maxl: int):
    """count_rows[ln[...], lane] via unrolled compare-select (no gathers).

    count_rows: (32, *lane_shape) int32; ln: (*state_shape) broadcastable
    against lane shape.  maxl bounds the unroll: count rows above maxl are
    zero for any valid table, so lanes with ln > maxl read 0 (never
    complete, reset via overflow) — identical behaviour, fewer selects.
    """
    acc = jnp.zeros_like(ln)
    for l in range(1, maxl + 1):
        acc = acc + jnp.where(ln == l, count_rows[l], 0)
    return acc


def _bit_at(words_ref, t, lane_shape):
    """Bit t of each lane's chunk, unpacked in-kernel from packed uint32
    words (MSB-first): words_ref row t>>5, bit 31-(t&31).  Replaces the
    (steps, NC) pre-unpacked bit-tile input — 32x less HBM traffic in and
    no 17x tile materialization fusion outside the kernel."""
    w = words_ref[t >> 5, :].reshape(1, lane_shape[-1])
    sh = (31 - (t & 31)).astype(jnp.uint32)
    return ((w >> sh) & jnp.uint32(1)).astype(jnp.int32)


def _phase_a_kernel(words_ref, count_ref, cnt_out, exit_out,
                    r_s, ln_s, c_s, cnt_s, ex_s, *, chunk_bits: int, maxl: int):
    steps = chunk_bits + GAPS
    t_shape = r_s.shape  # (GAPS, TILE_A)
    gaps = jax.lax.broadcasted_iota(jnp.int32, t_shape, 0)
    zero = jnp.zeros(t_shape, jnp.int32)
    r_s[...] = zero
    ln_s[...] = zero
    c_s[...] = zero
    cnt_s[...] = zero
    ex_s[...] = zero - 1

    def body(t, _):
        bit = _bit_at(words_ref, t, t_shape)
        r = r_s[...]
        ln = ln_s[...]
        c = c_s[...]
        active = (ex_s[...] < 0) & (t >= gaps)

        r_n = 2 * (r - c) + bit
        ln_n = ln + 1
        c_n = _count_at(ln_n, count_ref, maxl)
        complete = (c_n > 0) & (r_n >= 0) & (r_n < c_n)
        reset = complete | (ln_n > maxl)

        r_s[...] = jnp.where(active, jnp.where(reset, 0, r_n), r)
        ln_s[...] = jnp.where(active, jnp.where(reset, 0, ln_n), ln)
        c_s[...] = jnp.where(active, jnp.where(reset, 0, c_n), c)
        fire = active & complete
        cnt_s[...] = jnp.where(fire, cnt_s[...] + 1, cnt_s[...])
        ex_s[...] = jnp.where(fire & (t + 1 >= chunk_bits),
                              t + 1 - chunk_bits, ex_s[...])
        return 0

    jax.lax.fori_loop(0, steps, body, 0)
    cnt_out[...] = cnt_s[...]
    exit_out[...] = jnp.clip(ex_s[...], 0, GAPS - 1)


def _phase_b_kernel(words_ref, count_ref, entry_ref, idx_out,
                    r_s, ln_s, c_s, o_s, done_s, *, chunk_bits: int, maxl: int):
    steps = chunk_bits + GAPS
    t_shape = r_s.shape  # (8, TILE_B)
    entry = entry_ref[0, 0]  # (8, TILE_B)
    zero = jnp.zeros(t_shape, jnp.int32)
    r_s[...] = zero
    ln_s[...] = zero
    c_s[...] = zero
    o_s[...] = zero
    done_s[...] = zero

    def body(t, _):
        w = words_ref[t >> 5, 0]  # (8, TILE_B) uint32
        sh = (31 - (t & 31)).astype(jnp.uint32)
        bit = ((w >> sh) & jnp.uint32(1)).astype(jnp.int32)
        r = r_s[...]
        ln = ln_s[...]
        c = c_s[...]
        o = o_s[...]
        active = (done_s[...] == 0) & (t >= entry)

        r_n = 2 * (r - c) + bit
        ln_n = ln + 1
        c_n = _count_at(ln_n, count_ref[:, 0], maxl)
        complete = (c_n > 0) & (r_n >= 0) & (r_n < c_n)
        reset = complete | (ln_n > maxl)

        fire = active & complete
        idx_out[t, 0] = jnp.where(fire, jnp.clip(o + r_n, 0, AMAX), -1)

        r_s[...] = jnp.where(active, jnp.where(reset, 0, r_n), r)
        ln_s[...] = jnp.where(active, jnp.where(reset, 0, ln_n), ln)
        c_s[...] = jnp.where(active, jnp.where(reset, 0, c_n), c)
        o_s[...] = jnp.where(active, jnp.where(reset, 0, o + c_n), o)
        done_s[...] = jnp.where(fire & (t + 1 >= chunk_bits), 1, done_s[...])
        return 0

    jax.lax.fori_loop(0, steps, body, 0)


def words_ext(words: jax.Array, chunk_bits: int) -> jax.Array:
    """(W,) uint32 payload words -> (wpc+1, NC) uint32, word-time-major.

    Row w holds word w of every chunk; the extra last row is the FIRST word
    of the following chunk, covering the GAPS(=32)-bit codeword lookahead
    past each chunk cut (GAPS == one word).  The kernels unpack bits from
    this in VMEM (_bit_at) instead of reading pre-unpacked bit tiles.
    """
    assert GAPS == 32
    wpc = chunk_bits // 32
    nwords = words.shape[0]
    nc = nwords // wpc
    assert nc * wpc == nwords, "pad words to a multiple of chunk_bits"
    wmat = words.reshape(nc, wpc)
    nxt = jnp.concatenate([wmat[1:, :1], jnp.zeros((1, 1), words.dtype)], axis=0)
    return jnp.concatenate([wmat, nxt], axis=1).T  # (wpc+1, NC)


@functools.partial(jax.jit, static_argnames=("chunk_bits", "maxl", "interpret"))
def phase_a(wext, count_t, *, chunk_bits: int, maxl: int = MAX_LEN,
            interpret: bool = False):
    """wext (wpc+1, NC) uint32 from words_ext; count_t (32, NC) int32
    per-chunk tables.  NC must be a multiple of CHUNK_ALIGN.
    Returns (cnt_map, exit_map), both (GAPS, NC) int32."""
    wrows, nc = wext.shape
    tile = min(TILE_A, nc)
    assert nc % tile == 0
    grid = (nc // tile,)
    return pl.pallas_call(
        functools.partial(_phase_a_kernel, chunk_bits=chunk_bits, maxl=maxl),
        grid=grid,
        in_specs=[
            pl.BlockSpec((wrows, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((GAPS, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((GAPS, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((GAPS, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((GAPS, nc), jnp.int32),
                   jax.ShapeDtypeStruct((GAPS, nc), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((GAPS, tile), jnp.int32) for _ in range(5)],
        interpret=interpret,
    )(wext, count_t)


@functools.partial(jax.jit, static_argnames=("chunk_bits", "maxl", "interpret"))
def phase_b(wext, count_t, entry, *, chunk_bits: int, maxl: int = MAX_LEN,
            interpret: bool = False):
    """Winning-lane decode: (steps, NC) int32 emitted canonical indices or -1.

    wext: (wpc+1, NC) uint32 from words_ext.  entry: (NC,) int32 true entry
    gaps.  The chunk axis is viewed as (NC/(8*TILE_B), 8, TILE_B) so each
    grid step drives 8 sublane rows of TILE_B chunks (full-height VPU tiles
    from a 1-lane-per-chunk problem).
    """
    wrows, nc = wext.shape
    steps = chunk_bits + GAPS
    assert nc % 8 == 0, "pad NC to a multiple of 8 (CHUNK_ALIGN in production)"
    tile_b = min(TILE_B, nc // 8)
    ngb = nc // (8 * tile_b)
    words_v = wext.reshape(wrows, ngb, 8, tile_b)
    count_v = count_t.reshape(GAPS, ngb, 8, tile_b)
    entry_v = entry.reshape(1, ngb, 8, tile_b)
    out = pl.pallas_call(
        functools.partial(_phase_b_kernel, chunk_bits=chunk_bits, maxl=maxl),
        grid=(ngb,),
        in_specs=[
            pl.BlockSpec((wrows, 1, 8, tile_b), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GAPS, 1, 8, tile_b), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, tile_b), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((steps, 1, 8, tile_b), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps, ngb, 8, tile_b), jnp.int32),
        scratch_shapes=[pltpu.VMEM((8, tile_b), jnp.int32) for _ in range(5)],
        interpret=interpret,
    )(words_v, count_v, entry_v)
    return out.reshape(steps, nc)


# ---------------------------------------------------------------------------
# XLA scan fallbacks (CPU / non-TPU backends): same flat interface
# ---------------------------------------------------------------------------

def phase_a_scan(tiles, count_t, *, chunk_bits: int, maxl: int = MAX_LEN):
    steps, nc = tiles.shape
    gaps = jnp.arange(GAPS, dtype=jnp.int32)[:, None]

    def step(carry, bit_row):
        t, r, ln, c, cnt, ex = carry
        bit = bit_row[None, :].astype(jnp.int32)
        active = (ex < 0) & (t >= gaps)
        r_n = 2 * (r - c) + bit
        ln_n = ln + 1
        c_n = _count_at(ln_n, count_t, maxl)  # count_t[l] (nc,) broadcasts
        complete = (c_n > 0) & (r_n >= 0) & (r_n < c_n)
        reset = complete | (ln_n > maxl)
        fire = active & complete
        r2 = jnp.where(active, jnp.where(reset, 0, r_n), r)
        ln2 = jnp.where(active, jnp.where(reset, 0, ln_n), ln)
        c2 = jnp.where(active, jnp.where(reset, 0, c_n), c)
        cnt2 = jnp.where(fire, cnt + 1, cnt)
        ex2 = jnp.where(fire & (t + 1 >= chunk_bits), t + 1 - chunk_bits, ex)
        return (t + 1, r2, ln2, c2, cnt2, ex2), None

    z = jnp.zeros((GAPS, nc), jnp.int32)
    carry = (jnp.int32(0), z, z, z, z, z - 1)
    (t, r, ln, c, cnt, ex), _ = jax.lax.scan(step, carry, tiles, unroll=4)
    return cnt, jnp.clip(ex, 0, GAPS - 1)


def phase_b_scan(tiles, count_t, entry, *, chunk_bits: int, maxl: int = MAX_LEN):
    steps, nc = tiles.shape

    def step(carry, bit_row):
        t, r, ln, c, o, done = carry
        bit = bit_row.astype(jnp.int32)
        active = (done == 0) & (t >= entry)
        r_n = 2 * (r - c) + bit
        ln_n = ln + 1
        c_n = _count_at(ln_n, count_t, maxl)
        complete = (c_n > 0) & (r_n >= 0) & (r_n < c_n)
        reset = complete | (ln_n > maxl)
        fire = active & complete
        emit = jnp.where(fire, jnp.clip(o + r_n, 0, AMAX), -1)
        r2 = jnp.where(active, jnp.where(reset, 0, r_n), r)
        ln2 = jnp.where(active, jnp.where(reset, 0, ln_n), ln)
        c2 = jnp.where(active, jnp.where(reset, 0, c_n), c)
        o2 = jnp.where(active, jnp.where(reset, 0, o + c_n), o)
        done2 = jnp.where(fire & (t + 1 >= chunk_bits), 1, done)
        return (t + 1, r2, ln2, c2, o2, done2), emit

    z = jnp.zeros((nc,), jnp.int32)
    carry = (jnp.int32(0), z, z, z, z, z)
    _, emits = jax.lax.scan(step, carry, tiles, unroll=4)
    return emits  # (steps, nc)
