"""Pallas TPU kernels for the gap-decode canonical Huffman FSM.

The XLA lax.scan formulation pays per-step loop overhead and streams its
lane state through HBM on every one of chunk_bits+32 steps.  Here the whole
FSM runs inside one kernel: bit tiles and lane state live in VMEM, the
per-step body is pure VPU work (the canonical tables are carried as
recurrences, with only the 32-entry count table needing an unrolled select),
and the only HBM traffic is the initial tile load and final state store.

Two kernels mirror ops.huffman.gap_decode's phases:
  * phase A: all (chunk, gap) lanes -> exit-gap map + symbol counts
  * phase B: the winning lane per chunk -> per-step emitted table indices

Grid iterates over chunk tiles so NC can exceed one VMEM block.  Off-TPU
the kernels run in interpret mode (CPU unit suite).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GAPS = 32
MAX_LEN = 31
TILE_NC = 512  # chunks per grid step; lanes per step = TILE_NC * GAPS


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _count_select(ln_n, count_rows):
    """cnt[c, g] = count_rows[c, ln_n[c, g]] via unrolled compare-select."""
    acc = jnp.zeros_like(ln_n)
    for l in range(1, MAX_LEN + 1):
        acc = acc + jnp.where(ln_n == l, count_rows[:, l][:, None], 0)
    return acc


def _fsm_body(bit, start_gap, t, chunk_bits, count_rows, st):
    """Identical transition to ops.huffman._fsm_step, VMEM-resident."""
    val, ln, f, o, done, cnt, exitg = st
    active = jnp.logical_not(done) & (t >= start_gap)

    val_n = (val << 1) | bit
    ln_n = ln + 1
    cnt_l = _count_select(ln_n, count_rows)

    rel = (val_n - f).astype(jnp.int32)
    complete = (cnt_l > 0) & (rel >= 0) & (rel < cnt_l)
    overflow = ln_n >= MAX_LEN + 1
    reset = complete | overflow

    emit_idx = jnp.where(active & complete, jnp.clip(o + rel, 0, 255), -1)

    finish = complete & (t + 1 >= chunk_bits)
    val2 = jnp.where(active, jnp.where(reset, jnp.uint32(0), val_n), val)
    ln2 = jnp.where(active, jnp.where(reset, 0, ln_n), ln)
    f2 = jnp.where(active, jnp.where(reset, jnp.uint32(0),
                                     (f + cnt_l.astype(jnp.uint32)) << 1), f)
    o2 = jnp.where(active, jnp.where(reset, 0, o + cnt_l), o)
    cnt2 = jnp.where(active & complete, cnt + 1, cnt)
    exit2 = jnp.where(active & finish, t + 1 - chunk_bits, exitg)
    done2 = done | (active & finish)
    return (val2, ln2, f2, o2, done2, cnt2, exit2), emit_idx


def _phase_a_kernel(tiles_ref, count_ref, cnt_out, exit_out, *, chunk_bits: int):
    nc = cnt_out.shape[0]
    steps = chunk_bits + GAPS
    gaps = jax.lax.broadcasted_iota(jnp.int32, (nc, GAPS), 1)
    count_rows = count_ref[...]

    def zeros(dt):
        return jnp.zeros((nc, GAPS), dtype=dt)

    st = (zeros(jnp.uint32), zeros(jnp.int32), zeros(jnp.uint32),
          zeros(jnp.int32), zeros(jnp.bool_), zeros(jnp.int32), zeros(jnp.int32))

    def body(t, st):
        bit = tiles_ref[t, :].astype(jnp.uint32)[:, None]
        st2, _ = _fsm_body(bit, gaps, t, chunk_bits, count_rows, st)
        return st2

    st = jax.lax.fori_loop(0, steps, body, st)
    cnt_out[...] = st[5]
    exit_out[...] = st[6]


def _phase_b_kernel(tiles_ref, count_ref, entry_ref, idx_out, *, chunk_bits: int):
    nc = entry_ref.shape[-1]
    steps = chunk_bits + GAPS
    entry = entry_ref[0, :][:, None]  # (nc, 1): the single winning lane
    count_rows = count_ref[...]

    def zeros(dt):
        return jnp.zeros((nc, 1), dtype=dt)

    st0 = (zeros(jnp.uint32), zeros(jnp.int32), zeros(jnp.uint32),
           zeros(jnp.int32), zeros(jnp.bool_), zeros(jnp.int32), zeros(jnp.int32))

    def body(t, st):
        bit = tiles_ref[t, :].astype(jnp.uint32)[:, None]
        st2, emit = _fsm_body(bit, entry, t, chunk_bits, count_rows, st)
        idx_out[t, :] = emit[:, 0].astype(jnp.int32)
        return st2

    jax.lax.fori_loop(0, steps, body, st0)


@functools.partial(jax.jit, static_argnames=("chunk_bits", "interpret"))
def phase_a(tiles, count_rows, *, chunk_bits: int, interpret: bool):
    """tiles (steps, NC) uint32 bits; count_rows (NC, 32) int32.
    Returns (cnt_map, exit_map), both (NC, GAPS) int32."""
    steps, nc = tiles.shape
    tile_nc = min(TILE_NC, nc)
    assert nc % tile_nc == 0
    grid = (nc // tile_nc,)
    out = pl.pallas_call(
        functools.partial(_phase_a_kernel, chunk_bits=chunk_bits),
        grid=grid,
        in_specs=[
            pl.BlockSpec((steps, tile_nc), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_nc, 32), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_nc, GAPS), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_nc, GAPS), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((nc, GAPS), jnp.int32),
                   jax.ShapeDtypeStruct((nc, GAPS), jnp.int32)),
        interpret=interpret,
    )(tiles, count_rows)
    return out


@functools.partial(jax.jit, static_argnames=("chunk_bits", "interpret"))
def phase_b(tiles, count_rows, entry, *, chunk_bits: int, interpret: bool):
    """Winning-lane decode: returns (steps, NC) int32 emitted indices or -1.

    entry: (1, NC) int32 true entry gaps.
    """
    steps, nc = tiles.shape
    tile_nc = min(TILE_NC, nc)
    assert nc % tile_nc == 0
    grid = (nc // tile_nc,)
    out = pl.pallas_call(
        functools.partial(_phase_b_kernel, chunk_bits=chunk_bits),
        grid=grid,
        in_specs=[
            pl.BlockSpec((steps, tile_nc), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_nc, 32), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_nc), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((steps, tile_nc), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps, nc), jnp.int32),
        interpret=interpret,
    )(tiles, count_rows, entry)
    return out
