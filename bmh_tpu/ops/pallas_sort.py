"""Pallas TPU bitonic sort for the BWT's (rank, rank2, index) triples.

XLA's variadic comparison sort costs ~20-40ms per (6, 128K) invocation on
v5e and dominates prefix-doubling BWT.  A bitonic network over VMEM-resident
(sublane, lane) tiles is pure vector work: log^2(N)/2 substeps, each a dense
compare-exchange over the whole array — no HBM traffic between substeps, no
comparator callbacks.

The network sorts the *triple* (k1, k2, idx) lexicographically.  idx is a
permutation (all distinct), so the order equals a stable sort by (k1, k2) —
exactly the `std::stable_sort` semantics the reference's rotation sort
relies on for periodic inputs (/root/reference/main.cpp:82).

Layout: element e lives at row r = e >> 7, lane l = e & 127 of an (S, 128)
int32 tile.  The flat fori_loop walks the (k, j) bitonic stage schedule held
in SMEM; partner exchange at distance d = 1 << j is a dynamic pltpu.roll of
the whole tile (axis 0 by d/128 rows when d >= 128, axis 1 by d lanes when
d < 128) with an element-parity select between the forward and backward
rolls.  Direction bit k of e is a row mask for k >= 7, a lane mask below.

Minimum N is 1024 (= 8 sublanes x 128 lanes): smaller tiles make the row
roll a sub-(8,128) vector, which tpu.dynamic_rotate cannot legalize.

Falls back to interpret mode off-TPU so the CPU unit suite validates the
network bit-for-bit against jax.lax.sort.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
LOG2_LANES = LANES.bit_length() - 1
MIN_N = 8 * LANES  # 8 sublanes: Mosaic alignment floor for i32 row rotates


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _lex_gt(a1, a2, a3, b1, b2, b3):
    """(a1,a2,a3) > (b1,b2,b3) lexicographically, elementwise."""
    return (a1 > b1) | ((a1 == b1) & ((a2 > b2) | ((a2 == b2) & (a3 > b3))))


def _sort_kernel(ks_ref, js_ref, k1_ref, k2_ref, id_ref,
                 o1_ref, o2_ref, o3_ref, *, n: int):
    """Flat compare-exchange loop over the bitonic schedule.

    The network's p(p+1)/2 substeps run as ONE fori_loop body (compiled
    once) instead of a fully unrolled instruction stream: the (k, j) stage
    schedule sits in SMEM and every roll distance is a traced scalar
    (pltpu.roll takes dynamic shifts).  This cuts Mosaic compile time from
    minutes to seconds at n = 2^17 while keeping the same dense VPU work.
    """
    s = n // LANES
    p = int(math.log2(n))
    steps = p * (p + 1) // 2
    row = jax.lax.broadcasted_iota(jnp.int32, (s, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (s, LANES), 1)
    e = row * LANES + lane

    def body(t, carry):
        a1, a2, a3 = carry
        k = ks_ref[t]
        j = js_ref[t]
        d = jnp.int32(1) << j
        # ascending iff bit k of e is 0 (bit p is 0 for all e < 2^p)
        asc = ((e >> k) & 1) == 0
        i_low = ((e >> j) & 1) == 0

        def row_partner(x):
            dr = d >> LOG2_LANES
            fwd = pltpu.roll(x, s - dr, 0)   # row r reads row r+dr (mod s)
            bwd = pltpu.roll(x, dr, 0)       # row r reads row r-dr
            return jnp.where(i_low, fwd, bwd)

        def lane_partner(x):
            fwd = pltpu.roll(x, LANES - d, 1)
            bwd = pltpu.roll(x, d, 1)
            return jnp.where(i_low, fwd, bwd)

        b1, b2, b3 = jax.lax.cond(
            d >= LANES,
            lambda: (row_partner(a1), row_partner(a2), row_partner(a3)),
            lambda: (lane_partner(a1), lane_partner(a2), lane_partner(a3)),
        )
        gt = _lex_gt(a1, a2, a3, b1, b2, b3)
        lt = _lex_gt(b1, b2, b3, a1, a2, a3)
        want_min = jnp.logical_not(jnp.logical_xor(asc, i_low))
        # boolean select (Mosaic cannot lower an i1-valued select_n)
        take = (want_min & gt) | (jnp.logical_not(want_min) & lt)
        a1 = jnp.where(take, b1, a1)
        a2 = jnp.where(take, b2, a2)
        a3 = jnp.where(take, b3, a3)
        return a1, a2, a3

    a1, a2, a3 = jax.lax.fori_loop(
        0, steps, body, (k1_ref[...], k2_ref[...], id_ref[...]))
    o1_ref[...] = a1
    o2_ref[...] = a2
    o3_ref[...] = a3


def _schedule(p: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(ks, js) int32 schedule arrays for the flat bitonic loop."""
    ks, js = [], []
    for k in range(1, p + 1):
        for j in range(k - 1, -1, -1):
            ks.append(k)
            js.append(j)
    return jnp.asarray(ks, jnp.int32), jnp.asarray(js, jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _sort3_call(k1, k2, idx, *, interpret: bool):
    n = k1.shape[-1]
    s = n // LANES
    assert n >= MIN_N and (n & (n - 1)) == 0, "N must be a power of two >= 1024"
    p = int(math.log2(n))
    ks, js = _schedule(p)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
    out = pl.pallas_call(
        functools.partial(_sort_kernel, n=n),
        in_specs=[sspec, sspec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=tuple(jax.ShapeDtypeStruct((s, LANES), jnp.int32) for _ in range(3)),
        input_output_aliases={2: 0, 3: 1, 4: 2},
        interpret=interpret,
        **kwargs,
    )(ks, js, k1.reshape(s, LANES), k2.reshape(s, LANES), idx.reshape(s, LANES))
    return tuple(o.reshape(n) for o in out)


def sort3(k1: jax.Array, k2: jax.Array, idx: jax.Array,
          interpret: bool | None = None):
    """Lexicographic sort of int32 triples (vmap-friendly).

    k1/k2/idx: (N,) int32, N a power of two >= MIN_N (1024), idx a permutation.
    Returns the three arrays reordered ascending by (k1, k2, idx) — i.e. a
    stable sort by (k1, k2).  Under jax.vmap the kernel batches into a grid.
    """
    if interpret is None:
        interpret = not _on_tpu()
    return _sort3_call(k1.astype(jnp.int32), k2.astype(jnp.int32),
                       idx.astype(jnp.int32), interpret=interpret)
