"""Pallas TPU kernel: VMEM-resident inverse-BWT cursor walk.

The checkpointed LF walk (ops/bwt.py bwt_inverse_cursors) is the largest
decode op left after round 4's reformulations: its XLA form issues one
k-lane random gather per step against the (B, Nmax) packed LF plane in
HBM — N total gathers at the ~10 ns/element random-access roofline
(~43 ms/corpus pass, TRACE_r04).  A 128 KiB block's packed LF table is
only 512 KiB, which fits VMEM with room to spare; this kernel pins one
block's table in VMEM and chases the k cursors with scalar loads, trading
HBM random-access latency for VMEM access.

RECORDED NEGATIVE RESULT (round 4): the per-lane scalar pointer-chase —
dynamic-index `pl.dslice` loads/stores inside a fori_loop — does NOT
compile through this environment's Mosaic toolchain (remote
tpu_compile_helper rejects even a minimal 128-step probe of the same
pattern; exit 1, no surfaced diagnostics), in every ref layout tried
(2-D/3-D blocks, fully-flattened 1-D).  The kernel is kept in interpret
mode with a correctness test as the record of the attempt, mirroring the
round-2 bitonic-sort kernel (which compiled but LOST to XLA's sort).
The XLA scan walk in ops/bwt.py bwt_inverse_cursors therefore remains
the production iBWT — it sits at the ~10 ns/element random-gather
roofline (TRACE_r04), which this kernel was trying to beat via VMEM
residency.

Reference hot loop replaced: /root/reference/main.cpp:70-73.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LF_MASK = (1 << 23) - 1


_TILE_B = 8  # blocks per grid step


def _ibwt_kernel(lf_ref, starts_ref, out_ref, *, steps: int, k: int,
                 nmax: int):
    """_TILE_B blocks per grid step, all refs FLATTENED to 1-D so every
    dynamic access is a last-dimension dslice (Mosaic's supported form):
    lf (8*nmax,) uint32 packed (byte<<23|next), starts (8*k,) int32,
    out (8*k*steps,) int32."""

    def lane(i, _):
        blk = i // k
        r0 = starts_ref[pl.dslice(i, 1)][0]
        base_lf = blk * nmax
        base_out = i * steps

        def step(t, r):
            g = lf_ref[pl.dslice(base_lf + r, 1)]  # (1,) uint32
            out_ref[pl.dslice(base_out + t, 1)] = (g >> 23).astype(jnp.int32)
            return (g[0] & jnp.uint32(_LF_MASK)).astype(jnp.int32)

        jax.lax.fori_loop(0, steps, step, r0)
        return 0

    jax.lax.fori_loop(0, _TILE_B * k, lane, 0)


@functools.partial(jax.jit, static_argnames=("steps", "interpret"))
def ibwt_walk(lf_packed: jax.Array, starts: jax.Array, *, steps: int,
              interpret: bool = False) -> jax.Array:
    """lf_packed (B, nmax) uint32, starts (B, k) int32 ->
    (B, k, steps) int32 emitted bytes (walk order: lane-major).
    B must be a multiple of 8 (pad with dummy blocks)."""
    b, nmax = lf_packed.shape
    k = starts.shape[1]
    assert b % _TILE_B == 0, "pad the batch to a multiple of 8 blocks"
    out = pl.pallas_call(
        functools.partial(_ibwt_kernel, steps=steps, k=k, nmax=nmax),
        grid=(b // _TILE_B,),
        in_specs=[
            pl.BlockSpec((_TILE_B * nmax,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_B * k,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_B * k * steps,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * k * steps,), jnp.int32),
        interpret=interpret,
    )(lf_packed.reshape(-1), starts.reshape(-1))
    return out.reshape(b, k, steps)
