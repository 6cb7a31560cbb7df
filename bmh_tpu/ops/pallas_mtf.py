"""Pallas TPU kernel for the inverse-MTF in-chunk scan.

The XLA formulation of the in-chunk permutation-composition scan
(ops/mtf.py mtf_inverse) streams its whole (B, k, 256) list state through
HBM on every one of `chunk` scan steps — measured 44.5 ms for the corpus
decode batch (TRACE_r02.md `while.2`).  Here the state lives in VMEM: one
column per chunk lane, 256 sublane rows for list positions, so each step is
a (256, TILE) compare/select/roll with no HBM traffic beyond the step's
code row and emitted output — and a larger chunk size becomes *free*,
shrinking the cross-chunk composition that remains outside the kernel.

Per step (replicating mtf.py's _step_select/_rot_apply exactly):
    y      = Q[c]                       (one-hot compare+sum over sublanes;
                                         per-lane dynamic indexing does not
                                         vectorize on the VPU, compares do)
    Q'     = [y, Q[0..c-1], Q[c+1..]]   (roll down 1 + two selects)

The reference's sequential 256-entry list walk is main.cpp:114-130; this
kernel runs every chunk of every block as an independent lane.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHABET = 256
TILE = 128  # chunk lanes per grid step; VMEM state = 256 x TILE x 4 B


def _imtf_kernel(codes_ref, ys_out, q_out, q_s, *, m: int):
    rows = jax.lax.broadcasted_iota(jnp.int32, (ALPHABET, TILE), 0)
    q_s[...] = rows  # identity list

    def body(t, _):
        c = codes_ref[t, :].reshape(1, TILE)
        q = q_s[...]
        y = jnp.sum(jnp.where(rows == c, q, 0), axis=0, keepdims=True)
        q_roll = pltpu.roll(q, 1, 0)
        q_s[...] = jnp.where(rows == 0, y, jnp.where(rows <= c, q_roll, q))
        ys_out[t, :] = y[0, :]
        return 0

    jax.lax.fori_loop(0, m, body, 0)
    q_out[...] = q_s[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def imtf_chunks(codes_tm: jax.Array, *, interpret: bool = False):
    """codes_tm: (m, K) int32, time-major MTF codes of K chunk lanes.

    Returns (ys (m, K) int32 — per-step list positions of the decoded
    symbol, q (256, K) int32 — each lane's whole-chunk permutation), the
    same values as the lax.scan in mtf.py's mtf_inverse.
    K must be a multiple of TILE (pad lanes decode code 0 harmlessly).
    """
    m, k = codes_tm.shape
    assert k % TILE == 0, "pad chunk lanes to a multiple of TILE"
    grid = (k // TILE,)
    ys, q = pl.pallas_call(
        functools.partial(_imtf_kernel, m=m),
        grid=grid,
        in_specs=[pl.BlockSpec((m, TILE), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((m, TILE), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((ALPHABET, TILE), lambda i: (0, i),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((m, k), jnp.int32),
                   jax.ShapeDtypeStruct((ALPHABET, k), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((ALPHABET, TILE), jnp.int32)],
        interpret=interpret,
    )(codes_tm)
    return ys, q
