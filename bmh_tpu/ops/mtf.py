"""TPU-native move-to-front transform.

The reference MTF is a strictly sequential 256-entry list scan+rotate per
input byte (/root/reference/main.cpp:93-130).  Here both directions are
reformulated for data parallelism:

* Forward: the MTF code of symbol s at position i equals the number of
  *distinct* symbols whose most recent occurrence lies strictly between s's
  previous occurrence and i.  With the initial identity list modelled as 256
  virtual occurrences prepended per chunk (ordered by the chunk's incoming
  list), the code becomes a windowed distinct count:

      code[i] = #{ j : prev[i] < j < i  and  prev[j] <= prev[i] }

  evaluated per fixed-size chunk against the chunk-extended sequence.  The
  incoming list of each chunk is recovered from an exclusive running max of
  per-chunk last-occurrence tables — a parallel scan, not a serial walk.

* Inverse: each MTF step is the *fixed* position-permutation
  rot(c): [c, 0, 1, .., c-1, c+1, ..] applied to the list, independent of
  the list contents.  Decoding therefore factors into an in-chunk
  permutation-composition scan (depth = chunk size, vectorised over all
  chunks) plus a log-depth associative scan composing whole-chunk
  permutations across chunks.

Both directions take (Nmax,) padded arrays with a traced true length n;
Nmax must be a multiple of the chunk size.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

ALPHABET = 256
DEFAULT_CHUNK = 128
_NEG_BIG = jnp.int32(-(2**30))


def mtf_forward(data: jax.Array, n: jax.Array, chunk: int = DEFAULT_CHUNK) -> jax.Array:
    """Parallel MTF encode. data: (Nmax,) uint8; returns (Nmax,) uint8 codes."""
    nmax = data.shape[0]
    assert nmax % chunk == 0, "Nmax must be a multiple of the MTF chunk size"
    k = nmax // chunk
    m = chunk
    ext = ALPHABET + m  # extended chunk length: 256 virtual + m real

    pos = jnp.arange(nmax, dtype=jnp.int32)
    sym = data.astype(jnp.int32)

    # last occurrence of each symbol within each chunk (global position),
    # -big if none — a (k, m, 256) compare-select reduction: the
    # .at[chunk_id, sym].max(pos) scatter this replaces lowered as a 4M
    # sort + 37 ms segmented-max fusion (TRACE_r04 fusion.30, the one
    # unattributed hot op), while the masked max fuses into VPU work
    s_iota = jnp.arange(ALPHABET, dtype=jnp.int32)
    last_occ = jnp.max(
        jnp.where(sym.reshape(k, m)[:, :, None] == s_iota[None, None, :],
                  pos.reshape(k, m)[:, :, None], _NEG_BIG), axis=1)

    # incoming recency per chunk: exclusive cummax over chunks, seeded with the
    # virtual initial-list times virt[s] = -(s+1)  (list front = most recent)
    virt = -(jnp.arange(ALPHABET, dtype=jnp.int32) + 1)
    run_max = jax.lax.cummax(last_occ, axis=0)
    incoming = jnp.concatenate([
        jnp.broadcast_to(virt, (1, ALPHABET)),
        jnp.maximum(run_max[:-1], virt[None, :]),
    ])  # (k, 256): recency of each symbol entering chunk k

    # incoming list as a sequence ordered least-recent -> most-recent.
    # argsort ascending by recency; recencies are distinct (global positions /
    # distinct negatives), so the order is well defined.
    prefix_syms = jnp.argsort(incoming, axis=-1).astype(jnp.int32)  # (k, 256)

    # extended per-chunk sequence: virtual prefix then chunk bytes
    chunks = sym.reshape(k, m)
    e = jnp.concatenate([prefix_syms, chunks], axis=-1)  # (k, ext)

    # prev occurrence within the extended chunk, via per-chunk PACKED
    # single-array sorts: (symbol << sh) | position sorts by symbol with
    # positions as tie-break, and the inverse permutation comes from a
    # second packed sort on (position << sh) | value — the (k, ext)-sized
    # scatter this replaces traced at 61 ms for the corpus batch
    sh = max(ext.bit_length(), 1)  # fits position AND prev+1 (both <= ext)
    j_idx = jnp.broadcast_to(jnp.arange(ext, dtype=jnp.int32), (k, ext))
    ps = jax.lax.sort((e << sh) | j_idx, dimension=-1, is_stable=False)
    sv = ps >> sh
    sj = ps & ((1 << sh) - 1)
    same = jnp.concatenate([
        jnp.zeros((k, 1), dtype=jnp.bool_),
        sv[:, 1:] == sv[:, :-1],
    ], axis=-1)
    prev_sorted = jnp.where(same, jnp.pad(sj, ((0, 0), (1, 0)))[:, :-1], -1)
    prev = (jax.lax.sort((sj << sh) | (prev_sorted + 1), dimension=-1,
                         is_stable=False)
            & ((1 << sh) - 1)) - 1

    # windowed distinct count: for real position i (local index 256+t),
    # code = sum_j (prev[i] < j < i) & (prev[j] <= prev[i])
    t_i = prev[:, ALPHABET:]                      # (k, m) window starts
    i_loc = jnp.arange(ALPHABET, ext, dtype=jnp.int32)  # (m,)
    j_loc = jnp.arange(ext, dtype=jnp.int32)      # (ext,)
    in_window = (j_loc[None, None, :] > t_i[:, :, None]) & (j_loc[None, None, :] < i_loc[None, :, None])
    dominated = prev[:, None, :] <= t_i[:, :, None]
    codes = jnp.sum(in_window & dominated, axis=-1, dtype=jnp.int32)  # (k, m)

    out = codes.reshape(nmax).astype(jnp.uint8)
    return jnp.where(pos < n, out, 0).astype(jnp.uint8)


def _step_select(q: jax.Array, c: jax.Array) -> jax.Array:
    """y[b] = q[b, c[b]] via one-hot select — per-row gathers cost ~10ns each
    on TPU while a 256-wide compare+reduce is pure fused VPU work."""
    p = jnp.arange(ALPHABET, dtype=jnp.int32)[None, :]
    return jnp.sum(jnp.where(p == c[:, None], q, 0), axis=-1)


def _rot_apply(q: jax.Array, c: jax.Array, q_c: jax.Array) -> jax.Array:
    """q' = q ∘ rot(c) for a batch: q (B,256) int32, c (B,) int32.

    rot(c)[0] = c, rot(c)[p] = p-1 for 1<=p<=c, p for p>c — the fixed
    position-permutation of one inverse-MTF step.  q_c = q[b, c[b]],
    precomputed by _step_select.
    """
    p = jnp.arange(ALPHABET, dtype=jnp.int32)[None, :]
    q_shift = jnp.roll(q, 1, axis=-1)
    return jnp.where(p == 0, q_c[:, None], jnp.where(p <= c[:, None], q_shift, q))


def _use_pallas_imtf() -> bool:
    import jax as _jax

    from ..utils import config as config_mod

    if not config_mod.DEFAULT.pallas_imtf:
        return False
    try:
        return _jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def mtf_inverse(codes: jax.Array, n: jax.Array, chunk: int = DEFAULT_CHUNK) -> jax.Array:
    """Parallel MTF decode. codes: (Nmax,) uint8; returns (Nmax,) uint8 symbols."""
    nmax = codes.shape[0]
    from . import pallas_mtf

    if _use_pallas_imtf() and nmax >= pallas_mtf.TILE:
        # VMEM-resident in-chunk scan; a bigger chunk costs the kernel
        # nothing and shrinks the cross-chunk composition below.  Pick the
        # chunk so the lane count k stays a multiple of the kernel TILE
        # (nmax is always a power of two here).
        from ..utils import config as config_mod

        k0 = max(nmax // config_mod.DEFAULT.imtf_chunk, pallas_mtf.TILE)
        chunk = max(nmax // k0, 1)
    assert nmax % chunk == 0
    k = nmax // chunk
    m = chunk
    c_chunks = codes.reshape(k, m).astype(jnp.int32).T  # (m, k) scan over steps

    ident = jnp.broadcast_to(jnp.arange(ALPHABET, dtype=jnp.int32), (k, ALPHABET))

    if _use_pallas_imtf() and k % pallas_mtf.TILE == 0:
        ys, qf = pallas_mtf.imtf_chunks(c_chunks, interpret=False)
        pi_full = qf.T  # (k, 256)
    else:
        def step(q, c):
            # y = q[c]: position in the chunk's incoming list of this step
            y = _step_select(q, c)
            return _rot_apply(q, c, y), y

        pi_full, ys = jax.lax.scan(step, ident, c_chunks)  # (k,256), (m,k)

    # exclusive prefix composition of whole-chunk permutations:
    # incoming_list[k] = pi_0 ∘ pi_1 ∘ ... ∘ pi_{k-1} applied to identity
    p_comp = jnp.arange(ALPHABET, dtype=jnp.int32)

    def compose(a, b):
        # (a then b) as functions on positions: result[p] = a[b[p]], as a
        # compare-select over the 256 alphabet — take_along_axis lowers to
        # ~1M random gathers per scan level (TRACE_r04 mtf.py: 21 ms/pass)
        # while the masked sum fuses into VPU work
        return jnp.sum(jnp.where(b[..., :, None] == p_comp, a[..., None, :], 0),
                       axis=-1)

    if k > 1:
        prefixes = jax.lax.associative_scan(compose, pi_full, axis=0)
        incoming = jnp.concatenate([ident[:1], prefixes[:-1]], axis=0)  # (k, 256)
    else:
        incoming = ident[:1]

    # incoming-list lookup as a compare-select reduction (per-row gathers
    # of (k, m) indices from (k, 256) traced at 43 ms; the fused masked sum
    # over the 256 axis runs in a few ms)
    p_iota = jnp.arange(ALPHABET, dtype=jnp.int32)
    syms = jnp.sum(jnp.where(ys.T[:, :, None] == p_iota[None, None, :],
                             incoming[:, None, :], 0), axis=-1)  # (k, m)
    out = syms.reshape(nmax).astype(jnp.uint8)
    pos = jnp.arange(nmax, dtype=jnp.int32)
    return jnp.where(pos < n, out, 0).astype(jnp.uint8)
