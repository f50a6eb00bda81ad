"""Pallas TPU kernel: streaming exact L2 top-k with an in-kernel bitonic
selection network.

Mosaic has no ``top_k``/``sort`` lowering, so the running top-K merge is a
hand-built bitonic network out of primitives that DO lower: ``pltpu.roll``
(circular lane shift), ``where``, comparisons, ``broadcasted_iota``.  The
XOR-partner exchange of a bitonic stage is expressed as two rolls selected
by the partner bit — lanes with bit ``j`` clear read ``i+j``, lanes with it
set read ``i-j``.

Per grid step (one base tile): MXU scores ``|b|^2 - 2 q·b`` → descending
bitonic sort of the tile's lanes (ties broken by index so duplicate
distances keep distinct ids) → cross-half exchange against the running
ascending top-K (whose minima ARE the new top-K set) → K-lane bitonic
merge, all in VMEM.  HBM traffic: one base read + one [Q, K] write — the
bandwidth floor for an exact scan.  See CLAUDE.md for the Mosaic
constraints that shaped this (no sort/top_k/rev, i1-select and i64
limits, non-reusing scoped-VMEM stack).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _partner_dyn(x: jax.Array, j: jax.Array) -> jax.Array:
    """Values at lane ``i ^ j`` along the last axis; ``j`` is a traced int32
    power of two (dynamic rotates keep the stage loop rolled so Mosaic's
    non-reusing stack allocator sees O(1) temporaries, not O(stages))."""
    n = x.shape[-1]
    fwd = pltpu.roll(x, jnp.int32(n) - j, axis=x.ndim - 1)  # lane i reads i+j
    bwd = pltpu.roll(x, j, axis=x.ndim - 1)                 # lane i reads i-j
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return jnp.where((lane & j) != 0, bwd, fwd)


def _cex_dyn(v, ix, j, keep_min):
    """Compare-exchange at traced XOR distance ``j``.  int32 mask algebra
    (bool->i32 extensions only: i64 literals from the x64 default recurse
    Mosaic's convert lowering, and selects with i1 payloads don't lower);
    index tie-break keeps duplicate values' ids distinct."""
    pv = _partner_dyn(v, j)
    pi = _partner_dyn(ix, j)
    lt = ((v < pv) | ((v == pv) & (ix < pi))).astype(jnp.int32)
    choose_self = (keep_min ^ lt) == 0     # XNOR == (keep_min ? lt : ~lt)
    return (jnp.where(choose_self, v, pv),
            jnp.where(choose_self, ix, pi))


def _bitonic_sort(v: jax.Array, ix: jax.Array, ascending: bool = True):
    """Bitonic sort of the last axis (power-of-two length) as rolled
    fori_loops: outer over block levels, inner over stage distances."""
    n = v.shape[-1]
    levels = n.bit_length() - 1          # log2(n)
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    flip = jnp.int32(1 if ascending else 0)

    def outer(level, carry):
        k = jnp.int32(1) << level

        def inner(m, carry2):
            vv, xx = carry2
            j = k >> (m + 1)

            def do(c):
                vv2, xx2 = c
                lower = ((lane & j) == 0).astype(jnp.int32)
                up = ((lane & k) == 0).astype(jnp.int32)
                keep_min = (lower ^ up) ^ flip
                return _cex_dyn(vv2, xx2, j, keep_min)

            return jax.lax.cond(j >= 1, do, lambda c: c, (vv, xx))

        return jax.lax.fori_loop(0, levels, inner, carry)

    return jax.lax.fori_loop(1, levels + 1, outer, (v, ix))


def _bitonic_merge(v: jax.Array, ix: jax.Array):
    """Ascending merge of a bitonic sequence along the last axis."""
    n = v.shape[-1]
    levels = n.bit_length() - 1
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)

    def body(m, carry):
        vv, xx = carry
        j = jnp.int32(n) >> (m + 1)
        keep_min = ((lane & j) == 0).astype(jnp.int32)
        return _cex_dyn(vv, xx, j, keep_min)

    return jax.lax.fori_loop(0, levels, body, (v, ix))


def _topk_kernel(q_ref, base_ref, outd_ref, outi_ref, run_d, run_i, *,
                 k: int, tile_n: int):
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _():
        run_d[:] = jnp.full_like(run_d, _BIG)
        run_i[:] = jnp.full_like(run_i, jnp.iinfo(jnp.int32).max)

    b = base_ref[:]                                   # [TN, d]
    q = q_ref[:]                                      # [QT, d]
    dots = jax.lax.dot_general(q, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    b2 = jnp.sum(b * b, axis=-1)[None, :]
    scores = b2 - 2.0 * dots                          # [QT, TN]
    # keep index math in int32: under jax_enable_x64 the python-int tile
    # size promotes to i64, which Mosaic cannot truncate
    idx = (jnp.int32(step) * jnp.int32(tile_n)
           + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1))

    # Sort the tile DESCENDING: its last K lanes are the K smallest in
    # descending order, so (running asc ++ tile tail) is a bitonic sequence
    # of 2K — no reverse needed (Mosaic has no rev lowering).  The first
    # cross-half exchange of a bitonic merge leaves every element of the
    # lower half <= every element of the upper half, so the K smallest are
    # exactly the pairwise minima of (run, tail) — merge only that half and
    # never materialize a 2K concatenation (lane-concat also fails to
    # legalize in Mosaic).
    sv, si = _bitonic_sort(scores, idx, ascending=False)
    tn = sv.shape[-1]
    tail_v = sv[:, tn - k:]
    tail_i = si[:, tn - k:]
    rv = run_d[:]
    ri = run_i[:]
    lt = (rv < tail_v) | ((rv == tail_v) & (ri < tail_i))
    lo_v = jnp.where(lt, rv, tail_v)
    lo_i = jnp.where(lt, ri, tail_i)
    mv, mi = _bitonic_merge(lo_v, lo_i)   # lower half is itself bitonic
    run_d[:] = mv
    run_i[:] = mi

    @pl.when(step == n_steps - 1)
    def _():
        outd_ref[:] = run_d[:]
        outi_ref[:] = run_i[:]


@partial(jax.jit, static_argnames=("k", "tile_n", "interpret"))
def _topk_call(queries, base, k: int, tile_n: int, interpret: bool):
    qt, d = queries.shape
    n = base.shape[0]
    return pl.pallas_call(
        partial(_topk_kernel, k=k, tile_n=tile_n),
        grid=(n // tile_n,),
        in_specs=[
            pl.BlockSpec((qt, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qt, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qt, k), jnp.float32),
            jax.ShapeDtypeStruct((qt, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((qt, k), jnp.float32),
            pltpu.VMEM((qt, k), jnp.int32),
        ],
        interpret=interpret,
    )(queries, base)


def bitonic_topk(base, queries, k: int = 100, tile_n: int = 512,
                 q_tile: int = 32, interpret: bool = False):
    """Exact L2 top-k via the bitonic streaming kernel.

    Returns (ids int32 [Q, K], dists f32 [Q, K] true L2).  K and the tile
    are padded to powers of two/hardware lanes; padded rows never surface.
    The (q_tile=32, tile_n=512) default is the largest shape that fits
    Mosaic's 16MB scoped-VMEM stack on v5e (the allocator does not reuse
    temporaries across compare-exchange stages).
    """
    base = np.asarray(base, np.float32)
    queries = np.asarray(queries, np.float32)
    n, d = base.shape
    nq = queries.shape[0]
    k_eff = min(k, n)

    k_pad = max(128, 1 << (k_eff - 1).bit_length())
    tile_n = max(tile_n, 2 * k_pad)
    tile_n = 1 << (tile_n - 1).bit_length()
    d_pad = _round_up(d, 128)
    n_pad = _round_up(n, tile_n)
    q_pad = _round_up(min(q_tile, max(nq, 8)), 8)

    bp = np.zeros((n_pad, d_pad), np.float32)
    bp[:n, :d] = base
    if n_pad > n:
        bp[n:, 0] = 1.0e17
    base_dev = jnp.asarray(bp)
    out_ids = np.empty((nq, k_eff), np.int32)
    out_d = np.empty((nq, k_eff), np.float32)

    for s in range(0, nq, q_pad):
        e = min(s + q_pad, nq)
        qp = np.zeros((q_pad, d_pad), np.float32)
        qp[:e - s, :d] = queries[s:e]
        # x64 mode breaks gridded Mosaic lowering (i64 leaks into grid
        # index plumbing); the kernel is pure f32/i32, so scope x64 off.
        with jax.enable_x64(False):
            dist, ids = _topk_call(jnp.asarray(qp), base_dev, k_pad, tile_n,
                             interpret)
        dist = np.asarray(dist[:e - s, :k_eff])
        ids = np.asarray(ids[:e - s, :k_eff])
        q2 = np.einsum("ij,ij->i", queries[s:e], queries[s:e])
        out_d[s:e] = np.sqrt(np.maximum(dist + q2[:, None], 0.0))
        out_ids[s:e] = ids
    return out_ids, out_d
