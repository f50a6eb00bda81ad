"""Pallas TPU kernel: streaming brute-force L2 top-k.

The XLA chunked scorer (`ops/refine.bruteforce_topk`) writes a `[Q, chunk]`
distance tile to HBM per chunk and re-reads it for top-k.  This kernel
streams base tiles HBM→VMEM (auto-pipelined by the grid), computes scores on
the MXU, and maintains the running per-query top-K entirely in VMEM scratch —
HBM traffic is one read of the base + one `[Q, K]` write, the bandwidth
floor.  Used for ground-truth precompute (reference
api/GroundtruthPrecompute.java — a CPU thread pool there) and the
plaintext/trusted serving mode's exact scan.

Layout: grid over N tiles; queries resident in VMEM; running (dist, idx)
scratch merged with each tile's scores via `lax.top_k` of the concatenation.
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


def _scan_kernel(q_ref, base_ref, outd_ref, outi_ref, run_d, run_i, *,
                 k: int, tile_n: int):
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _():
        run_d[:] = jnp.full_like(run_d, _BIG)
        run_i[:] = jnp.full_like(run_i, -1)

    b = base_ref[:]                                   # [TN, d]
    q = q_ref[:]                                      # [QT, d]
    # partial squared distance: |b|^2 - 2 q·b  (|q|^2 added by the caller)
    dots = jax.lax.dot_general(q, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    b2 = jnp.sum(b * b, axis=-1)[None, :]             # [1, TN]
    scores = b2 - 2.0 * dots                          # [QT, TN]
    # keep index math in int32: under jax_enable_x64 the python-int tile
    # size promotes to i64, which Mosaic cannot truncate
    idx = (jnp.int32(step) * jnp.int32(tile_n)
           + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1))

    cat_d = jnp.concatenate([run_d[:], scores], axis=1)
    cat_i = jnp.concatenate([run_i[:], idx], axis=1)
    neg, sel = jax.lax.top_k(-cat_d, k)
    run_d[:] = -neg
    run_i[:] = jnp.take_along_axis(cat_i, sel, axis=1)

    @pl.when(step == n_steps - 1)
    def _():
        outd_ref[:] = run_d[:]
        outi_ref[:] = run_i[:]


@partial(jax.jit, static_argnames=("k", "tile_n", "interpret"))
def _scan_call(queries: jax.Array, base: jax.Array, k: int, tile_n: int,
               interpret: bool):
    qt, d = queries.shape
    n = base.shape[0]
    grid = n // tile_n
    outd, outi = pl.pallas_call(
        partial(_scan_kernel, k=k, tile_n=tile_n),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((qt, d), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qt, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qt, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
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
    return outd, outi


def streaming_topk(base, queries, k: int = 100, tile_n: int = 2048,
                   q_tile: int = 128, interpret: bool = False):
    """Exact L2 top-k of every query against the whole base.

    Returns (ids int32 [Q, K], dists f32 [Q, K] true L2).  Pads N/d/Q/K to
    hardware tiles; padded base rows score +BIG and never surface.
    """
    base = np.asarray(base, np.float32)
    queries = np.asarray(queries, np.float32)
    n, d = base.shape
    nq = queries.shape[0]
    k_eff = min(k, n)

    d_pad = _round_up(d, 128)
    k_pad = _round_up(k_eff, 128)
    tile_n = max(tile_n, k_pad)
    n_pad = _round_up(n, tile_n)
    q_pad = _round_up(min(q_tile, max(nq, 8)), 8)

    bp = np.zeros((n_pad, d_pad), np.float32)
    bp[:n, :d] = base
    if n_pad > n:
        bp[n:, 0] = 1.0e17   # huge coordinate -> +BIG distance
    out_ids = np.empty((nq, k_eff), np.int32)
    out_d = np.empty((nq, k_eff), np.float32)
    base_dev = jnp.asarray(bp)

    for s in range(0, nq, q_pad):
        e = min(s + q_pad, nq)
        qp = np.zeros((q_pad, d_pad), np.float32)
        qp[:e - s, :d] = queries[s:e]
        # x64 mode breaks gridded Mosaic lowering (i64 leaks into grid
        # index plumbing); the kernel is pure f32/i32, so scope x64 off.
        with jax.enable_x64(False):
            dist, ids = _scan_call(jnp.asarray(qp), base_dev, k_pad, tile_n,
                             interpret)
        dist = np.asarray(dist[:e - s, :k_eff])
        ids = np.asarray(ids[:e - s, :k_eff])
        q2 = np.einsum("ij,ij->i", queries[s:e], queries[s:e])
        out_d[s:e] = np.sqrt(np.maximum(dist + q2[:, None], 0.0))
        out_ids[s:e] = ids
    return out_ids, out_d
