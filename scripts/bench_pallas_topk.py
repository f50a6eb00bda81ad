"""Head-to-head: Pallas bitonic streaming top-k vs XLA matmul+lax.top_k.

VERDICT r1 item 7: the kernel must earn its keep with a measured table on
the real chip, at the two shapes that matter — GT precompute (big N, K=100)
and serving refine (candidate-set N, K=10).  Run ON TPU (serialize with any
other device user):

    python scripts/bench_pallas_topk.py [N_LIST]

Writes a markdown table to stdout; paste into NOTES_ROUND2.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_case(n, d, nq, k, reps=3):
    """Kernel-vs-kernel on DEVICE-RESIDENT data: both sides get pre-placed
    (pre-padded for the Pallas side) arrays, so the high-latency tunnel
    transfer is excluded — that cost is identical for both backends in the
    serving path (the corpus lives in HBM)."""
    import jax
    import jax.numpy as jnp
    from fspann_tpu.ops import pallas_topk as ptk

    rng = np.random.default_rng(0)
    base = rng.normal(size=(n, d)).astype(np.float32)
    queries = rng.normal(size=(nq, d)).astype(np.float32)
    bdev = jax.device_put(base)
    qdev = jax.device_put(queries)

    @jax.jit
    def xla_topk(b, q):
        # chunk-free reference: one [NQ, N] distance matrix + lax.top_k
        d2 = (jnp.sum(b * b, axis=1)[None, :]
              - 2.0 * q @ b.T + jnp.sum(q * q, axis=1)[:, None])
        neg, idx = jax.lax.top_k(-d2, k)
        return idx, jnp.sqrt(jnp.maximum(-neg, 0.0))

    # pre-pad for the pallas kernel exactly as bitonic_topk does
    k_pad = max(128, 1 << (min(k, n) - 1).bit_length())
    tile_n = 1 << (max(512, 2 * k_pad) - 1).bit_length()
    d_pad = -(-d // 128) * 128
    n_pad = -(-n // tile_n) * tile_n
    q_pad = -(-min(32, max(nq, 8)) // 8) * 8
    bp = np.zeros((n_pad, d_pad), np.float32)
    bp[:n, :d] = base
    if n_pad > n:
        bp[n:, 0] = 1.0e17
    bp_dev = jax.device_put(bp)
    qp = np.zeros((q_pad, d_pad), np.float32)
    qp[:min(nq, q_pad), :d] = queries[:q_pad]
    qp_dev = jax.device_put(qp)

    def pallas_fn(qd, bd):
        with jax.enable_x64(False):
            return ptk._topk_call(qd, bd, k_pad, tile_n, False)

    def timed(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        return min(ts), out

    t_xla, (xi, xd) = timed(xla_topk, bdev, qdev)
    t_pal, (pd, pi) = timed(pallas_fn, qp_dev, bp_dev)
    # agreement on the queries both sides share (ties may differ)
    nq_c = min(nq, q_pad)
    xi_n = np.asarray(xi)[:nq_c]
    pi_n = np.asarray(pi)[:nq_c, :k]
    agree = np.mean([len(set(xi_n[i].tolist()) & set(pi_n[i].tolist())) / k
                     for i in range(nq_c)])
    # normalize: pallas processed q_pad queries, xla nq — report per-query
    t_pal = t_pal * (nq / q_pad)
    return t_xla, t_pal, agree


def main():
    import jax
    print(f"devices: {jax.devices()}", file=sys.stderr)
    cases = [
        ("GT precompute", 1_000_000, 128, 64, 100),
        ("GT precompute (small)", 200_000, 128, 64, 100),
        ("refine shape", 8_192, 128, 64, 10),
        ("refine shape (wide)", 20_000, 128, 64, 10),
    ]
    print("| case | N | K | XLA ms | Pallas ms | speedup | overlap |")
    print("|---|---|---|---|---|---|---|")
    for name, n, d, nq, k in cases:
        try:
            t_xla, t_pal, agree = bench_case(n, d, nq, k)
            print(f"| {name} | {n} | {k} | {t_xla*1e3:.1f} | {t_pal*1e3:.1f} "
                  f"| {t_xla/t_pal:.2f}x | {agree:.3f} |", flush=True)
        except Exception as e:  # noqa: BLE001 — report per-case failures
            print(f"| {name} | {n} | {k} | FAILED: {type(e).__name__} | | | |",
                  flush=True)


if __name__ == "__main__":
    main()
