#!/usr/bin/env python
"""TPU operating-point sweep at the parity default (m=64 + adaptive
margin): ONE 1M hard-corpus build, then sweep (query_batch, margin)
without rebuilding.  Finds the headline point for bench.py.

Runs on the real TPU (no platform forcing).  Env: OP_N (1_000_000),
OP_Q (256), OP_GRID ("64:40,128:40,64:25,128:25" batch:margin pairs).
"""
import dataclasses
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# persistent compile cache (same as bench.py — tunnel compiles are slow)
cache_dir = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
os.makedirs(cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

N = int(os.environ.get("OP_N", 1_000_000))
D, Q, K = 128, int(os.environ.get("OP_Q", 256)), 10
GRID = [tuple(int(v) for v in pair.split(":"))
        for pair in os.environ.get("OP_GRID",
                                   "64:40,128:40,96:40,64:25").split(",")]


def main():
    from fspann_tpu.api.system import ForwardSecureANNSystem
    from fspann_tpu.config import SystemConfig, PaperConfig, RuntimeConfig
    from fspann_tpu.io import synthetic, groundtruth

    print("devices:", jax.devices(), file=sys.stderr, flush=True)
    base, queries = synthetic.lsh_hard_corpus(N, D, Q, seed=42)
    cfg = SystemConfig(
        paper=PaperConfig(m=64, lam=2, divisions=3, tables=8, seed=13),
        runtime=RuntimeConfig(probe_override=16, block_size=128,
                              refinement_limit=56000,
                              max_global_candidates=56000,
                              rerank_limit=2000,
                              adaptive_decrypt_margin=40,
                              routing_mode="scan",
                              encode_backend="cpu")).validate()
    work = tempfile.mkdtemp(prefix="fspann_op_")
    s = ForwardSecureANNSystem(cfg, os.path.join(work, "db"), D,
                               query_batch=64)
    try:
        t0 = time.perf_counter()
        s.index_stream(base, batch_size=100_000)
        s.finalize_for_search()
        print(f"build {time.perf_counter()-t0:.0f}s", file=sys.stderr,
              flush=True)
        gtm = groundtruth.precompute(base, queries, k=100)

        for batch, margin in GRID:
            s.query_batch = batch
            c2 = dataclasses.replace(cfg, runtime=dataclasses.replace(
                cfg.runtime, adaptive_decrypt_margin=margin)).validate()
            for obj in (s, s.index, s.query_service):
                obj.cfg = c2
            s.run_queries(queries[:batch], gtm, base, ks=(10,))  # warm
            s.profiler.clear_rows()
            t0 = time.perf_counter()
            agg = s.run_queries(queries, gtm, base, ks=(10, 100))
            wall = time.perf_counter() - t0
            print(json.dumps({
                "batch": batch, "margin": margin,
                "qps": round(Q / wall, 1),
                "art_ms": round(agg.mean_art_ms, 2),
                "r@10": round(agg.recall_at_k[10], 4),
                "r@100": round(agg.recall_at_k.get(100, float("nan")), 4),
                "dec": round(agg.mean_cand_decrypted, 0),
                "wall_s": round(wall, 2)}), flush=True)
    finally:
        s.shutdown()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
