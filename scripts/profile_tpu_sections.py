"""Locate the unattributed per-query milliseconds on the REAL TPU path.

Monkeypatches wall-clock accumulators around the serving loop's sections
(token creation, route dispatch, consume, metrics block, diagnostics) and
runs the parity profile on a small corpus (route compute is pipelined-
hidden regardless of N, so N=200k localizes host costs at 1/5 the build
cost).  Usage:  python scripts/profile_tpu_sections.py [N] [Q]
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from fspann_tpu.config import SystemConfig, PaperConfig, RuntimeConfig
from fspann_tpu.api.system import ForwardSecureANNSystem
from fspann_tpu.api import system as system_mod
from fspann_tpu.query import service as service_mod
from fspann_tpu.io import groundtruth, synthetic

SECTIONS: dict[str, float] = {}


def timed(name, fn):
    def wrap(*a, **kw):
        t0 = time.perf_counter()
        out = fn(*a, **kw)
        SECTIONS[name] = SECTIONS.get(name, 0.0) + time.perf_counter() - t0
        return out
    return wrap


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    q = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    d, batch = 128, 64
    base, queries = synthetic.lsh_hard_corpus(n, d, q, seed=42)
    cfg = SystemConfig(
        paper=PaperConfig(m=64, lam=2, divisions=3, tables=8, seed=13),
        runtime=RuntimeConfig(refinement_limit=56000,
                              max_global_candidates=56000,
                              rerank_limit=2000, probe_override=16,
                              block_size=128, routing_mode="scan",
                              adaptive_decrypt_margin=40,
                              encode_backend="cpu")).validate()
    gtm = groundtruth.precompute(base, queries, k=100)

    service_mod.QueryService._dispatch_route = timed(
        "dispatch_route", service_mod.QueryService._dispatch_route)
    service_mod.QueryService._decrypt_queries = timed(
        "decrypt_queries", service_mod.QueryService._decrypt_queries)
    service_mod.QueryService._consume_pass = timed(
        "consume_pass", service_mod.QueryService._consume_pass)
    service_mod.QueryService._finish_batch = timed(
        "finish_batch(incl consume)", service_mod.QueryService._finish_batch)
    system_mod.ForwardSecureANNSystem._metrics_block = timed(
        "metrics_block", system_mod.ForwardSecureANNSystem._metrics_block)

    with tempfile.TemporaryDirectory() as td:
        sys_ = ForwardSecureANNSystem(cfg, os.path.join(td, "db"), d,
                                      query_batch=batch)
        try:
            t0 = time.perf_counter()
            sys_.index_stream(base, batch_size=100_000)
            sys_.finalize_for_search()
            print(f"build {time.perf_counter()-t0:.1f}s", flush=True)
            sys_.run_queries(queries[:batch], gtm, base, ks=(10,))  # warm
            sys_.profiler.clear_rows()
            SECTIONS.clear()
            import fspann_tpu.query.token as token_mod
            sys_.tokens.create_batch = timed("token_create",
                                             sys_.tokens.create_batch)
            t0 = time.perf_counter()
            agg = sys_.run_queries(queries, gtm, base, ks=(1, 10, 100))
            wall = time.perf_counter() - t0
            print(f"wall {wall*1e3:.1f} ms  ({q/wall:.1f} q/s)  "
                  f"ART {agg.mean_art_ms:.2f} ms  "
                  f"r@10 {agg.recall_at_k.get(10, float('nan')):.4f}")
            other = wall
            for k in sorted(SECTIONS, key=SECTIONS.get, reverse=True):
                v = SECTIONS[k]
                print(f"  {k:28s} {v*1e3:8.1f} ms  {v*1e3/q:6.3f} ms/q")
            top = (SECTIONS.get("token_create", 0)
                   + SECTIONS.get("dispatch_route", 0)
                   + SECTIONS.get("decrypt_queries", 0)
                   + SECTIONS.get("finish_batch(incl consume)", 0)
                   + SECTIONS.get("metrics_block", 0))
            print(f"  {'UNACCOUNTED (eval/profiler)':28s} "
                  f"{(wall-top)*1e3:8.1f} ms  {(wall-top)*1e3/q:6.3f} ms/q")
        finally:
            sys_.shutdown()


if __name__ == "__main__":
    main()
