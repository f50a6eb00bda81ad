#!/usr/bin/env python
"""Sustained mixed-workload serving soak (VERDICT r3 next-round #7).

One clock, every lifecycle mechanism at once, on the real TPU at the
bench parity operating point (1M hard corpus, 3,072-bit codes, f16
payloads, adaptive decrypt budget):

  continuous query stream (windows of 256 from a 1,024-query pool)
  + periodic live inserts (capacity-padded scan state -> NO recompile)
  + deletes of the previous insert batch
  + ONE mid-run key rotation with the background migration daemon
    re-encrypting the corpus under live traffic

Per-window JSON rows (recall@10 / ART / q/s / key version / stale count /
mean decrypts) -> bench_results/soak_r4.jsonl, plus a summary row with
recall drift and pre/post-rotation ART medians.

The soak's pass condition (VERDICT): recall drift ~ 0 across the rotation
epoch and ART stable once migration drains.

Usage: python scripts/soak_tpu.py            # TPU (preflight + fallback)
Env: SOAK_S (timed seconds, default 660), SOAK_N (1_000_000), SOAK_D (128),
     SOAK_POOL (1024), SOAK_WINDOW (256), SOAK_INSERT_EVERY (4 windows),
     SOAK_INSERT_BATCH (128), SOAK_ROTATE_FRAC (0.4)
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

import bench  # preflight + cache conventions (repo root)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.environ.get("SOAK_OUT",
                     os.path.join(ROOT, "bench_results", "soak_r4.jsonl"))


def emit(row):
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("ROW", json.dumps(row), flush=True)


def main():
    soak_s = float(os.environ.get("SOAK_S", 660))
    n = int(os.environ.get("SOAK_N", 1_000_000))
    d = int(os.environ.get("SOAK_D", 128))
    pool = int(os.environ.get("SOAK_POOL", 1024))
    window = int(os.environ.get("SOAK_WINDOW", 256))
    ins_every = int(os.environ.get("SOAK_INSERT_EVERY", 4))
    ins_batch = int(os.environ.get("SOAK_INSERT_BATCH", 128))
    rot_frac = float(os.environ.get("SOAK_ROTATE_FRAC", 0.4))

    platform = "tpu"
    if os.environ.get("BENCH_SKIP_PREFLIGHT"):
        pass
    elif not bench._device_preflight():
        bench.log("TPU preflight failed — CPU fallback")
        os.environ["JAX_PLATFORMS"] = "cpu"
        platform = "cpu-fallback"

    import jax
    if platform == "cpu-fallback":
        jax.config.update("jax_platforms", "cpu")
    cache_dir = os.path.join(ROOT, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    bench.log(f"devices: {jax.devices()}")
    platform = jax.default_backend() if platform == "tpu" else platform

    from fspann_tpu.api.system import ForwardSecureANNSystem
    from fspann_tpu.config import SystemConfig
    from fspann_tpu.crypto.rotation import BackgroundReencryption
    from fspann_tpu.io import groundtruth, synthetic

    base, queries = synthetic.lsh_hard_corpus(n, d, pool, seed=42)

    cfg = SystemConfig()
    cfg = dataclasses.replace(
        cfg,
        paper=dataclasses.replace(cfg.paper, tables=8, m=64),
        runtime=dataclasses.replace(
            cfg.runtime, routing_mode="scan", rerank_limit=2000,
            refinement_limit=56000, max_global_candidates=56000,
            probe_override=16, block_size=128,
            adaptive_decrypt_margin=40, storage_dtype="f16",
            encode_backend="cpu",
            # capacity headroom: every soak insert fills tombstoned
            # padding in place — no scan recompile under live traffic
            scan_capacity_rows=n + 16384),
        reencryption=dataclasses.replace(cfg.reencryption,
                                         background_enabled=False)).validate()

    work = tempfile.mkdtemp(prefix="fspann_soak_")
    try:
        s = ForwardSecureANNSystem(cfg, os.path.join(work, "db"), d,
                                   query_batch=64)
        t0 = time.perf_counter()
        s.index_stream(base, batch_size=100_000)
        s.finalize_for_search()
        build_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        gtm = groundtruth.precompute(base, queries, k=100)
        bench.log(f"build {build_s:.0f}s, GT {time.perf_counter()-t0:.0f}s")

        # warmup/compile at window shape + one insert shape
        s.run_queries(queries[:window],
                      groundtruth.GroundtruthManager(gtm.gt[:window]),
                      base, ks=(10,))
        rngi = np.random.default_rng(777)
        warm_v = rngi.normal(size=(ins_batch, d)).astype(np.float32) * 3 + 60.0
        next_id = n
        s.insert_live(np.arange(next_id, next_id + ins_batch), warm_v)
        warm_ids = np.arange(next_id, next_id + ins_batch)
        next_id += ins_batch
        s.delete(warm_ids)
        s.profiler.clear_rows()

        emit({"step": "setup", "platform": platform, "n": n, "d": d,
              "build_s": round(build_s, 1), "soak_s": soak_s,
              "window": window, "insert_batch": ins_batch,
              "insert_every": ins_every, "capacity": n + 16384})

        bg = None
        rotated = False
        prev_ins: np.ndarray | None = None
        w = 0
        t_start = time.perf_counter()
        rows = []
        try:
            while True:
                t_rel = time.perf_counter() - t_start
                if t_rel >= soak_s:
                    break
                ev = {}
                if not rotated and t_rel >= rot_frac * soak_s:
                    rv = s.rotation.force_rotate_now()
                    bg = BackgroundReencryption(s.rotation, interval_s=0.05,
                                                batch=25_000,
                                                load_shed_qps=1e9)
                    bg.start()
                    rotated = True
                    ev["event"] = f"rotate->v{rv}+bg_migration"
                if w % ins_every == 0:
                    if prev_ins is not None:
                        s.delete(prev_ins)
                        ev["deleted"] = len(prev_ins)
                    v = rngi.normal(size=(ins_batch, d)).astype(np.float32) \
                        * 3 + 60.0
                    ids = np.arange(next_id, next_id + ins_batch)
                    s.insert_live(ids, v)
                    next_id += ins_batch
                    prev_ins = ids
                    ev["inserted"] = ins_batch
                lo = (w * window) % pool
                qs = queries[lo:lo + window]
                gslice = groundtruth.GroundtruthManager(
                    gtm.gt[lo:lo + window])
                s.profiler.clear_rows()
                t1 = time.perf_counter()
                agg = s.run_queries(qs, gslice, base, ks=(10,))
                dt = time.perf_counter() - t1
                prow = [r for r in s.profiler.rows if r.k == 10]
                dec = (sum(r.cand_decrypted for r in prow) / max(len(prow), 1))
                stale = int(len(s.store.meta.stale_ids(s.km.current_version)))
                row = {"w": w, "t_s": round(t_rel, 1),
                       "qps": round(window / dt, 1),
                       "art_ms": round(agg.mean_art_ms, 2),
                       "recall_at_10": round(agg.recall_at_k[10], 4),
                       "decrypts": round(dec, 0),
                       "key_version": s.km.current_version,
                       "stale": stale,
                       "live_extra": 0 if prev_ins is None
                       else int(len(prev_ins))}
                row.update(ev)
                rows.append(row)
                emit(row)
                w += 1
        finally:
            if bg is not None:
                bg.stop()

        r10 = [r["recall_at_10"] for r in rows]
        arts = [r["art_ms"] for r in rows]
        rot_w = next((r["w"] for r in rows if "event" in r), None)
        pre = [a for r, a in zip(rows, arts)
               if rot_w is None or r["w"] < rot_w]
        post_drain = [a for r, a in zip(rows, arts)
                      if rot_w is not None and r["w"] > rot_w
                      and r["stale"] == 0]
        med = lambda xs: round(float(np.median(xs)), 2) if xs else None
        emit({"step": "summary", "windows": len(rows),
              "total_queries": len(rows) * window,
              "wall_s": round(time.perf_counter() - t_start, 1),
              "recall_min": min(r10), "recall_max": max(r10),
              "recall_drift": round(max(r10) - min(r10), 4),
              "art_median_pre_rotation_ms": med(pre),
              "art_median_post_migration_ms": med(post_drain),
              "inserts_total": int(next_id - n),
              "final_stale": rows[-1]["stale"] if rows else None})
        s.shutdown()
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
