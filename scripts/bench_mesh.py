"""Mesh serving-path throughput datum: DistributedEncryptedSystem on the
8-virtual-device CPU mesh.

Not a hardware benchmark (8 virtual devices share this host's ONE core) —
it measures the mesh code path's end-to-end serving rate and the adaptive
decrypt budget's effect on the sharded AES fan-out, with recall against
brute force.  Prints one JSON row per operating point.

Env: MESH_N (200_000), MESH_D (64), MESH_Q (64), MESH_DEV (8),
MESH_L (2000), MESH_MARGINS ("0,40").
"""

import dataclasses
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS",
                                                                ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=" +
                               os.environ.get("MESH_DEV", "8")).strip()
# env AND config (sitecustomize sets JAX_PLATFORMS itself, and the package
# __init__ honors the env var over a programmatic config update)
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")


def main():
    from fspann_tpu.config import SystemConfig, PaperConfig, RuntimeConfig
    from fspann_tpu.io import synthetic
    from fspann_tpu.parallel.serving import DistributedEncryptedSystem

    n = int(os.environ.get("MESH_N", 200_000))
    d = int(os.environ.get("MESH_D", 64))
    q = int(os.environ.get("MESH_Q", 64))
    L = int(os.environ.get("MESH_L", 2000))
    k = 10
    margins = [int(x) for x in
               os.environ.get("MESH_MARGINS", "0,40").split(",")]

    base, queries = synthetic.lsh_hard_corpus(n, d, q, seed=7)
    cfg = SystemConfig(
        paper=PaperConfig(m=48, lam=2, divisions=2, tables=8, seed=13),
        runtime=RuntimeConfig(refinement_limit=L, max_global_candidates=L,
                              block_size=128, rerank_limit=L,
                              routing_mode="scan")).validate()
    work = tempfile.mkdtemp(prefix="fspann_mesh_bench_")
    sys_ = DistributedEncryptedSystem(cfg, os.path.join(work, "db"), d)

    decrypted = [0]

    def counted(method):
        def counting(flat, *a, **kw):
            decrypted[0] += int((np.asarray(flat) >= 0).sum())
            return method(flat, *a, **kw)
        return counting

    # the serving path decrypts via the fused load_score_batch; wrap the
    # unfused variant too so a backend change can't zero the counter
    sys_.store.load_score_batch = counted(sys_.store.load_score_batch)
    sys_.store.load_decrypt_batch = counted(sys_.store.load_decrypt_batch)

    try:
        t0 = time.perf_counter()
        sys_.index_stream(base, batch_size=50_000)
        print(f"build {time.perf_counter()-t0:.0f}s "
              f"({sys_.size_bytes()/1e6:.0f} MB ciphertext, "
              f"{sys_.ndev} shards)", file=sys.stderr, flush=True)
        d2 = ((base[None] - queries[:, None]) ** 2).sum(-1)
        gt = np.argsort(d2, axis=1)[:, :k]
        sys_.search_batch(queries, k)       # compile warmup (full shape)

        for margin in margins:
            sys_.cfg = dataclasses.replace(cfg, runtime=dataclasses.replace(
                cfg.runtime, adaptive_decrypt_margin=margin)).validate()
            decrypted[0] = 0
            t0 = time.perf_counter()
            ids, _ = sys_.search_batch(queries, k)
            wall = time.perf_counter() - t0
            hits = sum(len(set(ids[i].tolist()) & set(gt[i].tolist()))
                       for i in range(q))
            print(json.dumps({
                "margin": margin, "n": n, "d": d, "ndev": sys_.ndev,
                "r@10": round(hits / (q * k), 4),
                "dec_per_q": round(decrypted[0] / q, 1),
                "qps": round(q / wall, 1),
                "art_ms": round(1000 * wall / q, 2)}), flush=True)
    finally:
        sys_.close()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
