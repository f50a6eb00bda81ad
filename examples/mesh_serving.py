"""Full mesh-serving lifecycle on a virtual 8-device mesh.

Demonstrates the DistributedEncryptedSystem (the v5e-8 stretch
configuration as a first-class API): streaming encrypted build, MXU-scan
queries with the ICI merge, live insertion, deletion/undelete, forced key
rotation with background-style migration, storage compaction, and
checkpoint/restore — the complete single-chip lifecycle at mesh scale.

Run:  python examples/mesh_serving.py        (forces an 8-device CPU mesh)
"""

import os
import sys
import tempfile

if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    # sitecustomize initializes the jax backend before this script runs, so
    # the flag must be in the environment at PROCESS start — re-exec once
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()
    print("re-exec with flags:", os.environ["XLA_FLAGS"], flush=True)
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from fspann_tpu.config import SystemConfig, PaperConfig, RuntimeConfig
from fspann_tpu.parallel.serving import DistributedEncryptedSystem


def main():
    rng = np.random.default_rng(7)
    n, d, k = 20_000, 32, 10
    centers = rng.normal(size=(32, d)).astype(np.float32) * 6
    base = centers[rng.integers(0, 32, n)] + \
        rng.normal(size=(n, d)).astype(np.float32)
    queries = centers[rng.integers(0, 32, 16)] + \
        rng.normal(size=(16, d)).astype(np.float32)

    cfg = SystemConfig(
        paper=PaperConfig(m=12, lam=2, divisions=2, tables=4, seed=13),
        runtime=RuntimeConfig(refinement_limit=1024,
                              max_global_candidates=1024,
                              block_size=64, routing_mode="scan"),
    ).validate()

    work = tempfile.mkdtemp(prefix="fspann_mesh_")
    sys_ = DistributedEncryptedSystem(cfg, work, d)
    print(f"mesh: {sys_.ndev} devices")

    # 1. streaming encrypted build (corpus never materialized)
    total = sys_.index_stream(
        (base[i:i + 4_000] for i in range(0, n, 4_000)),
        n_total=n, capacity=n + 4_096)
    print(f"streamed build: {total} rows, "
          f"{sys_.size_bytes() / 1e6:.1f} MB ciphertext across "
          f"{sys_.store.num_shards} shard arenas")

    # 2. query (per-shard MXU scan + ICI merge + host decrypt/refine)
    ids, dist = sys_.search_batch(queries, k)
    d2 = ((base[None] - queries[:, None]) ** 2).sum(-1)
    true_ids = np.argsort(d2, axis=1)[:, :k]
    hits = sum(len(set(ids[i].tolist()) & set(true_ids[i].tolist()))
               for i in range(len(queries)))
    print(f"recall@{k}: {hits / ids.size:.4f}")

    # 3. live insert — searchable immediately, no rebuild
    # (all query batches share ONE shape: the mesh step compiles once —
    # first compile of an 8-device shard_map on this 1-core host is ~2 min)
    def q16(row):
        return np.broadcast_to(row, (16, d)).copy()

    new = (np.full((64, d), 40.0) + rng.normal(size=(64, d))).astype(
        np.float32)
    new_ids = sys_.insert_live(new)
    got, _ = sys_.search_batch(q16(np.full(d, 40.0, np.float32)), k)
    assert set(got[0].tolist()) <= set(new_ids.tolist())
    print(f"live insert: {len(new_ids)} rows, immediately served")

    # 4. delete / undelete (device mask is a runtime input — no recompile)
    victim = int(true_ids[0, 0])
    sys_.delete([victim])
    ids_d, _ = sys_.search_batch(q16(queries[0]), k)
    assert victim not in ids_d[0].tolist()
    restored = sys_.undelete([victim])
    print(f"delete/undelete: victim {victim} removed then restored "
          f"{restored}")

    # 5. forced rotation; migrate HALF now (the rest is the background
    # daemon's job) — routing state untouched either way
    v0 = sys_.km.current_version
    rep = sys_.rotate_and_migrate(np.arange(0, n, 2))
    ids_r, _ = sys_.search_batch(queries, k)
    print(f"rotation v{v0}->v{sys_.km.current_version}: "
          f"{rep.reencrypted} migrated, remaining "
          f"{sys_.migration_remaining(v0)}")

    # 6. compaction reclaims superseded ciphertexts
    comp = sys_.compact_storage()
    print(f"compaction freed {comp['bytes_freed'] / 1e6:.1f} MB")

    # 7. checkpoint + restore (codes-only, no decrypt pass)
    sys_.save_index()
    sys_.close()
    back = DistributedEncryptedSystem(cfg, work, d)
    assert back.restore_index() == n + 64
    ids_b, _ = back.search_batch(queries, k)
    print(f"restore: {back.n} rows, query results "
          f"{'match' if np.array_equal(ids_b[1:], ids_r[1:]) else 'differ'}")
    back.close()
    print("mesh lifecycle OK")


if __name__ == "__main__":
    main()
