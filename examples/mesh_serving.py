"""Mesh-scale encrypted serving demo.

Runs the DistributedEncryptedSystem on a virtual 8-device CPU mesh: the
device mesh holds per-shard routing state (MXU Hamming-scan bit matrices —
no vector content), hosts hold shard-aligned AES-GCM arenas, and a search
is per-shard bit-matmul + ICI merge + host decrypt/refine.  On a real
v5e-8 slice the same code runs unchanged with the collectives on ICI.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/mesh_serving.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        # sitecustomize imports jax (axon platform) before user env applies
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    if len(jax.devices()) < 2:
        print("need a multi-device mesh — run with\n"
              "  XLA_FLAGS=--xla_force_host_platform_device_count=8 "
              "JAX_PLATFORMS=cpu python examples/mesh_serving.py")
        return

    from fspann_tpu.config import SystemConfig, PaperConfig, RuntimeConfig
    from fspann_tpu.parallel.serving import DistributedEncryptedSystem

    rng = np.random.default_rng(7)
    n, d, k = 20_000, 32, 10
    centers = rng.normal(size=(64, d)).astype(np.float32) * 5
    base = centers[rng.integers(0, 64, n)] + \
        rng.normal(size=(n, d)).astype(np.float32)
    queries = centers[rng.integers(0, 64, 16)] + \
        rng.normal(size=(16, d)).astype(np.float32)

    cfg = SystemConfig(
        paper=PaperConfig(m=12, lam=2, divisions=2, tables=4, seed=13),
        runtime=RuntimeConfig(refinement_limit=2048,
                              max_global_candidates=2048,
                              block_size=64, routing_mode="scan",
                              rerank_limit=512)).validate()
    with tempfile.TemporaryDirectory() as work:
        sys_ = DistributedEncryptedSystem(cfg, work, d)
        try:
            sys_.build(base)
            print(f"built: {n} pts over {sys_.ndev} devices, "
                  f"{sys_.size_bytes()/1e6:.1f} MB ciphertext, "
                  f"no plaintext in HBM")
            ids, dists = sys_.search_batch(queries, k)
            d2 = ((base[None] - queries[:, None]) ** 2).sum(-1)
            gt = np.argsort(d2, axis=1)[:, :k]
            hits = sum(len(set(ids[i]) & set(gt[i])) for i in range(len(queries)))
            print(f"search: recall@{k} = {hits/(len(queries)*k):.3f}")

            rep = sys_.rotate_and_migrate()
            print(f"rotation: {rep.reencrypted} ciphertexts migrated, "
                  f"{rep.time_ms:.0f} ms")
            ids2, _ = sys_.search_batch(queries, k)
            assert (ids == ids2).all(), "results changed across rotation!"
            print("results bit-identical across key rotation — "
                  "routing-ciphertext orthogonality holds at mesh scale")
        finally:
            sys_.close()


if __name__ == "__main__":
    main()
