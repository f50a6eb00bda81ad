"""Time each device op inside bank init on the live platform.

The r5 headline artifact shows bank_init_s=305.3 with device_claim_s=1.4 —
the claim-absorb op was fast yet the first REAL bank op still ate 5 min.
This isolates which op pays (PRNG normal/uniform dispatches vs the jitted
omega stats einsum) and whether the persistent compile cache covers them.

Usage: python scripts/probe_bank_init.py   (TPU; run serialized)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def t(name, fn):
    t0 = time.perf_counter()
    out = fn()
    import jax
    try:
        out = jax.block_until_ready(out)
    except Exception:
        pass
    print(f"{name}: {time.perf_counter() - t0:.2f}s", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    print("devices:", jax.devices(), flush=True)
    t("claim (ones.sum)", lambda: jnp.ones(4).sum())

    from fspann_tpu.ops import coding

    sample = np.random.default_rng(0).standard_normal(
        (2000, 128), dtype=np.float32)
    # the parity geometry: tables=8, m=64, divisions=3 (config default)
    g, m, d = 8 * 3, 64, 128
    key = t("PRNGKey", lambda: jax.random.PRNGKey(np.uint32(13)))
    key2 = t("fold_in", lambda: jax.random.fold_in(key, 0x414C5048))
    a = t("random.normal [G,m,d]",
          lambda: jax.random.normal(key2, (g, m, d), dtype=jnp.float32))
    t("row-normalize", lambda: a / jnp.sqrt(jnp.maximum(
        jnp.sum(a * a, axis=-1, keepdims=True), 1e-12)))
    t("random.uniform [G,m]",
      lambda: jax.random.uniform(key2, (g, m), dtype=jnp.float32))
    t("full build_bank_from_sample",
      lambda: coding.build_bank_from_sample(sample, m, 2, 8, 3, 13).omega)
    t("second build_bank_from_sample",
      lambda: coding.build_bank_from_sample(sample, m, 2, 8, 3, 14).omega)


if __name__ == "__main__":
    main()
