"""fspann_tpu — TPU-native forward-secure encrypted ANN search framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the Java reference
system FSPANN (Mehran-Memon/fspann-query-system).  The geometric routing core
(LSH coding, greedy partition construction, multi-probe candidate generation,
L2 refine + top-k) runs as batched device computations over dense ``[G, N]``
arrays in TPU HBM; AES-256-GCM ciphertexts, the HMAC-derived versioned
keystore, selective re-encryption and the metadata store stay host-side
(C AES-NI kernels + an embedded append-only store).

Core invariant preserved from the reference (README.md:79-99 of the
reference): **routing–ciphertext orthogonality** — routing state is a pure
function of (seed, config, sample statistics) and never depends on key or
cipher state, so key rotation/re-encryption never rebuilds the device index.
"""

import os

import jax

# Honor JAX_PLATFORMS even when a sitecustomize pre-imported jax with a
# different platform pinned (this image registers the axon TPU plugin at
# interpreter start; env vars read later would otherwise be ignored).
_env_platforms = os.environ.get("JAX_PLATFORMS")
if _env_platforms and \
        (getattr(jax.config, "jax_platforms", None) or "") != _env_platforms:
    # the env var is the caller's explicit choice; sitecustomize pins the
    # axon TPU via config before user code runs, so config alone can't be
    # trusted (code that overrides programmatically should also set the env)
    try:
        jax.config.update("jax_platforms", _env_platforms)
    except Exception:  # noqa: BLE001 — never block import on platform quirks
        pass

# Routing keys are 63-bit sortable integers (reference:
# index/paper/GreedyPartitioner.java:87-96).  We carry them as int64, which
# XLA emulates on TPU; all floating point arrays in this package are
# explicitly float32/bfloat16 so enabling x64 never widens compute dtypes.
jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
