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
#
# The env var is honored ONLY when every platform it names is already in
# the current config list (or the config is unset).  Rationale: the image
# boot exports JAX_PLATFORMS=<tpu-plugin> itself, so the env var is not
# necessarily the caller's choice — but a caller who programmatically ran
# ``jax.config.update("jax_platforms", "cpu")`` has REMOVED the pinned
# platform from the config, and that explicit narrowing must win over the
# boot-injected env var (otherwise a config-cpu script silently runs on
# the TPU the moment it imports this package — measured, round 3).  The
# supported workflows both keep working: ``JAX_PLATFORMS=cpu python ...``
# (sitecustomize widens the config to "axon,cpu", cpu ⊆ it → honored) and
# programmatic config updates (env "axon" ⊄ config "cpu" → left alone).
_env_platforms = os.environ.get("JAX_PLATFORMS")
_cfg_platforms = getattr(jax.config, "jax_platforms", None) or ""
if _env_platforms and _env_platforms != _cfg_platforms and \
        (not _cfg_platforms or
         set(_env_platforms.split(",")) <= set(_cfg_platforms.split(","))):
    try:
        jax.config.update("jax_platforms", _env_platforms)
    except Exception:  # noqa: BLE001 — never block import on platform quirks
        pass

# The host CPU backend must always be reachable (device-free bank build —
# ops/coding._cpu_device): the image boot exports JAX_PLATFORMS=axon, which
# pins the config to the TPU plugin ONLY, so jax.local_devices(backend="cpu")
# raises "Unknown backend cpu".  Widen the platform list with a trailing
# "cpu" — a trailing entry never changes the default backend (first in the
# list wins), it only makes the cpu backend resolvable.  Runs after the
# honoring block above so an env-narrowed choice is widened too.
_cfg_platforms = getattr(jax.config, "jax_platforms", None) or ""
if _cfg_platforms and "cpu" not in _cfg_platforms.split(","):
    try:
        jax.config.update("jax_platforms", _cfg_platforms + ",cpu")
    except Exception:  # noqa: BLE001 — never block import on platform quirks
        pass

# Routing keys are 63-bit sortable integers (reference:
# index/paper/GreedyPartitioner.java:87-96).  We carry them as int64, which
# XLA emulates on TPU; all floating point arrays in this package are
# explicitly float32/bfloat16 so enabling x64 never widens compute dtypes.
jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
