"""Test harness: force an 8-device virtual CPU mesh (the JAX analogue of the
reference's "multi-node without a cluster" testing; SURVEY.md §4).

Note: this image's sitecustomize registers the axon TPU PJRT plugin and
imports jax before pytest starts, so env vars alone are too late —
``jax.config.update`` still wins as long as no computation has run yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# env AND config must agree: the package __init__ trusts the env var over
# a config pinned by this image's sitecustomize
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
