"""Test configuration: CPU backend with a virtual 8-device mesh, float64 on.

Tests run on CPU (deterministic, f64 available) with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware. The reference's
numerics are double precision; enabling x64 lets tests assert tight parity.
"""

import os

# Force CPU: the environment pre-sets JAX_PLATFORMS=axon (TPU tunnel); tests
# need the deterministic f64 CPU backend + virtual multi-device mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize calls jax.config.update("jax_platforms", "axon,cpu")
# at interpreter start, which overrides the env var — override it back before
# any backend initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
