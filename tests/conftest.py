"""Test configuration.

Tests run on CPU with 8 virtual devices so that multi-chip sharding paths
(jax.sharding.Mesh + shard_map) are exercised without TPU hardware. This must
happen before jax is imported anywhere.
"""

import os
import sys

# MSM_TEST_TPU=1 leaves the real TPU backend registered so the tpu-marked
# tests (tests/test_tpu_kernels.py) can run compiled Mosaic kernels:
#   MSM_TEST_TPU=1 python -m pytest tests -m tpu
_USE_TPU = os.environ.get("MSM_TEST_TPU", "") == "1"

if not _USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

# Make the repo root importable regardless of how pytest is invoked.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# The environment's sitecustomize force-registers the experimental 'axon'
# TPU backend and overrides the JAX_PLATFORMS env var, so the platform must
# be pinned programmatically (env vars alone are NOT honored here).
import jax

if not _USE_TPU:
    jax.config.update("jax_platforms", "cpu")

    # NO persistent compilation cache on CPU in this environment: the
    # cache's native executable.serialize()/deserialize segfaults the
    # interpreter (observed 3x mid-suite, both read and write paths —
    # this machine's compile service targets CPU features the host
    # lacks; XLA:CPU AOT reloads warn "+prefer-no-scatter ... could
    # lead to SIGILL").  Re-run latency is the price of not dying.

import random

import pytest


@pytest.fixture
def rng():
    """Seeded RNG, mirroring the reference's seedrandom('hello') discipline
    (mont_mul.test.ts:15)."""
    return random.Random("hello")
