"""Disk-backed executable cache (utils/exec_cache.py).

CPU-hosted: forces the cache on via MSM_EXEC_CACHE so the
serialize/deserialize round-trip is exercised without TPU hardware.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from webgpu_msm_bls12_377_tpu.utils import exec_cache


@pytest.fixture()
def forced_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("MSM_EXEC_CACHE", "1")
    monkeypatch.setenv("MSM_EXEC_CACHE_DIR", str(tmp_path))
    return tmp_path


def _build():
    return lambda x: x * jnp.uint32(3) + jnp.uint32(1)


def test_disabled_on_cpu_by_default(monkeypatch):
    monkeypatch.delenv("MSM_EXEC_CACHE", raising=False)
    assert not exec_cache.enabled()  # conftest pins the cpu backend


def test_wrap_compiles_and_persists(forced_cache):
    x = jnp.arange(8, dtype=jnp.uint32)
    fn = exec_cache.wrap(("test", "affine", 8), _build)
    out = np.asarray(fn(x))
    np.testing.assert_array_equal(out, np.arange(8) * 3 + 1)
    blobs = list(forced_cache.glob("*.jexec"))
    assert len(blobs) == 1 and blobs[0].stat().st_size > 0
    # second call reuses the resolved callable
    np.testing.assert_array_equal(np.asarray(fn(x + 1)), np.arange(1, 9) * 3 + 1)


def test_wrap_reloads_from_disk(forced_cache):
    """Happy path (populate, then reload without rebuilding).

    Runs in a 1-device subprocess: a deserialized executable binds its
    device assignment, and this suite's 8-virtual-device mesh makes the
    reloaded program expect 8 input shards (the production TPU process
    is single-device, the case this cache exists for).
    """
    script = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from webgpu_msm_bls12_377_tpu.utils import exec_cache

build_calls = []
def build():
    build_calls.append(1)
    return lambda x: x * jnp.uint32(3) + jnp.uint32(1)

x = jnp.arange(16, dtype=jnp.uint32)
key = ("test", "reload", 16)
np.testing.assert_array_equal(
    np.asarray(exec_cache.wrap(key, build)(x)), np.arange(16) * 3 + 1)
assert build_calls == [1], build_calls
blobs = list(exec_cache.cache_dir().glob("*.jexec"))
assert len(blobs) == 1, blobs
np.testing.assert_array_equal(
    np.asarray(exec_cache.wrap(key, build)(x)), np.arange(16) * 3 + 1)
assert build_calls == [1], f"reload invoked build: {build_calls}"
print("RELOAD_OK")
"""
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        env=env,
        timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert "RELOAD_OK" in out.stdout, (out.stdout, out.stderr[-2000:])


def test_multi_device_probe_falls_back(forced_cache):
    """In THIS 8-virtual-device process the reload probe fails and the
    wrapper degrades to a fresh compile — results stay correct."""
    x = jnp.arange(16, dtype=jnp.uint32)
    key = ("test", "mdev", 16)
    np.asarray(exec_cache.wrap(key, _build)(x))  # populate disk
    fn2 = exec_cache.wrap(key, _build)
    np.testing.assert_array_equal(
        np.asarray(fn2(x)), np.arange(16) * 3 + 1
    )


def test_corrupt_blob_falls_back_and_heals(forced_cache):
    x = jnp.arange(8, dtype=jnp.uint32)
    key = ("test", "corrupt", 8)
    np.asarray(exec_cache.wrap(key, _build)(x))
    (blob,) = forced_cache.glob("*.jexec")
    blob.write_bytes(b"not a pickle")
    fn = exec_cache.wrap(key, _build)
    np.testing.assert_array_equal(np.asarray(fn(x)), np.arange(8) * 3 + 1)
    # the corrupt entry was replaced by a fresh serialization
    (blob2,) = forced_cache.glob("*.jexec")
    assert blob2.stat().st_size > 64


def test_distinct_keys_distinct_entries(forced_cache):
    x = jnp.arange(8, dtype=jnp.uint32)
    np.asarray(exec_cache.wrap(("test", "k1", 8), _build)(x))
    np.asarray(exec_cache.wrap(("test", "k2", 8), _build)(x))
    assert len(list(forced_cache.glob("*.jexec"))) == 2
