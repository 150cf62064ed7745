"""Test configuration: force the JAX CPU backend with 8 virtual devices.

Tests exercise the accelerated code path (device='jax') and the multi-chip
sharding logic without TPU hardware — the fake-backend story the reference
never had (its CI skipped tests entirely, ``.travis.yml:12-13``)."""

import os
import sys

# Must run before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

import jax

# The container's sitecustomize force-registers the remote-TPU ("axon")
# platform and overrides JAX_PLATFORMS; pin the CPU backend explicitly so the
# suite runs hermetically on the 8 virtual devices.
jax.config.update("jax_platforms", "cpu")

# persistent compile cache: the suite recompiles many gather graphs
# otherwise.  The dir is keyed by the host's CPU feature set: XLA:CPU loads
# AOT results compiled for a *different* microarchitecture (it only warns),
# which produced a real 1-ulp-class miscomputation when a cache written on
# another machine was reused here.
import hashlib
import platform

try:
    with open("/proc/cpuinfo") as f:
        _cpu = next((ln for ln in f if ln.startswith("flags")), platform.machine())
except OSError:
    _cpu = platform.machine()
_cpu_tag = hashlib.sha1(_cpu.encode()).hexdigest()[:12]
jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/voltools_tpu_jax_cache_{_cpu_tag}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture
def small_volume(rng):
    return rng.random((17, 19, 23)).astype(np.float32)


@pytest.fixture
def cube_volume(rng):
    return rng.random((24, 24, 24)).astype(np.float32)
