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


# ---------------------------------------------------------------------------
# quick/slow split: `pytest -q` (the default, via addopts in pyproject.toml)
# skips the tests below and finishes in ~5 min warm even on a single-core
# host (measured 5m18s, nproc=1); CI's full run (`-m "slow or not slow"`)
# still executes everything, so there is no coverage loss where it counts.
# Every slow-marked parametrization keeps a cheaper sibling in the quick
# set.  The list is nodeids rather than scattered marks so the whole budget
# is auditable in one place.
_SLOW_NODEIDS = {
    # inline-compiles the chooser core for 9 shapes x 3 configs (~95 s);
    # test_fast_chooser_matches_numpy_quick keeps one config in the quick set
    "tests/test_walk.py::test_fast_chooser_matches_numpy",
    "tests/test_prefilter.py::test_fir_equals_scan_interior",
    "tests/test_prefilter.py::test_prefilter_matches_scipy_mirror[scan]",
    "tests/test_walk.py::test_autotune_plan_interpret",
    "tests/test_pallas.py::test_variant_rejects_full_3d_rotation",
    # the bspline select-tree parity grid keeps shear/scale/translate/
    # identity/rot_small quick; the two heaviest rotations run in full CI
    "tests/test_pallas.py::test_pallas_matches_xla[rot_single_axis_60-constant-bspline]",
    "tests/test_pallas.py::test_pallas_matches_xla[rot_single_axis_60-border-bspline]",
    "tests/test_pallas.py::test_pallas_matches_xla[rot_z_170-constant-bspline]",
    "tests/test_pallas.py::test_pallas_matches_xla[rot_z_170-border-bspline]",
    # non-divisible sharding keeps one mode x shape cell quick
    "tests/test_parallel.py::test_sharded_non_divisible_extent[constant-shape0]",
    "tests/test_parallel.py::test_sharded_non_divisible_extent[constant-shape1]",
    "tests/test_parallel.py::test_sharded_non_divisible_extent[border-shape0]",
    # replica fuzz: seed 7 stays quick for both interpolations; seed 3's
    # linear cell alone costs ~50 s (its variant compiles a huge interpret
    # program).  The dynamic-x-window replica is interpret-mode-only logic
    # validation; kernel parity stays quick via test_walk.
    "tests/test_walk_replica.py::test_replica_random_rotation_unmasked[3-linear]",
    "tests/test_walk_replica.py::test_replica_random_rotation_unmasked[3-bspline]",
    "tests/test_walk_replica.py::test_replica_dynamic_x_window",
    # strip windows are a probed-dead experimental path (BENCHMARKS.md):
    # correctness kept in full CI only
    "tests/test_walk.py::test_walk_strip_windows_match_xla",
    # gather-free stream: 'constant' full-3D cell (both interp families,
    # cval!=0) + the linear strategy cells stay quick
    "tests/test_parallel.py::test_sharded_stream_full_3d_rotation[border]",
    "tests/test_parallel.py::test_sharded_global_transform[bspline-stream]",
    # select-tree bspline grid: translate-border + rot_small-constant
    # represent the matrix families x edge modes in the quick run
    "tests/test_pallas.py::test_pallas_matches_xla[identity-constant-bspline]",
    "tests/test_pallas.py::test_pallas_matches_xla[identity-border-bspline]",
    "tests/test_pallas.py::test_pallas_matches_xla[translate-constant-bspline]",
    "tests/test_pallas.py::test_pallas_matches_xla[scale-constant-bspline]",
    "tests/test_pallas.py::test_pallas_matches_xla[scale-border-bspline]",
    "tests/test_pallas.py::test_pallas_matches_xla[shear-border-bspline]",
    "tests/test_pallas.py::test_pallas_matches_xla[shear-constant-bspline]",
    "tests/test_pallas.py::test_pallas_matches_xla[rot_small-border-bspline]",
    # interpret-mode plan-logic check; the same plans execute compiled in
    # the quick projector parity tests of test_models
    "tests/test_models.py::test_projector_walk_plan_interpret",
    # volume-sharded SIRT parity also runs in __graft_entry__.dryrun_multichip
    # (driver-executed every round) and in full CI
    "tests/test_models.py::test_sirt_mesh_volume_sharded_matches_single",
}


def pytest_collection_modifyitems(config, items):
    seen = set()
    for item in items:
        if item.nodeid in _SLOW_NODEIDS:
            item.add_marker(pytest.mark.slow)
            seen.add(item.nodeid)
    # drift guard: a renamed test or reordered parametrize would silently
    # un-mark a heavy test and break the quick-run budget with no signal.
    # Only checked on full-directory collection (path-restricted runs like
    # `pytest tests/test_walk.py` legitimately collect a subset).
    roots = {item.nodeid.split("::", 1)[0] for item in items}
    if roots.issuperset(n.split("::", 1)[0] for n in _SLOW_NODEIDS):
        missing = _SLOW_NODEIDS - seen
        assert not missing, (
            f"_SLOW_NODEIDS entries no longer match any collected test "
            f"(renamed or re-parametrized?): {sorted(missing)}")
