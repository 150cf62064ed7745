"""Headline benchmark: random full-3D rotations of a resident 250^3 volume.

This is the reference's own benchmark workload: rotations drawn uniformly
from [-180, 180)^3 in 'sxyz' order about center=size/2 (reference
``tests/benchmark.py:52-54``), applied to a device-resident volume with the
output kept on device -- the ``static_vol_out`` column.  Baseline numbers
(GTX 1050 Ti, mean of 100 random rotations at 250^3):
linear ``static_vol_out`` 8.768 ms / ``cp_transform_out`` 12.710 ms;
filt_bspline 34.69 / 38.77 ms (BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": <linear mean ms>, "unit": "ms",
   "vs_baseline": <speedup x vs linear static_vol_out>,
   "per_rotation_ms": [...], "cubic_ms": <cubic mean>,
   "cubic_vs_baseline": ..., "cubic_per_rotation_ms": [...]}

Timing method: this environment reaches the TPU through an RPC tunnel where
``block_until_ready`` returns before execution finishes and every host
round-trip costs ~25-35 ms, so per-call wall timing is meaningless.  Per
rotation we chain N dependent kernel applications inside one jitted loop
(the output feeds a denormal-scale perturbation of the matrix, forcing the
dependency) and subtract the 1-iteration run: the slope is the true
per-transform device time.  Kernel compilation is excluded, as in the
baseline (its kernel was compiled once before its timed loop).
"""

import json
import sys
import time

import numpy as np

BASELINE_STATIC_MS = 8.768   # static_vol_out, 250^3 linear (BASELINE.md)
BASELINE_CP_MS = 12.710      # cp_transform_out, 250^3 linear (BASELINE.md)
BASELINE_CUBIC_MS = 34.69    # static_vol_out, 250^3 filt_bspline

N_ROT = 16       # linear rotations measured (one compiled program each)
N_ROT_CUBIC = 16  # cubic rotations: same n as linear so the worst-case
                  # statistic is comparable across interpolation families
ITERS = 8       # chained applications per program


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/voltools_tpu_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from voltools_tpu.kernels.planner import (choose_plan, plan_prepare,
                                              plan_sample_prepared)
    from voltools_tpu.utils import transform_matrix

    size = 250
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((size,) * 3, dtype=np.float64)
                      .astype(np.float32))
    center = (size / 2,) * 3   # reference benchmark.py:53

    def measure(m, interpolation):
        # tight per-matrix plan (sticky=None: no binary reuse, no
        # quantization ladders): the benchmark measures the steady-state
        # per-call time with each matrix's own kernel, compile excluded --
        # exactly how the baseline timed its one precompiled kernel per
        # configuration.  The volume is prefiltered once at upload for
        # cubic (reference volume.py:48-50), so the kernel samples
        # coefficients directly either way.
        plan = choose_plan(m, vol.shape, interpolation, "constant",
                           sticky=None)
        if plan is None:   # pragma: no cover - defensive
            return None, "xla"
        prep = plan_prepare(vol, plan)

        @jax.jit
        def chained(n, p, mat):
            # n is traced (dynamic fori trip count): ONE compile per plan
            # serves both slope points
            def body(_, carry):
                mm, acc = carry
                out = plan_sample_prepared(p, mm, plan, 0.0)
                probe = out[0, 0, 0] * jnp.float32(1e-38)
                return mm + probe, acc + probe
            mm, acc = jax.lax.fori_loop(
                0, n, body, (mat, jnp.float32(0.0)))
            return mm[0, 0] + acc

        mj = jnp.asarray(m, jnp.float32)
        float(chained(1, prep, mj))
        float(chained(ITERS, prep, mj))

        def run(n):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(chained(n, prep, mj))
                best = min(best, time.perf_counter() - t0)
            return best

        ms = (run(ITERS) - run(1)) / (ITERS - 1) * 1e3
        return ms, type(plan).__name__

    def sweep(interpolation, n_rot):
        rot_rng = np.random.default_rng(0)
        rot_rng.random((size,) * 3, dtype=np.float64)  # align the stream
        times = []
        for i in range(n_rot):
            ang = rot_rng.uniform(-180, 180, 3)  # reference benchmark.py:52
            m = transform_matrix(rotation=tuple(ang), rotation_order="sxyz",
                                 center=center)
            ms, kind = measure(m, interpolation)
            if ms is not None:
                times.append(round(ms, 3))
            print(f"# {interpolation} rot {i} {np.round(ang, 1).tolist()}: "
                  f"{ms:.2f} ms ({kind})", file=sys.stderr)
        return times

    lin = sweep("linear", N_ROT)
    cub = sweep("filt_bspline", N_ROT_CUBIC)

    mean_lin = float(np.mean(lin))
    mean_cub = float(np.mean(cub)) if cub else None
    print(json.dumps({
        "metric": (f"StaticVolume {size}^3 f32 linear, mean of {N_ROT} "
                   f"random 'sxyz' rotations (reference benchmark "
                   f"workload), resident volume, device output"),
        "value": round(mean_lin, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_STATIC_MS / mean_lin, 2),
        "per_rotation_ms": lin,
        "worst_ms": round(max(lin), 3),
        "cubic_ms": round(mean_cub, 3) if mean_cub else None,
        "cubic_vs_baseline": (round(BASELINE_CUBIC_MS / mean_cub, 2)
                              if mean_cub else None),
        "cubic_worst_ms": round(max(cub), 3) if cub else None,
        "cubic_per_rotation_ms": cub,
    }))


if __name__ == "__main__":
    main()
