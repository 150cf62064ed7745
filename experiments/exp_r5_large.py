"""Scaling probe past the reference's table: random rotations at 350^3 /
500^3 (its benchmark stops at 250^3 — `tests/benchmark.py:46` there).

Usage: python experiments/exp_r5_large.py [size] [n_rot] [interpolation]

Same measurement contract as bench.py: tight per-matrix plan, chained
device slope (ITERS dependent applications inside one jit minus the
1-iteration run), compile excluded, volume resident and prefiltered once.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    import voltools_tpu.kernels.pallas_walk as _pw
    _pw._FAST_CHOOSER = False
    from voltools_tpu.kernels.planner import (choose_plan, plan_prepare,
                                              plan_sample_prepared)
    from voltools_tpu.ops.prefilter import bspline_prefilter
    from voltools_tpu.utils import transform_matrix

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    n_rot = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    interpolation = sys.argv[3] if len(sys.argv) > 3 else "linear"
    iters = 8

    rng = np.random.default_rng(0)
    host = rng.random((size,) * 3, dtype=np.float64).astype(np.float32)
    vol = jax.block_until_ready(jnp.asarray(host))
    if interpolation.startswith("filt_"):
        vol = jax.block_until_ready(bspline_prefilter(vol))
    print(f"# volume {size}^3 resident ({host.nbytes / 1e6:.0f} MB)",
          flush=True)
    center = (size / 2,) * 3

    for i in range(n_rot):
        ang = rng.uniform(-180, 180, 3)
        m = transform_matrix(rotation=tuple(ang), rotation_order="sxyz",
                             center=center)
        plan = choose_plan(np.asarray(m, np.float32), vol.shape,
                           interpolation, "constant", sticky=None)
        prep = jax.block_until_ready(plan_prepare(vol, plan))

        @jax.jit
        def chained(n, p, mat, _plan=plan):
            def body(_, carry):
                mm, acc = carry
                out = plan_sample_prepared(p, mm, _plan, 0.0)
                probe = out[0, 0, 0] * jnp.float32(1e-38)
                return mm + probe, acc + probe
            mm, acc = jax.lax.fori_loop(0, n, body,
                                        (mat, jnp.float32(0.0)))
            return mm[0, 0] + acc

        mj = jnp.asarray(m, jnp.float32)
        t0 = time.perf_counter()
        float(chained(jnp.int32(1), prep, mj))
        float(chained(jnp.int32(iters), prep, mj))
        compile_s = time.perf_counter() - t0

        def run(n):
            best = float("inf")
            for _ in range(3):
                tr = time.perf_counter()
                float(chained(jnp.int32(n), prep, mj))
                best = min(best, time.perf_counter() - tr)
            return best

        ms = (run(iters) - run(1)) / (iters - 1) * 1e3
        print(f"{interpolation} {size}^3 rot {i} "
              f"{np.round(ang, 1).tolist()}: {ms:.2f} ms "
              f"({type(plan).__name__}, compile+first {compile_s:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
