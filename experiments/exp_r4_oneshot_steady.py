"""Round-4: STEADY-STATE one-shot measurement (the cp_transform analogue).

The reference's 22.3/13.3 ms one-shot numbers (``np_transform`` /
``cp_transform``, /root/reference/README.md:78) are steady-state means over
100 random rotations with the NVRTC kernel already compiled.  Our
equivalent steady state is the production STICKY planner (canonical-binary
reuse) + the fused prepare+kernel+unblock program.  This script measures,
over the bench's own 16 seed-0 rotations at 250^3 linear:

* per-rotation device slope of the fused one-shot chain under sticky plans
  (quantized, canonical-shared binaries -- what call #20 of a real sweep
  runs);
* steady-state host planning cost (fresh matrices against a warm canonical
  set -- the fit path, not the full chooser);
* the number of distinct fused programs the 16 rotations compiled.

Fresh-call numbers (tight plans, 2.3 ms full chooser) were measured by
exp_r4_oneshot.py; together they give the measured one-shot row for
BENCHMARKS.md.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/voltools_tpu_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import voltools_tpu.kernels.pallas_walk as pw
    from voltools_tpu.kernels.planner import choose_plan
    from voltools_tpu.utils import transform_matrix
    from exp_r3_walkprofile import slope_time

    size = 250
    vrng = np.random.default_rng(0)
    vol_np = vrng.random((size,) * 3, dtype=np.float64).astype(np.float32)
    vol_dev = jax.device_put(jnp.asarray(vol_np))
    vol_dev.block_until_ready()
    center = (size / 2,) * 3
    rot_rng = np.random.default_rng(0)
    rot_rng.random((size,) * 3, dtype=np.float64)
    angs = [rot_rng.uniform(-180, 180, 3) for _ in range(32)]

    mats = [transform_matrix(rotation=tuple(a), rotation_order="sxyz",
                             center=center) for a in angs]

    # --- sticky sweep: plan AND run per rotation, in order, so the
    # canonical set accumulates exactly as a user sweep builds it ----------
    times = []
    for ri in range(16):
        v = choose_plan(mats[ri], (size,) * 3, "linear", "constant")
        if not isinstance(v, pw.WalkVariant):
            print(f"rot {ri}: non-walk plan ({type(v).__name__}), skipped",
                  flush=True)
            continue
        run = pw._oneshot_runner(pw.canonical_walk_variant(v), v.ps, v.po,
                                 0.0, False)
        permute = pw._permuter(v.ps, v.po, v.xpad, v.kax)
        y_lo = jnp.int32(v.y_lo)

        def fused(vol, mat, _r=run, _p=permute, _y=y_lo):
            return _r(vol, _p(mat, _y))

        t = slope_time(fused, vol_dev, jnp.asarray(mats[ri], jnp.float32))
        times.append(t)
        print(f"rot {ri:2d}: fused chain {t:6.2f} ms (hz={v.hz} "
              f"ndx={len(v.dxs)} hy={v.hy})", flush=True)
    arr = np.asarray(times)
    print(f"\nsticky one-shot fused chain over {len(arr)} rotations: "
          f"mean {arr.mean():.2f} ms, worst {arr.max():.2f} ms", flush=True)
    print(f"canonical binaries: {len(pw.known_canonicals())}; "
          f"fused programs: {len(pw._ONESHOT_RUNNERS)}", flush=True)

    # steady-state host planning: 16 FRESH matrices against the warm set
    t0 = time.perf_counter()
    for m in mats[16:32]:
        choose_plan(m, (size,) * 3, "linear", "constant")
    t1 = time.perf_counter()
    print(f"steady-state planning (fresh matrix, warm canonicals): "
          f"{(t1 - t0) / 16 * 1e3:.2f} ms/matrix", flush=True)


if __name__ == "__main__":
    main()
