"""Round-3 probe: small/mid-size random-rotation cost (VERDICT #4).

Measures the full resident-volume sampler path (walk kernel + un-blocking,
compile excluded) at 25/50/100^3 over many random 'sxyz' rotations --
the reference's static_vol_out workload at the sizes where its texture
unit posts 0.057/0.092/0.40 ms.  Small kernels need long chains for slope
resolution: iters scales inversely with volume.

Usage: python -u experiments/exp_r3_small.py [n_rot] [size ...] [--sticky] [--cubic]

``--sticky`` uses the production sticky planner (compiled-binary reuse via
canonical matching, ~8-11 compiles per 100 rotations instead of 100) --
the steady-state cost a real sweep pays, cheap enough for n_rot=100.
Default is tight per-matrix plans (one compile each), matching the
baseline's one-kernel-per-configuration setup.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/voltools_tpu_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from voltools_tpu.kernels.planner import (choose_plan, plan_prepare,
                                              plan_sample_prepared)
    from voltools_tpu.utils import transform_matrix

    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    sticky = 3.0 if "--sticky" in sys.argv else None
    interp = "filt_bspline" if "--cubic" in sys.argv else "linear"
    n_rot = int(argv[0]) if argv else 100
    sizes = [int(a) for a in argv[1:]] or [25, 50, 100]

    for size in sizes:
        iters = max(16, int(2 ** np.ceil(np.log2(4e5 / size ** 2))))
        rng = np.random.default_rng(0)
        vol = jnp.asarray(rng.random((size,) * 3, dtype=np.float64)
                          .astype(np.float32))
        if interp != "linear":
            from voltools_tpu.ops.prefilter import bspline_prefilter
            vol = jax.jit(bspline_prefilter)(vol)
        center = (size / 2,) * 3
        times, kinds = [], {}
        for i in range(n_rot):
            ang = rng.uniform(-180, 180, 3)
            m = transform_matrix(rotation=tuple(ang), rotation_order="sxyz",
                                 center=center)
            plan = choose_plan(m, vol.shape, interp, "constant",
                               sticky=sticky)
            if plan is None:
                print(f"{size:>4} {i:>3} XLA-fallback", flush=True)
                continue
            prep = plan_prepare(vol, plan)

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
            float(chained(1, prep, mj))
            float(chained(iters, prep, mj))

            def run(n):
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(chained(n, prep, mj))
                    best = min(best, time.perf_counter() - t0)
                return best

            ms = (run(iters) - run(1)) / (iters - 1) * 1e3
            times.append(ms)
            kind = type(plan).__name__
            kinds[kind] = kinds.get(kind, 0) + 1
            if i < 12 or ms > 2 * np.mean(times):
                print(f"{size:>4} {i:>3} {ms * 1e3:>8.1f} us ({kind})",
                      flush=True)
        print(f"size {size}: n={len(times)} iters={iters} "
              f"mean {np.mean(times) * 1e3:.1f} us  "
              f"median {np.median(times) * 1e3:.1f}  "
              f"worst {max(times) * 1e3:.1f}  kinds={kinds}", flush=True)
        print(f"size {size} per-rotation us: "
              + " ".join(f"{t * 1e3:.0f}" for t in times), flush=True)


if __name__ == "__main__":
    main()
