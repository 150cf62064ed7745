"""Round-5 probe (VERDICT r4 #4): cubic window-DMA lever, fair re-test.

The round-3 strips probe (exp_r3_strips) kept the CLASSIC pick's macro
tiling and only swapped the window for band-following strips — but strips'
whole point is the freed VMEM: smaller windows admit bigger macro tiles,
which amortize DMA issue overhead AND cut per-vreg window redundancy.
This probe lets the chooser re-search the full (packing x macro) space
with strips enabled (``_CHOOSER_STRIPS=True``, topk) and slope-measures
the top strip candidates against the classic pick for the same bench
rotations, at several chunk sizes.

If no strip config beats classic even with the macro re-search, the
cubic-DMA lever is closed for real (the model's verdict: cubic is
compute-bound, window DMA ~10x below the gather work at 250^3).

Usage: python -u experiments/exp_r5_cubic_strips.py [rot_idx ...]
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

    from voltools_tpu.kernels import pallas_walk as pw
    from voltools_tpu.kernels.planner import (plan_prepare,
                                              plan_sample_prepared)
    from voltools_tpu.ops.prefilter import bspline_prefilter
    from voltools_tpu.utils import transform_matrix

    pw._FAST_CHOOSER = False   # deterministic numpy planning

    idxs = [int(a) for a in sys.argv[1:]] or [0, 2, 3, 12]

    size = 250
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((size,) * 3, dtype=np.float64)
                      .astype(np.float32))
    vol = jax.jit(bspline_prefilter)(vol)   # kernel samples coefficients
    center = (size / 2,) * 3
    rot_rng = np.random.default_rng(0)
    rot_rng.random((size,) * 3, dtype=np.float64)  # align the bench stream
    rots = [rot_rng.uniform(-180, 180, 3) for _ in range(16)]

    def slope_ms(plan, m, iters=8):
        prep = plan_prepare(vol, plan)

        @jax.jit
        def chained(n, p, mat):
            def body(_, carry):
                mm, acc = carry
                out = plan_sample_prepared(p, mm, plan, 0.0)
                probe = out[0, 0, 0] * jnp.float32(1e-38)
                return mm + probe, acc + probe
            mm, acc = jax.lax.fori_loop(0, n, body, (mat, jnp.float32(0.0)))
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

        return (run(iters) - run(1)) / (iters - 1) * 1e3

    for i in idxs:
        m = np.asarray(transform_matrix(
            rotation=tuple(rots[i]), rotation_order="sxyz", center=center),
            np.float64)
        classic = pw.choose_walk_variant(m, (size,) * 3, "filt_bspline",
                                         "constant", quantize=False,
                                         sticky=1.0)
        t_classic = slope_ms(classic, m)
        print(f"rot {i}: classic macro=({classic.gu},{classic.gv}) "
              f"w0={classic.w0} w1={classic.w1} hz={classic.hz} "
              f"ndx={len(classic.dxs)}: {t_classic:.2f} ms", flush=True)

        for cs in (4, 8, 16):
            pw._CHOOSER_STRIPS = True
            pw._STRIP_CS = cs
            try:
                cands = pw.choose_walk_variant(m, (size,) * 3,
                                               "filt_bspline", "constant",
                                               quantize=False, topk=6)
            finally:
                pw._CHOOSER_STRIPS = False
                pw._STRIP_CS = 8
            strips = [v for v in cands if v.cs][:2]
            if not strips:
                print(f"  cs={cs}: no strip candidate in top-6 "
                      f"(model never ranks strips near optimum)",
                      flush=True)
            for v in strips:
                t = slope_ms(v, m)
                print(f"  cs={cs}: strips macro=({v.gu},{v.gv}) w0={v.w0} "
                      f"sh={v.sh} nch={v.nch}: {t:.2f} ms "
                      f"({t / t_classic:.2f}x classic)", flush=True)


if __name__ == "__main__":
    main()
