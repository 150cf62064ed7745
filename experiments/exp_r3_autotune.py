"""Round-3 probe: best-of-K autotune gains on the headline workload.

For each requested bench rotation (same seed-0 'sxyz' stream as bench.py)
enumerate the top-K structurally-diverse walk configs (tight mode), slope-
measure each on device, and report the gain of measured-best over the
model's single pick.

Usage: python -u experiments/exp_r3_autotune.py [k] [rot_idx ...]
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

    from voltools_tpu.kernels import pallas_walk as _pwmod
    _pwmod._FAST_CHOOSER = False   # deterministic numpy planning (matches
    #                                bench.py; the jitted core can flip
    #                                model-equal ties run-to-run)

    from voltools_tpu.kernels import pallas_walk as pw
    from voltools_tpu.kernels.planner import (plan_prepare,
                                              plan_sample_prepared)
    from voltools_tpu.utils import transform_matrix

    argv = sys.argv[1:]
    k = int(argv[0]) if argv else 3
    idxs = [int(a) for a in argv[1:]] or [3, 12]
    # round-5: EXP_INTERP=filt_bspline probes the cubic slow class (the
    # ndx>=6 / ycand=3 rotations run 0.84-0.88x of model vs 0.72-0.76x for
    # the rest -- a pressure knee the model's ndx^1.5 misses, so the
    # chooser may be mis-ranking exactly there)
    import os
    interp = os.environ.get("EXP_INTERP", "linear")

    size = 250
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((size,) * 3, dtype=np.float64)
                      .astype(np.float32))
    center = (size / 2,) * 3
    mats = []
    for i in range(16):
        ang = rng.uniform(-180, 180, 3)
        mats.append(np.asarray(transform_matrix(
            rotation=tuple(ang), rotation_order="sxyz", center=center),
            np.float32))

    def slope_ms(plan, m, iters=8):
        prep = plan_prepare(vol, plan)

        @jax.jit
        def chained(n, p, mat):
            def body(_, carry):
                mm, acc = carry
                out = plan_sample_prepared(p, mm, plan, 0.0)
                probe = out[0, 0, 0] * jnp.float32(1e-38)
                return mm + probe, acc + probe
            mm, acc = jax.lax.fori_loop(0, n, body,
                                        (mat, jnp.float32(0.0)))
            return mm[0, 0] + acc

        mj = jnp.asarray(m)
        t0 = time.perf_counter()
        float(chained(1, prep, mj))
        print(f"    compile+first run {time.perf_counter() - t0:.0f}s",
              flush=True)
        float(chained(iters, prep, mj))

        def run(n):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(chained(n, prep, mj))
                best = min(best, time.perf_counter() - t0)
            return best

        return (run(iters) - run(1)) / (iters - 1) * 1e3

    gains = []
    for i in idxs:
        m = mats[i]
        cands = pw.choose_walk_variant(m, (size,) * 3, interp, "constant",
                                       topk=k, quantize=False)
        res = []
        for v in cands:
            ms = slope_ms(v, m)
            res.append(ms)
            print(f"rot {i}: {v.ps} {v.po} ({v.vb},{v.wb}) ({v.gu},{v.gv}) "
                  f"kax={v.kax} hz={v.hz} hy={v.hy} ndx={len(v.dxs)} "
                  f"model={pw._variant_cost(v) / 1e6:.2f}ms "
                  f"measured={ms:.2f}ms", flush=True)
        gains.append(res[0] / min(res))
        print(f"rot {i}: model-pick {res[0]:.2f} ms, best-of-{len(res)} "
              f"{min(res):.2f} ms ({(res[0] / min(res) - 1) * 100:.0f}% "
              f"gain)", flush=True)
    print(f"mean gain over model pick: {(np.mean(gains) - 1) * 100:.1f}%",
          flush=True)


if __name__ == "__main__":
    main()
