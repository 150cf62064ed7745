"""Round-5 probe (VERDICT r4 #3): best-of-K autotune gains at 50^3/100^3.

The 50^3/100^3 random-single-rotation regime is the one class still losing
to the reference's texture unit (0.5-0.7x).  The remaining non-structural
lever is the cost model's error band: enumerate the top-K structurally
diverse walk configs per rotation (tight mode), slope-measure each on
device, and report measured-best vs the model's single pick.  If the gain
is sub-noise, the band is tight and autotune-by-default would only buy
extra compiles; if it's real, StaticVolume(autotune=K) should become the
default in this regime.

Usage: python -u experiments/exp_r5_autotune_small.py [k] [n_rot]
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
    n_rot = int(argv[1]) if len(argv) > 1 else 6
    import os
    interp = os.environ.get("EXP_INTERP", "linear")

    for size in (50, 100):
        rng = np.random.default_rng(0)   # same stream as exp_r3_small /
        vol = jnp.asarray(rng.random((size,) * 3).astype(np.float32))
        center = (size / 2,) * 3

        def slope_us(plan, m, iters=24):
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
            float(chained(1, prep, mj))
            float(chained(iters, prep, mj))

            def run(n):
                best = float("inf")
                for _ in range(5):
                    t0 = time.perf_counter()
                    float(chained(n, prep, mj))
                    best = min(best, time.perf_counter() - t0)
                return best

            return (run(iters) - run(1)) / (iters - 1) * 1e6

        gains = []
        for i in range(n_rot):
            ang = rng.uniform(-180, 180, 3)
            m = np.asarray(transform_matrix(
                rotation=tuple(ang), rotation_order="sxyz", center=center),
                np.float32)
            cands = pw.choose_walk_variant(m, (size,) * 3, interp,
                                           "constant", topk=k,
                                           quantize=False)
            if not isinstance(cands, list):
                cands = [cands]
            res = []
            for v in cands:
                us = slope_us(v, m)
                res.append(us)
                print(f"{size}^3 rot {i}: {v.ps} {v.po} ({v.vb},{v.wb}) "
                      f"({v.gu},{v.gv}) whole={v.whole} hz={v.hz} "
                      f"model={pw._variant_cost(v) / 1e3:.1f}us "
                      f"measured={us:.1f}us", flush=True)
            gains.append(res[0] / min(res))
            print(f"{size}^3 rot {i}: model-pick {res[0]:.1f} us, "
                  f"best-of-{len(res)} {min(res):.1f} us "
                  f"({(gains[-1] - 1) * 100:.0f}% gain)", flush=True)
        print(f"{size}^3 mean gain over model pick: "
              f"{(np.mean(gains) - 1) * 100:.1f}%", flush=True)


if __name__ == "__main__":
    main()
