"""Round-3 probe: band-following strip windows vs classic windows (cubic).

The cost model assumes window DMA overlaps compute (max + 0.25*min); the
round-2 DMA ablations suggested cubic is up to ~40% window-DMA-bound.  If
real overlap is worse than modeled, strips (which cut window bytes by
dropping the kappa*(w0+1) sweep from the window height) win on hardware
even though the model never picks them.  This measures both for the same
rotations at 250^3.

Usage: python -u experiments/exp_r3_strips.py [interp] [rot_idx ...]
"""

import dataclasses
import math
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def stripify(v, m, pw, adjusted):
    a = adjusted(np.asarray(m, np.float64), v.ps, v.po)
    g = pw._geometry(a, v.order, v.vb, v.wb, v.kax)
    if g is None:
        return None
    hz, hy_raw, y_lo, (sl, shi), kappa = g
    E = (8.0 * v.gu - 1.0, v.vb * v.gv - 1.0, v.wb - 1.0)
    res = [abs(a[1, i] - kappa * a[0, i]) for i in range(3)]
    cs = pw._STRIP_CS
    w0 = min(-cs * (-v.w0 // cs), v.d[0])
    if w0 % cs:
        return None
    need = (int(math.ceil(sum(res[i] * E[i] for i in range(3))
                          + abs(kappa) * (cs + 1))) + 3 + v.hy)
    sh = min(-8 * (-need // 8), v.d[1])
    return dataclasses.replace(v, cs=cs, sh=sh, w1=sh, w0=w0)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/voltools_tpu_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from voltools_tpu.kernels import pallas_walk as pw
    from voltools_tpu.kernels.pallas_affine import _adjusted_matrix
    from voltools_tpu.kernels.planner import (plan_prepare,
                                              plan_sample_prepared)
    from voltools_tpu.utils import transform_matrix

    argv = sys.argv[1:]
    interp = argv[0] if argv else "bspline"
    idxs = [int(a) for a in argv[1:]] or [2, 0]

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
        print(f"    compile+first {time.perf_counter() - t0:.0f}s",
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

    for i in idxs:
        m = mats[i]
        vw = pw.choose_walk_variant(m, (size,) * 3, interp, "constant",
                                    sticky=None, quantize=False)
        if vw is None or vw.cs or vw.whole:
            print(f"rot {i}: pick is not a classic window, skip")
            continue
        vs = stripify(vw, m, pw, _adjusted_matrix)
        if vs is None or not pw.walk_variant_covers(vs, m, (size,) * 3,
                                                    interp, "constant"):
            print(f"rot {i}: no covering strip variant")
            continue
        t_w = slope_ms(vw, m)
        print(f"rot {i} window: w1={vw.w1} {t_w:.2f} ms", flush=True)
        t_s = slope_ms(vs, m)
        print(f"rot {i} strips: sh={vs.sh} nch={vs.nch} {t_s:.2f} ms "
              f"({(t_w / t_s - 1) * 100:+.0f}% vs window)", flush=True)


if __name__ == "__main__":
    main()
