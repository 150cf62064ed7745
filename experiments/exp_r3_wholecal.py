"""Calibrate the whole-resident walk cost model from hardware.

The round-3 cost model (per-vreg-plane = 2.16*ycand*ndx^1.5*tapf*nbw ns)
was fitted at 250^3 where nbw is 2-3; at small sizes (nbw=1) it
underestimates ~2x, so the chooser picks configs that measure slower than
alternatives.  This probe measures the CHOSEN plan for many random
rotations at small sizes, records (hz, ycand, ndx, nbw, npad, total_us),
and least-squares fits

    total_ns = npad * (hz*(A*ycand*ndx^1.5*tapf*nbw + B*ycand + C) + D)

i.e. a per-plane constant floor (B*ycand + C: the dynamic row slices and
weight folds that do not scale with nbw) and a per-vreg overhead D.

Usage: python -u experiments/exp_r3_wholecal.py [n_rot] [size ...]
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
    from voltools_tpu.utils import transform_matrix

    argv = sys.argv[1:]
    n_rot = int(argv[0]) if argv else 12
    sizes = [int(a) for a in argv[1:]] or [50, 100]

    rows = []
    for size in sizes:
        iters = max(16, int(2 ** np.ceil(np.log2(4e5 / size ** 2))))
        rng = np.random.default_rng(0)
        vol = jnp.asarray(rng.random((size,) * 3, dtype=np.float64)
                          .astype(np.float32))
        center = (size / 2,) * 3
        for i in range(n_rot):
            ang = rng.uniform(-180, 180, 3)
            m = transform_matrix(rotation=tuple(ang), rotation_order="sxyz",
                                 center=center)
            minv = np.asarray(m, np.float32)
            v = pw.choose_walk_variant(minv, vol.shape, "linear", "constant")
            if v is None:
                continue
            prep = pw.prepare_walk_volume(vol, v)
            mj = jnp.asarray(minv)

            @jax.jit
            def chained(n, p, mat, _v=v):
                def body(_, carry):
                    mm, acc = carry
                    out = pw.walk_sample_prepared(p, mm, _v, 0.0)
                    probe = out[0, 0, 0] * jnp.float32(1e-38)
                    return mm + probe, acc + probe
                mm, acc = jax.lax.fori_loop(0, n, body,
                                            (mat, jnp.float32(0.0)))
                return mm[0, 0] + acc

            float(chained(1, prep, mj))
            float(chained(iters, prep, mj))

            def run(n):
                best = float("inf")
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(chained(n, prep, mj))
                    best = min(best, time.perf_counter() - t0)
                return best

            us = (run(iters) - run(1)) / (iters - 1) * 1e6
            U, V, W = v.out_d
            npad = (-(-U // (8 * v.gu)) * v.gu
                    * -(-V // (v.vb * v.gv)) * v.gv * -(-W // v.wb))
            ndx = len(v.dxs)
            tapf = 1.0 if v.order == 1 else 1.11
            dma_ns = v.w0 * v.w1 * v.xw * 4.0 / 750.0 if v.whole else 0.0
            rows.append((size, i, us, npad, v.hz, v.ycand, ndx, v.nbw,
                         tapf, v.whole, dma_ns))
            print(f"{size:>4} {i:>3} {us:>8.1f} us npad={npad} hz={v.hz} "
                  f"ycand={v.ycand} ndx={ndx} nbw={v.nbw} whole={v.whole}",
                  flush=True)

    # fit total_ns - dma = npad*(hz*(A*yc*ndx^1.5*tapf*nbw + B*yc + C) + D)
    rows_f = [r for r in rows if r[9]]          # whole-mode rows only
    if len(rows_f) >= 6:
        y = np.array([r[2] * 1e3 - r[10] for r in rows_f])
        X = np.array([[r[3] * r[4] * r[5] * r[6] ** 1.5 * r[8] * r[7],
                       r[3] * r[4] * r[5],
                       r[3] * r[4],
                       r[3]] for r in rows_f], dtype=np.float64)
        coef, res, *_ = np.linalg.lstsq(X, y, rcond=None)
        pred = X @ coef
        err = (pred - y) / y
        print(f"fit A={coef[0]:.2f} B={coef[1]:.2f} C={coef[2]:.2f} "
              f"D={coef[3]:.1f}  relerr mean {np.abs(err).mean():.2%} "
              f"max {np.abs(err).max():.2%}")
        # compare against the current model (A=2.16, B=C=0, D=30)
        pred0 = X @ np.array([2.16, 0.0, 0.0, 30.0])
        err0 = (pred0 - y) / y
        print(f"current model relerr mean {np.abs(err0).mean():.2%} "
              f"max {np.abs(err0).max():.2%}")


if __name__ == "__main__":
    main()
