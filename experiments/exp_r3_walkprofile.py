"""Round-3 probe: split the plane-walk kernel's time into DMA vs compute.

For each rotation at 250^3 (interpolation from argv[2]; round-5 reuses this
for the cubic-DMA question, VERDICT r4 #4):
  - full: the real walk kernel, slope-timed (tight per-matrix plan)
  - dma:  a stripped kernel issuing the SAME window DMAs (same windows,
    macro grid, pipeline depth) with trivial compute
  - hz/2: the real kernel with the walk halved (wrong results, right
    timing) -> d(time)/d(plane) isolates the per-plane compute cost

With the 2-deep pipeline, full ~= max(dma, compute) + fixed, so comparing
the three tells which side is binding per rotation.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def slope_time(fn, vol, mat, iters=8):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(n, v, m):
        # n is traced (dynamic fori trip count): ONE compile serves both
        # slope points (a static n would recompile the Mosaic kernel per
        # point through the enclosing jit)
        def body(_, carry):
            mm, acc = carry
            out = fn(v, mm)
            probe = out.ravel()[0] * jnp.float32(1e-38)
            return mm + probe, acc + probe
        mm, acc = jax.lax.fori_loop(0, n, body, (m, jnp.float32(0.0)))
        return mm[0, 0] + acc

    float(chained(1, vol, mat))
    float(chained(iters, vol, mat))

    def run(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(n, vol, mat))
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(iters) - run(1)) / (iters - 1) * 1e3


def dma_only_walk(v, cval=0.0):
    """A walk-kernel twin that does the window DMAs and nothing else."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from voltools_tpu.kernels.pallas_walk import _PIPELINE_DEPTH, _MatView

    d0, d1, d2 = v.d
    w0, w1 = v.w0, v.w1
    vb, wb = v.vb, v.wb
    gu, gv = v.gu, v.gv
    nbw, xg = v.nbw, v.xg
    dyn_x = v.dyn_x
    ncopies = v.ncopies
    hz = v.hz
    depth = _PIPELINE_DEPTH

    def kernel(mat_ref, vol_hbm, out_ref, win_ref, sem):
        ui, vi, wi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
        nu, nv, nw = (pl.num_programs(0), pl.num_programs(1),
                      pl.num_programs(2))
        a = _MatView(mat_ref)
        zoff = v.taps[0] - 2

        def zorg_of(am, ub, vbase, wbase):
            zc = (am[0, 0] * ub + am[0, 1] * vbase + am[0, 2] * wbase
                  + am[0, 3])
            zlo = (zc + jnp.minimum(am[0, 0] * 7.0, 0.0)
                   + jnp.minimum(am[0, 1] * (vb - 1.0), 0.0)
                   + jnp.minimum(am[0, 2] * (wb - 1.0), 0.0))
            zorg = jnp.floor(zlo).astype(jnp.int32) + zoff
            return jnp.clip(zorg, 0, d0 - hz), zc

        def yb_of(am, ub, vbase, wbase, zk):
            zc = (am[0, 0] * ub + am[0, 1] * vbase + am[0, 2] * wbase
                  + am[0, 3])
            yc = (am[1, 0] * ub + am[1, 1] * vbase + am[1, 2] * wbase
                  + am[1, 3])
            y_line = yc + am[3, 0] * (zk.astype(jnp.float32) - zc)
            return (jnp.floor(y_line).astype(jnp.int32)
                    + am[3, 1].astype(jnp.int32))

        def origins(am, ubt, vbt, wbt):
            o0 = None
            o1 = None
            for cu in (0.0, float(8 * (gu - 1))):
                for cv in (0.0, float(vb * (gv - 1))):
                    zorg_c, _ = zorg_of(am, ubt + cu, vbt + cv, wbt)
                    o0 = zorg_c if o0 is None else jnp.minimum(o0, zorg_c)
                    for endk in (0, hz - 1):
                        yb = yb_of(am, ubt + cu, vbt + cv, wbt,
                                   zorg_c + endk)
                        o1 = yb if o1 is None else jnp.minimum(o1, yb)
            o0 = jnp.clip(o0, 0, d0 - w0)
            o1 = jnp.clip(o1, 0, d1 - w1)
            if not dyn_x:
                return o0, o1, jnp.int32(0)
            xlo = (am[2, 0] * ubt + am[2, 1] * vbt + am[2, 2] * wbt
                   + am[2, 3]
                   + jnp.minimum(am[2, 0] * (8.0 * gu - 1.0), 0.0)
                   + jnp.minimum(am[2, 1] * (vb * gv - 1.0), 0.0)
                   + jnp.minimum(am[2, 2] * (wb - 1.0), 0.0))
            margin = v.dxs[0] - 2
            xlo_i = jnp.floor(xlo).astype(jnp.int32) + jnp.int32(margin)
            tx = jnp.clip(xlo_i, 0, d2 - 1) // xg
            tmax = (d2 - 1) // xg
            return o0, o1, jnp.clip(tx, 0, tmax)

        def start_window_dma(slot, oo0, oo1, tt):
            if dyn_x:
                ci, b0 = tt % ncopies, tt // ncopies
            else:
                ci, b0 = jnp.int32(0), jnp.int32(0)
            for j in range(nbw):
                src = vol_hbm.at[ci, pl.ds(oo0, w0), pl.ds(oo1, w1), b0 + j]
                pltpu.make_async_copy(src, win_ref.at[slot, j],
                                      sem.at[slot, j]).start()

        step = (ui * nv + vi) * nw + wi
        total = nu * nv * nw
        slot = jax.lax.rem(step, depth)

        def step_state(t):
            uu = t // (nv * nw)
            rest = t - uu * (nv * nw)
            vv = rest // nw
            ww = rest - vv * nw
            return a, ((uu * (8 * gu)).astype(jnp.float32),
                       (vv * (vb * gv)).astype(jnp.float32),
                       (ww * wb).astype(jnp.float32))

        ubt = (ui * (8 * gu)).astype(jnp.float32)
        vbt = (vi * (vb * gv)).astype(jnp.float32)
        wbt = (wi * wb).astype(jnp.float32)
        o0, o1, tx = origins(a, ubt, vbt, wbt)

        @pl.when(step == 0)
        def _():
            start_window_dma(0, o0, o1, tx)
            for j in range(1, depth - 1):
                t = jnp.int32(j)

                @pl.when(t < total)
                def _(t=t, j=j):
                    am, bb = step_state(t)
                    start_window_dma(j, *origins(am, *bb))

        @pl.when(step + depth - 1 < total)
        def _():
            t = step + depth - 1
            am, bb = step_state(t)
            start_window_dma(jax.lax.rem(t, depth), *origins(am, *bb))

        if dyn_x:
            ci_w, b0_w = tx % ncopies, tx // ncopies
        else:
            ci_w, b0_w = jnp.int32(0), jnp.int32(0)
        for j in range(nbw):
            src = vol_hbm.at[ci_w, pl.ds(o0, w0), pl.ds(o1, w1), b0_w + j]
            pltpu.make_async_copy(src, win_ref.at[slot, j],
                                  sem.at[slot, j]).wait()
        touch = win_ref[slot, 0, 0, 0:8, :] + a[0, 0]
        for igv in range(gv):
            out_ref[igv, 0, pl.ds(0, 8 * gu)] = jnp.broadcast_to(
                touch[0:1], (8 * gu, 128))

    U, V, W = v.out_d
    U_pad = -(8 * gu) * (-U // (8 * gu))
    V_pad = -(vb * gv) * (-V // (vb * gv))
    W_pad = -wb * (-W // wb)
    grid = (U_pad // (8 * gu), V_pad // (vb * gv), W_pad // wb)
    out_shape = (V_pad // vb, W_pad // wb, U_pad, 128)
    block = (gv, 1, 8 * gu, 128)

    def run(vol_s, cols):
        import jax
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(block, lambda u, vv, w: (vv, w, u, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            scratch_shapes=[pltpu.VMEM((depth, nbw, w0, w1, 128),
                                       jnp.float32),
                            pltpu.SemaphoreType.DMA((depth, nbw))],
        )(cols, vol_s)

    return run


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from voltools_tpu.kernels.pallas_walk import (
        _walk_runner, canonical_walk_variant, choose_walk_variant,
        permute_matrix, prepare_walk_volume)
    from voltools_tpu.utils import transform_matrix

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/voltools_tpu_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from voltools_tpu.kernels import pallas_walk as _pwmod
    _pwmod._FAST_CHOOSER = False   # deterministic numpy planning (matches
    #                                bench.py; the jitted core can flip
    #                                model-equal ties run-to-run)

    size = 250
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((size,) * 3, dtype=np.float64)
                      .astype(np.float32))
    center = (size / 2,) * 3
    n_rot = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    interp = sys.argv[2] if len(sys.argv) > 2 else "linear"
    if interp.startswith("filt_bspline"):
        from voltools_tpu.ops.prefilter import bspline_prefilter
        vol = jax.jit(bspline_prefilter)(vol)  # kernels sample coefficients

    print(f"{'rot':>3} {'hz':>3} {'winMB':>6} {'trafGB':>6} "
          f"{'full':>6} {'dma':>6} {'hz/2':>6} {'perplane':>8} {'GB/s':>5}")
    for i in range(n_rot):
        ang = rng.uniform(-180, 180, 3)
        m = transform_matrix(rotation=tuple(ang), rotation_order="sxyz",
                             center=center)
        v = choose_walk_variant(m, (size,) * 3, interp, "constant",
                                sticky=None)
        if v is None:
            print(f"{i:>3} NONE")
            continue
        prep = prepare_walk_volume(vol, v)
        cols = permute_matrix(m, v)
        vc = canonical_walk_variant(v)

        def full_fn(p, c, _vc=vc, _v=v):
            return _walk_runner(_vc, 0.0, False)(p, c)

        t_full = slope_time(full_fn, prep, cols)

        run_dma = dma_only_walk(v)
        t_dma = slope_time(run_dma, prep, cols)

        v_half = dataclasses.replace(vc, hz=max(4, vc.hz // 2))

        def half_fn(p, c, _vc=v_half):
            return _walk_runner(_vc, 0.0, False)(p, c)

        t_half = slope_time(half_fn, prep, cols)
        dplanes = vc.hz - v_half.hz
        per_plane = (t_full - t_half) / max(dplanes, 1) * 1e3  # us/plane

        U, V, W = v.out_d
        nwin = ((-(-U // (8 * v.gu))) * (-(-V // (v.vb * v.gv)))
                * (-(-W // v.wb)))
        win_mb = v.nbw * v.w0 * v.w1 * 128 * 4 / 1e6
        traf = nwin * win_mb / 1e3
        print(f"{i:>3} {v.hz:>3} {win_mb:>6.2f} {traf:>6.2f} "
              f"{t_full:>6.2f} {t_dma:>6.2f} {t_half:>6.2f} "
              f"{per_plane:>8.1f} {traf / t_dma * 1e3:>5.0f}")


if __name__ == "__main__":
    main()
