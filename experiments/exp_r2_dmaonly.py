"""Probe: time a DMA-only version of the window kernel (no interpolation
compute) to split the fori tier's cost into DMA vs compute, plus a bandwidth
microbenchmark of box-copy shapes (chunk size effects)."""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from experiments.exp_r2_profile import slope_time  # noqa: E402


def dma_only_variant(v, vol, mat):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d0, d1, d2 = v.d
    w0, w1 = v.w0, v.w1
    nb = v.nb
    depth = 4

    def kernel(mat_ref, vol_hbm, out_ref, win_ref, sem):
        g = pl.program_id(0)
        si = pl.program_id(1)
        li = pl.program_id(2)
        ns = pl.num_programs(1)
        nl = pl.num_programs(2)
        ng = pl.num_programs(0)
        a = mat_ref

        def origin(r, wr, dr, gp, sb, lb):
            base = a[r, 0] * gp + a[r, 1] * sb + a[r, 2] * lb + a[r, 3]
            lo = (base + jnp.minimum(a[r, 1] * 7.0, 0.0)
                  + jnp.minimum(a[r, 2] * 127.0, 0.0))
            o = jnp.floor(lo).astype(jnp.int32) - 1
            return jnp.clip(o, 0, dr - wr)

        def origins(gp, sb, lb):
            return (origin(0, w0, d0, gp, sb, lb),
                    origin(1, w1, d1, gp, sb, lb))

        def start_window_dma(slot, oo0, oo1):
            for b in range(nb):
                pltpu.make_async_copy(
                    vol_hbm.at[pl.ds(oo0, w0), pl.ds(oo1, w1), b],
                    win_ref.at[slot, b], sem.at[slot, b]).start()

        step = (g * ns + si) * nl + li
        total = ng * ns * nl
        slot = jax.lax.rem(step, depth)

        def step_origins(t):
            gg = t // (ns * nl)
            rest = t - gg * (ns * nl)
            ss = rest // nl
            ll = rest - ss * nl
            return origins(gg.astype(jnp.float32),
                           (ss * 8).astype(jnp.float32),
                           (ll * 128).astype(jnp.float32))

        o0, o1 = origins(g.astype(jnp.float32), (si * 8).astype(jnp.float32),
                         (li * 128).astype(jnp.float32))

        @pl.when(step == 0)
        def _():
            start_window_dma(0, o0, o1)
            for j in range(1, depth - 1):
                t = jnp.int32(j)

                @pl.when(t < total)
                def _(t=t, j=j):
                    oo0, oo1 = step_origins(t)
                    start_window_dma(j, oo0, oo1)

        @pl.when(step + depth - 1 < total)
        def _():
            t = step + depth - 1
            oo0, oo1 = step_origins(t)
            start_window_dma(jax.lax.rem(t, depth), oo0, oo1)

        for b in range(nb):
            pltpu.make_async_copy(
                vol_hbm.at[pl.ds(o0, w0), pl.ds(o1, w1), b],
                win_ref.at[slot, b], sem.at[slot, b]).wait()
        # touch the window so the DMA can't be elided
        touch = win_ref[slot, 0, 0, 0:1, :] + mat_ref[0, 0]
        out_ref[0, :, :] = jnp.broadcast_to(touch, (8, 128))

    vol_p = jnp.transpose(vol, v.ps)
    if v.dx_pad > v.d[2]:
        vol_p = jnp.pad(vol_p, ((0, 0), (0, 0), (0, v.dx_pad - v.d[2])))
    vol_p = vol_p.reshape(v.d[0], v.d[1], v.nb, 128)
    m = jnp.asarray(mat, jnp.float32)
    rows = jnp.stack([m[v.ps[k]] for k in range(3)])
    cols = jnp.stack([rows[:, v.po[j]] for j in range(3)] + [rows[:, 3]],
                     axis=1)
    og, os_, ol = v.out_d
    os_pad = ((os_ + 7) // 8) * 8
    ol_pad = ((ol + 127) // 128) * 128
    grid = (og, os_pad // 8, ol_pad // 128)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda g, s, l: (g, s, l),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((og, os_pad, ol_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((depth, v.nb, v.w0, v.w1, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((depth, v.nb))],
    )(cols, vol_p)
    out = out[:, :os_, :ol]
    return jnp.transpose(out, tuple(np.argsort(v.po)))


def main():
    import jax
    import jax.numpy as jnp

    from voltools_tpu.kernels import pallas_affine as pa
    from voltools_tpu.utils import transform_matrix

    size = 250
    rng = np.random.default_rng(1)
    vol = jnp.asarray(rng.random((size,) * 3).astype(np.float32))
    center = (size / 2,) * 3

    # case [0] from the profile run: 245ms full, 21.6GB traffic
    ang = rng.uniform(-180, 180, (4, 3))[0]
    m = transform_matrix(rotation=tuple(ang), rotation_order="sxyz",
                         center=center)
    v = pa.choose_variant(m, vol.shape, "linear")
    mj = jnp.asarray(m, jnp.float32)
    t_dma = slope_time(lambda vv, mm: dma_only_variant(v, vv, mm),
                       vol, mj, iters=8)
    ntiles = v.out_d[0] * ((v.out_d[1] + 7) // 8) * ((v.out_d[2] + 127) // 128)
    gb = ntiles * v.nb * v.w0 * v.w1 * 128 * 4 / 1e9
    print(f"dma-only: {t_dma:.1f}ms for {gb:.1f}GB -> {gb/t_dma*1e3:.0f}GB/s "
          f"(full kernel was ~245ms)")

    # axis-dominant case: single-axis 60 deg rotation (the bench.py workload)
    m2 = transform_matrix(rotation=(60.0, 0.0, 0.0), rotation_order="rzxz",
                          center=((size - 1) / 2,) * 3)
    v2 = pa.choose_variant(m2, vol.shape, "linear")
    mj2 = jnp.asarray(m2, jnp.float32)
    t2 = slope_time(lambda vv, mm: dma_only_variant(v2, vv, mm),
                    vol, mj2, iters=16)
    gb2 = ntiles * v2.nb * v2.w0 * v2.w1 * 128 * 4 / 1e9
    print(f"axis-dominant w=({v2.w0},{v2.w1}) dma-only: {t2:.1f}ms for "
          f"{gb2:.2f}GB -> {gb2/t2*1e3:.0f}GB/s (full was ~7.7ms)")


if __name__ == "__main__":
    main()
