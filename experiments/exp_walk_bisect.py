"""Bisect the walk kernel's TPU failure with minimal kernels."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

STAGE = int(sys.argv[1]) if len(sys.argv) > 1 else 1


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d0 = d1 = 64
    nb = 1
    w0, w1 = 24, 24
    hz, hy = 16, 16
    G = 4

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((d0, d1, nb, 128)).astype(np.float32))
    mat = jnp.asarray(np.array([[0.5, 0.1, 0.2, 3.0],
                                [0.1, 0.9, 0.1, 2.0],
                                [0.2, 0.1, 0.9, 1.0]], np.float32))

    def kernel(mat_ref, vol_hbm, out_ref, win_ref, sem):
        gi = pl.program_id(0)
        a = mat_ref
        o0 = jnp.clip(jnp.floor(a[0, 0] * gi.astype(jnp.float32)
                                + a[0, 3]).astype(jnp.int32), 0, d0 - w0)
        o1 = jnp.clip(jnp.floor(a[1, 3]).astype(jnp.int32), 0, d1 - w1)
        slot = jax.lax.rem(pl.program_id(0), 2)
        for b in range(nb):
            pltpu.make_async_copy(
                vol_hbm.at[pl.ds(o0, w0), pl.ds(o1, w1), b],
                win_ref.at[slot, b], sem.at[slot, b]).start()
        for b in range(nb):
            pltpu.make_async_copy(
                vol_hbm.at[pl.ds(o0, w0), pl.ds(o1, w1), b],
                win_ref.at[slot, b], sem.at[slot, b]).wait()

        for g in range(G):
            if STAGE == 1:
                # static everything
                acc = win_ref[slot, 0, 0, pl.ds(0, 8), :]
            elif STAGE == 2:
                # dynamic plane index, static y
                def body(k, acc):
                    zk = jnp.clip(o0 + k, o0, o0 + w0 - 1)
                    return acc + win_ref[slot, 0, zk - o0, pl.ds(0, 8), :]
                acc = jax.lax.fori_loop(0, hz, body,
                                        jnp.zeros((8, 128), jnp.float32))
            elif STAGE == 3:
                # dynamic plane + dynamic y ds
                def body(k, acc):
                    zk = o0 + k
                    yb = jnp.clip(o1 + (k % 3), o1, o1 + w1 - hy)
                    s = win_ref[slot, 0, zk - o0, pl.ds(yb - o1, 8), :]
                    return acc + s
                acc = jax.lax.fori_loop(0, hz, body,
                                        jnp.zeros((8, 128), jnp.float32))
            elif STAGE == 4:
                # + gathers inside the loop
                l_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
                def body(k, acc):
                    zk = o0 + k
                    yb = jnp.clip(o1 + (k % 3), o1, o1 + w1 - hy)
                    s = win_ref[slot, 0, zk - o0, pl.ds(yb - o1, 8), :]
                    gx = jnp.take_along_axis(s, (l_iota + k) % 128, axis=1)
                    gy = jnp.take_along_axis(gx, (l_iota + k) % 8, axis=0)
                    return acc + gy
                acc = jax.lax.fori_loop(0, hz, body,
                                        jnp.zeros((8, 128), jnp.float32))
            out_ref[g, :, :] = acc

    grid = (d0 // G, 1, 1)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((G, 8, 128), lambda g, s, l: (g, s, l),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((d0, 8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, nb, w0, w1, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((2, nb))],
    )(mat, vol)
    print(f"stage {STAGE}: ok, sum={float(out.sum()):.3f}")


if __name__ == "__main__":
    main()
