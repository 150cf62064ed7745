"""Plane-walk kernel on the real TPU: compile, parity vs XLA oracle, timing."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from experiments.exp_r2_profile import slope_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from voltools_tpu.kernels.pallas_walk import (
        affine_sample_pallas_walk, choose_walk_variant)
    from voltools_tpu.ops.sampling import affine_sample
    from voltools_tpu.utils import transform_matrix

    rng = np.random.default_rng(1)

    # ---- stage 1: parity at 64^3 (fast compiles)
    size = 64
    vol = jnp.asarray(rng.random((size,) * 3).astype(np.float32))
    for trial in range(3):
        ang = rng.uniform(-180, 180, 3)
        m = transform_matrix(rotation=tuple(ang), rotation_order="sxyz",
                             center=(size / 2,) * 3)
        for interp in ("linear", "bspline"):
            v = choose_walk_variant(m, vol.shape, interp, "constant")
            if v is None:
                print(f"64^3 {interp} trial{trial}: no variant"); continue
            t0 = time.time()
            got = np.asarray(affine_sample_pallas_walk(
                vol, jnp.asarray(m, jnp.float32), v, 0.0))
            want = np.asarray(jax.jit(
                lambda vv, mm: affine_sample(vv, mm, interp, "constant", 0.0,
                                             prefiltered=True))(
                vol, jnp.asarray(m, jnp.float32)))
            err = np.abs(got - want).max()
            print(f"64^3 {interp} trial{trial} ang={np.round(ang,1)}: "
                  f"err={err:.2e} hz={v.hz} hy={v.hy} ({time.time()-t0:.0f}s)")

    # ---- stage 2: timing at 250^3 for random rotations
    size = 250
    vol = jnp.asarray(rng.random((size,) * 3).astype(np.float32))
    for trial in range(4):
        ang = rng.uniform(-180, 180, 3)
        m = transform_matrix(rotation=tuple(ang), rotation_order="sxyz",
                             center=(size / 2,) * 3)
        mj = jnp.asarray(m, jnp.float32)
        for interp, g in (("linear", 8),):
            v = choose_walk_variant(m, vol.shape, interp, "constant")
            if v is None:
                print(f"250^3 {interp} trial{trial}: no variant"); continue
            t = slope_time(
                lambda vv, mm: affine_sample_pallas_walk(vv, mm, v, 0.0),
                vol, mj, iters=8)
            # spot parity too (excluding voxels whose source coordinate sits
            # within f32 rounding of the domain boundary, where inside/cval
            # classification legitimately differs between f32 evaluations)
            got = np.asarray(affine_sample_pallas_walk(vol, mj, v, 0.0))
            want = np.asarray(jax.jit(
                lambda vv, mm: affine_sample(vv, mm, interp, "constant", 0.0,
                                             prefiltered=True))(vol, mj))
            err = np.abs(got - want)
            idx = np.indices(vol.shape, dtype=np.float64).reshape(3, -1)
            src = (m[:3, :3] @ idx + m[:3, 3:4]).reshape(3, *vol.shape)
            tol = 1e-3
            near = np.zeros(vol.shape, bool)
            for ax in range(3):
                near |= (np.abs(src[ax]) < tol) | (
                    np.abs(src[ax] - (vol.shape[ax] - 1)) < tol)
            err = np.where(near, 0.0, err).max()
            print(f"250^3 {interp} trial{trial} ang={np.round(ang,1)}: "
                  f"{t:.1f}ms err={err:.2e} hz={v.hz} hy={v.hy} slop={v.slop_lo},{v.slop_hi} "
                  f"w=({v.w0},{v.w1}) ps={v.ps} po={v.po}")


if __name__ == "__main__":
    main()
