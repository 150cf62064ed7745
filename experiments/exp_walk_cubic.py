"""Time the walk kernel's cubic path at 250^3 for random rotations."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from experiments.exp_r2_profile import slope_time  # noqa: E402


def main():
    import jax.numpy as jnp

    from voltools_tpu.kernels.pallas_walk import (
        affine_sample_pallas_walk, choose_walk_variant)
    from voltools_tpu.utils import transform_matrix

    rng = np.random.default_rng(7)
    size = 250
    vol = jnp.asarray(rng.random((size,) * 3).astype(np.float32))
    for trial in range(4):
        ang = rng.uniform(-180, 180, 3)
        m = transform_matrix(rotation=tuple(ang), rotation_order="sxyz",
                             center=(size / 2,) * 3)
        mj = jnp.asarray(m, jnp.float32)
        v = choose_walk_variant(m, vol.shape, "bspline", "constant")
        if v is None:
            print(f"250^3 bspline trial{trial}: no variant")
            continue
        t = slope_time(
            lambda vv, mm: affine_sample_pallas_walk(vv, mm, v, 0.0),
            vol, mj, iters=6)
        print(f"250^3 bspline trial{trial} ang={np.round(ang,1)}: "
              f"{t:.1f}ms hz={v.hz} hy={v.hy} ndx={len(v.dxs)} "
              f"w=({v.w0},{v.w1}) pack=({v.vb},{v.wb}) g=({v.gu},{v.gv})")


if __name__ == "__main__":
    main()
