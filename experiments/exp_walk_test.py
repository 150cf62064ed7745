"""Correctness shakeout of the plane-walk kernel (interpret mode, CPU)."""

import os
import sys

os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from voltools_tpu.kernels.pallas_walk import (
        affine_sample_pallas_walk, choose_walk_variant)
    from voltools_tpu.ops.sampling import affine_sample
    from voltools_tpu.utils import transform_matrix

    rng = np.random.default_rng(0)
    fails = 0
    runs = 0
    for trial in range(12):
        shape = tuple(int(s) for s in rng.integers(20, 46, 3))
        vol = rng.random(shape).astype(np.float32)
        ang = rng.uniform(-180, 180, 3)
        m = transform_matrix(rotation=tuple(ang), rotation_order="sxyz",
                             center=tuple((np.array(shape) - 1) / 2),
                             translation=tuple(rng.uniform(-3, 3, 3)))
        for interp, order in (("linear", 1), ("bspline", 3)):
            for mode in ("constant", "border"):
                v = choose_walk_variant(m, shape, interp, mode)
                if v is None:
                    print(f"trial {trial} {interp}/{mode}: NO VARIANT")
                    continue
                runs += 1
                got = np.asarray(affine_sample_pallas_walk(
                    vol, jnp.asarray(m, jnp.float32), v, cval=0.0,
                    interpret=True))
                want = np.asarray(affine_sample(
                    jnp.asarray(vol), jnp.asarray(m, jnp.float32), interp,
                    mode, 0.0, prefiltered=True))
                err = np.abs(got - want).max()
                ok = err < 3e-5
                if not ok:
                    fails += 1
                    bad = np.argwhere(np.abs(got - want) > 3e-5)
                    print(f"trial {trial} {interp}/{mode} shape={shape} "
                          f"ang={np.round(ang,1)} ERR={err:.2e} "
                          f"nbad={len(bad)} first={bad[:3].tolist()} "
                          f"hz={v.hz} hy={v.hy} y_lo={v.y_lo} ps={v.ps} po={v.po}")
                else:
                    print(f"trial {trial} {interp}/{mode}: ok ({err:.1e}) "
                          f"hz={v.hz} hy={v.hy} slop={v.slop_lo},{v.slop_hi}")
    print(f"\n{runs} runs, {fails} failures")


if __name__ == "__main__":
    main()
