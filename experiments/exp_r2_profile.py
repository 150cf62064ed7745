"""Round-2 probe: where does the general-rotation (fori) tier spend time?

Times on the real TPU via the slope method (chained dependent iterations in
one jit, subtract the 1-iteration run).  Reports, for a few random 'sxyz'
rotations at 250^3:
  - the chosen variant (window size, tier)
  - expected window DMA traffic
  - measured per-call ms for: full kernel / DMA-only kernel / compute-only
    (single stale window) kernel
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def slope_time(fn, vol, mat, iters=8):
    import jax

    @functools.partial(jax.jit, static_argnames="n")
    def chained(n, v, m):
        def body(_, carry):
            vv, mm = carry
            out = fn(vv, mm)
            return out, mm
        out, _ = jax.lax.fori_loop(0, n, body, (v, m))
        return out.ravel()[0]

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


def main():
    import jax
    import jax.numpy as jnp

    from voltools_tpu.kernels import pallas_affine as pa
    from voltools_tpu.utils import transform_matrix

    size = 250
    rng = np.random.default_rng(1)
    vol = jnp.asarray(rng.random((size,) * 3).astype(np.float32))
    center = (size / 2,) * 3  # benchmark.py:53 uses size/2

    angles = rng.uniform(-180, 180, (4, 3))
    for i, ang in enumerate(angles):
        m = transform_matrix(rotation=tuple(ang), rotation_order="sxyz",
                             center=center)
        v = pa.choose_variant(m, vol.shape, "linear")
        if v is None:
            print(f"[{i}] angles={np.round(ang,1)} -> NO VARIANT (XLA fallback)")
            continue
        ntiles = v.out_d[0] * ((v.out_d[1] + 7) // 8) * ((v.out_d[2] + 127) // 128)
        win_mb = v.nb * v.w0 * v.w1 * 128 * 4 / 1e6
        traffic_gb = ntiles * win_mb / 1e3
        mj = jnp.asarray(m, jnp.float32)

        t_full = slope_time(
            lambda vv, mm: pa.affine_sample_pallas_variant(vv, mm, v, 0.0),
            vol, mj)
        print(f"[{i}] angles={np.round(ang,1)} unroll={v.unroll} "
              f"w=({v.w0},{v.w1}) slop={v.slop} nv={v.nv} nb={v.nb} "
              f"win={win_mb:.2f}MB traffic={traffic_gb:.1f}GB "
              f"full={t_full:.1f}ms")


if __name__ == "__main__":
    main()
