"""Round-4: best-of-8 diverse autotune probe, full 250^3 linear slow class.

exp_r4_oneshot.py probed rotations 12 and 3 (best-of-6); this extends to
the remaining slow rotations (8, 11, 14) with topk=8, measuring every
structurally distinct near-optimal config on hardware.  Goal: quantify how
much an empirical best-of-K planner can recover over the model pick for
the ndx=4 class (VERDICT #2), and whether ANY config family breaks the
class's ~10-12 ms floor.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/voltools_tpu_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import voltools_tpu.kernels.pallas_walk as pw
    from voltools_tpu.utils import transform_matrix
    from exp_r3_walkprofile import slope_time

    size = 250
    vrng = np.random.default_rng(0)
    vol_np = vrng.random((size,) * 3, dtype=np.float64).astype(np.float32)
    vol_dev = jax.device_put(jnp.asarray(vol_np))
    vol_dev.block_until_ready()
    center = (size / 2,) * 3
    rot_rng = np.random.default_rng(0)
    rot_rng.random((size,) * 3, dtype=np.float64)
    angs = [rot_rng.uniform(-180, 180, 3) for _ in range(16)]

    for ri in (8, 11, 14):
        m = transform_matrix(rotation=tuple(angs[ri]),
                             rotation_order="sxyz", center=center)
        cands = pw.choose_walk_variant(m, (size,) * 3, "linear",
                                       "constant", quantize=False, topk=8)
        print(f"\nrot {ri}: {len(cands)} structurally distinct candidates",
              flush=True)
        best = None
        for v in cands:
            prep = pw.prepare_walk_volume(vol_dev, v)
            cols = pw.permute_matrix(m, v)
            vc = pw.canonical_walk_variant(v)
            t0 = time.time()
            runner = pw._walk_runner(vc, 0.0, False)
            t = slope_time(lambda p, c, _r=runner: _r(p, c), prep, cols)
            best = t if best is None else min(best, t)
            print(f"  ndx={len(v.dxs)} hz={v.hz} hy={v.hy} "
                  f"pack={v.vb},{v.wb} g={v.gu},{v.gv} kax={v.kax} "
                  f"ps={v.ps} model={pw._variant_cost(v)/1e6:6.2f} "
                  f"meas={t:6.2f} ms (compile+first {time.time()-t0:.0f}s)",
                  flush=True)
        print(f"rot {ri}: best measured {best:.2f} ms "
              f"(model pick was first row)", flush=True)


if __name__ == "__main__":
    main()
