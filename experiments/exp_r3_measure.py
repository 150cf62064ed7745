"""Measure the bench rotations with the current chooser (tight mode) on the
real TPU: one line per rotation (hz/hy/ndx, predicted vs measured ms)."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from experiments.exp_r3_walkprofile import slope_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from voltools_tpu.kernels.pallas_walk import (_variant_cost,
                                                  _walk_runner,
                                                  canonical_walk_variant,
                                                  choose_walk_variant,
                                                  permute_matrix,
                                                  prepare_walk_volume)
    from voltools_tpu.utils import transform_matrix

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/voltools_tpu_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    size = 250
    interpolation = sys.argv[2] if len(sys.argv) > 2 else "linear"
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((size,) * 3, dtype=np.float64)
                      .astype(np.float32))
    center = (size / 2,) * 3
    n_rot = int(sys.argv[1]) if len(sys.argv) > 1 else 8

    times = []
    for i in range(n_rot):
        ang = rng.uniform(-180, 180, 3)
        m = transform_matrix(rotation=tuple(ang), rotation_order="sxyz",
                             center=center)
        v = choose_walk_variant(m, (size,) * 3, interpolation, "constant",
                                quantize=False)
        if v is None:
            print(f"{i:>3} NONE")
            continue
        prep = prepare_walk_volume(vol, v)
        cols = permute_matrix(m, v)
        vc = canonical_walk_variant(v)

        def full_fn(p, c, _vc=vc):
            return _walk_runner(_vc, 0.0, False)(p, c)

        t = slope_time(full_fn, prep, cols)
        times.append(t)
        print(f"{i:>3} hz={v.hz:>3} hy={v.hy:>2} ndx={len(v.dxs)} "
              f"pack={v.vb},{v.wb} g={v.gu},{v.gv} "
              f"pred={_variant_cost(v) / 1e6:>6.2f} meas={t:>6.2f}",
              flush=True)
    print(f"mean {np.mean(times):.3f} worst {max(times):.2f}")


if __name__ == "__main__":
    main()
