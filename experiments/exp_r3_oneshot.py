"""Round-3 probe: one-shot transform cost for a locally-attached TPU.

The full-table `transform` column is wall clock THROUGH the RPC tunnel
(~30 ms per round trip), which buries what a locally-attached user would
pay.  This measures the device-side part of a one-shot call — source-layout
prepare (transpose/pad/stack) + walk kernel + un-blocking, chained inside
one jit — and reports it next to the measured H2D/D2H byte counts, so
BENCHMARKS.md can present an honest locally-attached estimate:

    one-shot ~= H2D(bytes/pcie) + host plan (~1 ms) + device slope
                + D2H(bytes/pcie)

Usage: python -u experiments/exp_r3_oneshot.py [size]
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

    from voltools_tpu.kernels.pallas_walk import (
        _unblocker, _walk_runner, canonical_walk_variant, choose_walk_variant,
        permute_matrix, prepare_walk_volume, walk_layout_key, _preparer)
    from voltools_tpu.utils import transform_matrix

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 250
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((size,) * 3, dtype=np.float64)
                      .astype(np.float32))
    center = (size / 2,) * 3

    t0 = time.perf_counter()
    ang = rng.uniform(-180, 180, 3)
    m = transform_matrix(rotation=tuple(ang), rotation_order="sxyz",
                         center=center)
    v = choose_walk_variant(m, vol.shape, "linear", "constant", sticky=None)
    plan_ms = (time.perf_counter() - t0) * 1e3
    print(f"host planning: {plan_ms:.2f} ms", flush=True)

    vc = canonical_walk_variant(v)
    runner = _walk_runner(vc, 0.0, False)
    unblock = _unblocker(v.out_d, v.vb, v.wb, v.gu, v.gv, v.po)
    prep = _preparer(walk_layout_key(v))

    @jax.jit
    def oneshot(n, volume, mat):
        def body(_, carry):
            volume, acc = carry
            vol_s = prep(volume)
            from voltools_tpu.kernels.pallas_walk import permute_matrix as pm
            cols = pm(mat, v)
            out = unblock(runner(vol_s, cols))
            probe = out[0, 0, 0] * jnp.float32(1e-38)
            return volume + probe, acc + probe
        volume, acc = jax.lax.fori_loop(0, n, body,
                                        (volume, jnp.float32(0.0)))
        return volume[0, 0, 0] + acc

    mj = jnp.asarray(m, jnp.float32)
    float(oneshot(1, vol, mj))
    iters = 32
    float(oneshot(iters, vol, mj))

    def run(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(oneshot(n, vol, mj))
            best = min(best, time.perf_counter() - t0)
        return best

    dev_ms = (run(iters) - run(1)) / (iters - 1) * 1e3
    nbytes = vol.size * 4
    print(f"device slope (prepare + kernel + unblock): {dev_ms:.2f} ms",
          flush=True)
    for gbps in (16, 32):
        xfer = 2 * nbytes / (gbps * 1e9) * 1e3
        print(f"locally-attached estimate @ {gbps} GB/s PCIe: "
              f"{xfer + plan_ms + dev_ms:.1f} ms "
              f"(H2D+D2H {xfer:.1f} + plan {plan_ms:.1f} + device {dev_ms:.1f})",
          flush=True)


if __name__ == "__main__":
    main()
