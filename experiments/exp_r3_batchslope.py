"""Round-3 probe: device slope of the grid-batched programs (VERDICT #5).

A 36-rotation single-axis tilt sweep of a resident 250^3 volume, resolved
by ONE grid-batched kernel launch (envelope walk plan, per-matrix SMEM
payloads).  Slope-times the batched program itself -- kernel + batched
un-blocker inside one jit, compile excluded -- and reports device
ms/rotation, the number the round-2 table could only bound with a
tunnel-polluted wall clock (BENCHMARKS.md "Sweeps").

Usage: python -u experiments/exp_r3_batchslope.py [size] [n_rot]
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

    from voltools_tpu.kernels.planner import (choose_plan, fit_payload,
                                              plan_batch_sampler,
                                              plan_payload, plan_prepare)
    from voltools_tpu.utils import transform_matrix

    size = int(sys.argv[1]) if len(sys.argv) > 1 else 250
    n_rot = int(sys.argv[2]) if len(sys.argv) > 2 else 36
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((size,) * 3, dtype=np.float64)
                      .astype(np.float32))
    center = ((size - 1) / 2,) * 3

    angles = np.linspace(-60, 60, n_rot)
    ms = [transform_matrix(rotation=(0, a, 0), rotation_order="sxyz",
                           center=center) for a in angles]

    env = choose_plan(np.stack(ms), vol.shape, "linear", "constant",
                      sticky=None)
    if env is None:
        print("no envelope plan; aborting")
        return
    fits = [fit_payload(env, m, vol.shape, "linear", "constant")
            for m in ms]
    assert all(f is not None for f in fits), "envelope must cover the sweep"
    print(f"envelope: hz={env.hz} hy={env.hy} ndx={len(env.dxs)} "
          f"pack={env.vb},{env.wb} grid g={env.gu},{env.gv}", flush=True)

    prep = plan_prepare(vol, env)
    payloads = jnp.stack([plan_payload(m, f) for m, f in zip(ms, fits)])
    run = plan_batch_sampler(env, n_rot, 0.0)

    @jax.jit
    def chained(n, p, pays):
        def body(_, carry):
            pp, acc = carry
            outs = run(p, pp)
            probe = outs[0, 0, 0, 0] * jnp.float32(1e-38)
            return pp + probe, acc + probe
        pp, acc = jax.lax.fori_loop(0, n, body, (pays, jnp.float32(0.0)))
        return pp[0, 0, 0] + acc

    iters = 4
    float(chained(1, prep, payloads))
    float(chained(iters, prep, payloads))

    def runn(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(n, prep, payloads))
            best = min(best, time.perf_counter() - t0)
        return best

    batch_ms = (runn(iters) - runn(1)) / (iters - 1) * 1e3
    print(f"batched program: {batch_ms:.2f} ms for {n_rot} rotations "
          f"-> {batch_ms / n_rot:.3f} ms/rotation (device slope)",
          flush=True)


if __name__ == "__main__":
    main()
