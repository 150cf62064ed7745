"""Microbenchmark: per-op cost of the walk kernel's inner primitives.

One pallas kernel per primitive, each looping the op K times over (8,128)
f32 vregs with a serial dependency, grid-iterated G times; slope over K
gives ns/op.  Primitives:
  fma      : a = a * b + c
  lanetake : take_along_axis(a, idx, axis=1)  (128-range lane gather)
  subtake  : take_along_axis(a, idx8, axis=0) (8-range sublane gather)
  roll     : pltpu.roll(a, 1, axis=0)
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def make_runner(op, K):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = 4096

    LANES = 8   # independent chains -> throughput, not latency

    def kernel(x_ref, i_ref, out_ref):
        base = x_ref[:] + pl.program_id(0).astype(jnp.float32) * 1e-30
        lane_idx = i_ref[:]
        sub_idx = jnp.clip(lane_idx, 0, 7)
        accs = [base + jnp.float32(j) * 1e-30 for j in range(LANES)]
        for k in range(K):
            for j in range(LANES):
                a = accs[j]
                if op == "fma":
                    a = a * jnp.float32(1.0000001) + jnp.float32(1e-30)
                elif op == "lanetake":
                    a = jnp.take_along_axis(a, lane_idx, axis=1) + 1e-30
                elif op == "subtake":
                    a = jnp.take_along_axis(a, sub_idx, axis=0) + 1e-30
                elif op == "roll":
                    a = pltpu.roll(a, 1, 0) + jnp.float32(1e-30)
                accs[j] = a
        out = accs[0]
        for j in range(1, LANES):
            out = out + accs[j]
        out_ref[:] = out

    def call(x, idx):
        return pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[pl.BlockSpec((8, 128), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((8, 128), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda g: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(x, idx)

    @jax.jit
    def chained(n, x, idx):
        def body(_, a):
            return call(a, idx)
        return jax.lax.fori_loop(0, n, body, x)[0, 0]

    return chained, G


def time_op(op, K, iters=32):
    import jax.numpy as jnp

    chained, G = make_runner(op, K)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((8, 128)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 128, (8, 128)).astype(np.int32))

    float(chained(1, x, idx))
    float(chained(iters, x, idx))

    def run(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(n, x, idx))
            best = min(best, time.perf_counter() - t0)
        return best

    per_prog = (run(iters) - run(1)) / (iters - 1)
    return per_prog, G


def main():
    for op in ("fma", "lanetake", "subtake", "roll"):
        t8, G = time_op(op, 8)
        t64, _ = time_op(op, 64)
        ns = (t64 - t8) / (64 - 8) / 8 / G * 1e9   # /8 independent chains
        print(f"{op:>9}: {ns:7.2f} ns/op  ({ns * 0.94:5.1f} cyc @940MHz)",
              flush=True)


if __name__ == "__main__":
    main()
