"""Slope-measured device times: sizes x {linear, bspline} x 3 random rotations."""
import functools, time
import numpy as np
import jax, jax.numpy as jnp
import sys; sys.path.insert(0, "/root/repo")
from voltools_tpu.transforms import select_variant
from voltools_tpu.utils import rotation_matrix, resolve_device
from voltools_tpu.kernels.pallas_affine import affine_sample_pallas_variant
from voltools_tpu.ops.sampling import affine_sample

def timeit(fn, *args, iters=10):
    @functools.partial(jax.jit, static_argnames='n')
    def chained(n, *a):
        def body(_, carry):
            return (fn(*carry),) + carry[1:]
        return jax.lax.fori_loop(0, n, body, a)[0].ravel()[0]
    float(chained(1, *args)); float(chained(iters, *args))
    def run(n):
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter(); float(chained(n, *args)); best = min(best, time.perf_counter()-t0)
        return best
    return (run(iters) - run(1)) / (iters-1) * 1e3

dev = resolve_device("tpu")
rng = np.random.default_rng(42)
for interp in ("linear", "bspline"):
    for size in (50, 100, 250):
        vol = jnp.asarray(np.random.default_rng(size).random((size,)*3).astype(np.float32))
        times, impls = [], []
        for r in range(3):
            m = rotation_matrix(rng.uniform(-180, 180, 3), "deg", "sxyz").astype(np.float32)
            v = select_variant(m, vol.shape, interp, "constant", dev)
            mj = jnp.asarray(m)
            if v is not None:
                fn = lambda vv, mm, v=v: affine_sample_pallas_variant(vv, mm, v, 0.0)
                impls.append("p" + ("u" if v.unroll else "l"))
            else:
                fn = lambda vv, mm: affine_sample(vv, mm, interp)
                impls.append("xla")
            iters = 10 if size <= 100 else (5 if interp == "linear" else 3)
            times.append(timeit(fn, vol, mj, iters=iters))
        print(f"{interp} {size}^3: " + " ".join(f"{t:.2f}ms({i})" for t, i in zip(times, impls)), flush=True)
