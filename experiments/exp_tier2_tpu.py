import functools, time
import numpy as np
import jax
import jax.numpy as jnp
import sys; sys.path.insert(0, "/root/repo")
from voltools_tpu.kernels.pallas_affine import choose_variant, affine_sample_pallas_variant
from voltools_tpu.ops.sampling import affine_sample
from voltools_tpu.utils import transform_matrix

D = 250
rng = np.random.default_rng(0)
vol = jnp.asarray(rng.random((D,)*3).astype(np.float32))
C = ((D-1)/2,)*3

def timeit(fn, *args, iters=5):
    @functools.partial(jax.jit, static_argnames='n')
    def chained(n, *a):
        def body(_, carry):
            return (fn(*carry),) + carry[1:]
        out = jax.lax.fori_loop(0, n, body, a)
        return out[0].ravel()[0]
    float(chained(1, *args)); float(chained(iters, *args))
    def run(n):
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter(); float(chained(n, *args)); best = min(best, time.perf_counter()-t0)
        return best
    return (run(iters) - run(1)) / (iters-1) * 1e3

for name, m, interp in [
    ("rot_mid linear", transform_matrix(rotation=(32,14,-7), rotation_order="rzxz", center=C), "linear"),
    ("rot454545 linear", transform_matrix(rotation=(45,45,45), rotation_order="rzxz", center=C), "linear"),
]:
    v = choose_variant(m, vol.shape, interp)
    if v is None:
        print(name, "NO VARIANT"); continue
    mj = jnp.asarray(m)
    try:
        fn = lambda vv, mm: affine_sample_pallas_variant(vv, mm, v, 0.0)
        out = jax.jit(fn)(vol, mj); out.block_until_ready()
        ref = jax.jit(lambda vv, mm: affine_sample(vv, mm, interp))(vol, mj)
        err = float(jnp.max(jnp.abs(out - ref)))
        t = timeit(fn, vol, mj, iters=5)
        print(f"{name}: nv={v.nv} slop={v.slop} err={err:.2e} time={t:.2f} ms")
    except Exception as e:
        print(name, "FAIL:", str(e).split("\n")[0][:150])
