import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def attempt(name, fn):
    try:
        ok = fn()
        print(name, "OK" if ok else "WRONG")
    except Exception as e:
        print(name, "FAIL:", str(e).split("\n")[0][:110])

vol = jnp.asarray(np.arange(64*64*256, dtype=np.float32).reshape(64,64,256))

def make(read_mode, W=(8,8,256)):
    def k(off_ref, hbm_ref, out_ref, scratch, sem):
        cp = pltpu.make_async_copy(
            hbm_ref.at[pl.ds(off_ref[0], W[0]), pl.ds(off_ref[1], W[1]), :], scratch, sem)
        cp.start(); cp.wait()
        if read_mode == "full-then-slice":
            v = scratch[:]
            out_ref[:] = v[0, 0:8, 0:128]
        elif read_mode == "direct-slice":
            out_ref[:] = scratch[0, 0:8, 0:128]
        elif read_mode == "reshape":
            v = scratch[:].reshape(W[0]*W[1], W[2])
            out_ref[:] = v[0:8, 0:128]
    f = pl.pallas_call(k,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32),
        scratch_shapes=[pltpu.VMEM(W, jnp.float32), pltpu.SemaphoreType.DMA])
    r = jax.jit(f)(jnp.asarray([13,27], jnp.int32), vol)
    exp = np.asarray(vol)[13:21, 27:35, :].reshape(W[0]*W[1], W[2])[0:8, 0:128]
    return np.allclose(np.asarray(r), np.asarray(vol)[13, 27:35, :128]) or np.allclose(np.asarray(r), exp)

attempt("W256 full-then-slice", lambda: make("full-then-slice"))
attempt("W256 direct-slice", lambda: make("direct-slice"))
attempt("W256 reshape", lambda: make("reshape"))
attempt("W128 full-then-slice", lambda: make("full-then-slice", (8,8,128)))
attempt("W128 reshape", lambda: make("reshape", (8,8,128)))
