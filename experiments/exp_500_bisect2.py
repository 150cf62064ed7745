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

def make(grid, offsets_mode, scratch_shape=(8,16,256)):
    def k(m_ref, vol_ref, out_ref, scratch, sem):
        if offsets_mode == "smem":
            o0 = m_ref[0]; o1 = m_ref[1]
        elif offsets_mode == "const":
            o0 = 3; o1 = 5
        elif offsets_mode == "arith":
            g = pl.program_id(0).astype(jnp.float32) if grid else jnp.float32(1.0)
            o0 = jnp.clip(jnp.floor(1.3*g).astype(jnp.int32), 0, 56)
            o1 = jnp.clip(jnp.floor(2.7*g).astype(jnp.int32), 0, 48)
        cp = pltpu.make_async_copy(
            vol_ref.at[pl.ds(o0, scratch_shape[0]), pl.ds(o1, scratch_shape[1]), :],
            scratch, sem)
        cp.start(); cp.wait()
        if grid:
            out_ref[0,:,:] = scratch[0, 0:8, 0:128]
        else:
            out_ref[:] = scratch[0, 0:8, 0:128]
    specs = dict(
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[pltpu.VMEM(scratch_shape, jnp.float32), pltpu.SemaphoreType.DMA])
    if grid:
        f = pl.pallas_call(k, grid=(4,2,2),
            out_specs=pl.BlockSpec((1,8,128), lambda g,s,l: (g,s,l), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((4,16,256), jnp.float32), **specs)
    else:
        f = pl.pallas_call(k,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32), **specs)
    m = jnp.asarray([3,5,0,0], jnp.int32)
    r = jax.jit(f)(m, vol)
    return np.isfinite(np.asarray(r)).all()

attempt("nogrid smem", lambda: make(False, "smem"))
attempt("nogrid arith", lambda: make(False, "arith"))
attempt("grid smem", lambda: make(True, "smem"))
attempt("grid const", lambda: make(True, "const"))
attempt("grid arith", lambda: make(True, "arith"))
