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
        lines = str(e).split("\n")
        print(name, "FAIL:", " | ".join(lines[:3])[:240])

def make(vol_shape, W, read):
    vol = jnp.asarray(np.arange(np.prod(vol_shape), dtype=np.float32).reshape(vol_shape))
    def k(off_ref, hbm_ref, out_ref, scratch, sem):
        cp = pltpu.make_async_copy(
            hbm_ref.at[pl.ds(off_ref[0], W[0]), pl.ds(off_ref[1], W[1]), :], scratch, sem)
        cp.start(); cp.wait()
        v = scratch[:]
        if read == "full":
            out_ref[:] = v[0]
        else:
            out_ref[:] = v.reshape(W[0]*W[1], W[2])[0:8, 0:128]
    out_shape = jax.ShapeDtypeStruct(W[1:], jnp.float32) if read == "full" else jax.ShapeDtypeStruct((8,128), jnp.float32)
    f = pl.pallas_call(k,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM(W, jnp.float32), pltpu.SemaphoreType.DMA])
    r = jax.jit(f)(jnp.asarray([13,27], jnp.int32), vol)
    return np.isfinite(np.asarray(r)).all()

attempt("vol(64,64,128) W(8,8,128) full", lambda: make((64,64,128),(8,8,128),"full"))
attempt("vol(64,64,256) W(8,8,256) full", lambda: make((64,64,256),(8,8,256),"full"))
attempt("vol(64,64,128) W(8,8,128) reshape", lambda: make((64,64,128),(8,8,128),"reshape"))
attempt("vol(64,64,256) W(8,8,256) reshape", lambda: make((64,64,256),(8,8,256),"reshape"))
attempt("vol(64,64,256) W(8,16,256) full", lambda: make((64,64,256),(8,16,256),"full"))
