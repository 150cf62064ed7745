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

# R1: reshape unaligned (3,10,256)->(30,256) + pad-concat + slice
def r1():
    x = jnp.asarray(np.random.rand(3,10,256).astype(np.float32))
    def k(in_ref, out_ref):
        v = in_ref[:].reshape(30, 256)
        v = jnp.concatenate([v, jnp.zeros((2,256), jnp.float32)], axis=0)
        out_ref[:] = v[8:16, :128]
    f = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    r = jax.jit(f)(x)
    exp = np.asarray(x).reshape(30,256)[8:16,:128]
    return np.array_equal(np.asarray(r), exp)
attempt("R1 unaligned reshape+concat", r1)

# R2: aligned reshape (3,16,256)->(48,256), no concat
def r2():
    x = jnp.asarray(np.random.rand(3,16,256).astype(np.float32))
    def k(in_ref, out_ref):
        v = in_ref[:].reshape(48, 256)
        out_ref[:] = v[8:16, :128]
    f = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    r = jax.jit(f)(x)
    exp = np.asarray(x).reshape(48,256)[8:16,:128]
    return np.array_equal(np.asarray(r), exp)
attempt("R2 aligned reshape", r2)

# R3: 3-dim grid with (1,8,128) output blocks + SMEM matrix + scalar math
def r3():
    m = jnp.asarray(np.random.rand(3,4).astype(np.float32))
    def k(m_ref, out_ref):
        g = pl.program_id(0).astype(jnp.float32)
        val = m_ref[0,0]*g + m_ref[1,1]
        o = jnp.floor(val).astype(jnp.int32)
        out_ref[0,:,:] = jnp.full((8,128), o.astype(jnp.float32))
    f = pl.pallas_call(k, grid=(4,2,2),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1,8,128), lambda g,s,l: (g,s,l), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4,16,256), jnp.float32))
    r = jax.jit(f)(m)
    return np.isfinite(np.asarray(r)).all()
attempt("R3 grid+smem+scalar", r3)

# R4: DMA with scalar-computed clamped origin inside grid kernel
def r4():
    vol = jnp.asarray(np.arange(64*64*256, dtype=np.float32).reshape(64,64,256))
    def k(m_ref, vol_ref, out_ref, scratch, sem):
        g = pl.program_id(0).astype(jnp.float32)
        o0 = jnp.clip(jnp.floor(m_ref[0,0]*g).astype(jnp.int32), 0, 64-8)
        o1 = jnp.clip(jnp.floor(m_ref[0,1]*g).astype(jnp.int32), 0, 64-16)
        cp = pltpu.make_async_copy(vol_ref.at[pl.ds(o0,8), pl.ds(o1,16), :], scratch, sem)
        cp.start(); cp.wait()
        out_ref[0,:,:] = scratch[:].reshape(16*8, 256)[0:8, 0:128]
    m = jnp.asarray(np.random.rand(3,4).astype(np.float32))
    f = pl.pallas_call(k, grid=(4,2,2),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1,8,128), lambda g,s,l: (g,s,l), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4,16,256), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8,16,256), jnp.float32), pltpu.SemaphoreType.DMA])
    r = jax.jit(f)(m, vol)
    return np.isfinite(np.asarray(r)).all()
attempt("R4 grid DMA scalar origin", r4)

# R5: int iota + float convert + floor/clip arith (8,128)
def r5():
    m = jnp.asarray(np.random.rand(3,4).astype(np.float32))
    def k(m_ref, out_ref):
        s = jax.lax.broadcasted_iota(jnp.int32, (8,128), 0).astype(jnp.float32)
        l = jax.lax.broadcasted_iota(jnp.int32, (8,128), 1).astype(jnp.float32)
        zf = m_ref[0,0]*s + m_ref[0,2]*l + m_ref[0,3]
        z0 = jnp.floor(zf).astype(jnp.int32)
        out_ref[:] = (z0 - (z0 >> 7)).astype(jnp.float32)
    f = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    r = jax.jit(f)(m)
    return np.isfinite(np.asarray(r)).all()
attempt("R5 iota+arith", r5)
