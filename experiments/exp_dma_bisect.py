import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def attempt(name, make_fn):
    try:
        ok = make_fn()
        print(name, "OK" if ok else "WRONG RESULT")
    except Exception as e:
        print(name, "FAIL:", str(e).split("\n")[0][:140])

# A: 2D dynamic slice DMA from ANY
def a():
    D, W = (256, 128), (16, 128)
    vol = jnp.asarray(np.arange(np.prod(D), dtype=np.float32).reshape(D))
    def k(off_ref, hbm_ref, out_ref, scratch, sem):
        o0 = off_ref[0]
        cp = pltpu.make_async_copy(hbm_ref.at[pl.ds(o0, W[0]), :], scratch, sem)
        cp.start(); cp.wait()
        out_ref[:] = scratch[:]
    f = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(W, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM(W, jnp.float32), pltpu.SemaphoreType.DMA])
    r = jax.jit(f)(jnp.asarray([32], jnp.int32), vol)
    return np.array_equal(np.asarray(r), np.asarray(vol)[32:48])
attempt("A 2D ds0 DMA", a)

# B: 3D, dynamic on dim0 only
def b():
    D, W = (64, 16, 128), (8, 16, 128)
    vol = jnp.asarray(np.arange(np.prod(D), dtype=np.float32).reshape(D))
    def k(off_ref, hbm_ref, out_ref, scratch, sem):
        o0 = off_ref[0]
        cp = pltpu.make_async_copy(hbm_ref.at[pl.ds(o0, 8), :, :], scratch, sem)
        cp.start(); cp.wait()
        out_ref[:] = scratch[:]
    f = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(W, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM(W, jnp.float32), pltpu.SemaphoreType.DMA])
    r = jax.jit(f)(jnp.asarray([13], jnp.int32), vol)
    return np.array_equal(np.asarray(r), np.asarray(vol)[13:21])
attempt("B 3D ds0 DMA", b)

# C: 3D, dynamic dims 0+1, full last
def c():
    D, W = (64, 64, 128), (8, 8, 128)
    vol = jnp.asarray(np.arange(np.prod(D), dtype=np.float32).reshape(D))
    def k(off_ref, hbm_ref, out_ref, scratch, sem):
        cp = pltpu.make_async_copy(
            hbm_ref.at[pl.ds(off_ref[0], 8), pl.ds(off_ref[1], 8), :], scratch, sem)
        cp.start(); cp.wait()
        out_ref[:] = scratch[:]
    f = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(W, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM(W, jnp.float32), pltpu.SemaphoreType.DMA])
    r = jax.jit(f)(jnp.asarray([13, 27], jnp.int32), vol)
    return np.array_equal(np.asarray(r), np.asarray(vol)[13:21, 27:35])
attempt("C 3D ds0+ds1 DMA", c)

# D: 3D with dynamic LAST dim too (the one that probably fails)
def d():
    D, W = (64, 64, 256), (8, 8, 128)
    vol = jnp.asarray(np.arange(np.prod(D), dtype=np.float32).reshape(D))
    def k(off_ref, hbm_ref, out_ref, scratch, sem):
        cp = pltpu.make_async_copy(
            hbm_ref.at[pl.ds(off_ref[0], 8), pl.ds(off_ref[1], 8), pl.ds(off_ref[2], 128)],
            scratch, sem)
        cp.start(); cp.wait()
        out_ref[:] = scratch[:]
    f = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct(W, jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM(W, jnp.float32), pltpu.SemaphoreType.DMA])
    r = jax.jit(f)(jnp.asarray([13, 27, 64], jnp.int32), vol)
    return np.array_equal(np.asarray(r), np.asarray(vol)[13:21, 27:35, 64:192])
attempt("D 3D ds0+ds1+dsLast DMA", d)
