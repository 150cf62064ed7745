import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# P1: lane-gather on (8,256): does idx range cover 256?
tab = jnp.asarray(np.random.rand(8, 256).astype(np.float32))
idx = jnp.asarray(np.random.randint(0, 256, (8, 256)), jnp.int32)
def k(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)
f = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32),
                   in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
                   out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
try:
    r = jax.jit(f)(tab, idx)
    exp = np.take_along_axis(np.asarray(tab), np.asarray(idx), 1)
    print("P1 lane (8,256) range256:", np.array_equal(np.asarray(r), exp))
except Exception as e:
    print("P1 FAIL:", str(e).split("\n")[0][:120])

# P2: 3D box DMA from HBM (ANY) ref with runtime scalar offsets
D = (64, 64, 128)
W = (8, 8, 128)
vol = jnp.asarray(np.arange(np.prod(D), dtype=np.float32).reshape(D))
def k2(off_ref, hbm_ref, out_ref, scratch, sem):
    o0, o1, o2 = off_ref[0], off_ref[1], off_ref[2]
    cp = pltpu.make_async_copy(
        hbm_ref.at[pl.ds(o0, W[0]), pl.ds(o1, W[1]), pl.ds(o2, W[2])],
        scratch, sem)
    cp.start(); cp.wait()
    out_ref[:] = scratch[:]
offs = jnp.asarray([13, 27, 0], jnp.int32)
f2 = pl.pallas_call(
    k2,
    out_shape=jax.ShapeDtypeStruct(W, jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
              pl.BlockSpec(memory_space=pltpu.ANY)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM(W, jnp.float32), pltpu.SemaphoreType.DMA],
)
try:
    r2 = jax.jit(f2)(offs, vol)
    exp2 = np.asarray(vol)[13:21, 27:35, 0:128]
    print("P2 dynamic 3D box DMA:", np.array_equal(np.asarray(r2), exp2))
except Exception as e:
    print("P2 FAIL:", str(e).split("\n")[0][:160])

# P3: reshape (W0,W1,WX)->(W0*W1,WX) inside kernel + static row slices
def k3(in_ref, out_ref):
    v = in_ref[:].reshape(8*8, 128)
    out_ref[:] = v[8:16, :]
vol3 = jnp.asarray(np.random.rand(8, 8, 128).astype(np.float32))
f3 = pl.pallas_call(k3, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
try:
    r3 = jax.jit(f3)(vol3)
    exp3 = np.asarray(vol3).reshape(64,128)[8:16]
    print("P3 reshape+slice:", np.array_equal(np.asarray(r3), exp3))
except Exception as e:
    print("P3 FAIL:", str(e).split("\n")[0][:120])

# P4: sublane-gather (8,128) with idx from arithmetic incl. broadcast iota
def k4(tab_ref, idx_ref, out_ref):
    m = jnp.clip(idx_ref[:], 0, 7)
    out_ref[:] = jnp.take_along_axis(tab_ref[:], m, axis=0)
tab4 = jnp.asarray(np.random.rand(8,128).astype(np.float32))
idx4 = jnp.asarray(np.random.randint(-3, 12, (8,128)), jnp.int32)
f4 = pl.pallas_call(k4, out_shape=jax.ShapeDtypeStruct((8,128), jnp.float32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
try:
    r4 = jax.jit(f4)(tab4, idx4)
    exp4 = np.take_along_axis(np.asarray(tab4), np.clip(np.asarray(idx4),0,7), 0)
    print("P4 sublane clip-gather:", np.array_equal(np.asarray(r4), exp4))
except Exception as e:
    print("P4 FAIL:", str(e).split("\n")[0][:120])
