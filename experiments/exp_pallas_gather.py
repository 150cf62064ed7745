import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def try_kernel(name, kernel, out_shape, inputs):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=out_shape,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(inputs),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        r = jax.jit(f)(*inputs)
        r.block_until_ready()
        return ("OK", r)
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        return (f"FAIL: {type(e).__name__}: {msg}", None)

# A: take_along_axis along lanes (axis=-1), idx in [0,128)
def kA(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)
tab = jnp.arange(8*128, dtype=jnp.float32).reshape(8,128)
idx = jnp.asarray(np.random.randint(0,128,(8,128)), jnp.int32)
st, r = try_kernel("A", kA, jax.ShapeDtypeStruct((8,128), jnp.float32), [tab, idx])
print("A take_along_axis lanes (8,128):", st)
if r is not None:
    exp = np.take_along_axis(np.asarray(tab), np.asarray(idx), 1)
    print("   correct:", np.array_equal(np.asarray(r), exp))

# B: take_along_axis along sublanes (axis=0), idx in [0, 1024)
def kB(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)
tab2 = jnp.arange(1024*128, dtype=jnp.float32).reshape(1024,128)
idx2 = jnp.asarray(np.random.randint(0,1024,(8,128)), jnp.int32)
st, r = try_kernel("B", kB, jax.ShapeDtypeStruct((8,128), jnp.float32), [tab2, idx2])
print("B take_along_axis sublanes (1024,128)->(8,128):", st)
if r is not None:
    exp = np.take_along_axis(np.asarray(tab2), np.asarray(idx2), 0)
    print("   correct:", np.array_equal(np.asarray(r), exp))

# C: flat 1D take with arbitrary idx
def kC(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[:])
tab3 = jnp.arange(65536, dtype=jnp.float32)
idx3 = jnp.asarray(np.random.randint(0,65536,(8,128)), jnp.int32)
st, r = try_kernel("C", kC, jax.ShapeDtypeStruct((8,128), jnp.float32), [tab3, idx3])
print("C flat take (65536,) idx (8,128):", st)
if r is not None:
    exp = np.asarray(tab3)[np.asarray(idx3)]
    print("   correct:", np.array_equal(np.asarray(r), exp))

# D: take_along_axis along lanes with wider table (8, 1024): idx range 1024
def kD(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)
tab4 = jnp.arange(8*1024, dtype=jnp.float32).reshape(8,1024)
idx4 = jnp.asarray(np.random.randint(0,1024,(8,1024)), jnp.int32)
st, r = try_kernel("D", kD, jax.ShapeDtypeStruct((8,1024), jnp.float32), [tab4, idx4])
print("D take_along_axis lanes (8,1024):", st)
if r is not None:
    exp = np.take_along_axis(np.asarray(tab4), np.asarray(idx4), 1)
    print("   correct:", np.array_equal(np.asarray(r), exp))

# E: 2D gather: rows from big table via take on axis 0 with (8,) idx vector -> dynamic row select
def kE(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)
tabE = jnp.arange(512*128, dtype=jnp.float32).reshape(512,128)
idxE = jnp.asarray(np.random.randint(0,512,(8,)), jnp.int32)
st, r = try_kernel("E", kE, jax.ShapeDtypeStruct((8,128), jnp.float32), [tabE, idxE])
print("E take rows (512,128) idx (8,):", st)
if r is not None:
    exp = np.asarray(tabE)[np.asarray(idxE)]
    print("   correct:", np.array_equal(np.asarray(r), exp))
