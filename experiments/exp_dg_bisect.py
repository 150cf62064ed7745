import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def try_shape(name, R, C, axis, hi):
    tab = jnp.asarray(np.random.rand(R, C).astype(np.float32))
    idx = jnp.asarray(np.random.randint(0, hi, (R, C)), jnp.int32)
    def k(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=axis)
    f = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
                       in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
                       out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    try:
        r = jax.jit(f)(tab, idx)
        exp = np.take_along_axis(np.asarray(tab), np.asarray(idx), axis)
        print(f"{name}: OK correct={np.array_equal(np.asarray(r), exp)}")
        return True
    except Exception as e:
        print(f"{name}: FAIL {str(e).split(chr(10))[0][:100]}")
        return False

try_shape("lane (8,128)", 8, 128, 1, 128)
try_shape("lane (16,128)", 16, 128, 1, 128)
try_shape("lane (64,128)", 64, 128, 1, 128)
try_shape("lane (256,128)", 256, 128, 1, 128)
try_shape("sublane (8,128)", 8, 128, 0, 8)
try_shape("sublane (16,128)", 16, 128, 0, 16)
try_shape("sublane (32,128)", 32, 128, 0, 32)
try_shape("sublane (64,128)", 64, 128, 0, 64)
