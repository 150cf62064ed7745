import functools, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def timeit(fn, *args, iters=20):
    @functools.partial(jax.jit, static_argnames='n')
    def chained(n, *a):
        def body(i, carry):
            return (fn(*carry),) + carry[1:]
        out = jax.lax.fori_loop(0, n, body, a)
        return out[0].ravel()[0]
    float(chained(1, *args)); float(chained(iters, *args))
    def run(n):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter(); float(chained(n, *args)); best = min(best, time.perf_counter()-t0)
        return best
    return (run(iters) - run(1)) / (iters-1) * 1e3

# --- correctness of sublane dynamic_gather with idx.shape == table.shape
R, C = 1024, 128
tab = jnp.asarray(np.random.rand(R, C).astype(np.float32))
idx = jnp.asarray(np.random.randint(0, R, (R, C)), jnp.int32)
def k_sub(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)
f = pl.pallas_call(k_sub, out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
                   in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
                   out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
try:
    r = jax.jit(f)(tab, idx)
    exp = np.take_along_axis(np.asarray(tab), np.asarray(idx), 0)
    print("sublane dg (1024,128): OK correct:", np.array_equal(np.asarray(r), exp))
except Exception as e:
    print("sublane dg FAIL:", str(e).split("\n")[0][:150])

# --- big-R sublane gather: R=62464 (~250^3-ish rows), C=128 -> 30MB table
R2 = 62464
tab2 = jnp.asarray(np.random.rand(R2, 128).astype(np.float32))
idx2 = jnp.asarray(np.random.randint(0, R2, (R2, 128)), jnp.int32)
f2 = pl.pallas_call(k_sub, out_shape=jax.ShapeDtypeStruct((R2, 128), jnp.float32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
try:
    r2 = jax.jit(f2)(tab2, idx2)
    exp2 = np.take_along_axis(np.asarray(tab2), np.asarray(idx2), 0)
    ok = np.array_equal(np.asarray(r2), exp2)
    t = timeit(lambda t_, i_: f2(t_, i_), tab2, idx2, iters=10)
    print(f"sublane dg (62464,128) 30MB table: correct={ok} time={t:.3f} ms ({R2*128/t/1e6:.0f} Melem/ms)")
except Exception as e:
    print("big sublane dg FAIL:", str(e).split("\n")[0][:150])

# --- lane dynamic_gather on (62464,128)
idx3 = jnp.asarray(np.random.randint(0, 128, (R2, 128)), jnp.int32)
def k_lane(tab_ref, idx_ref, out_ref):
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)
f3 = pl.pallas_call(k_lane, out_shape=jax.ShapeDtypeStruct((R2, 128), jnp.float32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
try:
    r3 = jax.jit(f3)(tab2, idx3)
    exp3 = np.take_along_axis(np.asarray(tab2), np.asarray(idx3), 1)
    ok = np.array_equal(np.asarray(r3), exp3)
    t = timeit(lambda t_, i_: f3(t_, i_), tab2, idx3, iters=10)
    print(f"lane dg (62464,128): correct={ok} time={t:.3f} ms")
except Exception as e:
    print("lane dg FAIL:", str(e).split("\n")[0][:150])

# --- VMEM capacity: single block of 64MB + 64MB idx + 32MB out = 160MB?
R4 = 125000
tab4 = jnp.asarray(np.random.rand(R4, 128).astype(np.float32))  # 64MB
idx4 = jnp.asarray(np.random.randint(0, R4, (R4, 128)), jnp.int32)  # 64MB
f4 = pl.pallas_call(k_sub, out_shape=jax.ShapeDtypeStruct((R4, 128), jnp.float32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
try:
    r4 = jax.jit(f4)(tab4, idx4)
    r4.block_until_ready()
    t = timeit(lambda t_, i_: f4(t_, i_), tab4, idx4, iters=10)
    print(f"sublane dg (125000,128) 64MB table+64MB idx: OK time={t:.3f} ms")
except Exception as e:
    print("64MB VMEM FAIL:", str(e).split("\n")[0][:200])
