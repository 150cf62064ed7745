import time
import numpy as np
import jax
import jax.numpy as jnp

# Calibrate: known-cost matmul. 8192^3 matmul = 1.1 TFLOP; v5e bf16 ~ 394 TFLOPs -> ~2.8ms
a = jnp.asarray(np.random.rand(8192, 8192).astype(np.float32)).astype(jnp.bfloat16)
f = jax.jit(lambda a: a @ a)
o = f(a); o.block_until_ready()
for trial in range(3):
    t0 = time.perf_counter(); f(a).block_until_ready(); t1 = time.perf_counter()
    print("matmul 8192^3 bf16: %.3f ms" % ((t1-t0)*1e3))

# elementwise: read+write 2*256MB -> ~0.6ms at 819GB/s
b = jnp.asarray(np.random.rand(64*1024*1024).astype(np.float32))
g = jax.jit(lambda x: x * 2.0 + 1.0)
o = g(b); o.block_until_ready()
for trial in range(3):
    t0 = time.perf_counter(); g(b).block_until_ready(); t1 = time.perf_counter()
    print("elementwise 256MB: %.3f ms" % ((t1-t0)*1e3))

# with forced host transfer of a scalar
h = jax.jit(lambda x: (x * 2.0 + 1.0).sum())
o = h(b); o.block_until_ready()
for trial in range(3):
    t0 = time.perf_counter(); s = float(h(b)); t1 = time.perf_counter()
    print("elementwise+sum->host 256MB: %.3f ms" % ((t1-t0)*1e3))
