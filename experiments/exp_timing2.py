import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

def timeit(fn, *args, iters=20):
    """Per-iteration cost via slope: chain `iters` dependent applications in one jit."""
    @partial(jax.jit, static_argnames='n')
    def chained(n, *a):
        def body(i, carry):
            return fn(*carry)
        out = jax.lax.fori_loop(0, n, body, a)
        return jnp.sum(out[0])
    # warm both compilations
    float(chained(1, *args)); float(chained(iters, *args))
    t0 = time.perf_counter(); float(chained(1, *args)); t1 = time.perf_counter()
    t2 = time.perf_counter(); float(chained(iters, *args)); t3 = time.perf_counter()
    return ((t3-t2) - (t1-t0)) / (iters-1) * 1e3

# calibration: matmul must return tuple matching args
a = jnp.asarray(np.random.rand(8192, 8192).astype(np.float32)).astype(jnp.bfloat16)
print("matmul 8192^3 bf16 (expect ~2.8-5.6ms): %.3f ms" % timeit(lambda x: (x @ x,), a, iters=10))

b = jnp.asarray(np.random.rand(64*1024*1024).astype(np.float32))
print("elementwise 256MB (expect ~0.7ms): %.3f ms" % timeit(lambda x: (x * 2.0 + 1.0,), b, iters=20))

# trilinear gather
D = 250
vol = jnp.asarray(np.random.rand(D, D, D).astype(np.float32))
theta = 0.3
c, s = np.cos(theta), np.sin(theta)
R = np.array([[1,0,0],[0,c,-s],[0,s,c]], np.float32)
center = (D-1)/2
offset = center - R @ np.array([center]*3, np.float32)
M = np.eye(4, dtype=np.float32); M[:3,:3] = R; M[:3,3] = offset
Mj = jnp.asarray(M)

def trilinear(vol, m):
    D0, D1, D2 = vol.shape
    i = jax.lax.broadcasted_iota(jnp.float32, (D0, D1, D2), 0)
    j = jax.lax.broadcasted_iota(jnp.float32, (D0, D1, D2), 1)
    k = jax.lax.broadcasted_iota(jnp.float32, (D0, D1, D2), 2)
    sz = m[0,0]*i + m[0,1]*j + m[0,2]*k + m[0,3]
    sy = m[1,0]*i + m[1,1]*j + m[1,2]*k + m[1,3]
    sx = m[2,0]*i + m[2,1]*j + m[2,2]*k + m[2,3]
    z0 = jnp.floor(sz); y0 = jnp.floor(sy); x0 = jnp.floor(sx)
    fz = sz - z0; fy = sy - y0; fx = sx - x0
    z0 = z0.astype(jnp.int32); y0 = y0.astype(jnp.int32); x0 = x0.astype(jnp.int32)
    flat = vol.reshape(-1)
    def tap(zz, yy, xx):
        ok = (zz >= 0) & (zz < D0) & (yy >= 0) & (yy < D1) & (xx >= 0) & (xx < D2)
        idx = (jnp.clip(zz,0,D0-1)*D1 + jnp.clip(yy,0,D1-1))*D2 + jnp.clip(xx,0,D2-1)
        return jnp.where(ok, jnp.take(flat, idx.reshape(-1), mode='clip').reshape(idx.shape), 0.0)
    out = 0.
    for dz in (0,1):
        wz = fz if dz else 1-fz
        for dy in (0,1):
            wy = fy if dy else 1-fy
            for dx in (0,1):
                wx = fx if dx else 1-fx
                out = out + wz*wy*wx*tap(z0+dz, y0+dy, x0+dx)
    return out

# chain: feed output back as next volume (same shape) to create dependency
print("XLA-gather trilinear 250^3: %.3f ms" % timeit(lambda v, m: (trilinear(v, m), m), vol, Mj, iters=10))
