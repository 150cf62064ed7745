import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial

D = 250
vol = jnp.asarray(np.random.rand(D, D, D).astype(np.float32))

# random rotation about center (pull-back matrix)
theta = 0.3
c, s = np.cos(theta), np.sin(theta)
R = np.array([[1,0,0],[0,c,-s],[0,s,c]], np.float32)
center = (D-1)/2
offset = center - R @ np.array([center]*3, np.float32)
M = np.eye(4, dtype=np.float32); M[:3,:3] = R; M[:3,3] = offset
Mj = jnp.asarray(M)

@partial(jax.jit, static_argnames=())
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
        wz = jnp.where(dz==0, 1-fz, fz)
        for dy in (0,1):
            wy = jnp.where(dy==0, 1-fy, fy)
            for dx in (0,1):
                wx = jnp.where(dx==0, 1-fx, fx)
                out = out + wz*wy*wx*tap(z0+dz, y0+dy, x0+dx)
    return out

o = trilinear(vol, Mj); o.block_until_ready()
ts = []
for _ in range(10):
    t0 = time.perf_counter()
    trilinear(vol, Mj).block_until_ready()
    ts.append(time.perf_counter()-t0)
print("XLA gather trilinear 250^3: min %.3f ms median %.3f ms" % (min(ts)*1e3, sorted(ts)[5]*1e3))

# map_coordinates comparison
from jax.scipy.ndimage import map_coordinates
@jax.jit
def mc(vol, m):
    D0, D1, D2 = vol.shape
    i = jax.lax.broadcasted_iota(jnp.float32, (D0, D1, D2), 0)
    j = jax.lax.broadcasted_iota(jnp.float32, (D0, D1, D2), 1)
    k = jax.lax.broadcasted_iota(jnp.float32, (D0, D1, D2), 2)
    sz = m[0,0]*i + m[0,1]*j + m[0,2]*k + m[0,3]
    sy = m[1,0]*i + m[1,1]*j + m[1,2]*k + m[1,3]
    sx = m[2,0]*i + m[2,1]*j + m[2,2]*k + m[2,3]
    return map_coordinates(vol, [sz, sy, sx], order=1, mode='constant', cval=0.0)
o2 = mc(vol, Mj); o2.block_until_ready()
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    mc(vol, Mj).block_until_ready()
    ts.append(time.perf_counter()-t0)
print("map_coordinates 250^3: min %.3f ms" % (min(ts)*1e3,))
print("max diff:", float(jnp.max(jnp.abs(o-o2))))
