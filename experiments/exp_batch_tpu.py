import time
import numpy as np
import sys; sys.path.insert(0, "/root/repo")
import voltools_tpu as vt
from scipy.ndimage import affine_transform

D = 250
rng = np.random.default_rng(0)
vol = rng.random((D,)*3).astype(np.float32)
sv = vt.StaticVolume(vol, interpolation="linear", device="tpu")

angles = np.arange(0.0, 180.0, 5.0)
ms = np.stack([vt.utils.rotation_matrix((a, 0, 0), "deg", "rzxz") for a in angles]).astype(np.float32)

# batched sweep, device output (no D2H), one program
t0 = time.perf_counter()
out = sv.affine_batch(ms, output="device")
out.block_until_ready()   # may not truly block on tunnel; force one element
float(out[-1, 0, 0, 0])
t1 = time.perf_counter()
total = (t1 - t0) * 1e3
print(f"180-rotation sweep 250^3 linear: {total:.0f} ms total = {total/len(angles):.2f} ms/rotation (incl compile)")

# second run: compiled
t0 = time.perf_counter()
out = sv.affine_batch(ms, output="device")
float(out[-1, 0, 0, 0])
t1 = time.perf_counter()
total = (t1 - t0) * 1e3
print(f"compiled: {total:.0f} ms total = {total/len(angles):.2f} ms/rotation")

# spot-check correctness vs scipy at a few angles
host = np.asarray(out)
for i in (0, 15, 35):
    ref = affine_transform(vol, ms[i], order=1, prefilter=False)
    print(f"angle {angles[i]}: max err vs scipy = {np.abs(host[i]-ref).max():.2e}")
