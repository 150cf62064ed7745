import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
from scipy.ndimage import affine_transform
from voltools_tpu.ops import affine_sample, bspline_prefilter

rng = np.random.default_rng(42)
vol = rng.random((17, 19, 23)).astype(np.float32)
M = np.eye(4, dtype=np.float32)
th = 0.4
c, s = np.cos(th), np.sin(th)
M[:3,:3] = np.array([[c,-s,0],[s,c,0],[0,0,1.05]],np.float32) @ np.array([[1,0.1,0],[0,1,0],[0,0,1]],np.float32)
M[:3,3] = [1.2, -0.7, 0.4]

for interp, order, pref in [("linear",1,False), ("bspline",3,False), ("filt_bspline",3,True)]:
    ref = affine_transform(vol, M, order=order, prefilter=pref)
    got = np.asarray(affine_sample(vol, M, interp))
    print(interp, "max abs err:", np.abs(ref-got).max())

# prefilter scan vs fir vs scipy spline_filter
from scipy.ndimage import spline_filter
sf = spline_filter(vol, order=3, mode='mirror', output=np.float32)
for method in ("scan", "fir"):
    got = np.asarray(bspline_prefilter(vol, "mirror", method))
    print("prefilter", method, "vs scipy mirror:", np.abs(sf-got).max())

# direct numpy IIR (reference semantics, clamp boundary) as independent oracle
def iir_1d_clamp(x):
    p = np.sqrt(3)-2; lam = (1-p)*(1-1/p)
    n = len(x); H = min(12, n)
    c = x.astype(np.float64).copy()
    zn, S = p, c[0]
    for k in range(H):
        S += zn * c[k]; zn *= p
    c[0] = prev = lam * S
    for k in range(1, n):
        c[k] = prev = lam * c[k] + p * prev
    c[n-1] = prev = (p/(p-1.0)) * c[n-1]
    for k in range(n-2, -1, -1):
        c[k] = prev = p * (prev - c[k])
    return c

x = rng.random(41).astype(np.float32)
ref1d = iir_1d_clamp(x)
from voltools_tpu.ops.prefilter import prefilter_scan, prefilter_fir
got_scan = np.asarray(prefilter_scan(np.asarray(x)[None,None,:], 2, "clamp"))[0,0]
got_fir  = np.asarray(prefilter_fir(np.asarray(x)[None,None,:], 2, "clamp"))[0,0]
print("clamp scan vs direct IIR:", np.abs(ref1d-got_scan).max())
print("clamp fir  vs direct IIR:", np.abs(ref1d-got_fir).max())
