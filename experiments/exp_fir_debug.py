import os
os.environ["JAX_PLATFORMS"]="cpu"
os.environ["XLA_FLAGS"]="--xla_force_host_platform_device_count=8"
import numpy as np
from scipy.ndimage import spline_filter, spline_filter1d
import sys; sys.path.insert(0,"/root/repo")
from voltools_tpu.ops.prefilter import bspline_prefilter, prefilter_fir, prefilter_scan

rng = np.random.default_rng(1234)
vol = rng.random((17,19,23)).astype(np.float32)
exp = spline_filter(vol, order=3, mode="mirror", output=np.float32)
fir = np.asarray(bspline_prefilter(vol, "mirror", "fir"))
scan = np.asarray(bspline_prefilter(vol, "mirror", "scan"))
print("fir vs scipy:", np.abs(fir-exp).max())
print("scan vs scipy:", np.abs(scan-exp).max())
print("fir vs scan:", np.abs(fir-scan).max())
# per-axis 1D check
x = rng.random(23).astype(np.float32)
e1 = spline_filter1d(x, order=3, mode="mirror")
f1 = np.asarray(prefilter_fir(x[None,None,:], 2, "mirror"))[0,0]
s1 = np.asarray(prefilter_scan(x[None,None,:], 2, "mirror"))[0,0]
print("1d fir:", np.abs(f1-e1).max(), "1d scan:", np.abs(s1-e1).max())
# where is the 3D error?
d = np.abs(fir-exp)
print("err profile along axis0:", d.max(axis=(1,2)))
print("err profile along axis2:", d.max(axis=(0,1)))
