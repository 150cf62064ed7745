import numpy as np
from scipy.ndimage import affine_transform, map_coordinates, spline_filter1d

# 1D-ish probe: order 1, mode constant. Where does blending with cval stop?
v = np.arange(10, dtype=np.float32) + 1.0  # 1..10
def probe(order, prefilter, coords):
    return map_coordinates(v, [np.array(coords)], order=order, mode='constant', cval=0.0, prefilter=prefilter)

print("order1 at [-0.5,-0.3,-1e-6, 0.0, 8.5, 9.0, 9.3, 9.5]:",
      probe(1, False, [-0.5,-0.3,-1e-6,0.0,8.5,9.0,9.3,9.5]))
# order 3 unfiltered near edges
print("order3 nofilt at [0.0, 0.5, 1.5, 8.5, 9.0, 9.2]:",
      probe(3, False, [0.0,0.5,1.5,8.5,9.0,9.2]))
# does order3 at 0.5 use a tap at -1 as 0? direct computation:
def bw(f):
    return np.array([(1-f)**3/6, 2/3 - f*f*(2-f)/2, 2/3-(1-f)**2*(1+f)/2, f**3/6])
w = bw(0.5)
taps_zero = w[0]*0 + w[1]*v[0] + w[2]*v[1] + w[3]*v[2]          # tap -1 -> 0
taps_clamp = w[0]*v[0] + w[1]*v[0] + w[2]*v[1] + w[3]*v[2]      # clamp
taps_mirror = w[0]*v[1] + w[1]*v[0] + w[2]*v[1] + w[3]*v[2]     # mirror about 0
print("manual order3@0.5 zero/clamp/mirror:", taps_zero, taps_clamp, taps_mirror)

# prefilter boundary: scipy spline_filter1d default mode for affine_transform(mode='constant')?
vf = spline_filter1d(v, order=3, mode='mirror')
vf_const = spline_filter1d(v, order=3, mode='constant')
out_pref = map_coordinates(v, [np.array([3.3])], order=3, mode='constant', prefilter=True)
out_manual_mirror = map_coordinates(vf, [np.array([3.3])], order=3, mode='constant', prefilter=False)
out_manual_const = map_coordinates(vf_const, [np.array([3.3])], order=3, mode='constant', prefilter=False)
print("prefilter=True @3.3:", out_pref, "| manual mirror-filt:", out_manual_mirror, "| manual const-filt:", out_manual_const)

# 3D affine_transform consistency with map_coordinates
rng = np.random.default_rng(0)
vol = rng.random((7,8,9)).astype(np.float32)
M = np.eye(4); M[:3,:3] = np.array([[0.9,0.1,0],[0.05,1.0,-0.1],[0,0.2,0.95]]); M[:3,3]=[0.3,-0.2,0.1]
o1 = affine_transform(vol, M, order=1, prefilter=False)
i,j,k = np.meshgrid(np.arange(7),np.arange(8),np.arange(9),indexing='ij')
coords = np.stack([M[0,0]*i+M[0,1]*j+M[0,2]*k+M[0,3],
                   M[1,0]*i+M[1,1]*j+M[1,2]*k+M[1,3],
                   M[2,0]*i+M[2,1]*j+M[2,2]*k+M[2,3]])
o2 = map_coordinates(vol, coords, order=1, mode='constant')
print("affine vs map_coords max diff:", np.abs(o1-o2).max())
