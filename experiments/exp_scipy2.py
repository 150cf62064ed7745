import numpy as np
from scipy.ndimage import affine_transform, map_coordinates

rng = np.random.default_rng(0)
vol = rng.random((7,8,9)).astype(np.float32)
M = np.eye(4); M[:3,:3] = np.array([[0.9,0.1,0],[0.05,1.0,-0.1],[0,0.2,0.95]]); M[:3,3]=[0.3,-0.2,0.1]
o1 = affine_transform(vol, M, order=1, prefilter=False)
i,j,k = np.meshgrid(np.arange(7),np.arange(8),np.arange(9),indexing='ij')
coords = np.stack([M[0,0]*i+M[0,1]*j+M[0,2]*k+M[0,3],
                   M[1,0]*i+M[1,1]*j+M[1,2]*k+M[1,3],
                   M[2,0]*i+M[2,1]*j+M[2,2]*k+M[2,3]])
o2 = map_coordinates(vol, coords, order=1, mode='constant')
d = np.abs(o1-o2)
idx = np.unravel_index(np.argmax(d), d.shape)
print("max diff at", idx, "coord:", coords[:, idx[0], idx[1], idx[2]], "o1:", o1[idx], "o2:", o2[idx])
bad = np.argwhere(d > 1e-6)
print("num diffs:", len(bad))
for b in bad[:5]:
    c = coords[:, b[0], b[1], b[2]]
    print(" out", b, "src", c, "o1", o1[tuple(b)], "o2", o2[tuple(b)])
# hypothesis: affine_transform uses matrix@out while I computed... check with separate matrix/offset call
o3 = affine_transform(vol, M[:3,:3], offset=M[:3,3], order=1, prefilter=False)
print("o1 vs o3:", np.abs(o1-o3).max())
