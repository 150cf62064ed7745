"""Round-4: two-pass (z-resolve, then yx-resolve) decomposition -- parity
probe for the judge's scheme (b).

The idea: factor the pull-back resample into pass 1 (1-D z-interp onto an
intermediate grid indexed (u, ys, xs), where zf is an exact affine function
of (u, yf, xf) by change of variables) and pass 2 (2-D bilinear of the
intermediate at (yf, xf)).  Each pass uses exact linear-interpolation
weights, and the coordinate maps compose to the original matrix exactly at
real-valued coordinates.

The flaw is structural: pass 2 reads tmp at integer taps (ys, xs) =
(y0+j, x0+k), and pass 1 evaluated its z-interp at zf(u, ys, xs) -- which
differs from the output voxel's true zf(u, yf, xf) by
beta*(ys-yf) + gamma*(xs-xf).  Direct trilinear uses ONE zf for all four
(j,k) taps; the two-pass result therefore samples the volume on a
bilinearly-warped surface instead.  Exact only when beta = gamma = 0, i.e.
the source z coordinate depends on u alone (axis-dominant maps, which the
walk kernel already handles at ndx<=3).  This script MEASURES the resulting
parity error vs scipy order-1 for the bench slow-class rotations."""
import sys

import numpy as np
from scipy.ndimage import affine_transform

sys.path.insert(0, "/root/repo")
from voltools_tpu.utils import transform_matrix


def two_pass(vol, A):
    """Two-pass resample: exact per-pass weights, composed maps == A."""
    A = np.asarray(A, np.float64)
    B = A[1:3, 1:3]              # (yf,xf) block w.r.t. (v,w)
    if abs(np.linalg.det(B)) < 1e-6:
        return None
    Binv = np.linalg.inv(B)
    b = A[1:3, 0]
    c = A[1:3, 3]
    # zf = A00*u + A0yx @ Binv @ ([yf,xf] - c - b*u) + A03
    A0yx = A[0, 1:3]
    coef_yx = A0yx @ Binv                       # (beta, gamma)
    alpha = A[0, 0] - coef_yx @ b
    delta = A[0, 3] - coef_yx @ c
    M1 = np.eye(4)
    M1[0, :] = [alpha, coef_yx[0], coef_yx[1], delta]
    M2 = np.eye(4)
    M2[1, :] = A[1, :]
    M2[2, :] = A[2, :]
    # sanity: M1 o M2 == A on the first row too
    assert np.allclose((M1 @ M2)[:3], A[:3], atol=1e-10)
    tmp = affine_transform(vol, M1, order=1, prefilter=False)
    return affine_transform(tmp, M2, order=1, prefilter=False), coef_yx


def main():
    size = 64
    rng = np.random.default_rng(0)
    noise = rng.random((size,) * 3).astype(np.float32)
    from scipy.ndimage import gaussian_filter
    smooth = gaussian_filter(noise, 2.0).astype(np.float32)
    center = (size / 2,) * 3

    rot_rng = np.random.default_rng(0)
    rot_rng.random((250,) * 3, dtype=np.float64)  # align bench stream
    angs = [rot_rng.uniform(-180, 180, 3) for _ in range(16)]

    print(f"{'rot':>3} {'|beta|+|gamma|':>14} {'max_err_noise':>13} "
          f"{'rms_noise':>10} {'max_err_smooth':>14}")
    for i in (3, 8, 11, 12, 14, 5):   # ndx=4 slow class + ndx=3 control
        m = transform_matrix(rotation=tuple(angs[i]), rotation_order="sxyz",
                             center=center)
        res = two_pass(noise, m)
        if res is None:
            print(f"{i:>3}  singular 2x2 block")
            continue
        tp, coef = res
        direct = affine_transform(noise, m, order=1, prefilter=False)
        mask = np.abs(direct) > 0   # compare interior contributions only
        err = np.abs(tp - direct)[mask]
        tp_s, _ = two_pass(smooth, m)
        direct_s = affine_transform(smooth, m, order=1, prefilter=False)
        err_s = np.abs(tp_s - direct_s)[np.abs(direct_s) > 0]
        print(f"{i:>3} {np.abs(coef).sum():>14.3f} {err.max():>13.2e} "
              f"{np.sqrt((err**2).mean()):>10.2e} {err_s.max():>14.2e}")
    print("\nparity tolerance for the suite is ~5e-5; the scheme's error is "
          "set by the matrix (beta/gamma), not the implementation.")


if __name__ == "__main__":
    main()
