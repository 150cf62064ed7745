"""Host-side simulation of the walk kernel's coverage logic for one failing
case: for every active (element, tap) check that its z-plane is visited and
its y-row falls inside that plane's slice."""

import os
import sys

os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, "/root/repo")


def check(v, m, shape, verbose=True):
    from voltools_tpu.kernels.pallas_affine import _adjusted_matrix

    a = _adjusted_matrix(np.asarray(m, np.float64), v.ps, v.po).astype(np.float64)
    d0, d1, d2 = v.d
    og, os_, ol = v.out_d
    order = v.order
    taps = v.taps
    G = v.g
    viol_z = viol_y = viol_w = 0
    worst = None

    def mirror(idx, n):
        if n == 1:
            return np.zeros_like(idx)
        period = 2 * n - 2
        idx = np.abs(idx) % period
        return np.where(idx >= n, period - idx, idx)

    og_pad = ((og + G - 1) // G) * G
    for gi in range(og_pad // G):
        for si in range((os_ + 7) // 8):
            for li in range((ol + 127) // 128):
                gpos, sbase, lbase = gi * G, si * 8, li * 128

                def origin(r, wr, dr):
                    base = (a[r, 0] * gpos + a[r, 1] * sbase
                            + a[r, 2] * lbase + a[r, 3])
                    lo = (base + min(a[r, 0] * (G - 1.0), 0.0)
                          + min(a[r, 1] * 7.0, 0.0)
                          + min(a[r, 2] * 127.0, 0.0))
                    o = int(np.floor(lo)) - (2 if order == 3 else 1) - 1
                    return int(np.clip(o, 0, dr - wr))

                o0 = origin(0, v.w0, d0)
                o1 = origin(1, v.w1, d1)
                for g in range(G):
                    gp = gpos + g
                    if gp >= og:
                        continue
                    s = np.arange(8)[:, None] + sbase
                    l = np.arange(128)[None, :] + lbase
                    zf = a[0, 0] * gp + a[0, 1] * s + a[0, 2] * l + a[0, 3]
                    yf = a[1, 0] * gp + a[1, 1] * s + a[1, 2] * l + a[1, 3]
                    xf = a[2, 0] * gp + a[2, 1] * s + a[2, 2] * l + a[2, 3]
                    inside = ((zf >= 0) & (zf <= d0 - 1) & (yf >= 0)
                              & (yf <= d1 - 1) & (xf >= 0) & (xf <= d2 - 1))
                    if v.mode == "border":
                        inside = ((zf > -0.5) & (zf < d0 - 0.5) & (yf > -0.5)
                                  & (yf < d1 - 0.5) & (xf > -0.5)
                                  & (xf < d2 - 0.5))
                    z0 = np.floor(zf).astype(int)
                    y0 = np.floor(yf).astype(int)

                    zc = a[0, 0] * gp + a[0, 1] * sbase + a[0, 2] * lbase + a[0, 3]
                    yc = a[1, 0] * gp + a[1, 1] * sbase + a[1, 2] * lbase + a[1, 3]
                    az_l = a[0, 2]
                    kappa = a[1, 2] / az_l if abs(az_l) > 1e-6 else 0.0
                    zlo = (zc + min(a[0, 1] * 7.0, 0.0)
                           + min(a[0, 2] * 127.0, 0.0))
                    zorg = int(np.floor(zlo)) - (2 if order == 3 else 1) - 1
                    zorg = int(np.clip(zorg, 0, d0 - v.hz))

                    for t in taps:
                        if v.mode == "constant":
                            zt = (mirror(z0 + t, d0) if order == 3
                                  else np.clip(z0 + t, 0, d0 - 1))
                        else:
                            zt = np.clip(z0 + t, 0, d0 - 1)
                            # invalid taps are weight-0: skip coverage
                        act = inside if v.mode == "constant" else (
                            inside & (z0 + t >= 0) & (z0 + t < d0))
                        # z-plane visited?
                        bad = act & ((zt < zorg) | (zt >= zorg + v.hz))
                        viol_z += bad.sum()
                        # window covers?
                        badw = act & ((zt < o0) | (zt >= o0 + v.w0))
                        viol_w += badw.sum()
                        # y coverage per plane
                        for ty in taps:
                            if v.mode == "constant":
                                yt = (mirror(y0 + ty, d1) if order == 3
                                      else np.clip(y0 + ty, 0, d1 - 1))
                                acty = act
                            else:
                                yt = np.clip(y0 + ty, 0, d1 - 1)
                                acty = act & (y0 + ty >= 0) & (y0 + ty < d1)
                            zk = zt
                            y_line = yc + kappa * (zk - zc)
                            yb = np.floor(y_line).astype(int) + v.y_lo
                            yb = np.clip(yb, o1, o1 + v.w1 - v.hy)
                            bady = acty & ((yt < yb) | (yt >= yb + v.hy))
                            if bady.sum() and worst is None:
                                i = tuple(np.argwhere(bady)[0])
                                worst = dict(tile=(gi, si, li, g), elem=i,
                                             zf=zf[i], yf=yf[i], t=t, ty=ty,
                                             zk=zk[i], yt=yt[i],
                                             y_line=y_line[i], yb=yb[i],
                                             o1=o1, hy=v.hy, y_lo=v.y_lo,
                                             kappa=kappa)
                            viol_y += bady.sum()
    print(f"violations: z={viol_z} y={viol_y} window={viol_w}")
    if worst:
        print("first y-violation:", worst)
    return viol_z + viol_y + viol_w


def main():
    from voltools_tpu.kernels.pallas_walk import choose_walk_variant
    from voltools_tpu.utils import transform_matrix

    # trial 9 linear failing case
    shape = (35, 42, 38)
    ang = (-55.3, -86.5, -86.0)
    rngm = np.random.default_rng(123)
    m = transform_matrix(rotation=ang, rotation_order="sxyz",
                         center=tuple((np.array(shape) - 1) / 2))
    v = choose_walk_variant(m, shape, "linear", "constant", g=4)
    print("variant:", v)
    check(v, m, shape)


if __name__ == "__main__":
    main()
