"""Coverage simulation (float64) of the CURRENT walk-kernel origin logic,
for the 250^3 trial0 failure."""

import os
import sys

os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np

sys.path.insert(0, "/root/repo")


def check(v, m, fdtype=np.float64, max_report=3):
    from voltools_tpu.kernels.pallas_affine import _adjusted_matrix

    a = _adjusted_matrix(np.asarray(m, np.float64), v.ps, v.po).astype(fdtype)
    d0, d1, d2 = v.d
    og, os_, ol = v.out_d
    order = v.order
    taps = v.taps
    G = v.g
    zoff = taps[0] - 1
    az_l = a[0, 2]
    kappa = fdtype(a[1, 2] / az_l) if abs(az_l) > 1e-6 else fdtype(0.0)
    viol = 0
    reports = []

    def mirror(idx, n):
        if n == 1:
            return np.zeros_like(idx)
        period = 2 * n - 2
        idx = np.abs(idx) % period
        return np.where(idx >= n, period - idx, idx)

    def zorg_of(gp, sb, lb):
        zc = a[0, 0] * gp + a[0, 1] * sb + a[0, 2] * lb + a[0, 3]
        zlo = zc + min(a[0, 1] * 7, 0) + min(a[0, 2] * 127, 0)
        return int(np.clip(np.floor(zlo) + zoff, 0, d0 - v.hz)), zc

    def yb_of(gp, sb, lb, zk):
        zc = a[0, 0] * gp + a[0, 1] * sb + a[0, 2] * lb + a[0, 3]
        yc = a[1, 0] * gp + a[1, 1] * sb + a[1, 2] * lb + a[1, 3]
        return int(np.floor(yc + kappa * (fdtype(zk) - zc))) + v.y_lo

    og_pad = ((og + G - 1) // G) * G
    for gi in range(og_pad // G):
        for si in range((os_ + 7) // 8):
            for li in range((ol + 127) // 128):
                gpos, sbase, lbase = gi * G, si * 8, li * 128
                o0 = o1 = None
                for gg in (0, G - 1):
                    zorg_g, _ = zorg_of(gpos + gg, sbase, lbase)
                    o0 = zorg_g if o0 is None else min(o0, zorg_g)
                    for endk in (0, v.hz - 1):
                        yb = yb_of(gpos + gg, sbase, lbase, zorg_g + endk)
                        o1 = yb if o1 is None else min(o1, yb)
                o0 = int(np.clip(o0, 0, d0 - v.w0))
                o1 = int(np.clip(o1, 0, d1 - v.w1))
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
                    z0 = np.floor(zf).astype(int)
                    y0 = np.floor(yf).astype(int)
                    zorg, _ = zorg_of(gp, sbase, lbase)
                    for t in taps:
                        zt = (mirror(z0 + t, d0) if order == 3
                              else np.clip(z0 + t, 0, d0 - 1))
                        act = inside
                        badz = act & ((zt < zorg) | (zt >= zorg + v.hz)
                                      | (zt < o0) | (zt >= o0 + v.w0))
                        if badz.sum():
                            viol += badz.sum()
                            if len(reports) < max_report:
                                i = tuple(np.argwhere(badz)[0])
                                reports.append(("Z", (gi, si, li, g), i,
                                                zf[i], zt[i], zorg, o0))
                        zc = a[0, 0] * gp + a[0, 1] * sbase + a[0, 2] * lbase + a[0, 3]
                        yc = a[1, 0] * gp + a[1, 1] * sbase + a[1, 2] * lbase + a[1, 3]
                        for ty in taps:
                            yt = (mirror(y0 + ty, d1) if order == 3
                                  else np.clip(y0 + ty, 0, d1 - 1))
                            yb = (np.floor(yc + kappa * (zt.astype(fdtype) - zc))
                                  .astype(int) + v.y_lo)
                            yb = np.clip(yb, o1, o1 + v.w1 - v.hy)
                            bady = act & ((yt < yb) | (yt >= yb + v.hy))
                            if bady.sum():
                                viol += bady.sum()
                                if len(reports) < max_report:
                                    i = tuple(np.argwhere(bady)[0])
                                    reports.append(
                                        ("Y", (gi, si, li, g), i, zf[i],
                                         yf[i], yt[i] if np.ndim(yt) else yt,
                                         yb, o1, v.hy, v.w1))
    print(f"violations={viol}")
    for r in reports:
        print(r)
    return viol


def main():
    from voltools_tpu.kernels.pallas_walk import choose_walk_variant
    from voltools_tpu.utils import transform_matrix

    shape = (250,) * 3
    ang = (60.0, 156.5, -28.2)
    m = transform_matrix(rotation=ang, rotation_order="sxyz",
                         center=(125.0,) * 3)
    v = choose_walk_variant(m, shape, "linear", "constant", g=8)
    print("variant:", v)
    check(v, m)


if __name__ == "__main__":
    main()
