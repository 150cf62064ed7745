"""Full f32 numpy replication of the plane-walk kernel's band mechanics.

The interpret-mode kernel tests (``test_walk.py``) mask voxels whose source
coordinate sits within ~1e-4 of an integer, because XLA:CPU's simulated
executable can rematerialize a coordinate chain into fusions with different
FMA contraction and flip a ``floor()`` inconsistently *between two copies of
the same value*.  That masking is justified by the claim that the kernel's
*mechanics* are knife-edge-safe when every consumer sees ONE evaluation of
each coordinate (as Mosaic guarantees on hardware): wherever the f32 floor
lands, the walk/band/slot geometry still covers the taps and the folded
weights stay consistent.

This module commits that argument as a test.  ``walk_replica`` re-implements
``pallas_walk._make_walk_kernel`` (and ``_preparer`` / ``permute_matrix`` /
``_unblocker``) step for step in numpy float32 — same operation order, same
floors, same clips, same gather decomposition — evaluating each coordinate
exactly once.  Its output is compared against the scipy-verified XLA oracle
WITHOUT any knife-edge masking, including on transforms where *every* voxel
sits on a knife edge (integer translations, 90-degree rotations,
exactly-representable half-voxel scalings).  Agreement within 5e-5
demonstrates the band geometry (hz walk length, y band, dx slots) loses no
taps to f32 floor flips; the residual interpret-mode divergence is therefore
an artifact of the simulator, not the kernel math.

Reference behaviour: ``/root/reference/voltools/transforms.py:232-287`` with
``kernels/helper_interpolation.h`` tap semantics.
"""

import numpy as np
import pytest

from voltools_tpu.kernels.pallas_walk import (WalkVariant, _PIPELINE_DEPTH,
                                              choose_walk_variant)
from voltools_tpu.ops.sampling import affine_sample
from voltools_tpu.utils import transform_matrix

f32 = np.float32


def _mirror_np(idx, n):
    if n == 1:
        return np.zeros_like(idx)
    period = 2 * (n - 1)
    idx = np.remainder(idx, period)
    return np.where(idx >= n, period - idx, idx)


def _bspline_w_np(f):
    one = f32(1.0)
    g = one - f
    f2 = f * f
    g2 = g * g
    w0 = f32(1.0 / 6.0) * g2 * g
    w1 = f32(2.0 / 3.0) - f32(0.5) * f2 * (f32(2.0) - f)
    w2 = f32(2.0 / 3.0) - f32(0.5) * g2 * (f32(2.0) - g)
    w3 = f32(1.0 / 6.0) * f2 * f
    return w0, w1, w2, w3


def _prepare_np(volume, v: WalkVariant):
    """numpy replica of pallas_walk._preparer."""
    vol_p = np.transpose(np.asarray(volume, f32), v.ps)
    if v.xpad:
        vol_p = np.concatenate(
            [vol_p[..., 1:v.xpad + 1][..., ::-1], vol_p,
             vol_p[..., -v.xpad - 1:-1][..., ::-1]], axis=-1)
    ncopies, nbk = v.ncopies, v.nbk
    x_pad = nbk * 128 + (ncopies - 1) * v.xg
    if x_pad > v.d[2]:
        vol_p = np.pad(vol_p, ((0, 0), (0, 0), (0, x_pad - v.d[2])))
    vol_s = np.stack([vol_p[..., c * v.xg: c * v.xg + nbk * 128]
                      for c in range(ncopies)])
    return vol_s.reshape(ncopies, v.d[0], v.d[1], nbk, 128)


def _payload_np(matrix, v: WalkVariant):
    """numpy replica of pallas_walk.permute_matrix."""
    m = np.asarray(matrix, f32)
    rows = np.stack([m[v.ps[k]] for k in range(3)])
    cols = np.stack([rows[:, v.po[j]] for j in range(3)] + [rows[:, 3]],
                    axis=1)
    if v.xpad:
        cols[2, 3] = cols[2, 3] + f32(v.xpad)
    kappa = f32(0.0) if v.kax < 0 else cols[1, v.kax] / cols[0, v.kax]
    payload = np.array([kappa, f32(v.y_lo), 0.0, 0.0], f32)
    return np.concatenate([cols, payload[None]], axis=0)


def walk_replica(volume, matrix, v: WalkVariant, cval=0.0):
    """f32 numpy replication of _make_walk_kernel + _unblocker (batch=0)."""
    d0, d1, d2 = v.d
    w0, w1 = v.w0, v.w1
    hz, hy = v.hz, v.hy
    vb, wb = v.vb, v.wb
    gu, gv = v.gu, v.gv
    nbw, xg = v.nbw, v.xg
    dyn_x, ncopies = v.dyn_x, v.ncopies
    taps, dxs = v.taps, v.dxs
    order = v.order
    constant = v.mode == "constant"
    use_mirror = constant and order == 3 and v.xpad == 0
    ycand = v.ycand
    wsh = wb.bit_length() - 1
    zoff = taps[0] - 1
    cvalf = f32(cval)

    a = _payload_np(matrix, v)
    vol_s = _prepare_np(volume, v)

    U, V, W = v.out_d
    U_pad = -(8 * gu) * (-U // (8 * gu))
    V_pad = -(vb * gv) * (-V // (vb * gv))
    W_pad = -wb * (-W // wb)
    out_b = np.zeros((V_pad // vb, W_pad // wb, U_pad, 128), f32)

    def zorg_of(ub, vbase, wbase):
        zc = a[0, 0] * ub + a[0, 1] * vbase + a[0, 2] * wbase + a[0, 3]
        zlo = (zc + np.minimum(a[0, 0] * f32(7.0), f32(0.0))
               + np.minimum(a[0, 1] * f32(vb - 1.0), f32(0.0))
               + np.minimum(a[0, 2] * f32(wb - 1.0), f32(0.0)))
        zorg = np.floor(zlo).astype(np.int32) + zoff
        return np.clip(zorg, 0, d0 - hz), zc

    def yb_of(ub, vbase, wbase, zk):
        zc = a[0, 0] * ub + a[0, 1] * vbase + a[0, 2] * wbase + a[0, 3]
        yc = a[1, 0] * ub + a[1, 1] * vbase + a[1, 2] * wbase + a[1, 3]
        y_line = yc + a[3, 0] * (f32(zk) - zc)
        return np.floor(y_line).astype(np.int32) + np.int32(a[3, 1])

    def origins(ubt, vbt, wbt):
        o0 = o1 = None
        for cu in (f32(0.0), f32(8 * (gu - 1))):
            for cv in (f32(0.0), f32(vb * (gv - 1))):
                zorg_c, _ = zorg_of(ubt + cu, vbt + cv, wbt)
                o0 = zorg_c if o0 is None else min(o0, zorg_c)
                for endk in (0, hz - 1):
                    yb = yb_of(ubt + cu, vbt + cv, wbt, zorg_c + endk)
                    o1 = yb if o1 is None else min(o1, yb)
        o0 = int(np.clip(o0, 0, d0 - w0))
        o1 = int(np.clip(o1, 0, d1 - w1))
        if not dyn_x:
            return o0, o1, 0
        xlo = (a[2, 0] * ubt + a[2, 1] * vbt + a[2, 2] * wbt + a[2, 3]
               + np.minimum(a[2, 0] * f32(8.0 * gu - 1.0), f32(0.0))
               + np.minimum(a[2, 1] * f32(vb * gv - 1.0), f32(0.0))
               + np.minimum(a[2, 2] * f32(wb - 1.0), f32(0.0)))
        margin = dxs[0] - 2
        xlo_i = int(np.floor(xlo)) + margin
        tx = np.clip(xlo_i, 0, d2 - 1) // xg
        return o0, o1, int(np.clip(tx, 0, (d2 - 1) // xg))

    s_iota = np.arange(8, dtype=np.int32)[:, None] * np.ones(
        (1, 128), np.int32)
    l_iota = np.ones((8, 1), np.int32) * np.arange(128, dtype=np.int32)
    sf = s_iota.astype(f32)
    vlf = (l_iota >> wsh).astype(f32)
    wlf = (l_iota & (wb - 1)).astype(f32)

    grid = (U_pad // (8 * gu), V_pad // (vb * gv), W_pad // wb)
    for ui in range(grid[0]):
        for vi in range(grid[1]):
            for wi in range(grid[2]):
                ubt = f32(ui * 8 * gu)
                vbt = f32(vi * vb * gv)
                wbt = f32(wi * wb)
                o0, o1, tx = origins(ubt, vbt, wbt)
                if dyn_x:
                    ci, b0 = tx % ncopies, tx // ncopies
                else:
                    ci, b0 = 0, 0
                win = np.stack([vol_s[ci, o0:o0 + w0, o1:o1 + w1, b0 + j]
                                for j in range(nbw)])   # (nbw, w0, w1, 128)
                for igu in range(gu):
                    for igv in range(gv):
                        res = _do_vreg(
                            a, win, ubt, vbt, wbt, igu, igv, o0, o1, tx, v,
                            sf, vlf, wlf, cvalf)
                        out_b[vi * gv + igv, wi,
                              ui * 8 * gu + igu * 8:
                              ui * 8 * gu + igu * 8 + 8, :] = res

    # _unblocker replica
    out = out_b.reshape(V_pad // vb, W_pad // wb, U_pad, vb, wb)
    out = np.transpose(out, (2, 0, 3, 1, 4)).reshape(U_pad, V_pad, W_pad)
    return np.transpose(out[:U, :V, :W], tuple(np.argsort(v.po)))


def _do_vreg(a, win, ubt, vbt, wbt, igu, igv, o0, o1, tx, v, sf, vlf, wlf,
             cvalf):
    d0, d1, d2 = v.d
    w1, hz, hy = v.w1, v.hz, v.hy
    vb, wb, nbw, xg = v.vb, v.wb, v.nbw, v.xg
    taps, dxs, order = v.taps, v.dxs, v.order
    constant = v.mode == "constant"
    use_mirror = constant and order == 3 and v.xpad == 0
    ycand = v.ycand
    zoff = taps[0] - 1

    ub = ubt + f32(8.0) * f32(igu)
    vbase = vbt + f32(v.vb) * f32(igv)
    up = ub + sf
    vp = vbase + vlf
    wp = wbt + wlf

    def coord(r):
        return a[r, 0] * up + a[r, 1] * vp + a[r, 2] * wp + a[r, 3]

    zf, yf, xf = coord(0), coord(1), coord(2)
    z0 = np.floor(zf).astype(np.int32)
    y0f = np.floor(yf)
    x0f = np.floor(xf)
    fz = zf - z0.astype(f32)
    fy = yf - y0f
    fx = xf - x0f
    y0 = y0f.astype(np.int32)
    x0 = x0f.astype(np.int32)

    if order == 1:
        wz = (f32(1.0) - fz, fz)
        wy = (f32(1.0) - fy, fy)
        wx = (f32(1.0) - fx, fx)
    else:
        wz = _bspline_w_np(fz)
        wy = _bspline_w_np(fy)
        wx = _bspline_w_np(fx)

    xb_row = a[2, 0] * ub + a[2, 1] * vp + a[2, 2] * wp + a[2, 3]
    xb = np.floor(xb_row).astype(np.int32)
    dxneed = x0 - xb

    def x_tap(t):
        idx = x0 + t
        if constant:
            if use_mirror:
                return _mirror_np(idx, d2), None
            return np.clip(idx, 0, d2 - 1), None
        return np.clip(idx, 0, d2 - 1), (idx >= 0) & (idx < d2)

    xtaps = [x_tap(t) for t in taps]
    xparts, bmask = {}, {}
    for dx in dxs:
        idx = np.clip(xb + dx, 0, d2 - 1)
        if nbw == 1:
            xparts[dx] = (None, np.clip(idx - tx * xg, 0, 127))
        else:
            xparts[dx] = (idx >> 7, idx & 127)
            bmask[dx] = [xparts[dx][0] == b for b in range(1, nbw)]
    wfold = {}
    for dx in dxs:
        acc = np.zeros((8, 128), f32)
        for ix, (xt, xvalid) in enumerate(xtaps):
            dxp = (xt - xb) if use_mirror else (dxneed + taps[ix])
            w = wx[ix]
            if xvalid is not None:
                w = np.where(xvalid, w, f32(0.0))
            acc = acc + np.where(dxp == dx, w, f32(0.0))
        wfold[dx] = acc

    def row_tap(base, t, n):
        idx = base + t
        if constant:
            if order == 3:
                return _mirror_np(idx, n), None
            return np.clip(idx, 0, n - 1), None
        return np.clip(idx, 0, n - 1), (idx >= 0) & (idx < n)

    ztaps = [row_tap(z0, t, d0) for t in taps]
    ytaps = [row_tap(y0, t, d1) for t in taps]
    wys = [np.where(yv, w, f32(0.0)) if yv is not None else w
           for w, (_, yv) in zip(wy, ytaps)]
    wzs = [np.where(zv, w, f32(0.0)) if zv is not None else w
           for w, (_, zv) in zip(wz, ztaps)]

    zorg, _ = None, None
    zc = a[0, 0] * ub + a[0, 1] * vbase + a[0, 2] * wbt + a[0, 3]
    zlo = (zc + np.minimum(a[0, 0] * f32(7.0), f32(0.0))
           + np.minimum(a[0, 1] * f32(vb - 1.0), f32(0.0))
           + np.minimum(a[0, 2] * f32(wb - 1.0), f32(0.0)))
    zorg = int(np.clip(np.floor(zlo).astype(np.int32) + zoff, 0, d0 - hz))

    acc = np.zeros((8, 128), f32)
    for k in range(hz):
        zk = zorg + k
        yc = a[1, 0] * ub + a[1, 1] * vbase + a[1, 2] * wbt + a[1, 3]
        y_line = yc + a[3, 0] * (f32(zk) - zc)
        yb_k = np.floor(y_line).astype(np.int32) + np.int32(a[3, 1])
        yb_k = int(np.clip(yb_k, o1, o1 + w1 - hy))

        wplane = np.zeros((8, 128), f32)
        for iz, (zt, _) in enumerate(ztaps):
            wplane = wplane + np.where(zt == zk, wzs[iz], f32(0.0))

        hits = [None] * len(ytaps)
        for c in range(ycand):
            rows = [win[b, zk - o0, yb_k - o1 + c * 8: yb_k - o1 + c * 8 + 8,
                        :] for b in range(nbw)]
            mcs, moks = [], []
            for (yt, _) in ytaps:
                m = (yt - yb_k) - c * 8
                mcs.append(np.clip(m, 0, 7))
                moks.append((m >= 0) & (m < 8) if ycand > 1 else None)
            parts = [None] * len(ytaps)
            for dx in dxs:
                _, within = xparts[dx]
                g = np.take_along_axis(rows[0], within, axis=1)
                for b in range(1, nbw):
                    gat = np.take_along_axis(rows[b], within, axis=1)
                    g = np.where(bmask[dx][b - 1], gat, g)
                wf = wfold[dx]
                for iy in range(len(ytaps)):
                    p = wf * np.take_along_axis(g, mcs[iy], axis=0)
                    parts[iy] = p if parts[iy] is None else parts[iy] + p
            for iy in range(len(ytaps)):
                part = parts[iy]
                if moks[iy] is not None:
                    part = np.where(moks[iy], part, f32(0.0))
                hits[iy] = part if hits[iy] is None else hits[iy] + part
        val = None
        for iy in range(len(ytaps)):
            term = wys[iy] * hits[iy]
            val = term if val is None else val + term
        acc = acc + wplane * val

    if constant:
        inside = ((zf >= 0) & (zf <= d0 - 1) & (yf >= 0) & (yf <= d1 - 1)
                  & (xf >= v.xpad) & (xf <= d2 - 1 - v.xpad))
    else:
        inside = ((zf > -0.5) & (zf < d0 - 0.5) & (yf > -0.5)
                  & (yf < d1 - 0.5) & (xf > -0.5) & (xf < d2 - 0.5))
    return np.where(inside, acc, cvalf)


# ---------------------------------------------------------------------------


def _variant_or_skip(m, shape, interpolation, mode):
    v = choose_walk_variant(m, shape, interpolation, mode)
    if v is None:
        pytest.skip("no walk variant for this configuration")
    return v


def _check(volume, m, interpolation, mode, atol=5e-5):
    v = _variant_or_skip(m, volume.shape, interpolation, mode)
    got = walk_replica(volume, m, v)
    want = np.asarray(affine_sample(volume, m, interpolation, mode,
                                    prefiltered=True))
    err = np.abs(got - want).max()
    assert err <= atol, f"max err {err:.2e} (unmasked, {v})"


@pytest.fixture(scope="module")
def volume():
    rng = np.random.default_rng(11)
    return rng.random((16, 24, 32)).astype(np.float32)


@pytest.mark.parametrize("interpolation", ["linear", "bspline"])
@pytest.mark.parametrize("seed", [3, 7])
def test_replica_random_rotation_unmasked(volume, interpolation, seed):
    """General rotations, compared WITHOUT the knife-edge mask."""
    rng = np.random.default_rng(seed)
    ang = rng.uniform(-180, 180, 3)
    m = transform_matrix(rotation=tuple(ang), rotation_order="sxyz",
                         center=tuple(s / 2 for s in volume.shape))
    _check(volume, m, interpolation, "constant")


@pytest.mark.parametrize("interpolation", ["linear", "bspline"])
def test_replica_all_knife_edges_integer_translation(volume, interpolation):
    """EVERY voxel sits exactly on a knife edge: integer translation."""
    m = transform_matrix(translation=(3, -5, 2))
    _check(volume, m, interpolation, "constant")


def test_replica_all_knife_edges_rot90(volume):
    """90-degree rotation about the volume center: every source coordinate
    is integral or half-integral (exactly representable in f32)."""
    m = transform_matrix(rotation=(90, 0, 0), rotation_order="rzxz",
                         center=tuple((s - 1) / 2 for s in volume.shape))
    _check(volume, m, "linear", "constant")


def test_replica_half_voxel_scale(volume):
    """Exactly-representable 0.5 scaling: half the voxels on knife edges."""
    m = transform_matrix(scale=(0.5, 0.5, 0.5),
                         center=tuple(s / 2 for s in volume.shape))
    _check(volume, m, "linear", "constant")


def test_replica_border_mode(volume):
    rng = np.random.default_rng(0)
    ang = rng.uniform(-180, 180, 3)
    m = transform_matrix(rotation=tuple(ang), rotation_order="sxyz",
                         center=tuple(s / 2 for s in volume.shape))
    _check(volume, m, "linear", "border")


def test_replica_dynamic_x_window():
    """x extent > 128 with a compact footprint: the planner picks a dynamic
    32-granular window origin realized via x-shifted HBM copies."""
    rng = np.random.default_rng(17)
    vol = rng.random((12, 16, 160)).astype(np.float32)
    m = transform_matrix(rotation=(0, 0, 25), rotation_order="sxyz",
                         center=tuple(s / 2 for s in vol.shape))
    v = _variant_or_skip(m, vol.shape, "linear", "constant")
    assert v.dyn_x, "expected a dynamic-x variant here"
    _check(vol, m, "linear", "constant")


def test_replica_multiblock_x():
    """Static two-block window (nbw = 2): the per-dx lane gather blends
    both 128-wide blocks by block index (the 250^3 regime, forced here so
    the replica stays small enough to run in numpy)."""
    import dataclasses

    from voltools_tpu.kernels.pallas_walk import walk_variant_covers

    rng = np.random.default_rng(17)
    vol = rng.random((12, 16, 160)).astype(np.float32)
    m = transform_matrix(rotation=(0, 0, 25), rotation_order="sxyz",
                         center=tuple(s / 2 for s in vol.shape))
    v = _variant_or_skip(m, vol.shape, "linear", "constant")
    v = dataclasses.replace(v, xg=128, xw=256)
    assert v.nbw == 2 and not v.dyn_x
    assert walk_variant_covers(v, m, vol.shape, "linear", "constant")
    got = walk_replica(vol, m, v)
    want = np.asarray(affine_sample(vol, m, "linear", "constant",
                                    prefiltered=True))
    assert np.abs(got - want).max() <= 5e-5
