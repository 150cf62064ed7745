"""Plane-walk Pallas kernel: general-rotation affine resampling.

The round-1 kernel (:mod:`.pallas_affine`) resolves the per-element source
row with a select-tree scanned over *every* row-vreg of the tile's source
window — O(window rows) vector work per output vreg.  For axis-dominant
matrices windows are tiny and that is fast; for general 3-D rotations the
window grows to thousands of rows and the scan dominates (measured 88% of
a 245 ms call at 250^3; the DMA floor was 29 ms).

This kernel exploits the geometry instead: the 128 output lanes map to a
*line* in source space, so the source rows an output vreg needs lie along a
staircase that crosses only ``hz`` z-planes, and within one z-plane the
active elements' y coordinates span only a few rows (the line's local
y-window).  Per output vreg we therefore:

* walk the ``hz`` source z-planes of the footprint (``fori_loop``);
* per plane, read an ``hy``-row y-slice at a scalar, data-dependent offset
  (``pl.ds`` on a non-minor window dim — the one dynamic-origin access TPUs
  do cheaply);
* resolve x with lane gathers + folded per-slot weights (same exact-weight
  scheme as the round-1 kernel, ``pallas_affine.py`` stage 2);
* resolve y with range-8 sublane gathers inside the slice;
* resolve z arithmetically: each plane contributes ``sum_t w_t * [tap_t ==
  plane]`` — no gather at all.

Vector work is O(hz * taps) per output vreg instead of O(window rows):
~20-40x less for random full-3D rotations.  The source window is shared
across a macro-tile of ``G`` output planes, cutting HBM traffic the same
way (one window serves ``G`` output vregs).

Reference behaviour being reproduced: the transform kernel of
``voltools/transforms.py:232-287`` with the texture reads of
``kernels/helper_interpolation.h`` (1-tap linear / separable cubic
B-spline), 'constant' (scipy) and 'border' (texture) edge semantics.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from .pallas_affine import _adjusted_matrix

# host-side tier limits
_MAX_HZ = 192          # longest per-vreg plane walk we accept
_MAX_HY = 24           # tallest per-plane y-slice (3 candidate sub-vregs)
_SLOP_LIMIT = 6.0      # |x| drift across the 8 sublanes (dx slots cover it)
_VMEM_BUDGET = 11 << 20


@dataclass(frozen=True)
class WalkVariant:
    """Static plane-walk kernel configuration chosen per matrix (host)."""
    ps: Tuple[int, int, int]     # source axes -> (z=walk, y=sliced, x=lanes)
    po: Tuple[int, int, int]     # output axes -> (grid, sub, lane)
    g: int                       # output planes per macro window
    w0: int                      # window z extent (covers G planes' walks)
    w1: int                      # window y extent
    hz: int                      # per-vreg walk length (planes)
    hy: int                      # per-plane y-slice height
    d: Tuple[int, int, int]      # permuted source dims
    dx_pad: int                  # x extent padded to lane multiple
    out_d: Tuple[int, int, int]  # permuted output dims
    order: int                   # 1 = trilinear, 3 = cubic B-spline
    mode: str                    # 'constant' | 'border'
    slop: int                    # x drift across sublanes, ceil'd
    y_lo: int                    # signed y-slice offset below the walk line

    @property
    def nb(self) -> int:
        return self.dx_pad // 128

    @property
    def taps(self):
        return (0, 1) if self.order == 1 else (-1, 0, 1, 2)

    @property
    def dxs(self):
        pad = self.slop
        if self.order == 3 and self.mode == "constant":
            pad = max(pad, self.slop + 1 if self.slop else 1)
        lo, hi = self.taps[0] - pad, self.taps[-1] + pad
        return tuple(range(lo, hi + 1))


def _walk_geometry(aa_signed, order):
    """Per-vreg walk/slice extents for one (ps, po) assignment.

    ``aa_signed``: (3,4) permuted matrix (signed, float64).  Returns
    (hz, hy, y_lo, slop, ok).  ``y_lo`` is the *signed* lower offset of the
    y-slice relative to the walk line's y(k) (host-side constant; the kernel
    adds it to the per-plane line y).
    """
    a = aa_signed
    tapspan = 1 if order == 1 else 3
    mirror_slack = 1 if order == 1 else 2

    # walk length: z spread across the (8, 128) tile + taps + floor rounding
    span_z = abs(a[0, 1]) * 7 + abs(a[0, 2]) * 127
    hz = int(math.ceil(span_z)) + tapspan + 2 + mirror_slack

    # x drift across sublanes (x base is taken at sublane 0)
    drift = abs(a[2, 1]) * 7.0
    if drift > _SLOP_LIMIT:
        return None
    slop = 0 if drift <= 1e-5 else int(math.ceil(drift))

    # y window around the line: active elements at a fixed plane satisfy
    # |z - plane| <= tapspan+1; eliminating the lane coordinate,
    #   y - y_line(k) = (a11 - kappa*a01)*s + a12*delta,
    # with kappa = a12/a02 and |a02*delta| <= tapspan+1.
    az_l = a[0, 2]
    if abs(az_l) < 1e-6:
        # z barely moves along lanes: the active set covers all lanes, so the
        # y window must span the whole lane y-motion instead
        kappa = 0.0
        sub_coef = a[1, 1]
        wob = abs(a[1, 2]) * 127.0
    else:
        kappa = a[1, 2] / az_l
        sub_coef = a[1, 1] - kappa * a[0, 1]
        wob = abs(kappa) * (tapspan + 1.0)
    lo = min(0.0, sub_coef * 7) - wob - 1.0
    hi = max(0.0, sub_coef * 7) + wob + 1.0
    # interpolation taps on y, plus mirror slack at the volume edges
    y_lo = int(math.floor(lo)) + (0 if order == 1 else -1) - mirror_slack
    y_hi = int(math.ceil(hi)) + tapspan + mirror_slack
    hy = y_hi - y_lo + 1
    return hz, hy, y_lo, slop, kappa


def choose_walk_variant(matrix, vol_shape, interpolation: str,
                        mode: str = "constant",
                        g: int = 8) -> Optional[WalkVariant]:
    """Pick the cheapest (ps, po) assignment for the plane-walk kernel.

    ``matrix`` may be (4,4) or a (N,4,4) batch (envelope over the batch).
    Returns None when no assignment fits the slice/walk limits.
    """
    import itertools

    matrices = np.asarray(matrix, dtype=np.float64)
    if matrices.ndim == 2:
        matrices = matrices[None]
    order = 1 if interpolation == "linear" else 3
    ntaps = 2 if order == 1 else 4
    best = None
    best_cost = None
    for ps in itertools.permutations((0, 1, 2)):
        for po in itertools.permutations((0, 1, 2)):
            geos = []
            for m in matrices:
                geo = _walk_geometry(_adjusted_matrix(m, ps, po), order)
                if geo is None:
                    geos = None
                    break
                geos.append(geo)
            if geos is None:
                continue
            hz = max(gg[0] for gg in geos)
            y_lo = min(gg[2] for gg in geos)
            y_hi = max(gg[2] + gg[1] - 1 for gg in geos)
            # slice reads happen in whole 8-row candidate groups, so hy must
            # be a multiple of 8 (a partial last group would read past the
            # window and Mosaic clamps the slice start, shifting rows)
            hy = (y_hi - y_lo + 8) // 8 * 8
            slop = max(gg[3] for gg in geos)
            if hz > _MAX_HZ or hy > _MAX_HY:
                continue
            d = tuple(vol_shape[ps[k]] for k in range(3))
            hz_c = min(hz, d[0])
            hy_c = hy
            aa = np.max(np.stack([np.abs(_adjusted_matrix(m, ps, po))
                                  for m in matrices]), axis=0)
            # macro window extents: per-vreg footprint + G-plane motion
            w0 = min(int(math.ceil(hz_c + aa[0, 0] * (g - 1))) + 1, d[0])
            w1 = min(int(math.ceil(
                aa[1, 0] * (g - 1) + aa[1, 1] * 7 + aa[1, 2] * 127
                + ntaps + 4)) + 1 + hy_c, d[1])
            if hy_c > w1:
                continue   # volume too small for the slice height
            dx_pad = ((vol_shape[ps[2]] + 127) // 128) * 128
            nb = dx_pad // 128
            win_bytes = 2 * w0 * w1 * nb * 128 * 4
            if win_bytes > _VMEM_BUDGET:
                continue
            out_d = tuple(vol_shape[po[k]] for k in range(3))
            # cost model: per plane ~ (slice + x-gathers + taps*(ndx
            # gathers+fma) * ceil(hy/8) candidates) ; plus fixed per vreg
            pad = max(slop, slop + 1 if slop else 1) if order == 3 else slop
            ndx = ntaps + 2 * pad
            ycand = (hy_c + 7) // 8
            per_plane = 1 + nb * ndx + ntaps * ycand * (ndx + 2) + ntaps + 3
            cost = hz_c * per_plane + 180
            # DMA term: window bytes per G output vregs, in op-equivalents
            cost += (w0 * w1 * nb * 128 * 4) / (g * 700.0)
            if best_cost is None or cost < best_cost:
                best_cost = cost
                best = WalkVariant(ps=ps, po=tuple(po), g=g, w0=w0, w1=w1,
                                   hz=hz_c, hy=hy_c, d=d, dx_pad=dx_pad,
                                   out_d=out_d, order=order, mode=mode,
                                   slop=slop, y_lo=y_lo)
    return best


def _make_walk_kernel(v: WalkVariant, cval: float):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..ops.interpolation import _mirror_index as _mirror
    from ..ops.interpolation import cubic_bspline_weights as _bspline_w

    d0, d1, d2 = v.d
    w0, w1 = v.w0, v.w1
    hz, hy = v.hz, v.hy
    G = v.g
    nb = v.nb
    taps = v.taps
    dxs = v.dxs
    order = v.order
    ntaps = len(taps)
    constant = v.mode == "constant"
    ycand = (hy + 7) // 8
    depth = 2

    def kernel(mat_ref, vol_hbm, out_ref, win_ref, sem):
        gi = pl.program_id(0)
        si = pl.program_id(1)
        li = pl.program_id(2)
        ng = pl.num_programs(0)
        ns = pl.num_programs(1)
        nl = pl.num_programs(2)
        a = mat_ref  # (3,4) SMEM, permuted

        # ---- macro window origin (scalar, min over macro-tile corners)
        def origin(r, wr, dr, gp, sb, lb):
            base = a[r, 0] * gp + a[r, 1] * sb + a[r, 2] * lb + a[r, 3]
            lo = (base + jnp.minimum(a[r, 0] * (G - 1.0), 0.0)
                  + jnp.minimum(a[r, 1] * 7.0, 0.0)
                  + jnp.minimum(a[r, 2] * 127.0, 0.0))
            o = jnp.floor(lo).astype(jnp.int32) - (2 if order == 3 else 1) - 1
            return jnp.clip(o, 0, dr - wr)

        def origins(gp, sb, lb):
            return (origin(0, w0, d0, gp, sb, lb),
                    origin(1, w1, d1, gp, sb, lb))

        def start_window_dma(slot, oo0, oo1):
            for b in range(nb):
                pltpu.make_async_copy(
                    vol_hbm.at[pl.ds(oo0, w0), pl.ds(oo1, w1), b],
                    win_ref.at[slot, b], sem.at[slot, b]).start()

        step = (gi * ns + si) * nl + li
        total = ng * ns * nl
        slot = jax.lax.rem(step, depth)

        def step_origins(t):
            gg = t // (ns * nl)
            rest = t - gg * (ns * nl)
            ss = rest // nl
            ll = rest - ss * nl
            return origins((gg * G).astype(jnp.float32),
                           (ss * 8).astype(jnp.float32),
                           (ll * 128).astype(jnp.float32))

        gpos = (gi * G).astype(jnp.float32)
        sbase = (si * 8).astype(jnp.float32)
        lbase = (li * 128).astype(jnp.float32)
        o0, o1 = origins(gpos, sbase, lbase)

        @pl.when(step == 0)
        def _():
            start_window_dma(0, o0, o1)
            # slots 1..depth-2 prefetch here; slot depth-1 comes from the
            # generic start below (starting it here too would double-start)
            for j in range(1, depth - 1):
                t = jnp.int32(j)

                @pl.when(t < total)
                def _(t=t, j=j):
                    oo0, oo1 = step_origins(t)
                    start_window_dma(j, oo0, oo1)

        @pl.when(step + depth - 1 < total)
        def _():
            t = step + depth - 1
            oo0, oo1 = step_origins(t)
            start_window_dma(jax.lax.rem(t, depth), oo0, oo1)

        for b in range(nb):
            pltpu.make_async_copy(
                vol_hbm.at[pl.ds(o0, w0), pl.ds(o1, w1), b],
                win_ref.at[slot, b], sem.at[slot, b]).wait()

        s_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0).astype(jnp.float32)
        l_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1).astype(jnp.float32)

        # one output plane of the macro-tile
        def do_plane(g):
            gp = gpos + g.astype(jnp.float32)
            sp = sbase + s_iota
            lp = lbase + l_iota

            def coord(r):
                return a[r, 0] * gp + a[r, 1] * sp + a[r, 2] * lp + a[r, 3]

            zf = coord(0)
            yf = coord(1)
            xf = coord(2)
            z0 = jnp.floor(zf).astype(jnp.int32)
            y0f = jnp.floor(yf)
            x0f = jnp.floor(xf)
            fz = zf - z0.astype(jnp.float32)
            fy = yf - y0f
            fx = xf - x0f
            y0 = y0f.astype(jnp.int32)
            x0 = x0f.astype(jnp.int32)

            if order == 1:
                wz = (1.0 - fz, fz)
                wy = (1.0 - fy, fy)
                wx = (1.0 - fx, fx)
            else:
                wz = _bspline_w(fz)
                wy = _bspline_w(fy)
                wx = _bspline_w(fx)

            # x base per lane (sublane 0), lane-gather decomposition + folded
            # exact x weights (same scheme as pallas_affine stage 2)
            xb_row = a[2, 0] * gp + a[2, 1] * sbase + a[2, 2] * lp + a[2, 3]
            xb = jnp.floor(xb_row).astype(jnp.int32)
            dxneed = x0 - xb

            def x_tap(t):
                idx = x0 + t
                if constant:
                    if order == 3:
                        return _mirror(idx, d2), None
                    return jnp.clip(idx, 0, d2 - 1), None
                valid = (idx >= 0) & (idx < d2)
                return jnp.clip(idx, 0, d2 - 1), valid

            xtaps = [x_tap(t) for t in taps]
            xparts = {}
            for dx in dxs:
                idx = jnp.clip(xb + dx, 0, d2 - 1)
                xparts[dx] = (idx >> 7, idx & 127)
            wfold = {}
            for dx in dxs:
                acc = jnp.zeros((8, 128), jnp.float32)
                for ix, (xt, xvalid) in enumerate(xtaps):
                    if constant and order == 3:
                        dxp = xt - xb
                    else:
                        dxp = dxneed + taps[ix]
                    w = wx[ix]
                    if xvalid is not None:
                        w = jnp.where(xvalid, w, 0.0)
                    acc = acc + jnp.where(dxp == dx, w, 0.0)
                wfold[dx] = acc

            # global z/y tap indices with edge handling
            def row_tap(base, t, n):
                idx = base + t
                if constant:
                    if order == 3:
                        return _mirror(idx, n), None
                    return jnp.clip(idx, 0, n - 1), None
                valid = (idx >= 0) & (idx < n)
                return jnp.clip(idx, 0, n - 1), valid

            ztaps = [row_tap(z0, t, d0) for t in taps]
            ytaps = [row_tap(y0, t, d1) for t in taps]
            wys = []
            for iy, (yt, yvalid) in enumerate(ytaps):
                w = wy[iy]
                if yvalid is not None:
                    w = jnp.where(yvalid, w, 0.0)
                wys.append(w)

            # scalar walk-line parameters for this output plane:
            #   z along lanes: z(l) = zc + az_l * l ;  y(l) = yc + ay_l * l
            # per walk plane k (global z = zk), the line's y is
            #   y_line(zk) = yc + kappa * (zk - zc)
            zc = a[0, 0] * gp + a[0, 1] * sbase + a[0, 2] * lbase + a[0, 3]
            yc = a[1, 0] * gp + a[1, 1] * sbase + a[1, 2] * lbase + a[1, 3]
            az_l = a[0, 2]
            safe = jnp.abs(az_l) > 1e-6
            kappa = jnp.where(safe, a[1, 2] / jnp.where(safe, az_l, 1.0), 0.0)

            # per-vreg walk start (scalar): min z over tile corners + taps
            zlo = (zc + jnp.minimum(a[0, 1] * 7.0, 0.0)
                   + jnp.minimum(a[0, 2] * 127.0, 0.0))
            zorg = jnp.floor(zlo).astype(jnp.int32) - (2 if order == 3 else 1) - 1
            zorg = jnp.clip(zorg, 0, d0 - hz)

            def plane_step(k, acc):
                zk = zorg + k
                # y-slice origin for this plane (scalar)
                y_line = yc + kappa * (zk.astype(jnp.float32) - zc)
                yb_k = (jnp.floor(y_line).astype(jnp.int32)
                        + jnp.int32(v.y_lo))
                yb_k = jnp.clip(yb_k, o1, o1 + w1 - hy)

                # per-plane z weight: sum of tap weights that land on zk
                wplane = jnp.zeros((8, 128), jnp.float32)
                for iz, (zt, zvalid) in enumerate(ztaps):
                    w = wz[iz]
                    if zvalid is not None:
                        w = jnp.where(zvalid, w, 0.0)
                    wplane = wplane + jnp.where(zt == zk, w, 0.0)

                # y-slice (hy, 128*nb), x-gathered at the dx slots
                gx = {}
                for c in range(ycand):
                    rows = [win_ref[slot, b, zk - o0,
                                    pl.ds(yb_k - o1 + c * 8, 8), :]
                            for b in range(nb)]
                    for dx in dxs:
                        blk, within = xparts[dx]
                        g_acc = None
                        for b in range(nb):
                            gat = jnp.take_along_axis(rows[b], within, axis=1)
                            g_acc = gat if g_acc is None else jnp.where(
                                blk == b, gat, g_acc)
                        gx[(c, dx)] = g_acc

                # y taps: range-8 sublane gathers within the slice
                val = jnp.zeros((8, 128), jnp.float32)
                for iy, (yt, _) in enumerate(ytaps):
                    yrel = yt - yb_k
                    hit = jnp.zeros((8, 128), jnp.float32)
                    for c in range(ycand):
                        m = yrel - c * 8
                        mok = (m >= 0) & (m < 8)
                        mc = jnp.clip(m, 0, 7)
                        part = jnp.zeros((8, 128), jnp.float32)
                        for dx in dxs:
                            part = part + wfold[dx] * jnp.take_along_axis(
                                gx[(c, dx)], mc, axis=0)
                        hit = hit + jnp.where(mok, part, 0.0) if ycand > 1 \
                            else part
                    val = val + wys[iy] * hit
                return acc + wplane * val

            out = jax.lax.fori_loop(0, hz, plane_step,
                                    jnp.zeros((8, 128), jnp.float32))

            if constant:
                inside = ((zf >= 0) & (zf <= d0 - 1) & (yf >= 0)
                          & (yf <= d1 - 1) & (xf >= 0) & (xf <= d2 - 1))
            else:
                inside = ((zf > -0.5) & (zf < d0 - 0.5) & (yf > -0.5)
                          & (yf < d1 - 0.5) & (xf > -0.5) & (xf < d2 - 0.5))
            out_ref[g, :, :] = jnp.where(inside, out, jnp.float32(cval))

        for g in range(G):
            do_plane(jnp.int32(g))

    return kernel


def affine_sample_pallas_walk(volume, matrix, v: WalkVariant,
                              cval: float = 0.0, interpret: bool = False):
    """Run the plane-walk kernel for a pre-chosen variant."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    volume = jnp.asarray(volume, jnp.float32)
    vol_p = jnp.transpose(volume, v.ps)
    if v.dx_pad > v.d[2]:
        vol_p = jnp.pad(vol_p, ((0, 0), (0, 0), (0, v.dx_pad - v.d[2])))
    vol_p = vol_p.reshape(v.d[0], v.d[1], v.nb, 128)

    m = jnp.asarray(matrix, jnp.float32)
    rows = jnp.stack([m[v.ps[k]] for k in range(3)])
    cols = jnp.stack([rows[:, v.po[j]] for j in range(3)] + [rows[:, 3]],
                     axis=1)

    og, os_, ol = v.out_d
    og_pad = ((og + v.g - 1) // v.g) * v.g
    os_pad = ((os_ + 7) // 8) * 8
    ol_pad = ((ol + 127) // 128) * 128
    grid = (og_pad // v.g, os_pad // 8, ol_pad // 128)

    kernel = _make_walk_kernel(v, cval)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((v.g, 8, 128), lambda g, s, l: (g, s, l),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((og_pad, os_pad, ol_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, v.nb, v.w0, v.w1, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA((2, v.nb))],
        interpret=interpret,
    )(cols, vol_p)

    out = out[:og, :os_, :ol]
    inv = tuple(np.argsort(v.po))
    return jnp.transpose(out, inv)
