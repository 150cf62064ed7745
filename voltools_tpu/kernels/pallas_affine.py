"""Pallas TPU kernel for affine volume resampling (the hot path).

TPU-native replacement for the reference's CUDA texture kernel
(``voltools/transforms.py:232-287`` + ``kernels/helper_interpolation.h``).
There is no texture unit on TPU, and XLA's general gather runs at scalar
rate, so the kernel restructures the resample around what the hardware does
well:

* the output is processed in (8 sublane x 128 lane) tiles;
* per tile, the source footprint (a slab of ``(r0, r1)`` rows spanning the
  full x extent) is DMA'd HBM->VMEM — a contiguous 3-D box copy;
* the x-coordinate is resolved with ``tpu.dynamic_gather`` along lanes
  (range 128, the one fast per-element gather TPUs have), with a small set
  of extra "slop" taps because x may drift across the 8 sublanes (up to
  ``_SUB_DRIFT_LIMIT`` voxels; the gather range widens to cover it);
* the (r0, r1) row pair is resolved with within-vreg sublane gathers plus a
  select-tree over the window's row-vregs;
* interpolation weights and boundary masks run on the VPU as ordinary
  vector arithmetic.

Because per-tile windows must stay small (<=128 rows) the kernel requires
the transform to be *axis-dominant*: some relabeling of source and output
axes under which each output tile touches a bounded source slab.  The host
(:func:`choose_variant`) scores all 36 (source-perm x output-perm) axis
assignments against the actual
matrix and picks one; matrices outside the regime (e.g. large fully-3D
rotations) return ``None`` and the caller falls back to the XLA path.
Translations, scales, shears, and single-axis rotations of any angle always
qualify; generic small/medium rotations usually do.
"""

from __future__ import annotations

import functools
import itertools
import math
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

PALLAS_AVAILABLE = True

_ROW_BUDGET_LINEAR = 256   # max window rows for the unrolled select-tree
_ROW_BUDGET_CUBIC = 160    # order 3 pays 16 row-taps per row-vreg
_ROW_BUDGET_LOOP = 4096    # fori-loop tier: general rotations, bigger slabs
_VMEM_WINDOW_BUDGET = 12 << 20   # cap on total window scratch bytes
_SUB_DRIFT_LIMIT = 6.0     # max |x drift| across 8 sublanes (slop taps cover it)


@dataclass(frozen=True)
class Variant:
    """Static kernel configuration chosen per matrix (host side)."""
    ps: Tuple[int, int, int]     # source axes -> (r0, r1, x)
    po: Tuple[int, int, int]     # output axes -> (grid, sub, lane)
    w0: int                      # window extent along r0
    w1: int                      # window extent along r1
    d: Tuple[int, int, int]      # permuted source dims (r0, r1, x)
    dx_pad: int                  # x extent padded to lane multiple
    out_d: Tuple[int, int, int]  # permuted output dims (grid, sub, lane)
    order: int                   # 1 = trilinear, 3 = cubic B-spline
    mode: str                    # 'constant' | 'border'
    slop: int                    # |x drift| across the 8 sublanes, ceil'd
    unroll: bool = True          # unrolled select-tree vs fori-loop tier

    @property
    def nv(self) -> int:
        return (self.w0 * self.w1 + 7) // 8

    @property
    def nb(self) -> int:
        return self.dx_pad // 128

    @property
    def taps(self):
        return (0, 1) if self.order == 1 else (-1, 0, 1, 2)

    @property
    def dxs(self):
        # gathered x offsets = tap range, widened by the sublane drift slop
        # (plus one for cubic mirror-tap jumps near edges)
        pad = self.slop
        if self.order == 3 and self.mode == "constant":
            pad = max(pad, self.slop + 1 if self.slop else 1)
        lo, hi = self.taps[0] - pad, self.taps[-1] + pad
        return tuple(range(lo, hi + 1))


class _MatView:
    """Cached scalar-read view of the SMEM matrix payload: ``m[r, c]`` reads
    ``ref[r, c]`` (unbatched) or ``ref[bi, r, c]`` (batched), memoized so
    repeated uses emit one SMEM load."""

    def __init__(self, ref, bi=None):
        self._ref, self._bi, self._cache = ref, bi, {}

    def __getitem__(self, rc):
        if rc not in self._cache:
            r, c = rc
            if self._bi is None:
                self._cache[rc] = self._ref[r, c]
            else:
                self._cache[rc] = self._ref[self._bi, r, c]
        return self._cache[rc]


def _adjusted_matrix(matrix: np.ndarray, ps, po) -> np.ndarray:
    """(3,4) matrix mapping permuted-output coords -> permuted-source."""
    m = np.asarray(matrix, dtype=np.float64)
    a = np.zeros((3, 4), np.float64)
    for k in range(3):
        for j in range(3):
            a[k, j] = m[ps[k], po[j]]
        a[k, 3] = m[ps[k], 3]
    return a.astype(np.float32)


def choose_variant(matrix, vol_shape, interpolation: str,
                   mode: str = "constant",
                   out_shape=None) -> Optional[Variant]:
    """Pick the cheapest axis assignment whose window fits, or None.

    ``matrix`` may be one (4,4) map or a (N,4,4) batch — for a batch the
    window/slop envelope covers every matrix, so one compiled kernel serves
    the whole sweep (the matrix itself stays a traced argument)."""
    if out_shape is None:
        out_shape = vol_shape
    matrices = np.asarray(matrix, dtype=np.float64)
    if matrices.ndim == 2:
        matrices = matrices[None]
    order = 1 if interpolation == "linear" else 3
    margin = 2 if order == 1 else 4   # floor + taps on each side
    budget = _ROW_BUDGET_LINEAR if order == 1 else _ROW_BUDGET_CUBIC
    best = None
    best_cost = None
    for ps in [(1, 2, 0), (0, 2, 1), (0, 1, 2),
               (2, 1, 0), (2, 0, 1), (1, 0, 2)]:
        for po in itertools.permutations((0, 1, 2)):
            aa = np.max(np.stack([np.abs(_adjusted_matrix(m, ps, po))
                                  for m in matrices]), axis=0)
            drift = 7.0 * aa[2, 1]
            if drift > _SUB_DRIFT_LIMIT:
                continue
            slop = 0 if drift <= 1e-5 else int(math.ceil(drift))
            # exact window extents: measured 20-30% faster than quantized
            # ones (window layout effects are nonlinear in w1); sweeps avoid
            # per-matrix recompiles via variant_covers() reuse instead
            spans = [aa[r, 1] * 7 + aa[r, 2] * 127 + margin + 1 for r in (0, 1)]
            w0, w1 = (int(math.ceil(s)) for s in spans)
            d = tuple(vol_shape[ps[k]] for k in range(3))
            w0 = min(w0, d[0])
            w1 = min(w1, d[1])
            unroll = w0 * w1 <= budget
            if not unroll:
                # the fori-loop tier reads row-vregs via ref slices, which
                # must not straddle an r0 boundary: round w1 to 8 sublanes
                w1 = -8 * (-w1 // 8)
                if w1 > d[1]:
                    continue
            if w0 * w1 > _ROW_BUDGET_LOOP:
                continue
            out_d = tuple(out_shape[po[k]] for k in range(3))
            nv = (w0 * w1 + 7) // 8
            dx_pad = ((vol_shape[ps[2]] + 127) // 128) * 128
            # the window scratch (2+ pipeline slots) must fit VMEM: its size
            # scales with the x extent (dx_pad), not just the row count
            if 2 * (dx_pad // 128) * w0 * w1 * 128 * 4 > _VMEM_WINDOW_BUDGET:
                continue
            # cost model: row-select work dominates; slop widens the x taps;
            # the fori-loop tier pays some per-iteration overhead
            pad = max(slop, slop + 1 if slop else 1) if order == 3 else slop
            ndx = (order + 1) + 2 * pad
            cost = nv * ndx * (order + 1) ** 2 * (1.0 if unroll else 1.5)
            if best_cost is None or cost < best_cost:
                best_cost = cost
                best = Variant(ps=ps, po=tuple(po), w0=w0, w1=w1, d=d,
                               dx_pad=dx_pad, out_d=out_d, order=order,
                               mode=mode, slop=slop, unroll=unroll)
    return best


def variant_cost(v: Variant) -> float:
    """The chooser's cost model recomputed from a variant's own parameters
    (lets callers gate cached-variant reuse on cost: a cached envelope that
    covers a matrix can still be much slower than its tight optimum,
    because the select-tree scans the whole window)."""
    pad = max(v.slop, v.slop + 1 if v.slop else 1) if v.order == 3 else v.slop
    ndx = (v.order + 1) + 2 * pad
    return v.nv * ndx * (v.order + 1) ** 2 * (1.0 if v.unroll else 1.5)


def variant_covers(v: Variant, matrix, vol_shape, interpolation: str,
                   mode: str = "constant", out_shape=None) -> bool:
    """True when an already-compiled variant's window/slop envelope covers
    ``matrix`` — lets sweeps reuse kernels instead of recompiling per angle."""
    order = 1 if interpolation == "linear" else 3
    if order != v.order or mode != v.mode:
        return False
    if tuple(vol_shape[v.ps[k]] for k in range(3)) != v.d:
        return False
    if out_shape is None:
        out_shape = vol_shape
    if tuple(out_shape[v.po[k]] for k in range(3)) != v.out_d:
        return False
    matrices = np.asarray(matrix, dtype=np.float64)
    if matrices.ndim == 2:
        matrices = matrices[None]
    aa = np.max(np.stack([np.abs(_adjusted_matrix(m, v.ps, v.po))
                          for m in matrices]), axis=0)
    drift = 7.0 * aa[2, 1]
    slop = 0 if drift <= 1e-5 else int(math.ceil(drift))
    if slop > v.slop:
        return False
    margin = 2 if order == 1 else 4
    spans = [aa[r, 1] * 7 + aa[r, 2] * 127 + margin + 1 for r in (0, 1)]
    # a window spanning the full volume extent covers every in-volume row
    # (its origin clips to 0), so spans beyond d need only w = d -- the
    # same capping choose_variant builds with
    return (min(math.ceil(spans[0]), v.d[0]) <= v.w0
            and min(math.ceil(spans[1]), v.d[1]) <= v.w1)


def _make_kernel(v: Variant, cval: float, batch: int = 0,
                 interpret: bool = False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret:
        # XLA:CPU may rematerialize a floor() into several fusions with
        # different FMA contraction; at knife-edge coordinates the copies
        # then disagree by 1, desynchronizing the DMA'd window (or the tap
        # indices) from the arithmetic computed against it — the same
        # hazard pallas_walk pins (its kernel observed a double-counted
        # row tap).  Mosaic keeps scalars as single SSA values, so the
        # compiled TPU path needs no barrier.
        def _pin(x):
            return jax.lax.optimization_barrier(x)
    else:
        def _pin(x):
            return x

    # shared scipy-parity helpers — same math the XLA oracle path uses
    from ..ops.interpolation import _mirror_index as _mirror
    from ..ops.interpolation import cubic_bspline_weights as _bspline_w

    d0, d1, d2 = v.d
    w0, w1 = v.w0, v.w1
    nv, nb = v.nv, v.nb
    taps = v.taps
    dxs = v.dxs
    order = v.order
    constant = v.mode == "constant"
    unroll = v.unroll
    rows_pad = nv * 8
    # pipeline depth: enough in-flight windows to hide DMA latency, capped
    # so window scratch stays modest
    win_bytes = nb * w0 * w1 * 128 * 4
    depth = max(2, min(4, (4 << 20) // max(win_bytes, 1)))

    def kernel(mat_ref, vol_hbm, out_ref, win_ref, sem):
        if batch:
            bi = pl.program_id(0)
            g, si, li = (pl.program_id(1), pl.program_id(2),
                         pl.program_id(3))
            ng, ns, nl = (pl.num_programs(1), pl.num_programs(2),
                          pl.num_programs(3))
            nbt = pl.num_programs(0)
        else:
            bi = None
            g, si, li = (pl.program_id(0), pl.program_id(1),
                         pl.program_id(2))
            ng, ns, nl = (pl.num_programs(0), pl.num_programs(1),
                          pl.num_programs(2))
            nbt = 1
        gpos = g.astype(jnp.float32)
        sbase = (si * 8).astype(jnp.float32)
        lbase = (li * 128).astype(jnp.float32)

        a = _MatView(mat_ref, bi)  # (3,4) SMEM (leading batch dim if any)

        # ---- scalar window origin per rows-axis (min over tile corners)
        def origin(am, r, wr, dr, gp, sb, lb):
            base = am[r, 0] * gp + am[r, 1] * sb + am[r, 2] * lb + am[r, 3]
            lo = (base + jnp.minimum(am[r, 1] * 7.0, 0.0)
                  + jnp.minimum(am[r, 2] * 127.0, 0.0))
            o = jnp.floor(lo).astype(jnp.int32) - (2 if order == 3 else 1)
            return _pin(jnp.clip(o, 0, dr - wr))

        def origins(am, gp, sb, lb):
            return (origin(am, 0, w0, d0, gp, sb, lb),
                    origin(am, 1, w1, d1, gp, sb, lb))

        def start_window_dma(slot, oo0, oo1):
            for b in range(nb):
                pltpu.make_async_copy(
                    vol_hbm.at[pl.ds(oo0, w0), pl.ds(oo1, w1), b],
                    win_ref.at[slot, b], sem.at[slot, b]).start()

        # ---- K-deep window pipeline: per-tile DMA latency exceeds per-tile
        # compute, so a single prefetch step cannot hide it; keep K windows
        # in flight (step t waits on slot t%K and starts step t+K-1's DMA)
        step = (g * ns + si) * nl + li
        if batch:
            step = bi * (ng * ns * nl) + step
        total = nbt * ng * ns * nl
        slot = jax.lax.rem(step, depth)

        def step_origins(t):
            if batch:
                bt = t // (ng * ns * nl)
                t = t - bt * (ng * ns * nl)
                am = _MatView(mat_ref, bt)
            else:
                am = a
            gg = t // (ns * nl)
            rest = t - gg * (ns * nl)
            ss = rest // nl
            ll = rest - ss * nl
            return origins(am, gg.astype(jnp.float32),
                           (ss * 8).astype(jnp.float32),
                           (ll * 128).astype(jnp.float32))

        o0, o1 = origins(a, gpos, sbase, lbase)

        @pl.when(step == 0)
        def _():
            start_window_dma(0, o0, o1)
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

        # ---- vectorized source coordinates for the tile
        s_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0).astype(jnp.float32)
        l_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1).astype(jnp.float32)
        gp = gpos
        sp = sbase + s_iota
        lp = lbase + l_iota

        def coord(r):
            return a[r, 0] * gp + a[r, 1] * sp + a[r, 2] * lp + a[r, 3]

        zf = _pin(coord(0))
        yf = _pin(coord(1))
        xf = _pin(coord(2))
        z0f = _pin(jnp.floor(zf))
        y0f = _pin(jnp.floor(yf))
        x0f = _pin(jnp.floor(xf))
        fz = zf - z0f
        fy = yf - y0f
        fx = xf - x0f
        z0 = z0f.astype(jnp.int32)
        y0 = y0f.astype(jnp.int32)
        x0 = x0f.astype(jnp.int32)

        # x base shared across sublanes; the per-sublane offset dxneed is
        # bounded by the chooser's drift limit (|drift| <= _SUB_DRIFT_LIMIT,
        # covered by the slop-widened gather range), NOT by +-1
        xb_row = a[2, 0] * gp + a[2, 1] * sbase + a[2, 2] * lp + a[2, 3]
        xb = _pin(jnp.floor(xb_row).astype(jnp.int32))
        dxneed = x0 - xb

        if order == 1:
            wz = (1.0 - fz, fz)
            wy = (1.0 - fy, fy)
            wx = (1.0 - fx, fx)
        else:
            wz = _bspline_w(fz)
            wy = _bspline_w(fy)
            wx = _bspline_w(fx)

        # global tap indices (+ boundary handling), then window-relative
        def row_tap(base, t, n):
            idx = base + t
            if constant:
                if order == 3:
                    idx = _mirror(idx, n)
                else:
                    idx = jnp.clip(idx, 0, n - 1)
                return idx, None
            valid = (idx >= 0) & (idx < n)
            return jnp.clip(idx, 0, n - 1), valid

        ztaps = [row_tap(z0, t, d0) for t in taps]
        ytaps = [row_tap(y0, t, d1) for t in taps]

        def x_tap(t):
            idx = x0 + t
            if constant:
                if order == 3:
                    return _mirror(idx, d2), None
                return jnp.clip(idx, 0, d2 - 1), None
            valid = (idx >= 0) & (idx < d2)
            return jnp.clip(idx, 0, d2 - 1), valid

        xtaps = [x_tap(t) for t in taps]

        for b in range(nb):
            pltpu.make_async_copy(
                vol_hbm.at[pl.ds(o0, w0), pl.ds(o1, w1), b],
                win_ref.at[slot, b], sem.at[slot, b]).wait()
        wins = []
        if unroll:
            for b in range(nb):
                wb = win_ref[slot, b].reshape(w0 * w1, 128)
                if rows_pad > w0 * w1:
                    wb = jnp.concatenate(
                        [wb, jnp.zeros((rows_pad - w0 * w1, 128), jnp.float32)],
                        axis=0)
                wins.append(wb)

        # x lane-gather index decomposition, shared by both tiers
        xparts = {}
        for dx in dxs:
            idx = jnp.clip(xb + dx, 0, d2 - 1)
            xparts[dx] = (idx >> 7, idx & 127)

        def gather_vreg(rows8, dx):
            """win rows (8, dx_pad) -> values at x = xb + dx, per lane."""
            blk, within = xparts[dx]
            acc = None
            for b in range(nb):
                gat = jnp.take_along_axis(rows8[b], within, axis=1)
                acc = gat if acc is None else jnp.where(blk == b, gat, acc)
            return acc

        # ---- stage 1 (unrolled tier): X[vreg, dx'] tables
        xg = {}
        if unroll:
            for vi in range(nv):
                rows8 = [wins[b][vi * 8:(vi + 1) * 8, :] for b in range(nb)]
                for dx in dxs:
                    xg[(vi, dx)] = gather_vreg(rows8, dx)

        # ---- stage 2: fold the x taps into per-dx' weights (exact: the x
        # contribution of tap ix lives in gathered slot dx' = dxp_ix, so
        # sum_ix wx_ix * V[..., xt_ix] == sum_dx' Wfold[dx'] * G[dx'])
        wfold = {}
        for dx in dxs:
            acc = jnp.zeros((8, 128), jnp.float32)
            for ix, (xt, xvalid) in enumerate(xtaps):
                if constant and order == 3:
                    # mirrored x taps can jump, but only near edges where
                    # xt - xb still stays within the widened dx range
                    dxp = xt - xb
                else:
                    dxp = dxneed + taps[ix]
                w = wx[ix]
                if xvalid is not None:
                    w = jnp.where(xvalid, w, 0.0)
                acc = acc + jnp.where(dxp == dx, w, 0.0)
            wfold[dx] = acc

        # per-pair row indices and weights, shared by both tiers
        pairs = []
        for iz, (zt, zvalid) in enumerate(ztaps):
            zrel = zt - o0
            for iy, (yt, yvalid) in enumerate(ytaps):
                yrel = yt - o1
                rrel = zrel * w1 + yrel
                w_zy = wz[iz] * wy[iy]
                if not constant:
                    w_zy = jnp.where(zvalid & yvalid, w_zy, 0.0)
                pairs.append((rrel, w_zy))

        # ---- stage 3: resolve rows per window vreg, accumulate with folded
        # x weights
        if unroll:
            def accumulate(dx_list, tables):
                acc = jnp.zeros((8, 128), jnp.float32)
                for rrel, w_zy in pairs:
                    val = jnp.zeros((8, 128), jnp.float32)
                    for vi in range(nv):
                        m = rrel - vi * 8
                        mok = (m >= 0) & (m < 8)
                        mc = jnp.clip(m, 0, 7)
                        hit = jnp.zeros((8, 128), jnp.float32)
                        for dx in dx_list:
                            gat = jnp.take_along_axis(tables[(vi, dx)], mc,
                                                      axis=0)
                            hit = hit + wfold[dx] * gat
                        val = val + jnp.where(mok, hit, 0.0)
                    acc = acc + w_zy * val
                return acc

            out = accumulate(dxs, xg)
        else:
            # fori-loop tier for big windows (general rotations): same math,
            # dynamic vreg slicing, one loop iteration per window row-vreg
            rrels = jnp.stack([p[0] for p in pairs])      # (P, 8, 128)
            wzys = jnp.stack([p[1] for p in pairs])       # (P, 8, 128)

            def one_vreg(vi, out):
                base = vi * 8
                # w1 % 8 == 0 in this tier, so the 8-row run lives within a
                # single r0 plane of the window scratch
                r0_i = base // w1
                r1_i = base - r0_i * w1
                rows8 = [win_ref[slot, b, r0_i, pl.ds(r1_i, 8), :]
                         for b in range(nb)]
                xgv = {dx: gather_vreg(rows8, dx) for dx in dxs}
                for p in range(len(pairs)):
                    m = rrels[p] - base
                    mok = (m >= 0) & (m < 8)
                    mc = jnp.clip(m, 0, 7)
                    hit = jnp.zeros((8, 128), jnp.float32)
                    for dx in dxs:
                        gat = jnp.take_along_axis(xgv[dx], mc, axis=0)
                        hit = hit + wfold[dx] * gat
                    out = out + wzys[p] * jnp.where(mok, hit, 0.0)
                return out

            # two row-vregs per iteration (amortizes loop/scalar overhead),
            # static epilogue for the odd remainder
            def body(v2, out):
                out = one_vreg(v2 * 2, out)
                return one_vreg(v2 * 2 + 1, out)

            out = jax.lax.fori_loop(0, nv // 2, body,
                                    jnp.zeros((8, 128), jnp.float32))
            if nv % 2:
                out = one_vreg(nv - 1, out)

        if constant:
            inside = ((zf >= 0) & (zf <= d0 - 1) & (yf >= 0) & (yf <= d1 - 1)
                      & (xf >= 0) & (xf <= d2 - 1))
        else:
            inside = ((zf > -0.5) & (zf < d0 - 0.5) & (yf > -0.5)
                      & (yf < d1 - 0.5) & (xf > -0.5) & (xf < d2 - 0.5))
        res = jnp.where(inside, out, jnp.float32(cval))
        if batch:
            out_ref[0, 0, :, :] = res
        else:
            out_ref[0, :, :] = res

    kernel.pipeline_depth = depth
    return kernel


@functools.lru_cache(maxsize=64)
def _tree_runner(v: Variant, cval: float, batch: int,
                 interpret: bool = False):
    """Jitted grid-batched launch of the select-tree kernel: N matrices in
    ONE pallas call (leading batch grid dimension, per-matrix SMEM rows) —
    the same runtime-payload scheme as the walk kernel's batched runner
    (``pallas_walk._walk_runner``), so a tilt sweep whose envelope lands on
    a tree plan is a single tight program instead of a ``lax.map`` of
    launches.  Takes the ORIGINAL (unpermuted) volume and the raw (N,4,4)
    matrix stack."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = _make_kernel(v, cval, batch, interpret=interpret)
    og, os_, ol = v.out_d
    os_pad = ((os_ + 7) // 8) * 8
    ol_pad = ((ol + 127) // 128) * 128
    grid = (batch, og, os_pad // 8, ol_pad // 128)
    inv = tuple(int(i) for i in np.argsort(v.po))

    def run(volume, matrices):
        vol_p = jnp.transpose(jnp.asarray(volume, jnp.float32), v.ps)
        if v.dx_pad > v.d[2]:
            vol_p = jnp.pad(vol_p,
                            ((0, 0), (0, 0), (0, v.dx_pad - v.d[2])))
        vol_p = vol_p.reshape(v.d[0], v.d[1], v.nb, 128)
        ms = jnp.asarray(matrices, jnp.float32)
        rows = ms[:, list(v.ps), :]                            # (n,3,4)
        cols = jnp.stack([rows[:, :, v.po[0]], rows[:, :, v.po[1]],
                          rows[:, :, v.po[2]], rows[:, :, 3]], axis=2)
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, 1, 8, 128),
                                   lambda b, g, s, l: (b, g, s, l),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((batch, og, os_pad, ol_pad),
                                           jnp.float32),
            scratch_shapes=[pltpu.VMEM((kernel.pipeline_depth, v.nb, v.w0,
                                        v.w1, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA(
                                (kernel.pipeline_depth, v.nb))],
            interpret=interpret,
        )(cols, vol_p)
        out = out[:, :, :os_, :ol]
        return jnp.transpose(out, (0,) + tuple(i + 1 for i in inv))

    return jax.jit(run)


def affine_sample_pallas_variant(volume, matrix, v: Variant,
                                 cval: float = 0.0, interpret: bool = False):
    """Run the kernel for a pre-chosen variant.  ``volume`` is the original
    (unpermuted) array; ``matrix`` the original 4x4 pull-back map."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    volume = jnp.asarray(volume, jnp.float32)
    vol_p = jnp.transpose(volume, v.ps)
    if v.dx_pad > v.d[2]:
        vol_p = jnp.pad(vol_p, ((0, 0), (0, 0), (0, v.dx_pad - v.d[2])))
    # split x into 128-wide chunks so window DMAs stay 128-wide minor
    vol_p = vol_p.reshape(v.d[0], v.d[1], v.nb, 128)

    # adjust the (traced) matrix for the permutations
    m = jnp.asarray(matrix, jnp.float32)
    rows = jnp.stack([m[v.ps[k]] for k in range(3)])          # (3,4)
    cols = jnp.stack([rows[:, v.po[j]] for j in range(3)] +
                     [rows[:, 3]], axis=1)                     # (3,4)

    og, os_, ol = v.out_d
    os_pad = ((os_ + 7) // 8) * 8
    ol_pad = ((ol + 127) // 128) * 128
    grid = (og, os_pad // 8, ol_pad // 128)

    kernel = _make_kernel(v, cval, interpret=interpret)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda g, s, l: (g, s, l),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((og, os_pad, ol_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((kernel.pipeline_depth, v.nb, v.w0, v.w1, 128),
                                   jnp.float32),
                        pltpu.SemaphoreType.DMA((kernel.pipeline_depth, v.nb))],
        interpret=interpret,
    )(cols, vol_p)

    out = out[:, :os_, :ol]
    inv = tuple(np.argsort(v.po))
    return jnp.transpose(out, inv)


def affine_sample_pallas(volume, matrix, interpolation="linear",
                         mode="constant", cval=0.0, prefiltered=False):
    """Generic entry — used when the caller could not pre-select a variant
    (traced matrix): falls back to the XLA implementation."""
    from ..ops.sampling import affine_sample
    return affine_sample(volume, matrix, interpolation, mode, cval,
                         prefiltered=prefiltered)
