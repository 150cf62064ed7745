"""Plane-walk Pallas kernel: general-rotation affine resampling.

The round-1 kernel (:mod:`.pallas_affine`) resolves the per-element source
row with a select-tree scanned over *every* row-vreg of the tile's source
window — O(window rows) vector work per output vreg.  For axis-dominant
matrices windows are tiny and that is fast; for general 3-D rotations the
window grows to thousands of rows and the scan dominates (measured: 88% of
a 245 ms call at 250^3, against a 29 ms DMA floor).

This kernel exploits the geometry instead.  An output vreg covers a small
output patch, whose source-space image crosses only ``hz`` z-planes; within
one z-plane the active elements' y coordinates concentrate in a narrow band
(``hy`` rows) around a per-plane line ``y_line(z)``.  Per output vreg we:

* walk the ``hz`` source z-planes of the footprint (fully unrolled when
  compiled; ``fori_loop`` under the interpreter);
* per plane, read ``hy`` rows at a scalar, data-dependent y offset
  (``pl.ds`` on a non-minor window dim — the one dynamic-origin access
  TPUs do cheaply);
* resolve x with lane gathers + folded per-slot exact weights (same scheme
  as ``pallas_affine.py`` stage 2);
* resolve y with range-8 sublane gathers inside the band;
* resolve z arithmetically: each plane contributes ``sum_t w_t * [tap_t ==
  plane]`` — no gather at all.

Vector work is O(hz * taps) per output vreg instead of O(window rows).

**Lane packing**: a vreg's 128 lanes can cover a 2-D output patch
``(vb, wb)`` (vb*wb = 128) instead of a 128-long line; with sublanes that
makes the patch (8, vb, wb), whose source footprint is ~3-4x fewer z-planes
than a line's for fully-3D rotations.  The kernel then writes a *blocked*
output layout ``(U, V/vb, W/wb, 128)``; XLA un-blocks it afterwards
(measured 0.06-0.55 ms at 250^3 — negligible).  ``vb=1`` degenerates to the
plain line layout with a free reshape.

**Macro windows**: one HBM->VMEM source window feeds a macro-tile of
``gu x gv`` output vregs, amortizing DMA traffic.

Reference behaviour being reproduced: the transform kernel of
``voltools/transforms.py:232-287`` with the texture reads of
``kernels/helper_interpolation.h`` (trilinear / separable cubic B-spline),
'constant' (scipy) and 'border' (texture) edge semantics.
"""

from __future__ import annotations

import functools
import itertools
import math
import threading
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from .pallas_affine import _adjusted_matrix, _MatView

# host-side tier limits
_MAX_HZ = 192          # longest per-vreg plane walk we accept
_MAX_HY = 32           # tallest per-plane y band (4 candidate sub-vregs)
_SLOP_LIMIT = 6.0      # |x| drift across the 8 sublanes (dx slots cover it)
_VMEM_BUDGET = 11 << 20
_PACKINGS = ((1, 128), (2, 64), (4, 32), (8, 16))
_MACROS = ((1, 8), (2, 4), (1, 4), (2, 2), (4, 2),
           (2, 8), (4, 4), (8, 2), (4, 8), (8, 4),
           # low-padding macros: whole-resident mode pays no per-macro DMA,
           # so the grid can run vreg-sized tiles without a redundancy tax
           (1, 1), (1, 2), (2, 1))

# --- experiment hooks (defaults = production behavior).  The hook values
# are part of _walk_runner's cache key, so flipping them can never serve a
# stale single-matrix program; experiments that exercise the BATCHED or
# FUSED paths must still clear the caches that capture runners
# (_oneshot_runner, _walk_donor, planner.plan_batch_sampler's lru, and
# transforms._jitted_affine) before and after flipping a hook.  The round-4
# _MXU_RESOLVE one-hot probe was removed after its closure (8-11x slower
# measured on hardware; tables in BENCHMARKS.md "Resolve-scheme probes").
_UNROLL_OVERRIDE = None   # planes per unrolled group in the compiled walk
                          # (None = fully unrolled, the production setting)
_DX_SPLIT = 0             # >0: process the dx slots in groups of this size,
                          # re-reading the band rows per group (live-range /
                          # spill probe for the ndx>=4 class)

# Parameter quantization ladders.  A compiled kernel depends on the variant's
# geometric parameters but NOT on the axis permutations (ps/po only permute
# host-side data movement), so rounding parameters up to a coarse ladder
# makes nearby matrices -- e.g. consecutive random rotations in a sweep --
# share one Mosaic binary instead of recompiling per angle.
_PIPELINE_DEPTH = 2   # in-flight window slots (scratch + kernel agree)
_STRIP_CS = 8         # planes per band-following strip DMA chunk
_HZ_STEP = 4
_W_STEP = 8
_YLO_STEP = 4
_SLOP_LADDER = (0, 1, 2, 3, 4, 6)


@dataclass(frozen=True)
class WalkVariant:
    """Static plane-walk kernel configuration chosen per matrix (host)."""
    ps: Tuple[int, int, int]     # source axes -> (z=walk, y=band, x=lanes)
    po: Tuple[int, int, int]     # output axes -> (u=sublanes, v, w)
    vb: int                      # lanes covering v (lane-hi)
    wb: int                      # lanes covering w (lane-lo); vb*wb == 128
    gu: int                      # macro vregs along u
    gv: int                      # macro vregs along v
    w0: int                      # window z extent (covers the macro)
    w1: int                      # window y extent
    hz: int                      # per-vreg walk length (planes)
    hy: int                      # per-plane y band height (multiple of 8)
    kax: int                     # kappa = a[1,kax]/a[0,kax]; -1 -> kappa=0
    d: Tuple[int, int, int]      # permuted source dims
    xg: int                      # HBM x-block granularity (32 or 128)
    xw: int                      # window lane width (multiple of 128)
    out_d: Tuple[int, int, int]  # permuted output dims (u, v, w)
    order: int                   # 1 = trilinear, 3 = cubic B-spline
    mode: str                    # 'constant' | 'border'
    slop_lo: int                 # x drift below the sublane-0 base, ceil'd
    slop_hi: int                 # x drift above it
    y_lo: int                    # signed y-band offset below the walk line
    xpad: int = 0                # mirror planes added per x side (d covers
                                 # them): lets constant-cubic taps stay in
                                 # range without extra mirror gather slots
    whole: bool = False          # whole-resident mode: the full prepared
                                 # volume fits VMEM, DMA'd ONCE at grid step
                                 # 0 (w0=d[0], w1=d[1], xw=dx_pad) -- kills
                                 # the per-macro window redundancy that
                                 # dominates small volumes
    cs: int = 0                  # strip-window chunk size (planes per
                                 # band-following strip DMA); 0 = classic
                                 # full-height windows.  Strips drop the
                                 # kappa*(w0+1) y-sweep term from the
                                 # window height (w1 -> sh), cutting both
                                 # window bytes AND VMEM so bigger macro
                                 # tiles fit -- the cubic regime is window-
                                 # redundancy-bound without this.
    sh: int = 0                  # strip height (rows per plane, mult of 8)

    @property
    def nch(self) -> int:
        """strip chunks per window (cs > 0 only)"""
        return self.w0 // self.cs if self.cs else 0

    @property
    def nbw(self) -> int:
        """gather blocks (128-wide) per window"""
        return self.xw // 128

    @property
    def dyn_x(self) -> bool:
        """window x origin is dynamic (xg-granular) instead of 0"""
        return self.xg < 128

    @property
    def ncopies(self) -> int:
        """x-shifted HBM copies (HBM minor dims must stay 128-tiled, so a
        32-granular window origin is realized by picking among 4 copies
        shifted by 0/32/64/96 and a 128-aligned block within the copy)"""
        return 128 // self.xg

    @property
    def nbk(self) -> int:
        """128-wide x blocks per copy in the HBM layout"""
        if not self.dyn_x:
            return -(-self.d[2] // 128)
        tmax = max(self.d[2] - 1, 0) // self.xg
        return tmax // self.ncopies + self.nbw

    @property
    def taps(self):
        return (0, 1) if self.order == 1 else (-1, 0, 1, 2)

    @property
    def dxs(self):
        lo = self.taps[0] - self.slop_lo
        hi = self.taps[-1] + self.slop_hi
        if self.order == 3 and self.mode == "constant" and self.xpad == 0:
            # mirrored x taps can jump one slot past the drift near edges
            # (unpadded layouts only; mirror-padded x never leaves range)
            lo -= 1
            hi += 1
        return tuple(range(lo, hi + 1))

    @property
    def ycand(self) -> int:
        return (self.hy + 7) // 8


def _geometry(a, order, vb, wb, kax):
    """Per-vreg walk/band extents for one (ps, po, packing, kappa) choice.

    ``a``: (3,4) permuted matrix (signed, float64).  Element coordinates
    within a vreg: (s, vl, wl) with extents (7, vb-1, wb-1).  Returns
    (hz, hy_raw, y_lo, (slop_lo, slop_hi), kappa) or None.
    """
    e = (7.0, float(vb - 1), float(wb - 1))
    tapspan = 1 if order == 1 else 3
    t_lo, t_hi = (0, 1) if order == 1 else (-1, 2)

    span_z = sum(abs(a[0, i]) * e[i] for i in range(3))
    # +1 walk-origin slot, +1 f32 scalar-vs-vector skew at the bottom.  A
    # skew flip at the TOP needs no slot: the tap escaping the walk has
    # fractional weight ~ulp there (fz -> 0/1), far below the 5e-5 parity
    # tolerance.
    hz = int(math.ceil(span_z)) + tapspan + 2

    # signed x drift across sublanes (x base is taken at sublane 0); epsilon
    # guards the ceil against f32 floor flips at near-integer drift
    drift = a[2, 0] * 7.0
    if abs(drift) > _SLOP_LIMIT:
        return None
    slop_lo = int(math.ceil(-drift + 1e-4)) if drift < -1e-5 else 0
    slop_hi = int(math.ceil(drift + 1e-4)) if drift > 1e-5 else 0

    # y band: an element is active at plane zk exactly when zf - zk is in
    # [-t_hi, t_hi); with y_line(zk) = yc + kappa*(zk - zc) (base corner),
    #   y - y_line = sum_i (a1i - kappa*a0i) * xi_i + kappa*(zf - zk),
    # xi_i in [0, e_i].
    if kax < 0:
        kappa = 0.0
    else:
        if abs(a[0, kax]) < 1e-6:
            return None
        kappa = a[1, kax] / a[0, kax]
    res = [a[1, i] - kappa * a[0, i] for i in range(3)]
    wob = abs(kappa) * float(t_hi)
    lo = sum(min(res[i] * e[i], 0.0) for i in range(3)) - wob
    hi = sum(max(res[i] * e[i], 0.0) for i in range(3)) + wob
    # one f32-skew slot at the bottom only: an upward floor flip at the top
    # puts ~ulp weight on the escaping tap (benign, see hz comment)
    y_lo = int(math.floor(lo)) + t_lo - 1
    y_hi = int(math.ceil(hi)) + t_hi
    return hz, y_hi - y_lo + 1, y_lo, (slop_lo, slop_hi), kappa


_PERMS = tuple(itertools.permutations((0, 1, 2)))
# Band-line slope candidates: kappa in {0, a10/a00, a11/a01, a12/a02}.
# These four realize the CONTINUOUS optimum of the band height: for active
# elements at plane zk (those with |zf - zk| < t_hi), the y residual
# against a line of slope kappa is (a1 - kappa*a0) . xi + kappa*(zf - zk)
# with xi over the patch box, so the required band height is
#   W(kappa) = sum_i |a1i - kappa*a0i| * e_i + |kappa| * t_hi  (+ taps),
# a convex piecewise-linear function of kappa whose breakpoints are exactly
# kappa = 0 and kappa = a1i/a0i.  A convex piecewise-linear function attains
# its minimum at a breakpoint, so searching these four IS the exhaustive
# continuous search: hy cannot be reduced by any finer line-slope choice.
# (The plane-slice constraint a0 . xi = const is absorbed into the line
# offset by the same argument — adding lambda*(a0.xi - c) re-parameterizes
# kappa — so W is also the exact bound for the per-plane ACTIVE set, not a
# whole-patch over-approximation: conditional skipping of band candidates
# that "usually" have no active rows cannot fire often enough to pay.)
_KAXES = (-1, 0, 1, 2)
_LADDER_ARR = np.asarray(_SLOP_LADDER)

# Strip windows were implemented, parity-validated, and then MEASURED
# 9-18% slower than classic windows at 250^3 cubic (exp_r3_strips: window
# DMA already hides behind gather compute), so the chooser never selected
# them.  Skipping their cost block saves ~25% of the host planning time
# (the one-shot path pays planning per fresh matrix); the kernel path
# stays available for explicit opt-in / experiments via this flag.
_CHOOSER_STRIPS = False

# chooser constants hoisted out of the per-call body (host planning is on
# the one-shot critical path)
_E_ALL = np.array([[7.0, vb - 1.0, wb - 1.0] for vb, wb in _PACKINGS],
                  np.float32)                          # (P, 3)
_EM_ALL = np.array([[[8.0 * gu - 1.0, vb * gv - 1.0, wb - 1.0]
                     for gu, gv in _MACROS]
                    for vb, wb in _PACKINGS], np.float32)  # (P, M, 3)
_GUV = np.array([gu * gv for gu, gv in _MACROS])       # (M,)
_GUS = np.array([gu for gu, gv in _MACROS])
_GVS = np.array([gv for gu, gv in _MACROS])
_VBS = np.array([vb for vb, wb in _PACKINGS])
_WBS = np.array([wb for vb, wb in _PACKINGS])


@functools.lru_cache(maxsize=64)
def _shape_tables(vol_shape, out_shape, xpad):
    """Matrix-independent chooser tables for one (volume, output, xpad)
    geometry: permuted dims, padded-vreg counts, and whole-resident-mode
    byte sizes.  Cached -- sweeps and one-shot calls over the same volume
    shape pay these allocations once, not per matrix."""
    d0 = np.array([vol_shape[ps[0]] for ps in _PERMS for _ in _PERMS])
    d1 = np.array([vol_shape[ps[1]] for ps in _PERMS for _ in _PERMS])
    d2 = np.array([vol_shape[ps[2]] + 2 * xpad
                   for ps in _PERMS for _ in _PERMS])
    o0 = np.array([out_shape[po[0]] for _ in _PERMS for po in _PERMS])
    o1 = np.array([out_shape[po[1]] for _ in _PERMS for po in _PERMS])
    o2 = np.array([out_shape[po[2]] for _ in _PERMS for po in _PERMS])
    dx_pad = ((d2 + 127) // 128) * 128
    # padded output vreg count per (perm, packing, macro): the grid covers
    # ceil-rounded macro tiles, so the kernel resolves THESE vregs, not
    # o0*o1*o2/1024 -- at small sizes padding is a 1.2-1.6x real cost the
    # model must see to pick low-padding packings/macros
    u_vregs = (-(-o0[:, None, None] // (8 * _GUS)) * _GUS)       # (36,1,M)
    v_vregs = (-(-o1[:, None, None] // (_VBS[:, None] * _GVS))
               * _GVS)                                           # (36,P,M)
    w_vregs = -(-o2[:, None, None] // _WBS[:, None])             # (36,P,1)
    npad = (u_vregs * v_vregs * w_vregs).astype(np.float64)     # (36,P,M)
    xww = dx_pad
    nbww = xww // 128
    whole_bytes = (d0 * d1 * xww * 4).astype(np.float64)
    return (d0, d1, d2, o0, o1, o2, dx_pad, npad, xww, nbww, whole_bytes)


def _ladder_arr(x, xp=np):
    """Vectorized slop ladder: round each element up to the next rung."""
    ladder = xp.asarray(_LADDER_ARR, dtype=x.dtype)
    idx = xp.searchsorted(ladder, x)
    return xp.where(idx < len(_LADDER_ARR),
                    ladder[xp.minimum(idx, len(_LADDER_ARR) - 1)], x)


_PS_IDX = np.array([ps for ps in _PERMS for _ in _PERMS])          # (36, 3)
_PO_IDX = np.array([list(po) + [3] for _ in _PERMS for po in _PERMS])  # (36,4)


def _adjusted_all(matrices, xp=np):
    """(N,4,4) matrices -> (36, N, 3, 4) adjusted forms over (ps, po)."""
    A = matrices[:, _PS_IDX[:, :, None], _PO_IDX[:, None, :]]  # (N,36,3,4)
    A = xp.transpose(A, (1, 0, 2, 3)).astype(xp.float32)
    return np.ascontiguousarray(A) if xp is np else A


def _vec_geometry(A, order, xp=np):
    """Vectorized :func:`_geometry` over leading axes and packings/kaxes.

    ``A``: (C, N, 3, 4) f32.  Returns per packing index p a dict of arrays:
    hz (C,N), slop_lo/hi (C,N), drift_ok (C,N), and per-kax (axis -1, order
    ``_KAXES``): kok (C,N,4), kappa (C,N,4), res (C,N,4,3), y_lo/y_hi
    (C,N,4) -- everything except e-dependent parts; e enters via callers.

    ``xp`` selects the array module: numpy (the host reference path) or
    jax.numpy (the same code traced into the jitted fast chooser).
    """
    t_lo, t_hi = (0, 1) if order == 1 else (-1, 2)
    drift = A[..., 2, 0] * np.float32(7.0)
    drift_ok = xp.abs(drift) <= _SLOP_LIMIT
    slop_lo = xp.where(drift < -1e-5, xp.ceil(-drift + 1e-4), 0.0)
    slop_hi = xp.where(drift > 1e-5, xp.ceil(drift + 1e-4), 0.0)
    denom = A[..., 0, :3]
    num = A[..., 1, :3]
    if xp is np:
        # masked divide: skips the |denom| < 1e-6 lanes the kok mask
        # zeroes downstream anyway (and the errstate context they needed)
        kap_axes = np.divide(num, denom, out=np.zeros_like(num),
                             where=np.abs(denom) >= 1e-6)
    else:
        kap_axes = num / denom
    kok = xp.concatenate([xp.ones_like(denom[..., :1], bool),
                          xp.abs(denom) >= 1e-6], axis=-1)
    kappa = xp.concatenate([xp.zeros_like(kap_axes[..., :1]), kap_axes],
                           axis=-1)
    kappa = xp.where(kok, kappa, 0.0)
    # res[..., k, i] = a1i - kappa_k * a0i
    res = num[..., None, :] - kappa[..., :, None] * denom[..., None, :]
    cap = float(1 << 29)   # see _I32_CAP: masked out downstream anyway
    return dict(slop_lo=xp.clip(slop_lo, 0.0, cap).astype(xp.int32),
                slop_hi=xp.clip(slop_hi, 0.0, cap).astype(xp.int32),
                drift_ok=drift_ok,
                kok=kok, kappa=kappa, res=res, t_lo=t_lo, t_hi=t_hi)


def _band_bounds(geo, A, vb, wb, order):
    """Packing-dependent walk/band extents from :func:`_vec_geometry`
    output: hz (C,N), y_lo/y_hi (C,N,4)."""
    e = np.array([7.0, vb - 1.0, wb - 1.0], np.float32)
    tapspan = 1 if order == 1 else 3
    span_z = np.abs(A[..., 0, :3]) @ e
    hz = np.ceil(span_z).astype(np.int64) + tapspan + 2
    rese = geo["res"] * e
    wob = np.abs(geo["kappa"]) * float(geo["t_hi"])
    lo = np.minimum(rese, 0.0).sum(-1) - wob
    hi = np.maximum(rese, 0.0).sum(-1) + wob
    y_lo = np.floor(lo).astype(np.int64) + geo["t_lo"] - 1
    y_hi = np.ceil(hi).astype(np.int64) + geo["t_hi"]
    return hz, y_lo, y_hi


_I32_CAP = 1 << 29   # clamp float bounds before int32 casts: extreme
                     # kappa/zoom matrices can push a band/window bound past
                     # 2^31, which would wrap negative and un-mask bogus
                     # configs (or crash warnings-as-errors callers with a
                     # cast RuntimeWarning).  2^29 keeps every downstream
                     # difference/sum inside int32 while staying far above
                     # the hard limits that mask such configs out anyway.


def _ceil_i32(x, xp):
    return xp.clip(xp.ceil(x), -_I32_CAP, _I32_CAP).astype(np.int32)


def _floor_i32(x, xp):
    return xp.clip(xp.floor(x), -_I32_CAP, _I32_CAP).astype(np.int32)


def _search_tensors(A, tables, order, mode, quantize, xp=np):
    """The chooser's vectorized search over (36 perms x 4 kax x P packings
    x M macros), parameterized by the array module ``xp``.

    ONE implementation serves both paths: ``xp=np`` is the host reference
    (float64 cost, exactly the historical chooser), and ``xp=jax.numpy``
    traces the same code into the jitted CPU fast path
    (:func:`_jit_search`) — same formulas, same masks, same cost model, no
    duplicated logic.  The jitted path runs float32 (jax x64 stays off),
    which can flip a near-exact cost tie or a knife-edge ceil by one rung;
    the winner is always re-validated by :func:`walk_variant_covers`, so a
    flip only trades between configs the model ranks equal within float32
    resolution.
    """
    ntaps = 2 if order == 1 else 4
    tapspan = ntaps - 1
    xpad = 2 if (order == 3 and mode == "constant") else 0
    (d0, d1, d2, o0, o1, o2, dx_pad, npad, xww, nbww,
     whole_bytes) = tables
    ff = np.float64 if xp is np else np.float32
    d0i = d0.astype(np.int32)
    d1i = d1.astype(np.int32)

    geo = _vec_geometry(A, order, xp=xp)
    aaE = xp.abs(A).max(axis=1)                       # (36, 3, 4) envelope
    # parameter ladders trade per-matrix tightness for Mosaic binary
    # sharing across a sweep; quantize=False (tight mode, e.g. benchmark
    # steady state with one compile per matrix) keeps the exact values —
    # hz and the slop slots directly scale the per-vreg vector work
    slop_lo = geo["slop_lo"].max(1)                   # (36,)
    slop_hi = geo["slop_hi"].max(1)
    if quantize:
        slop_lo = _ladder_arr(slop_lo, xp)
        slop_hi = _ladder_arr(slop_hi, xp)
    base_ok = geo["drift_ok"].all(1)                  # (36,)
    kok = geo["kok"].all(1)                           # (36, 4)
    kapM = xp.abs(geo["kappa"]).max(1)                # (36, 4)
    resM = xp.abs(geo["res"]).max(1)                  # (36, 4, 3)
    ndx0 = ntaps + slop_lo + slop_hi
    if xpad:
        # _preparer's mirror extension slices xpad planes off each x side;
        # a raw x extent <= xpad (quasi-2D volume) can't supply them and
        # would crash the reshape there — mask those permutations out
        base_ok = base_ok & (d2 - 2 * xpad > xpad)

    e_all = _E_ALL
    E_all = _EM_ALL
    guv = _GUV
    t_lo, t_hi = geo["t_lo"], geo["t_hi"]

    span_z = xp.abs(A[:, :, 0, :3]) @ e_all.T         # (36, N, P)
    hz_r = _ceil_i32(span_z, xp) + tapspan + 2
    wob = xp.abs(geo["kappa"]) * float(t_hi)          # (36, N, 4)
    lo_b = (xp.minimum(geo["res"], 0.0) @ e_all.T
            - wob[..., None])                         # (36, N, 4, P)
    hi_b = xp.maximum(geo["res"], 0.0) @ e_all.T + wob[..., None]
    ylo_r = _floor_i32(lo_b, xp) + t_lo - 1
    yhi_r = _ceil_i32(hi_b, xp) + t_hi

    hz_raw = hz_r.max(1)                              # (36, P)
    if quantize:
        y_lo = (ylo_r.min(1) // _YLO_STEP) * _YLO_STEP  # (36, 4, P)
        hz = -_HZ_STEP * (-hz_raw // _HZ_STEP)        # (36, P)
    else:
        y_lo = ylo_r.min(1)
        hz = hz_raw
    y_hi = yhi_r.max(1)
    hy = (y_hi - y_lo + 8) // 8 * 8                   # (36, 4, P)
    ok0 = ((base_ok[:, None] & (hz <= _MAX_HZ))[:, None]
           & kok[:, :, None] & (hy <= _MAX_HY))       # (36, 4, P)
    hz_c = xp.minimum(hz, d0i[:, None])               # (36, P)
    ycand = (hy + 7) // 8

    span0 = xp.einsum("cj,pmj->cpm", aaE[:, 0, :3], E_all)
    w0 = (_ceil_i32(span0, xp) + tapspan + 3
          + (hz - hz_raw)[:, :, None])                # (36, P, M)
    w0 = xp.maximum(w0, hz[:, :, None])
    if quantize:
        w0 = -_W_STEP * (-w0 // _W_STEP)
    w0 = xp.minimum(w0, d0i[:, None, None])
    w1 = (_ceil_i32(xp.einsum("ckj,pmj->ckpm", resM, E_all)
                    + kapM[:, :, None, None] * (w0[:, None] + 1.0), xp)
          + 3 + hy[..., None])                        # (36, 4, P, M)
    # w1 is the window's second-minor dim: keep 8-sublane alignment even in
    # tight mode (dynamic-start band slices assume it)
    w1 = xp.minimum(-8 * (-w1 // 8), d1i[:, None, None, None])
    span_x = (xp.einsum("cj,pmj->cpm", aaE[:, 2, :3], E_all)
              + tapspan + (slop_lo + slop_hi)[:, None, None] + 4)
    dyn = (span_x <= 128 - 32 - 2) & (dx_pad > 128)[:, None, None]
    xg = xp.where(dyn, 32, 128).astype(np.int32)      # (36, P, M)
    xw = xp.where(dyn, 128,
                  dx_pad[:, None, None]).astype(np.int32)
    nbw = xw // 128
    # float window-byte check: exact below 2^24 (the budget region), and
    # overflow-safe for volumes whose int32 byte product would wrap.
    # ``w01x`` is shared with the DMA term below: the regrouping is exact
    # (f64 products here are integer-valued < 2^53; in f32 the only factor
    # moved across a rounding step is a power of two)
    w01x = w0[:, None].astype(ff) * w1.astype(ff) * xw[:, None].astype(ff)
    win_bytes = (_PIPELINE_DEPTH * 4.0) * w01x
    ok = ok0[..., None] & (hy[..., None] <= w1) & (win_bytes <= _VMEM_BUDGET)

    # whole-resident mode: the full prepared volume fits one VMEM slot --
    # DMA it once at grid step 0, no per-macro windows, no pipelining.
    # Small volumes otherwise pay a >10x window-redundancy DMA tax.
    # (npad / xww / nbww / whole_bytes come from the shape-table cache; the
    # byte comparison is matrix-independent and stays host-side numpy.)
    whole_fits = ((whole_bytes <= _VMEM_BUDGET)[:, None, None]
                  & (hy <= d1i[:, None, None]))        # (36,4,P)
    ok_w = ok0 & whole_fits

    # measurement-calibrated cost model (exp_r3_walkprofile +
    # exp_r3_measure, 250^3): per-vreg-plane compute ~= 2.16 * ycand *
    # ndx^1.5 ns.  The lane gathers dominate (sublane takes/fma are
    # ~free), so cubic's extra taps cost only ~11% (measured 2.4 vs
    # 2.16 ns units), not 2x.  The window DMA pipelines behind the
    # compute, so it only costs where it exceeds the overlap headroom.
    nd = ndx0[:, None, None, None].astype(ff)
    tapf = 1.0 if ntaps == 2 else 1.11
    # the 5.5*ycand floor is the per-plane work that does NOT scale
    # with nbw (dynamic row slices, weight folds) -- calibrated at
    # nbw=1 from exp_r3_wholecal (50^3/100^3 hardware sweep).  The
    # hoisted ``gath``/``floor_y``/``hzf``/``nbwf`` factors keep the
    # historical op order exactly (shared between the classic and
    # whole-mode costs below)
    ycf = ycand[..., None].astype(ff)
    gath = 2.16 * ycf * nd ** 1.5 * tapf
    floor_y = 5.5 * ycf
    nbwf = nbw[:, None].astype(ff)
    hzf = hz_c[:, None, :, None].astype(ff)
    per_plane = gath * nbwf + floor_y                    # ns/vreg/plane
    per_vreg = hzf * per_plane + 30.0                    # ns/vreg
    dma = ((w01x * 4.0) / guv / 750.0
           + 300.0 * nbwf / guv)                         # ns/vreg
    tot = (xp.maximum(per_vreg, dma)
           + 0.25 * xp.minimum(per_vreg, dma))
    cost = xp.where(ok, tot * npad[:, None], np.inf)

    # whole-mode cost: same per-vreg compute with nbw=nbww, plus the
    # one-time volume DMA (no overlap term: it's serial at step 0)
    per_plane_w = (gath * nbww[:, None, None, None].astype(ff)
                   + floor_y)
    per_vreg_w = hzf * per_plane_w + 30.0
    cost_w = xp.where(
        ok_w[..., None],
        per_vreg_w * npad[:, None]
        + (whole_bytes / 750.0
           + 300.0 * nbww)[:, None, None, None], np.inf)

    return dict(cost=cost, cost_w=cost_w, hz=hz, hz_raw=hz_raw, hz_c=hz_c,
                hy=hy, y_lo=y_lo, slop_lo=slop_lo, slop_hi=slop_hi,
                w0=w0, w1=w1, xg=xg, xw=xw, nbw=nbw, ok0=ok0,
                resM=resM, kapM=kapM, per_vreg=per_vreg)


def _variant_from_fields(pq, ki, pi, mi, kind, tables, order, mode,
                         hz, hy, y_lo, slop_lo, slop_hi, w0, w1, xg, xw):
    """WalkVariant construction shared by the fast-path decode and the
    numpy ``_build`` (kind 0 = classic window, 1 = whole-resident) — one
    source of truth for the winner-index -> variant-field mapping."""
    d0, d1, d2, o0, o1, o2 = tables[:6]
    xww = tables[8]
    xpad = 2 if (order == 3 and mode == "constant") else 0
    common = dict(ps=_PERMS[pq // 6], po=_PERMS[pq % 6],
                  vb=_PACKINGS[pi][0], wb=_PACKINGS[pi][1],
                  gu=_MACROS[mi][0], gv=_MACROS[mi][1],
                  hz=hz, hy=hy, kax=_KAXES[ki],
                  d=(int(d0[pq]), int(d1[pq]), int(d2[pq])),
                  out_d=(int(o0[pq]), int(o1[pq]), int(o2[pq])),
                  order=order, mode=mode, slop_lo=slop_lo,
                  slop_hi=slop_hi, y_lo=y_lo, xpad=xpad)
    if kind == 1:
        return WalkVariant(w0=int(d0[pq]), w1=int(d1[pq]), xg=128,
                           xw=int(xww[pq]), whole=True, **common)
    return WalkVariant(w0=w0, w1=w1, xg=xg, xw=xw, **common)


_FAST_CHOOSER = True   # jitted CPU chooser core (numpy fallback on any
                       # backend hiccup; tests flip this to compare paths)
_FAST_N_MAX = 64       # envelope sizes above this use the numpy path (the
                       # jit caches one executable per batch size)


@functools.lru_cache(maxsize=64)
def _jit_search(vol_shape, out_shape, n, order, mode, quantize):
    """CPU-jitted chooser core for one (shape, order, mode, quantize) key:
    traces :func:`_search_tensors` once, then each fresh matrix costs one
    dispatch + one 12-scalar fetch.  Returns (callable, cpu_device), or
    None when no CPU backend is available."""
    try:
        import jax
        cpu = jax.devices("cpu")[0]
    except Exception:   # pragma: no cover - exotic backends
        return None
    import jax.numpy as jnp

    xpad = 2 if (order == 3 and mode == "constant") else 0
    tables = _shape_tables(vol_shape, out_shape, xpad)
    # jnp copies: the winner decode indexes these with traced scalars
    d0i = jnp.asarray(tables[0].astype(np.int32))
    d1i = jnp.asarray(tables[1].astype(np.int32))
    xwwi = jnp.asarray(tables[8].astype(np.int32))
    P, M = len(_PACKINGS), len(_MACROS)
    csize = 36 * 4 * P * M

    def core(mats):
        A = _adjusted_all(mats, xp=jnp)
        t = _search_tensors(A, tables, order, mode, quantize, xp=jnp)
        flat = jnp.concatenate([t["cost"].ravel(), t["cost_w"].ravel()])
        fi = jnp.argmin(flat)
        val = flat[fi]
        kind = (fi >= csize).astype(jnp.int32)
        idx = fi - kind * csize
        mi = idx % M
        r = idx // M
        pi = r % P
        r = r // P
        ki = r % 4
        pq = r // 4
        whole = kind == 1
        w0 = jnp.where(whole, d0i[pq], t["w0"][pq, pi, mi])
        w1 = jnp.where(whole, d1i[pq], t["w1"][pq, ki, pi, mi])
        xg = jnp.where(whole, 128, t["xg"][pq, pi, mi])
        xw = jnp.where(whole, xwwi[pq], t["xw"][pq, pi, mi])
        f = jnp.float32
        return jnp.stack([
            fi.astype(f), val.astype(f), kind.astype(f),
            t["hz_c"][pq, pi].astype(f), t["hy"][pq, ki, pi].astype(f),
            t["y_lo"][pq, ki, pi].astype(f),
            t["slop_lo"][pq].astype(f), t["slop_hi"][pq].astype(f),
            w0.astype(f), w1.astype(f), xg.astype(f), xw.astype(f)])

    return jax.jit(core), cpu


_FAST_BAD: set = set()     # keys whose jitted core failed once — skip them
                           # forever instead of paying a failed trace
                           # (~60 ms) on every later call
_FAST_READY: dict = {}     # fkey -> (core, cpu) with the executable WARM
_FAST_PENDING: set = set()
_FAST_LOCK = threading.Lock()
_FAST_SYNC = False         # tests: compile inline instead of in background
_FAST_THREADS: list = []   # live warm threads, joined at interpreter exit


def _fast_join(timeout: float = None):
    """Join outstanding warm threads (atexit): tearing a process down in
    the middle of a compile can wedge remote-tunnel platforms for minutes
    (and aborts noisily); a bounded join lets in-flight warms finish.

    The long grace period only applies when a non-CPU backend is live in
    this process (the tunnel hazard); on a purely local backend a normal
    XLA:CPU chooser compile finishes in ~1 s, so a short-lived CLI run
    never hangs at exit behind a wedged (daemon) compile thread."""
    if timeout is None:
        timeout = 90.0 if _accelerator_backend_live() else 5.0
    deadline = None
    for th in list(_FAST_THREADS):
        if th.is_alive():
            import time as _time
            if deadline is None:
                deadline = _time.monotonic() + timeout
            th.join(max(0.0, deadline - _time.monotonic()))
    _FAST_THREADS.clear()


def _accelerator_backend_live() -> bool:
    """True when a non-CPU jax backend has been initialized in this process
    (checked via the bridge's registry so the probe itself never initializes
    one); conservatively True if the registry is unreadable."""
    try:
        from jax._src import xla_bridge as xb
        # no getattr default: if a jax release renames _backends the
        # AttributeError must land in the conservative branch below, not
        # read as "no accelerator" and cut the teardown grace period
        return any(p != "cpu" for p in xb._backends)
    except Exception:  # pragma: no cover - private-API drift
        return True


import atexit as _atexit

_atexit.register(_fast_join)


def _fast_warm(fkey):
    """Background warm-up: trace+compile the chooser core for ``fkey`` and
    publish it.  Off the critical path because some platform plugins (the
    axon remote-TPU tunnel) inflate a ~1 s local XLA:CPU compile to ~45 s;
    numpy serves every plan until the executable is ready."""
    try:
        js = _jit_search(*fkey)
        if js is None:
            raise RuntimeError("no CPU backend")
        core, cpu = js
        import jax
        dummy = np.zeros((fkey[2], 4, 4), np.float32)
        dummy[:] = np.eye(4, dtype=np.float32)
        np.asarray(core(jax.device_put(dummy, cpu)))
        with _FAST_LOCK:
            _FAST_READY[fkey] = (core, cpu)
            # bounded like _jit_search's lru: a long-lived service planning
            # many distinct shapes must not pin every warmed executable
            while len(_FAST_READY) > 64:
                _FAST_READY.pop(next(iter(_FAST_READY)))
    except Exception:   # pragma: no cover - any backend hiccup
        with _FAST_LOCK:
            _FAST_BAD.add(fkey)
    finally:
        with _FAST_LOCK:
            _FAST_PENDING.discard(fkey)


def _fast_search(matrices, vol_shape, out_shape, order, mode, quantize):
    """(best_variant_or_None, best_cost) via the jitted CPU core, or None
    when the fast path is unavailable (caller falls back to numpy)."""
    n = int(matrices.shape[0])
    if n > _FAST_N_MAX:
        return None
    fkey = (vol_shape, out_shape, n, order, mode, quantize)
    with _FAST_LOCK:
        if fkey in _FAST_BAD:
            return None
        entry = _FAST_READY.get(fkey)
        if entry is None and fkey not in _FAST_PENDING:
            _FAST_PENDING.add(fkey)
            if not _FAST_SYNC:
                th = threading.Thread(target=_fast_warm, args=(fkey,),
                                      daemon=True)
                # prune finished warms so the list stays O(live threads)
                _FAST_THREADS[:] = [t for t in _FAST_THREADS
                                    if t.is_alive()]
                _FAST_THREADS.append(th)
                th.start()
    if entry is None:
        if _FAST_SYNC:
            _fast_warm(fkey)
            with _FAST_LOCK:
                entry = _FAST_READY.get(fkey)
        if entry is None:
            return None
    core, cpu = entry
    try:
        import jax
        packed = np.asarray(core(jax.device_put(
            np.ascontiguousarray(matrices, np.float32), cpu)))
    except Exception:   # pragma: no cover - any backend hiccup
        with _FAST_LOCK:
            _FAST_BAD.add(fkey)
        return None
    val = float(packed[1])
    if not np.isfinite(val):
        return (None, np.inf)
    fi = int(packed[0])
    kind = int(packed[2])
    P, M = len(_PACKINGS), len(_MACROS)
    idx = fi - kind * (36 * 4 * P * M)
    pq, ki, pi, mi = np.unravel_index(idx, (36, 4, P, M))
    xpad = 2 if (order == 3 and mode == "constant") else 0
    tables = _shape_tables(vol_shape, out_shape, xpad)
    (hz_c, hy, y_lo, slop_lo, slop_hi, w0, w1, xg,
     xw) = (int(round(float(x))) for x in packed[3:12])
    v = _variant_from_fields(pq, ki, pi, mi, kind, tables, order, mode,
                             hz_c, hy, y_lo, slop_lo, slop_hi, w0, w1,
                             xg, xw)
    return (v, val)


def choose_walk_variant(matrix, vol_shape, interpolation: str,
                        mode: str = "constant", known=(),
                        sticky: float = 1.35,
                        out_shape=None,
                        quantize: bool = True,
                        topk: int = 1) -> Optional[WalkVariant]:
    """Pick the cheapest (axes, packing, macro) assignment for the kernel.

    ``topk > 1`` returns a LIST of up to topk coverage-validated variants
    with distinct Mosaic binaries, cheapest modeled first (for empirical
    best-of-K autotune); ``known``/``sticky`` are ignored in that mode.

    ``known`` is a collection of already-compiled canonical variants; when
    one of them covers the matrix under some permutation at a cost within
    ``sticky`` x the fresh optimum, it wins -- reusing a Mosaic binary beats
    a ~13 s compile for a marginally tighter config, so sweeps of random
    orientations converge onto a handful of kernels.

    ``matrix`` may be (4,4) or (N,4,4) (envelope over the batch).  Returns
    None when no assignment fits the band/walk limits.  The search is
    numpy-vectorized over all (ps, po, packing, kax, macro) configurations
    (the scalar :func:`_geometry` stays the reference used by
    :func:`walk_variant_covers`, which re-validates the winner).
    """
    if out_shape is None:
        out_shape = vol_shape
    matrices = np.asarray(matrix, dtype=np.float64)
    if matrices.ndim == 2:
        matrices = matrices[None]
    order = 1 if interpolation == "linear" else 3
    ntaps = 2 if order == 1 else 4
    tapspan = ntaps - 1

    # permutation-dependent dims (matrix-independent: cached per shape)
    xpad = 2 if (order == 3 and mode == "constant") else 0
    tables = _shape_tables(tuple(vol_shape), tuple(out_shape), xpad)
    (d0, d1, d2, o0, o1, o2, dx_pad, npad, xww, nbww,
     whole_bytes) = tables

    if _FAST_CHOOSER and topk <= 1 and not _CHOOSER_STRIPS:
        # jitted-on-CPU fast path: one dispatch + a 12-scalar fetch instead
        # of ~40 host numpy passes (measured 2.8 -> ~1 ms at 250^3, the
        # one-shot latency lever).  The winner flows through the same
        # cover re-validation and known-variant fit as the numpy path, so
        # a float32 cost tie-flip only trades model-equal configs.
        fast = _fast_search(matrices, tuple(vol_shape), tuple(out_shape),
                            order, mode, quantize)
        if fast is not None:
            best, best_cost = fast
            return _choose_finish(best, best_cost, matrix, matrices,
                                  vol_shape, out_shape, interpolation,
                                  mode, known, sticky, quantize, topk)

    A = _adjusted_all(matrices)                       # (36, N, 3, 4)
    t = _search_tensors(A, tables, order, mode, quantize)
    cost, cost_w = t["cost"], t["cost_w"]
    hz_c, hy, y_lo = t["hz_c"], t["hy"], t["y_lo"]
    slop_lo, slop_hi = t["slop_lo"], t["slop_hi"]
    w0, w1, xg, xw, nbw = t["w0"], t["w1"], t["xg"], t["xw"], t["nbw"]
    ok0, per_vreg = t["ok0"], t["per_vreg"]
    resM, kapM = t["resM"], t["kapM"]
    guv = _GUV
    E_all = _EM_ALL

    best = None
    best_cost = np.inf
    # the strips costs are computed inside this block, so it must also be
    # entered when only strips could be feasible (opt-in _CHOOSER_STRIPS)
    if (np.isfinite(cost).any() or np.isfinite(cost_w).any()
            or _CHOOSER_STRIPS):
        # strip-window mode: per chunk of cs planes, DMA only the tile's
        # band rows at that chunk (band-following).  Measured slower than
        # classic windows on this hardware (exp_r3_strips) so skipped by
        # default (_CHOOSER_STRIPS); the kernel path remains validated and
        # available for opt-in.
        cost_s = None
        if _CHOOSER_STRIPS:
            cs = _STRIP_CS
            w0_s = -cs * (-w0 // cs)                          # (36,P,M)
            sh = (np.ceil(np.einsum("ckj,pmj->ckpm", resM, E_all)
                          + kapM[:, :, None, None] * (cs + 1.0))
                  .astype(np.int64) + 3 + hy[..., None])      # (36,K,P,M)
            sh = np.minimum(-8 * (-sh // 8), d1[:, None, None, None])
            nch = w0_s // cs
            win_bytes_s = (_PIPELINE_DEPTH * w0_s[:, None] * sh
                           * xw[:, None] * 4)
            ok_s = (ok0[..., None] & (hy[..., None] <= sh)
                    & (w0_s <= d0[:, None, None])[:, None]
                    & (win_bytes_s <= _VMEM_BUDGET))
            dma_s = ((w0_s[:, None] * sh * xw[:, None] * 4.0) / guv / 750.0
                     + 300.0 * (nbw * nch)[:, None] / guv)    # ns/vreg
            tot_s = (np.maximum(per_vreg, dma_s)
                     + 0.25 * np.minimum(per_vreg, dma_s))
            cost_s = np.where(ok_s, tot_s * npad[:, None], np.inf)

        def _build(flat_i, kind):
            # kind: 0 = classic window, 1 = whole-resident, 2 = strips
            pq, ki, pi, mi = np.unravel_index(flat_i, cost.shape)
            if kind == 2:
                import dataclasses
                shv = int(sh[pq, ki, pi, mi])
                base = _variant_from_fields(
                    pq, ki, pi, mi, 0, tables, order, mode,
                    int(hz_c[pq, pi]), int(hy[pq, ki, pi]),
                    int(y_lo[pq, ki, pi]), int(slop_lo[pq]),
                    int(slop_hi[pq]), int(w0_s[pq, pi, mi]), shv,
                    int(xg[pq, pi, mi]), int(xw[pq, pi, mi]))
                return dataclasses.replace(base, cs=cs, sh=shv)
            return _variant_from_fields(
                pq, ki, pi, mi, kind, tables, order, mode,
                int(hz_c[pq, pi]), int(hy[pq, ki, pi]),
                int(y_lo[pq, ki, pi]), int(slop_lo[pq]),
                int(slop_hi[pq]), int(w0[pq, pi, mi]),
                int(w1[pq, ki, pi, mi]), int(xg[pq, pi, mi]),
                int(xw[pq, pi, mi]))

        if topk > 1:
            # best-of-K enumeration for empirical autotune: the K cheapest
            # configs with DISTINCT Mosaic binaries (canonical form + data
            # layout), each coverage-validated.  Model error is ~±10-20%,
            # so measuring a few near-optimal configs on device recovers it.
            flat = np.concatenate(
                [cost.ravel(), cost_w.ravel()]
                + ([cost_s.ravel()] if cost_s is not None else []))
            cands = []
            seen = set()
            order_i = np.argsort(flat)
            cutoff = 1.6 * float(flat[order_i[0]]) if order_i.size else 0.0
            for fi in order_i:
                # require STRUCTURAL diversity (axes/packing/kax/mode, not
                # just macro tiling, which measures within ±5%) and stay
                # within 1.6x of the modeled optimum — beyond that the
                # model's error band can't flip the ranking
                if (not np.isfinite(flat[fi]) or len(cands) >= topk
                        or flat[fi] > cutoff):
                    break
                v = _build(int(fi) % cost.size, int(fi) // cost.size)
                key = (v.ps, v.po, v.vb, v.wb, v.kax, v.whole, v.cs)
                if key in seen:
                    continue
                seen.add(key)
                if walk_variant_covers(v, matrices, vol_shape,
                                       interpolation, mode,
                                       out_shape=out_shape):
                    cands.append(v)
            return cands

        kinds = ((cost, cost_w, cost_s) if cost_s is not None
                 else (cost, cost_w))
        kis = [int(np.argmin(c)) for c in kinds]
        kind = int(np.argmin([float(c.flat[i])
                              for c, i in zip(kinds, kis)]))
        flat_i = kis[kind]
        best_cost = float(kinds[kind].flat[flat_i])
        if np.isfinite(best_cost):
            best = _build(flat_i, kind)
        else:
            best_cost = np.inf
    elif topk > 1:
        return []
    return _choose_finish(best, best_cost, matrix, matrices, vol_shape,
                          out_shape, interpolation, mode, known, sticky,
                          quantize, topk)


def _choose_finish(best, best_cost, matrix, matrices, vol_shape, out_shape,
                   interpolation, mode, known, sticky, quantize, topk):
    """Shared chooser tail (fast and numpy paths): scalar-reference cover
    re-validation with one slot of headroom, known-variant sticky fit, and
    the unquantized retry when the ladders round past a hard limit."""
    if best is not None and not walk_variant_covers(
            best, matrices, vol_shape, interpolation, mode,
            out_shape=out_shape):
        # f32 associativity differences between the vectorized estimates and
        # the scalar reference can flip a bound at an exact boundary; give
        # the envelope one slot of headroom and re-validate
        import dataclasses
        new_w1 = (min(best.w1 + 8, best.d[1]) if best.cs else best.w1)
        # hy MUST stay a multiple of 8 (the kernel reads the band as
        # ycand 8-row dynamic slices; a ragged hy would read past the
        # window rows when ybase hits its w1-hy limit) — round the w1
        # clamp down; never below the original 8-aligned hy
        best = dataclasses.replace(
            best, hz=min(best.hz + _HZ_STEP, best.d[0], best.w0),
            hy=min(best.hy + 8, _MAX_HY, new_w1 // 8 * 8),
            y_lo=best.y_lo - 4,
            w1=new_w1, sh=new_w1 if best.cs else best.sh)
        if not walk_variant_covers(best, matrices, vol_shape, interpolation,
                                   mode, out_shape=out_shape):
            best = None
    if known:
        fitv, fitc = fit_walk_variant(matrix, vol_shape, interpolation,
                                      mode, known, out_shape=out_shape)
        if fitv is not None and (best is None or fitc <= sticky * best_cost):
            return fitv
    if best is None and quantize and topk <= 1:
        # the parameter ladders can round a bound over a hard limit at
        # tiny volumes (e.g. hy past _MAX_HY or the volume extent) where
        # the EXACT config still fits; take the tight per-matrix config
        # rather than refusing -- the binary just isn't shared
        return choose_walk_variant(matrix, vol_shape, interpolation, mode,
                                   known=(), sticky=1.0,
                                   out_shape=out_shape, quantize=False)
    return best


def walk_variant_covers(v: WalkVariant, matrix, vol_shape,
                        interpolation: str, mode: str = "constant",
                        out_shape=None) -> bool:
    """True when a compiled variant's envelope covers ``matrix`` (lets
    sweeps reuse kernels instead of recompiling per angle).

    Checks the per-vreg geometry (walk length, band, drift slop) AND the
    macro-window extents: a variant sized for one matrix could otherwise be
    reused for a matrix whose macro footprint overflows its windows, and the
    origin clipping would silently slide the window off the footprint."""
    order = 1 if interpolation == "linear" else 3
    if order != v.order or mode != v.mode:
        return False
    if out_shape is None:
        out_shape = vol_shape
    if (vol_shape[v.ps[0]], vol_shape[v.ps[1]],
            vol_shape[v.ps[2]] + 2 * v.xpad) != v.d:
        return False
    if tuple(out_shape[v.po[k]] for k in range(3)) != v.out_d:
        return False
    matrices = np.asarray(matrix, dtype=np.float64)
    if matrices.ndim == 2:
        matrices = matrices[None]
    tapspan = 1 if order == 1 else 3
    E = (8.0 * v.gu - 1.0, v.vb * v.gv - 1.0, v.wb - 1.0)
    d0, d1 = v.d[0], v.d[1]
    for m in matrices:
        a = _adjusted_matrix(m, v.ps, v.po)
        g = _geometry(a, order, v.vb, v.wb, v.kax)
        if g is None:
            return False
        hz, hy_raw, y_lo, (sl, sh), kappa = g
        # a walk spanning the full volume depth covers every in-volume z
        # tap (zorg clips to 0), so a geometric span beyond d0 needs only
        # hz = d0 -- same capping the chooser builds with
        if (min(hz, d0) > v.hz or y_lo < v.y_lo
                or y_lo + hy_raw - 1 > v.y_lo + v.hy - 1
                or sl > v.slop_lo or sh > v.slop_hi):
            return False
        aa = np.abs(a)
        need_w0 = (int(math.ceil(sum(aa[0, i] * E[i] for i in range(3))))
                   + tapspan + 3 + (v.hz - hz))
        if min(need_w0, d0) > v.w0:
            return False
        res = [abs(a[1, i] - kappa * a[0, i]) for i in range(3)]
        # strip windows follow the band per cs-plane chunk, so only the
        # kappa sweep WITHIN a chunk widens them (vs the whole window)
        ksweep = (v.cs + 1.0) if v.cs else (v.w0 + 1.0)
        need_w1 = (int(math.ceil(sum(res[i] * E[i] for i in range(3))
                                 + abs(kappa) * ksweep)) + 3 + v.hy)
        if min(need_w1, d1) > v.w1:
            return False
        if v.dyn_x:
            span_x = (sum(aa[2, i] * E[i] for i in range(3))
                      + tapspan + v.slop_lo + v.slop_hi + 4)
            if span_x > 128 - 32 - 2:
                return False
    return True


def _variant_cost(v: WalkVariant) -> float:
    """The chooser's measurement-calibrated cost (ns), recomputed from a
    variant's own parameters (used to compare an already-compiled config
    against the fresh per-matrix optimum).  Calibration:
    exp_r3_walkprofile at 250^3 linear — per-vreg-plane compute
    ~= 2.16 * ycand * ndx^1.5 ns, DMA overlapped behind compute."""
    ndx = len(v.dxs)
    tapf = 1.0 if v.order == 1 else 1.11
    per_plane = (2.16 * v.ycand * ndx ** 1.5 * tapf * v.nbw
                 + 5.5 * v.ycand)
    per_vreg = v.hz * per_plane + 30.0
    U, V, W = v.out_d
    nvregs = (-(-U // (8 * v.gu)) * v.gu * -(-V // (v.vb * v.gv)) * v.gv
              * -(-W // v.wb))
    if v.whole:
        return (per_vreg * nvregs
                + (v.w0 * v.w1 * v.xw * 4.0) / 750.0 + 300.0 * v.nbw)
    ncopies = v.nbw * (v.nch if v.cs else 1)
    dma = ((v.w0 * v.w1 * v.xw * 4.0) / (v.gu * v.gv) / 750.0
           + 300.0 * ncopies / (v.gu * v.gv))
    return (max(per_vreg, dma) + 0.25 * min(per_vreg, dma)) * nvregs


def fit_walk_variant(matrix, vol_shape, interpolation: str, mode: str,
                     known, out_shape=None):
    """Cheapest already-compiled canonical config that covers ``matrix``
    under SOME axis permutation, as (variant, cost) or (None, None).

    The Mosaic binary depends only on a variant's canonical form, so fitting
    a known canonical under fresh permutations costs no compile at all."""
    import dataclasses
    order = 1 if interpolation == "linear" else 3
    ntaps = 2 if order == 1 else 4
    tapspan = ntaps - 1
    if out_shape is None:
        out_shape = vol_shape
    # sorted by modeled cost, the FIRST covering known is the answer —
    # sweeps steady-state with ~10 canonicals pay band bounds only for the
    # knowns cheaper than the winner (measured 7 -> ~1-2 ms at 250^3)
    ranked = sorted(((K, _variant_cost(K)) for K in known
                     if K.order == order and K.mode == mode),
                    key=lambda kc: kc[1])
    if not ranked:
        return None, None
    matrices = np.asarray(matrix, dtype=np.float64)
    if matrices.ndim == 2:
        matrices = matrices[None]

    A = _adjusted_all(matrices)
    geo = _vec_geometry(A, order)
    aaE = np.abs(A).max(axis=1)
    slop_lo = geo["slop_lo"].max(1)
    slop_hi = geo["slop_hi"].max(1)
    kok = geo["kok"].all(1) & geo["drift_ok"].all(1)[:, None]  # (36, 4)
    kapM = np.abs(geo["kappa"]).max(1)
    resM = np.abs(geo["res"]).max(1)
    dims = np.array([[vol_shape[ps[k]] for k in range(3)]
                     for ps in _PERMS for _ in _PERMS])
    odims = np.array([[out_shape[po[k]] for k in range(3)]
                      for _ in _PERMS for po in _PERMS])
    band_cache = {}

    for K, cost in ranked:
        key = (K.vb, K.wb)
        if key not in band_cache:
            band_cache[key] = _band_bounds(geo, A, K.vb, K.wb, order)
        hz_r, ylo_r, yhi_r = band_cache[key]
        hz_m = hz_r.max(1)                               # (36,)
        y_lo_m = ylo_r.min(1)                            # (36, 4)
        y_hi_m = yhi_r.max(1)
        E = np.array([8.0 * K.gu - 1.0, K.vb * K.gv - 1.0, K.wb - 1.0],
                     np.float32)
        # same +3 margin as the chooser's w0 and walk_variant_covers —
        # a stricter prefilter here only drops valid reuse candidates
        # (covers is the final gate for every hit), costing a spurious
        # ~13 s Mosaic recompile per dropped fit
        need_w0 = (np.ceil(aaE[:, 0, :3] @ E).astype(np.int64)
                   + tapspan + 3 + (K.hz - hz_m))
        ksweep = (K.cs + 1.0) if K.cs else (K.w0 + 1.0)
        need_w1 = (np.ceil(resM @ E + kapM * ksweep).astype(np.int64)
                   + 3 + K.hy)                           # (36, 4)
        dims_ok = ((dims[:, 0] == K.d[0]) & (dims[:, 1] == K.d[1])
                   & (dims[:, 2] + 2 * K.xpad == K.d[2])
                   & (dims[:, 2] > K.xpad))
        ok = (dims_ok & (odims == K.out_d).all(1)
              & (np.minimum(hz_m, dims[:, 0]) <= K.hz)
              & (slop_lo <= K.slop_lo)
              & (slop_hi <= K.slop_hi)
              & (np.minimum(need_w0, dims[:, 0]) <= K.w0))[:, None]
        ok = ok & kok & (y_hi_m - y_lo_m + 1 <= K.hy) \
            & (np.minimum(need_w1, dims[:, 1:2]) <= K.w1)
        if K.dyn_x:
            span_x = (aaE[:, 2, :3] @ E + tapspan + K.slop_lo
                      + K.slop_hi + 4)
            ok = ok & (span_x <= 128 - 32 - 2)[:, None]
        hits = np.argwhere(ok)
        for pq, ki in hits:
            cand = dataclasses.replace(
                K, ps=_PERMS[pq // 6], po=_PERMS[pq % 6], kax=_KAXES[ki],
                y_lo=int(y_lo_m[pq, ki]))
            # final gate through the scalar reference (f32 associativity
            # can flip a vectorized bound at an exact boundary)
            if walk_variant_covers(cand, matrices, vol_shape, interpolation,
                                   mode, out_shape=out_shape):
                return cand, cost
    return None, None




def _make_walk_kernel(v: WalkVariant, cval: float, interpret: bool = False,
                      batch: int = 0, unroll_override=None, dx_split: int = 0):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # the band is read as ycand dynamic 8-row slices whose last row is
    # ybase + ceil(hy/8)*8 - 1: with ybase at its w1-hy (sh-hy) limit, a
    # ragged hy would read ceil(hy/8)*8 - hy rows PAST the window — fail
    # loudly at build instead of returning silently wrong samples
    assert v.hy % 8 == 0, f"band height must be 8-aligned, got hy={v.hy}"

    from ..ops.interpolation import _mirror_index as _mirror
    from ..ops.interpolation import cubic_bspline_weights as _bspline_w

    d0, d1, d2 = v.d
    w0, w1 = v.w0, v.w1
    hz, hy = v.hz, v.hy
    vb, wb = v.vb, v.wb
    gu, gv = v.gu, v.gv
    nbw = v.nbw
    xg, xw = v.xg, v.xw
    dyn_x = v.dyn_x
    ncopies = v.ncopies
    nbk = v.nbk
    taps = v.taps
    dxs = v.dxs
    order = v.order
    ntaps = len(taps)
    constant = v.mode == "constant"
    use_mirror = constant and order == 3 and v.xpad == 0
    xpad = v.xpad
    ycand = v.ycand
    wsh = wb.bit_length() - 1   # wb is a power of two
    whole = v.whole
    depth = 1 if whole else _PIPELINE_DEPTH
    cs, sh, nch = v.cs, v.sh, v.nch
    strips = cs > 0

    if interpret:
        # XLA:CPU may rematerialize a scalar floor() into several fusions
        # with different FMA contraction; at knife-edge coordinates the
        # copies then disagree by 1, desynchronizing a slice offset from the
        # indices computed against it (observed: one row tap double-counted).
        # Pinning the value forces a single evaluation.  Mosaic keeps scalars
        # as single SSA values, so the compiled TPU path needs no barrier.
        def _pin(x):
            return jax.lax.optimization_barrier(x)
    else:
        def _pin(x):
            return x

    def kernel(mat_ref, vol_hbm, out_ref, win_ref, sem):
        if batch:
            bi = pl.program_id(0)
            ui, vi, wi = (pl.program_id(1), pl.program_id(2),
                          pl.program_id(3))
            nu, nv, nw = (pl.num_programs(1), pl.num_programs(2),
                          pl.num_programs(3))
            nb = pl.num_programs(0)
        else:
            bi = None
            ui, vi, wi = (pl.program_id(0), pl.program_id(1),
                          pl.program_id(2))
            nu, nv, nw = (pl.num_programs(0), pl.num_programs(1),
                          pl.num_programs(2))
            nb = 1
        a = _MatView(mat_ref, bi)  # (4,4) permuted matrix + payload row

        # walk/window z start: lowest tap is floor(zf) + taps[0], minus one
        # slot for a downward f32 scalar-vs-vector floor flip (an upward
        # flip at the top carries ~ulp tap weight and needs no slot)
        zoff = taps[0] - 1

        def zorg_of(am, ub, vbase, wbase):
            zc = (am[0, 0] * ub + am[0, 1] * vbase + am[0, 2] * wbase
                  + am[0, 3])
            zlo = (zc + jnp.minimum(am[0, 0] * 7.0, 0.0)
                   + jnp.minimum(am[0, 1] * (vb - 1.0), 0.0)
                   + jnp.minimum(am[0, 2] * (wb - 1.0), 0.0))
            zorg = jnp.floor(zlo).astype(jnp.int32) + zoff
            return _pin(jnp.clip(zorg, 0, d0 - hz)), zc

        def yb_of(am, ub, vbase, wbase, zk):
            """y-band start the walk will use at plane zk (unclipped).

            The band's slope (kappa) and offset (y_lo) are runtime payload
            (row 3): the binary depends only on the band HEIGHT, so sweeps
            share one compiled kernel across band placements."""
            zc = (am[0, 0] * ub + am[0, 1] * vbase + am[0, 2] * wbase
                  + am[0, 3])
            yc = (am[1, 0] * ub + am[1, 1] * vbase + am[1, 2] * wbase
                  + am[1, 3])
            y_line = yc + am[3, 0] * (zk.astype(jnp.float32) - zc)
            return (jnp.floor(y_line).astype(jnp.int32)
                    + am[3, 1].astype(jnp.int32))

        def origins(am, ubt, vbt, wbt):
            """Window origin: extremes of (zorg, yb) over the macro's walks;
            affine in each macro coordinate and in the walk plane, so the
            corners bound them.  The x origin is the macro's min x corner,
            xg-granular."""
            o0 = None
            o1 = None
            for cu in (0.0, float(8 * (gu - 1))):
                for cv in (0.0, float(vb * (gv - 1))):
                    zorg_c, _ = zorg_of(am, ubt + cu, vbt + cv, wbt)
                    o0 = zorg_c if o0 is None else jnp.minimum(o0, zorg_c)
                    for endk in (0, hz - 1):
                        yb = yb_of(am, ubt + cu, vbt + cv, wbt,
                                   zorg_c + endk)
                        o1 = yb if o1 is None else jnp.minimum(o1, yb)
            o0 = _pin(jnp.clip(o0, 0, d0 - w0))
            if strips:
                o1 = jnp.int32(0)   # strips follow the band per chunk
            else:
                o1 = _pin(jnp.clip(o1, 0, d1 - w1))
            if not dyn_x:
                return o0, o1, jnp.int32(0)
            xlo = (am[2, 0] * ubt + am[2, 1] * vbt + am[2, 2] * wbt
                   + am[2, 3]
                   + jnp.minimum(am[2, 0] * (8.0 * gu - 1.0), 0.0)
                   + jnp.minimum(am[2, 1] * (vb * gv - 1.0), 0.0)
                   + jnp.minimum(am[2, 2] * (wb - 1.0), 0.0))
            margin = v.dxs[0] - 2   # lowest gathered slot, floor + f32 skew
            xlo_i = jnp.floor(xlo).astype(jnp.int32) + jnp.int32(margin)
            tx = jnp.clip(xlo_i, 0, d2 - 1) // xg
            tmax = (d2 - 1) // xg
            return o0, o1, _pin(jnp.clip(tx, 0, tmax))

        def strip_origins(am, ubt0, vbt0, wbt0, oo0):
            """Per-chunk strip y origin: min of the band start over the
            macro tile's corners at the chunk's end planes (the band line
            is affine in the macro coords and in the plane index, so the
            corners bound it), clipped into the volume."""
            outs = []
            for ch in range(nch):
                lo = None
                for cu in (0.0, float(8 * (gu - 1))):
                    for cv in (0.0, float(vb * (gv - 1))):
                        for pe in (0, cs - 1):
                            p = oo0 + ch * cs + pe
                            yb = yb_of(am, ubt0 + cu, vbt0 + cv, wbt0, p)
                            lo = yb if lo is None else jnp.minimum(lo, yb)
                outs.append(_pin(jnp.clip(lo, 0, d1 - sh)))
            return outs

        def window_copies(slot, am, bases):
            """The slot's async-copy descriptors for the tile at ``bases``
            (started by the prefetching step, waited by the consuming step;
            both sides reconstruct identical descriptors from the same SMEM
            scalars)."""
            oo0, oo1, tt = origins(am, *bases)
            if dyn_x:
                ci, b0 = tt % ncopies, tt // ncopies
            else:
                ci, b0 = jnp.int32(0), jnp.int32(0)
            cps = []
            if strips:
                for ch, s1 in enumerate(strip_origins(am, *bases, oo0)):
                    for j in range(nbw):
                        src = vol_hbm.at[ci, pl.ds(oo0 + ch * cs, cs),
                                         pl.ds(s1, sh), b0 + j]
                        dst = win_ref.at[slot, j, pl.ds(ch * cs, cs)]
                        cps.append(pltpu.make_async_copy(
                            src, dst, sem.at[slot, j, ch]))
            else:
                for j in range(nbw):
                    src = vol_hbm.at[ci, pl.ds(oo0, w0), pl.ds(oo1, w1),
                                     b0 + j]
                    cps.append(pltpu.make_async_copy(
                        src, win_ref.at[slot, j], sem.at[slot, j]))
            return cps

        def start_window_dma(slot, am, bases):
            for cp in window_copies(slot, am, bases):
                cp.start()

        step = (ui * nv + vi) * nw + wi
        if batch:
            step = bi * (nu * nv * nw) + step
        total = nb * nu * nv * nw
        slot = jax.lax.rem(step, depth)

        def step_state(t):
            """(matrix view, macro bases) of flattened step t."""
            if batch:
                bt = t // (nu * nv * nw)
                t = t - bt * (nu * nv * nw)
                am = _MatView(mat_ref, bt)
            else:
                am = a
            uu = t // (nv * nw)
            rest = t - uu * (nv * nw)
            vv = rest // nw
            ww = rest - vv * nw
            return am, ((uu * (8 * gu)).astype(jnp.float32),
                        (vv * (vb * gv)).astype(jnp.float32),
                        (ww * wb).astype(jnp.float32))

        ubt = (ui * (8 * gu)).astype(jnp.float32)
        vbt = (vi * (vb * gv)).astype(jnp.float32)
        wbt = (wi * wb).astype(jnp.float32)
        if whole:
            # whole-resident window: the full prepared volume is copied into
            # the single VMEM slot ONCE (grid steps run sequentially on TPU,
            # so the step-0 wait covers every later read)
            o0 = 0
            o1 = 0
            tx = 0
            slot = 0
            # Pre-read the runtime payload scalars in the OUTER kernel
            # trace: _MatView memoizes SMEM reads, and without origins()
            # the first read of row 3 otherwise happens inside the
            # interpret-mode fori body, leaking inner tracers into the
            # kernel jaxpr as captured constants.
            _ = (a[3, 0], a[3, 1])

            @pl.when(step == 0)
            def _():
                for j in range(nbw):
                    src = vol_hbm.at[0, pl.ds(0, w0), pl.ds(0, w1), j]
                    cp = pltpu.make_async_copy(src, win_ref.at[0, j],
                                               sem.at[0, j])
                    cp.start()
                for j in range(nbw):
                    src = vol_hbm.at[0, pl.ds(0, w0), pl.ds(0, w1), j]
                    pltpu.make_async_copy(src, win_ref.at[0, j],
                                          sem.at[0, j]).wait()
        else:
            o0, o1, tx = origins(a, ubt, vbt, wbt)
            if strips:
                s1s = strip_origins(a, ubt, vbt, wbt, o0)

            @pl.when(step == 0)
            def _():
                start_window_dma(0, a, (ubt, vbt, wbt))
                # slots 1..depth-2 prefetch here; slot depth-1 comes from
                # the generic start below (starting it here too would
                # double-start)
                for j in range(1, depth - 1):
                    t = jnp.int32(j)

                    @pl.when(t < total)
                    def _(t=t, j=j):
                        am, bb = step_state(t)
                        start_window_dma(j, am, bb)

            @pl.when(step + depth - 1 < total)
            def _():
                t = step + depth - 1
                am, bb = step_state(t)
                start_window_dma(jax.lax.rem(t, depth), am, bb)

            for cp in window_copies(slot, a, (ubt, vbt, wbt)):
                cp.wait()

        s_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        l_iota = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        sf = s_iota.astype(jnp.float32)
        vlf = (l_iota >> wsh).astype(jnp.float32)
        wlf = (l_iota & (wb - 1)).astype(jnp.float32)

        # one output vreg of the macro-tile
        def do_vreg(igu, igv):
            ub = ubt + 8.0 * igu
            vbase = vbt + float(vb) * igv
            up = ub + sf
            vp = vbase + vlf
            wp = wbt + wlf

            def coord(r):
                return (a[r, 0] * up + a[r, 1] * vp + a[r, 2] * wp
                        + a[r, 3])

            # pinned: every consumer (floor -> taps, fractional weights,
            # inside mask) must see ONE evaluation of each coordinate chain
            zf = _pin(coord(0))
            yf = _pin(coord(1))
            xf = _pin(coord(2))
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

            # x base per lane (sublane 0), lane-gather decomposition +
            # folded exact x weights (pallas_affine stage-2 scheme)
            xb_row = (a[2, 0] * ub + a[2, 1] * vp + a[2, 2] * wp + a[2, 3])
            xb = _pin(jnp.floor(xb_row).astype(jnp.int32))
            dxneed = x0 - xb

            def x_tap(t):
                idx = x0 + t
                if constant:
                    if use_mirror:
                        return _mirror(idx, d2), None
                    return jnp.clip(idx, 0, d2 - 1), None
                valid = (idx >= 0) & (idx < d2)
                return jnp.clip(idx, 0, d2 - 1), valid

            xtaps = [x_tap(t) for t in taps]
            xparts = {}
            for dx in dxs:
                idx = jnp.clip(xb + dx, 0, d2 - 1)
                if nbw == 1:
                    # single gather block at a (possibly dynamic) x origin;
                    # stray (masked-out) elements clip into range
                    rel = jnp.clip(idx - tx * xg, 0, 127)
                    xparts[dx] = (None, rel)
                else:
                    xparts[dx] = (idx >> 7, idx & 127)
            # hoisted per-block lane masks for the multi-block blend
            bmask = {}
            if nbw > 1:
                for dx in dxs:
                    blk = xparts[dx][0]
                    bmask[dx] = [blk == b for b in range(1, nbw)]
            wfold = {}
            for dx in dxs:
                acc = jnp.zeros((8, 128), jnp.float32)
                for ix, (xt, xvalid) in enumerate(xtaps):
                    if use_mirror:
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
            wzs = []
            for iz, (zt, zvalid) in enumerate(ztaps):
                w = wz[iz]
                if zvalid is not None:
                    w = jnp.where(zvalid, w, 0.0)
                wzs.append(w)

            zorg, _ = zorg_of(a, ub, vbase, wbt)

            def plane_step(k, acc):
                zk = zorg + k
                yb_k = yb_of(a, ub, vbase, wbt, zk)
                if strips:
                    # the plane's strip: select its chunk's y origin (the
                    # same values the DMA used -- recomputed from the same
                    # SMEM scalars) and band-clip within the strip
                    rel = zk - o0
                    cidx = rel // cs
                    s1k = s1s[nch - 1]
                    for chv in range(nch - 1):
                        s1k = jnp.where(cidx == chv, s1s[chv], s1k)
                    yb_k = _pin(jnp.clip(yb_k, s1k, s1k + sh - hy))
                    ybase = yb_k - s1k
                else:
                    yb_k = _pin(jnp.clip(yb_k, o1, o1 + w1 - hy))
                    ybase = yb_k - o1

                # per-plane z weight: sum of tap weights landing on zk
                wplane = None
                for iz, (zt, _) in enumerate(ztaps):
                    term = jnp.where(zt == zk, wzs[iz], 0.0)
                    wplane = term if wplane is None else wplane + term

                # Per candidate sub-vreg of the band: lane-gather each dx
                # slot and fold it into the per-y-tap accumulators
                # IMMEDIATELY.  Holding all ycand*ndx gathered vregs live
                # before the y stage (the previous structure) measured
                # ~quadratic in ndx -- scheduling/spill pressure -- while
                # this gather-and-consume ordering keeps one gathered vreg
                # plus ntaps accumulators live.
                #
                # The lane-gather-BEFORE-sublane-take order is forced, not a
                # choice: composing the two per-element resolves the other
                # way (sublane-take first, then lane-gather) evaluates
                # take_sub(rows, M)[s, W[l]] = rows[M[s, W[l]], W[l]] where
                # the needed value is rows[M[s, l], W[l]] -- the y index
                # gets permuted by the x gather unless M is lane-constant,
                # which it is not (yf varies across lanes).  Hence
                # ycand*ndx lane gathers + ndx*ntaps sublane takes per plane
                # is the structural floor of this resolve; every measured
                # restructure (unroll tiers, dx splits, MXU one-hot
                # contraction, y-first ordering) lands on the same op count
                # or worse (exp_r4_ndx4.py, BENCHMARKS.md round-4 notes).
                hits = [None] * len(ytaps)
                dx_groups = ([dxs] if not dx_split else
                             [dxs[i:i + dx_split]
                              for i in range(0, len(dxs), dx_split)])
                for c in range(ycand):
                    mcs, moks = [], []
                    for iy, (yt, _) in enumerate(ytaps):
                        m = (yt - yb_k) - c * 8
                        mcs.append(jnp.clip(m, 0, 7))
                        moks.append((m >= 0) & (m < 8) if ycand > 1
                                    else None)
                    parts = [None] * len(ytaps)
                    for grp in dx_groups:
                        # band rows re-read per dx group (with one group --
                        # the production setting -- this is the plain read)
                        rows = [win_ref[slot, b, zk - o0,
                                        pl.ds(ybase + c * 8, 8), :]
                                for b in range(nbw)]
                        for dx in grp:
                            _, within = xparts[dx]
                            g = jnp.take_along_axis(rows[0], within,
                                                    axis=1)
                            for b in range(1, nbw):
                                gat = jnp.take_along_axis(rows[b],
                                                          within,
                                                          axis=1)
                                g = jnp.where(bmask[dx][b - 1], gat, g)
                            wf = wfold[dx]
                            for iy in range(len(ytaps)):
                                p = wf * jnp.take_along_axis(g, mcs[iy],
                                                             axis=0)
                                parts[iy] = p if parts[iy] is None \
                                    else parts[iy] + p
                    for iy in range(len(ytaps)):
                        part = parts[iy]
                        if moks[iy] is not None:
                            part = jnp.where(moks[iy], part, 0.0)
                        hits[iy] = part if hits[iy] is None \
                            else hits[iy] + part
                val = None
                for iy in range(len(ytaps)):
                    term = wys[iy] * hits[iy]
                    val = term if val is None else val + term
                return acc + wplane * val

            # fully-unrolled walk: overlaps each plane's scalar address chain
            # (yb -> clip -> slice) with the others' vector work.  The
            # interpreter keeps the fori_loop instead (the unrolled trace
            # takes minutes to compile on CPU, with nothing to overlap).
            unroll = 1 if interpret else min(unroll_override or hz, hz)
            def plane_pair(k2, acc):
                for uu in range(unroll):
                    acc = plane_step(k2 * unroll + uu, acc)
                return acc

            out = jax.lax.fori_loop(0, hz // unroll, plane_pair,
                                    jnp.zeros((8, 128), jnp.float32))
            for kk in range(hz - hz % unroll, hz):
                out = plane_step(kk, out)

            if constant:
                inside = ((zf >= 0) & (zf <= d0 - 1) & (yf >= 0)
                          & (yf <= d1 - 1) & (xf >= xpad)
                          & (xf <= d2 - 1 - xpad))
            else:
                inside = ((zf > -0.5) & (zf < d0 - 0.5) & (yf > -0.5)
                          & (yf < d1 - 0.5) & (xf > -0.5) & (xf < d2 - 0.5))
            res_vreg = jnp.where(inside, out, jnp.float32(cval))
            if batch:
                out_ref[0, igv, 0, pl.ds(igu * 8, 8), :] = res_vreg
            else:
                out_ref[igv, 0, pl.ds(igu * 8, 8), :] = res_vreg

        for igu in range(gu):
            for igv in range(gv):
                do_vreg(igu, igv)

    return kernel


def walk_layout_key(v: WalkVariant):
    """Hashable description of the HBM source layout a variant samples from;
    variants with equal keys can share one prepared volume (lets resident
    sweeps cache the transpose/pad/stack across angle steps)."""
    return (v.ps, v.d, v.xg, v.nbk, v.xpad)


@functools.lru_cache(maxsize=64)
def _preparer(layout_key):
    """Jitted source-layout builder for a layout key, cached so sweeps and
    one-shot calls re-trace the transpose/pad/stack once per layout."""
    import jax
    import jax.numpy as jnp

    ps, d, xg, nbk, xpad = layout_key
    ncopies = 128 // xg

    def prepare(volume):
        vol_p = jnp.transpose(jnp.asarray(volume, jnp.float32), ps)
        if xpad:
            # mirror extension (reflect, edge not repeated: matches
            # _mirror_index) so cubic taps never leave the array
            vol_p = jnp.concatenate(
                [vol_p[..., 1:xpad + 1][..., ::-1], vol_p,
                 vol_p[..., -xpad - 1:-1][..., ::-1]], axis=-1)
        x_pad = nbk * 128 + (ncopies - 1) * xg
        if x_pad > d[2]:
            vol_p = jnp.pad(vol_p, ((0, 0), (0, 0), (0, x_pad - d[2])))
        vol_s = jnp.stack([vol_p[..., c * xg: c * xg + nbk * 128]
                           for c in range(ncopies)])
        return vol_s.reshape(ncopies, d[0], d[1], nbk, 128)

    return jax.jit(prepare)


def prepare_walk_volume(volume, v: WalkVariant):
    """Transpose/pad/stack the source volume into the kernel's HBM layout.

    x-shifted copies realize a 32-granular dynamic window origin while
    keeping every HBM block 128-tiled (one copy when the origin is static).
    """
    return _preparer(walk_layout_key(v))(volume)


def canonical_walk_variant(v: WalkVariant) -> WalkVariant:
    """The variant with every non-structural field erased.  The compiled
    kernel never reads ``ps``/``po`` (they only permute host-side data
    movement) nor ``kax``/``y_lo`` (runtime SMEM payload), so variants with
    equal canonical forms share one Mosaic binary -- e.g. all orientations
    of a random-rotation sweep over a cubic volume."""
    import dataclasses
    return dataclasses.replace(v, ps=(0, 1, 2), po=(0, 1, 2), kax=-1,
                               y_lo=0)


# canonical forms whose Mosaic binaries exist (newest last); the chooser's
# sticky policy prefers these over fresh compiles
_KNOWN_CANONICALS: list = []
# RLock: oneshot_walk_sampler builds _oneshot_runner under the lock, and
# that construction reaches _walk_runner's own _CANON_LOCK section
_CANON_LOCK = threading.RLock()


def known_canonicals():
    with _CANON_LOCK:
        return tuple(_KNOWN_CANONICALS)


def _walk_runner(vc: WalkVariant, cval: float, interpret: bool,
                 batch: int = 0):
    """Jitted pallas launch for a canonical variant: (vol_s, cols) -> the
    blocked output layout.  Cached so every variant sharing a canonical form
    reuses one compiled executable.  ``batch`` > 0 adds a leading grid
    dimension over a (batch, 4, 4) payload stack -- N matrices resolved in
    ONE launch with per-matrix SMEM payloads (the batched sweep the
    reference looped in Python, ``tests/benchmark.py:59-65``).

    The experiment hooks are folded into the cache key here so flipping
    them between calls can never serve a program compiled under the old
    values."""
    return _walk_runner_hooked(vc, cval, interpret, batch,
                               _UNROLL_OVERRIDE, _DX_SPLIT)


@functools.lru_cache(maxsize=128)
def _walk_runner_hooked(vc: WalkVariant, cval: float, interpret: bool,
                        batch: int, _unroll, _dx_split):
    with _CANON_LOCK:
        if vc not in _KNOWN_CANONICALS:
            _KNOWN_CANONICALS.append(vc)
            del _KNOWN_CANONICALS[:-64]
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    v = vc
    U, V, W = v.out_d
    U_pad = -(8 * v.gu) * (-U // (8 * v.gu))
    V_pad = -(v.vb * v.gv) * (-V // (v.vb * v.gv))
    W_pad = -v.wb * (-W // v.wb)
    grid = (U_pad // (8 * v.gu), V_pad // (v.vb * v.gv), W_pad // v.wb)
    out_shape = (V_pad // v.vb, W_pad // v.wb, U_pad, 128)
    # blocked layout (V/vb, W/wb, U, 128): Mosaic requires the block's
    # trailing two dims to be (8k, 128)-aligned, so U and the lane pack go
    # last
    block = (v.gv, 1, 8 * v.gu, 128)
    if batch:
        grid = (batch,) + grid
        out_shape = (batch,) + out_shape
        block = (1,) + block

        def index_map(b, u, vv, w):
            return (b, vv, w, u, 0)
    else:
        def index_map(u, vv, w):
            return (vv, w, u, 0)

    kernel = _make_walk_kernel(v, cval, interpret, batch,
                               unroll_override=_unroll, dx_split=_dx_split)
    depth = 1 if v.whole else _PIPELINE_DEPTH

    def run(vol_s, cols):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(block, index_map,
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            scratch_shapes=[pltpu.VMEM((depth, v.nbw, v.w0,
                                        v.sh if v.cs else v.w1, 128),
                                       jnp.float32),
                            pltpu.SemaphoreType.DMA(
                                (depth, v.nbw, v.nch) if v.cs
                                else (depth, v.nbw))],
            interpret=interpret,
        )(cols, vol_s)

    return jax.jit(run)


@functools.lru_cache(maxsize=128)
def _unblocker(out_d, vb, wb, gu, gv, po, batch: int = 0):
    """Jitted un-blocking: (V/vb, W/wb, U, 128) -> (U, V, W) -> inverse
    output permutation (leading batch dim when ``batch`` > 0).  Cheap XLA
    relayout, cached per shape/permutation."""
    import jax
    import jax.numpy as jnp

    U, V, W = out_d
    U_pad = -(8 * gu) * (-U // (8 * gu))
    V_pad = -(vb * gv) * (-V // (vb * gv))
    W_pad = -wb * (-W // wb)
    inv = tuple(np.argsort(po))

    def unblock(out_b):
        out = out_b.reshape(V_pad // vb, W_pad // wb, U_pad, vb, wb)
        out = jnp.transpose(out, (2, 0, 3, 1, 4)).reshape(U_pad, V_pad,
                                                          W_pad)
        return jnp.transpose(out[:U, :V, :W], inv)

    def unblock_batch(out_b):
        n = out_b.shape[0]
        out = out_b.reshape(n, V_pad // vb, W_pad // wb, U_pad, vb, wb)
        out = jnp.transpose(out, (0, 3, 1, 4, 2, 5)).reshape(
            n, U_pad, V_pad, W_pad)
        return jnp.transpose(out[:, :U, :V, :W],
                             (0,) + tuple(i + 1 for i in inv))

    return jax.jit(unblock_batch if batch else unblock)


def permute_matrix(matrix, v: WalkVariant):
    """(4,4) pull-back matrix -> the kernel's (4,4) SMEM payload: the
    permuted (3,4) matrix plus a row carrying the runtime band parameters
    ``[kappa, y_lo, 0, 0]`` (the binary only bakes the band height)."""
    import jax.numpy as jnp
    m = jnp.asarray(matrix, jnp.float32)
    rows = jnp.stack([m[v.ps[k]] for k in range(3)])
    cols = jnp.stack([rows[:, v.po[j]] for j in range(3)] + [rows[:, 3]],
                     axis=1)
    if v.xpad:
        # mirror-padded x layout: kernel x coordinates live in the padded
        # frame (the structural xpad adjusts its inside bounds to match)
        cols = cols.at[2, 3].add(jnp.float32(v.xpad))
    if v.kax < 0:
        kappa = jnp.float32(0.0)
    else:
        kappa = cols[1, v.kax] / cols[0, v.kax]
    payload = jnp.stack([kappa, jnp.float32(v.y_lo), jnp.float32(0.0),
                         jnp.float32(0.0)])
    return jnp.concatenate([cols, payload[None]], axis=0)


def walk_sample_prepared(vol_s, matrix, v: WalkVariant, cval: float = 0.0,
                         interpret: bool = False):
    """Run the plane-walk kernel on an already-prepared source layout.

    Composed of independently-cached jitted stages, so calling it eagerly
    (outside any enclosing jit) reuses one Mosaic binary across every
    variant with the same canonical form -- an angle sweep compiles the
    expensive kernel once and only re-traces the cheap data-movement ends.
    """
    cols = permute_matrix(matrix, v)
    out_b = _walk_runner(canonical_walk_variant(v), float(cval),
                         bool(interpret))(vol_s, cols)
    return _unblocker(v.out_d, v.vb, v.wb, v.gu, v.gv, v.po)(out_b)


def affine_sample_pallas_walk(volume, matrix, v: WalkVariant,
                              cval: float = 0.0, interpret: bool = False):
    """Prepare the source layout and run the plane-walk kernel."""
    return walk_sample_prepared(prepare_walk_volume(volume, v), matrix, v,
                                cval, interpret)


# Fused one-shot programs are keyed per (canonical, ps, po): a sticky-fit
# sweep rotates through permutations and would compile a fresh XLA
# executable (including its Mosaic kernel) per key, so the population is
# capped -- one-shot users (few matrices) get the fused program, sweep
# users overflow the cap and gracefully degrade to the eagerly-composed
# stages (which share Mosaic binaries across permutations).  The dict holds
# strong references to the admitted samplers (so _oneshot_runner's LRU
# churning -- e.g. direct benchmark use -- can never strand an admitted key
# without its runner).  Keys are admitted at insert; a call failure
# releases the slot AND permanently degrades that sampler closure to the
# eager stages -- callers cache the closure (transforms._jitted_affine), so
# a released slot must never leave a live fused program behind it or the
# population could exceed the cap.
_ONESHOT_CAP = 8
_ONESHOT_RUNNERS: dict = {}


@functools.lru_cache(maxsize=32)
def _oneshot_runner(vc: WalkVariant, ps, po, cval: float, prefilter: bool):
    """ONE jitted program for the whole one-shot chain: [B-spline
    prefilter] + prepare (transpose/pad/stack) + plane-walk kernel +
    un-blocking.  The locally-attached one-shot path (the reference's
    ``cp_transform``, ``transforms.py:164-226`` there) runs as a single
    device program instead of 3-4 dispatched stages."""
    import jax

    prep = _preparer((ps, vc.d, vc.xg, vc.nbk, vc.xpad))
    runner = _walk_runner(vc, cval, False)
    unblock = _unblocker(vc.out_d, vc.vb, vc.wb, vc.gu, vc.gv, po)

    def run(volume, cols):
        if prefilter:
            from ..ops.prefilter import bspline_prefilter
            volume = bspline_prefilter(volume)
        return unblock(runner(prep(volume), cols))

    return jax.jit(run)


@functools.lru_cache(maxsize=64)
def _permuter(ps, po, xpad: int, kax: int):
    """Jitted ``(matrix, y_lo) -> SMEM payload``: the traced form of
    :func:`permute_matrix` (y_lo rides as a traced scalar so one trace
    serves every matrix sharing the permutation)."""
    import jax
    import jax.numpy as jnp

    def build(matrix, y_lo):
        m = jnp.asarray(matrix, jnp.float32)
        rows = jnp.stack([m[ps[k]] for k in range(3)])
        cols = jnp.stack([rows[:, po[j]] for j in range(3)] + [rows[:, 3]],
                         axis=1)
        if xpad:
            cols = cols.at[2, 3].add(jnp.float32(xpad))
        if kax < 0:
            kappa = jnp.float32(0.0)
        else:
            kappa = cols[1, kax] / cols[0, kax]
        payload = jnp.stack([kappa, y_lo.astype(jnp.float32),
                             jnp.float32(0.0), jnp.float32(0.0)])
        return jnp.concatenate([cols, payload[None]], axis=0)

    return jax.jit(build)


def oneshot_walk_sampler(v: WalkVariant, cval: float, prefilter: bool):
    """A fused one-shot callable ``(volume, matrix) -> output`` (ONE device
    program + one payload build), or None when the fused-program population
    cap is reached (the caller composes the cached stages eagerly)."""
    import jax.numpy as jnp

    key = (canonical_walk_variant(v), v.ps, v.po, float(cval),
           bool(prefilter))
    with _CANON_LOCK:
        entry = _ONESHOT_RUNNERS.get(key)
        if entry is None:
            if len(_ONESHOT_RUNNERS) >= _ONESHOT_CAP:
                return None
            # the state dict is SHARED by every closure for this key: when
            # one closure's failure releases the slot, its fallback flag
            # degrades all of them, so no live closure keeps executing a
            # fused program whose cap slot is gone
            entry = (_oneshot_runner(*key), {})   # lazy jit: no compile yet
            _ONESHOT_RUNNERS[key] = entry
    run, state = entry
    permute = _permuter(v.ps, v.po, v.xpad, v.kax)
    y_lo = jnp.int32(v.y_lo)

    def sample(volume, matrix):
        fallback = state.get("fallback")
        if fallback is not None:
            return fallback(volume, matrix)
        try:
            return run(volume, permute(matrix, y_lo))
        except Exception:
            # a program that cannot compile/execute must not hold a cap
            # slot forever; release it so future keys can still be
            # admitted.  Callers cache this closure, so it must also stop
            # running the fused program (the slot is gone): retries go
            # through the eagerly-composed stages instead.
            with _CANON_LOCK:
                if _ONESHOT_RUNNERS.get(key) is entry:
                    del _ONESHOT_RUNNERS[key]
            state["fallback"] = _eager_walk_sampler(v, cval, prefilter)
            raise

    return sample


def _eager_walk_sampler(v: WalkVariant, cval: float, prefilter: bool):
    """Composed (non-fused) one-shot chain: independently-jitted prefilter /
    prepare / kernel / unblock stages sharing Mosaic binaries across
    permutations.  Used when the fused population cap is reached and as the
    permanent retry path after a fused program fails."""
    import jax

    from .planner import plan_prepare, plan_sampler

    pre = None
    if prefilter:
        from ..ops.prefilter import bspline_prefilter
        pre = jax.jit(bspline_prefilter)
    sample_stage = plan_sampler(v, cval)

    def run_walk(volume, matrix):
        if pre is not None:
            volume = pre(volume)
        return sample_stage(plan_prepare(volume, v), matrix)

    return run_walk


@functools.lru_cache(maxsize=128)
def _walk_donor(vc: WalkVariant, cval: float, po, interpret: bool):
    """Jitted runner+unblocker that DONATES a caller device buffer to back
    the final output (``jax.jit(..., donate_argnums)`` — the TPU-native
    analogue of the reference's caller-provided GPU output array,
    ``voltools/volume.py:72-75``).  The donated parameter is unused in the
    dataflow; jax aliases donated inputs to outputs by matching shape/dtype,
    so XLA writes the result into the donated buffer's HBM instead of
    allocating a fresh one.  Keyed per canonical form + output permutation:
    an orientation sweep shares one executable."""
    import jax

    runner = _walk_runner(vc, cval, interpret)
    unblock = _unblocker(vc.out_d, vc.vb, vc.wb, vc.gu, vc.gv, po)

    def run(vol_s, cols, out_buf):
        del out_buf   # donated: its memory backs the result via aliasing
        return unblock(runner(vol_s, cols))

    return jax.jit(run, donate_argnums=(2,), keep_unused=True)


def walk_sample_prepared_into(vol_s, matrix, v: WalkVariant, out_buf,
                              cval: float = 0.0, interpret: bool = False):
    """Like :func:`walk_sample_prepared`, but donates ``out_buf`` (a device
    array of the output's shape/dtype) so the result reuses its HBM.  The
    donated array is consumed — callers chain ``out = f(..., out)``."""
    cols = permute_matrix(matrix, v)
    donor = _walk_donor(canonical_walk_variant(v), float(cval), v.po,
                        bool(interpret))
    return donor(vol_s, cols, out_buf)
