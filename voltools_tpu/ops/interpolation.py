"""Interpolation kernels (XLA reference implementations).

Samples a 3-D volume at arbitrary fractional coordinates. These are the
portable, pure-`jax.numpy` implementations used for correctness, autodiff,
CPU execution and as the oracle for the Pallas fast path.

Supported interpolation modes mirror the reference library
(``voltools/transforms.py:11-17``):

* ``linear``  - trilinear (scipy ``order=1``)
* ``bspline`` / ``bspline_simple`` - cubic B-spline weighting of the raw
  samples (scipy ``order=3, prefilter=False``).  The reference keeps two GPU
  variants because texture hardware allows an 8-fetch trick
  (``kernels/helper_interpolation.h:8-68``); on TPU both names run the same
  exact 64-tap separable contraction, so they are numerically identical.
* ``filt_bspline`` / ``filt_bspline_simple`` - as above, on a prefiltered
  volume (scipy ``order=3, prefilter=True``); prefiltering itself lives in
  :mod:`voltools_tpu.ops.prefilter`.

Boundary handling (``mode``):

* ``'constant'`` (default) — scipy-compatible: any sample point outside
  ``[0, n-1]`` on any axis returns ``cval``; in-range cubic taps that poke
  past the edge are mirror-reflected, matching ``scipy.ndimage``.
* ``'border'`` — CUDA-texture-style (the reference GPU backend): out-of-range
  taps contribute zero, and points are discarded only half a voxel past the
  edge (reference ``transforms.py:276-278``).
"""

from __future__ import annotations

import jax.numpy as jnp

AVAILABLE_INTERPOLATIONS = [
    "linear",
    "bspline",
    "bspline_simple",
    "filt_bspline",
    "filt_bspline_simple",
]

MODES = ("constant", "border")


def spline_order(interpolation: str) -> int:
    if interpolation == "linear":
        return 1
    if interpolation in AVAILABLE_INTERPOLATIONS:
        return 3
    raise ValueError(
        f"Interpolation must be one of {AVAILABLE_INTERPOLATIONS}, got {interpolation!r}")


def needs_prefilter(interpolation: str) -> bool:
    return interpolation.startswith("filt_bspline")


def cubic_bspline_weights(f):
    """The four cubic B-spline tap weights for fractional offset ``f``.

    Taps sit at ``floor(s)-1 .. floor(s)+2``.  Same basis as the reference
    (``kernels/bspline.h:102-112``).
    """
    g = 1.0 - f
    f2 = f * f
    g2 = g * g
    w0 = (1.0 / 6.0) * g2 * g
    w1 = 2.0 / 3.0 - 0.5 * f2 * (2.0 - f)
    w2 = 2.0 / 3.0 - 0.5 * g2 * (2.0 - g)
    w3 = (1.0 / 6.0) * f2 * f
    return w0, w1, w2, w3


def _mirror_index(idx, n: int):
    """scipy 'mirror' reflection (no edge repeat): ... 2 1 | 0 1 2 | 1 0 ..."""
    if n == 1:
        return jnp.zeros_like(idx)
    period = 2 * (n - 1)
    idx = jnp.remainder(idx, period)
    return jnp.where(idx >= n, period - idx, idx)


def _flat_gather(flat_vol, z, y, x, shape):
    d0, d1, d2 = shape
    lin = (z * d1 + y) * d2 + x
    return jnp.take(flat_vol, lin.reshape(-1), mode="clip").reshape(lin.shape)


def sample_linear(volume, coords, mode: str = "constant", cval: float = 0.0):
    """Trilinear sampling. ``coords``: (3, ...) fractional source coordinates."""
    d0, d1, d2 = volume.shape
    sz, sy, sx = coords[0], coords[1], coords[2]
    z0f = jnp.floor(sz)
    y0f = jnp.floor(sy)
    x0f = jnp.floor(sx)
    fz, fy, fx = sz - z0f, sy - y0f, sx - x0f
    z0 = z0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)

    flat = volume.reshape(-1)

    def tap(dz, dy, dx):
        z, y, x = z0 + dz, y0 + dy, x0 + dx
        if mode == "constant":
            # valid-point masking happens once at the end; taps may clip
            # because an in-range point's +1 tap is only reached with weight 0.
            zc = jnp.clip(z, 0, d0 - 1)
            yc = jnp.clip(y, 0, d1 - 1)
            xc = jnp.clip(x, 0, d2 - 1)
            return _flat_gather(flat, zc, yc, xc, volume.shape)
        # 'border': each out-of-range tap contributes zero
        ok = ((z >= 0) & (z < d0) & (y >= 0) & (y < d1) & (x >= 0) & (x < d2))
        zc = jnp.clip(z, 0, d0 - 1)
        yc = jnp.clip(y, 0, d1 - 1)
        xc = jnp.clip(x, 0, d2 - 1)
        return jnp.where(ok, _flat_gather(flat, zc, yc, xc, volume.shape), 0.0)

    out = jnp.zeros_like(sz)
    for dz in (0, 1):
        wz = fz if dz else 1.0 - fz
        for dy in (0, 1):
            wy = fy if dy else 1.0 - fy
            for dx in (0, 1):
                wx = fx if dx else 1.0 - fx
                out = out + wz * wy * wx * tap(dz, dy, dx)

    if mode == "constant":
        inside = ((sz >= 0) & (sz <= d0 - 1) & (sy >= 0) & (sy <= d1 - 1)
                  & (sx >= 0) & (sx <= d2 - 1))
        return jnp.where(inside, out, cval)
    # 'border' keeps blended edge values; discard at half-voxel past the edge
    inside = ((sz > -0.5) & (sz < d0 - 0.5) & (sy > -0.5) & (sy < d1 - 0.5)
              & (sx > -0.5) & (sx < d2 - 0.5))
    return jnp.where(inside, out, cval)


def sample_cubic(volume, coords, mode: str = "constant", cval: float = 0.0):
    """Cubic B-spline sampling (64 taps, separable weights).

    Apply to a prefiltered volume for true order-3 interpolation
    (= scipy ``order=3, prefilter=True``) or to the raw volume for the
    smoothing variants (= scipy ``order=3, prefilter=False``).
    """
    d0, d1, d2 = volume.shape
    sz, sy, sx = coords[0], coords[1], coords[2]
    z0f = jnp.floor(sz)
    y0f = jnp.floor(sy)
    x0f = jnp.floor(sx)
    fz, fy, fx = sz - z0f, sy - y0f, sx - x0f
    z0 = z0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)

    wz = cubic_bspline_weights(fz)
    wy = cubic_bspline_weights(fy)
    wx = cubic_bspline_weights(fx)

    flat = volume.reshape(-1)

    def tap_indices(base, d, n):
        idx = base + (d - 1)
        if mode == "constant":
            return _mirror_index(idx, n), None
        ok = (idx >= 0) & (idx < n)
        return jnp.clip(idx, 0, n - 1), ok

    out = jnp.zeros_like(sz)
    for dz in range(4):
        z, okz = tap_indices(z0, dz, d0)
        for dy in range(4):
            y, oky = tap_indices(y0, dy, d1)
            w_zy = wz[dz] * wy[dy]
            for dx in range(4):
                x, okx = tap_indices(x0, dx, d2)
                v = _flat_gather(flat, z, y, x, volume.shape)
                if mode == "border":
                    v = jnp.where(okz & oky & okx, v, 0.0)
                out = out + w_zy * wx[dx] * v

    if mode == "constant":
        inside = ((sz >= 0) & (sz <= d0 - 1) & (sy >= 0) & (sy <= d1 - 1)
                  & (sx >= 0) & (sx <= d2 - 1))
        return jnp.where(inside, out, cval)
    inside = ((sz > -0.5) & (sz < d0 - 0.5) & (sy > -0.5) & (sy < d1 - 0.5)
              & (sx > -0.5) & (sx < d2 - 0.5))
    return jnp.where(inside, out, cval)


def sample(volume, coords, interpolation: str = "linear",
           mode: str = "constant", cval: float = 0.0, prefiltered: bool = False):
    """Dispatch by interpolation name. ``prefiltered=True`` means the caller
    already converted the volume to B-spline coefficients (StaticVolume does
    this once at construction, mirroring reference ``volume.py:48-50``)."""
    if mode not in MODES:
        raise ValueError(f"mode must be one of {MODES}")
    order = spline_order(interpolation)
    if order == 1:
        return sample_linear(volume, coords, mode, cval)
    if needs_prefilter(interpolation) and not prefiltered:
        from .prefilter import bspline_prefilter
        volume = bspline_prefilter(volume, boundary="mirror")
    return sample_cubic(volume, coords, mode, cval)
