"""Filtered (weighted) back-projection — the inverse of the tilt-series
forward model.

:class:`~voltools_tpu.models.TiltSeriesProjector` computes
``p_m(y, x) = sum_z vol(M (z, y, x))`` per tilt matrix ``M`` (a pull-back
map, reference ``examples/projections.py`` workflow).  The adjoint of
(rotate-by-M, sum-over-z) evaluates each projection at the (y, x) part of
``M^-1 w`` for every output voxel ``w`` — so reconstruction is: ramp-filter
each projection along the tilt-sweep axis, back-project along the matching
geometry, and average.  This closes the tomography loop (project →
reconstruct) inside one framework; the CUDA reference has no inverse at
all.

TPU-native shape: the ramp filter is an FFT along the projection's minor
axis; back-projection is a ``lax.scan`` over tilts of a vectorized 2-D
bilinear gather (static shapes, no host round trips) — the whole
reconstruction is ONE jitted program.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["ramp_filter", "sirt_reconstruct", "wbp_reconstruct"]


def ramp_filter(projections, axis: int = -1, window: str = "ramlak"):
    """Frequency-domain ramp filter |f| along ``axis``.

    ``window``: 'ramlak' (plain |f|) or 'hamming' (|f| tapered by a Hamming
    window — damps the high-frequency noise amplification).
    """
    import jax.numpy as jnp

    projections = jnp.asarray(projections, jnp.float32)
    n = projections.shape[axis]
    freqs = jnp.fft.fftfreq(n)
    ramp = jnp.abs(freqs)
    if window == "hamming":
        ramp = ramp * (0.54 + 0.46 * jnp.cos(2.0 * jnp.pi * freqs))
    elif window != "ramlak":
        raise ValueError(f"unknown window {window!r}")
    shape = [1] * projections.ndim
    shape[axis] = n
    f = jnp.fft.fft(projections, axis=axis)
    out = jnp.fft.ifft(f * ramp.reshape(shape), axis=axis)
    return jnp.real(out).astype(jnp.float32)


def _norm_axis(projection_axis) -> int:
    """Validate and normalize a (possibly negative, numpy-style) axis to
    {0, 1, 2}.  The keep-axes computations below compare against literal
    range(3) values, so an unnormalized -3/-2 would silently corrupt the
    adjoint geometry instead of erroring."""
    axis = int(projection_axis)
    if not -3 <= axis <= 2:
        raise ValueError(
            f"projection_axis must be in [-3, 2], got {projection_axis!r}")
    return axis % 3


def _result_out(result, output):
    """The library's output contract for device results: None -> host
    numpy; 'device' -> the device array; a numpy buffer -> validated fill
    (returns None).  Any other string is an error, not a silent None."""
    if isinstance(output, str):
        if output == "device":
            return result
        raise ValueError(
            f"output must be None, 'device', or a numpy array to fill, "
            f"got {output!r}")
    from ..transforms import _finish
    return _finish(np.asarray(result), output)


def _make_adjoint(minv, keep, out_shape, proj_shape,
                  _force_general: bool = False):
    """The back-projection operator ``(projs, minvs) -> volume`` shared by
    WBP and SIRT.

    General geometry: per tilt, a 2-D bilinear gather of the projection at
    (rows, cols) = the ``keep`` components of ``M^-1 w``.  Single-axis
    tilt series (cols ≡ the identity coordinate on one volume axis, rows
    independent of it — true for every ``tilt_matrices`` stack) take a
    fast path: the gather degenerates to TWO whole-row ``take``s, which
    lower to large contiguous slices instead of per-element gathers —
    measured ~an order of magnitude faster on TPU, where the per-element
    gather path dominated SIRT's iteration time.
    """
    import jax
    import jax.numpy as jnp

    ax_c = keep[1]
    ident = np.zeros(4, np.float32)
    ident[ax_c] = 1.0
    rowgather = (not _force_general
                 and np.abs(minv[:, ax_c, :] - ident).max() < 1e-6
                 and np.abs(minv[:, keep[0], ax_c]).max() < 1e-6
                 and out_shape[ax_c] == proj_shape[1])
    dep = [a for a in range(3) if a != ax_c]
    perm = tuple(int(i) for i in np.argsort(dep + [ax_c]))

    def adjoint(projs, minvs):
        if rowgather:
            sh2 = (out_shape[dep[0]], out_shape[dep[1]])
            i0 = jax.lax.broadcasted_iota(jnp.float32, sh2, 0)
            i1 = jax.lax.broadcasted_iota(jnp.float32, sh2, 1)
            h = proj_shape[0]

            def body(acc, tilt):
                proj, mi = tilt
                rows = (mi[keep[0], dep[0]] * i0
                        + mi[keep[0], dep[1]] * i1 + mi[keep[0], 3])
                r0f = jnp.floor(rows)
                fr = rows - r0f
                r0 = r0f.astype(jnp.int32)

                def rtap(rt, wgt):
                    valid = (rt >= 0) & (rt < h)
                    g = jnp.take(proj, jnp.clip(rt, 0, h - 1), axis=0)
                    return jnp.where(valid[..., None], g, 0.0) \
                        * wgt[..., None]

                gb = rtap(r0, 1.0 - fr) + rtap(r0 + 1, fr)
                return acc + jnp.transpose(gb, perm), None
        else:
            zi = jax.lax.broadcasted_iota(jnp.float32, out_shape, 0)
            yi = jax.lax.broadcasted_iota(jnp.float32, out_shape, 1)
            xi = jax.lax.broadcasted_iota(jnp.float32, out_shape, 2)

            def body(acc, tilt):
                proj, mi = tilt
                rows = (mi[keep[0], 0] * zi + mi[keep[0], 1] * yi
                        + mi[keep[0], 2] * xi + mi[keep[0], 3])
                cols = (mi[keep[1], 0] * zi + mi[keep[1], 1] * yi
                        + mi[keep[1], 2] * xi + mi[keep[1], 3])
                return acc + _bilinear2d(proj, rows, cols), None

        acc, _ = jax.lax.scan(body, jnp.zeros(out_shape, jnp.float32),
                              (projs, minvs))
        return acc

    return adjoint


def _trilinear3d_pertap(vol, zz, yy, xx):
    """Trilinear sample of a 3-D block at float coordinate arrays with
    PER-TAP zero extension (each of the 8 taps contributes 0 outside the
    block).  Unlike the scipy-'constant' whole-sample mask, per-tap zeroing
    is linear in ``vol`` under zero extension — summing samples of disjoint
    z-slabs equals sampling the full volume, which is what makes the
    volume-sharded SIRT forward decomposition exact (the caller applies the
    scipy whole-sample mask from GLOBAL coordinates separately)."""
    import jax.numpy as jnp

    l, h, w = vol.shape
    z0f = jnp.floor(zz)
    y0f = jnp.floor(yy)
    x0f = jnp.floor(xx)
    fz = zz - z0f
    fy = yy - y0f
    fx = xx - x0f
    z0 = z0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)

    def tap(zt, yt, xt, wgt):
        valid = ((zt >= 0) & (zt < l) & (yt >= 0) & (yt < h)
                 & (xt >= 0) & (xt < w))
        v = vol[jnp.clip(zt, 0, l - 1), jnp.clip(yt, 0, h - 1),
                jnp.clip(xt, 0, w - 1)]
        return jnp.where(valid, v, 0.0) * wgt

    return (tap(z0, y0, x0, (1 - fz) * (1 - fy) * (1 - fx))
            + tap(z0, y0, x0 + 1, (1 - fz) * (1 - fy) * fx)
            + tap(z0, y0 + 1, x0, (1 - fz) * fy * (1 - fx))
            + tap(z0, y0 + 1, x0 + 1, (1 - fz) * fy * fx)
            + tap(z0 + 1, y0, x0, fz * (1 - fy) * (1 - fx))
            + tap(z0 + 1, y0, x0 + 1, fz * (1 - fy) * fx)
            + tap(z0 + 1, y0 + 1, x0, fz * fy * (1 - fx))
            + tap(z0 + 1, y0 + 1, x0 + 1, fz * fy * fx))


def _bilinear2d(img, yy, xx):
    """Bilinear sample of a 2-D image at float coordinate arrays (any
    shape); out-of-range samples contribute 0 (constant boundary)."""
    import jax.numpy as jnp

    h, w = img.shape
    y0f = jnp.floor(yy)
    x0f = jnp.floor(xx)
    fy = yy - y0f
    fx = xx - x0f
    y0 = y0f.astype(jnp.int32)
    x0 = x0f.astype(jnp.int32)

    def tap(yt, xt, wgt):
        valid = (yt >= 0) & (yt < h) & (xt >= 0) & (xt < w)
        v = img[jnp.clip(yt, 0, h - 1), jnp.clip(xt, 0, w - 1)]
        return jnp.where(valid, v, 0.0) * wgt

    return (tap(y0, x0, (1 - fy) * (1 - fx))
            + tap(y0, x0 + 1, (1 - fy) * fx)
            + tap(y0 + 1, x0, fy * (1 - fx))
            + tap(y0 + 1, x0 + 1, fy * fx))


def wbp_reconstruct(projections, matrices, out_shape,
                    projection_axis: int = 0,
                    filter_window: Optional[str] = "ramlak",
                    filter_axis="auto", mesh=None, mesh_shard: str = "tilts",
                    device: str = "tpu", output: Optional[str] = None):
    """Weighted back-projection from a tilt series.

    Parameters
    ----------
    projections : (N, H', W') stack — the output of
        :meth:`TiltSeriesProjector.project` (or experimental data in the
        same geometry).
    matrices : (N, 4, 4) pull-back matrices — the SAME matrices the
        forward projection used (e.g. ``projector.tilt_matrices(angles)``).
    out_shape : (D, H, W) of the reconstructed volume.
    projection_axis : the axis the forward model integrated over
        (default 0, matching :class:`TiltSeriesProjector`).
    filter_window : 'ramlak', 'hamming', or None (plain unfiltered
        back-projection).
    filter_axis : which projection axis (-2 rows / -1 cols) the ramp acts
        on — the in-plane direction the beam sweeps, i.e. perpendicular to
        the tilt axis.  'auto' (default) detects it for single-axis tilt
        series: the projection axis whose coordinate map stays identity
        across every matrix IS the tilt axis; the other one is filtered.
    mesh : optional 1-D ``jax.sharding.Mesh``.  With
        ``mesh_shard='tilts'`` (default) the tilt batch is sharded: each
        device back-projects its share and the partial volumes are
        ``psum``-reduced over ICI (zero-padded when the batch does not
        divide evenly).  With ``mesh_shard='volume'`` the OUTPUT z-axis
        is sharded instead — each device reconstructs only its slab from
        the replicated projections, so the full volume never has to fit
        one device's HBM (the memory-scaling axis for large tomograms).
    output : None -> host numpy; 'device' -> device array.

    Returns the (D, H, W) reconstruction scaled by ``pi / N`` (parallel-
    beam WBP normalisation over a [0, pi) sweep).
    """
    import jax
    import jax.numpy as jnp

    from ..utils import resolve_device

    projections = np.asarray(projections, np.float32)
    matrices = np.asarray(matrices, np.float32)
    if projections.ndim != 3:
        raise ValueError("projections must be (N, H', W')")
    if matrices.shape != (projections.shape[0], 4, 4):
        raise ValueError("matrices must be (N, 4, 4) matching projections")
    out_shape = tuple(int(s) for s in out_shape)
    if len(out_shape) != 3:
        raise ValueError("out_shape must be 3-D")
    projection_axis = _norm_axis(projection_axis)
    n_tilt = projections.shape[0]

    # the projection's (row, col) are the non-integrated output axes, in
    # order; a sample of tilt m at voxel w reads (row, col) = those two
    # components of M^-1 w
    keep = [a for a in range(3) if a != projection_axis]
    minv = np.stack([np.linalg.inv(m) for m in matrices]).astype(np.float32)

    if filter_axis == "auto":
        # a projection axis whose coordinate map is the identity row in
        # EVERY M^-1 is the tilt axis (it never mixes with depth): filter
        # the other one.  Ambiguous geometries default to the minor axis.
        filter_axis = -1
        for pos, a in enumerate(keep):
            ident = np.zeros(4, np.float32)
            ident[a] = 1.0
            dev_rows = np.abs(minv[:, a, :3]
                              - ident[:3][None]).max()
            if dev_rows < 1e-5:          # this axis IS the tilt axis
                filter_axis = -1 if pos == 0 else -2
                break
    if filter_axis not in (-1, -2):
        raise ValueError("filter_axis must be -1, -2, or 'auto'")

    adjoint = _make_adjoint(minv, keep, out_shape, projections.shape[1:])

    def backproject(projs, minvs):
        if filter_window is not None:
            projs = ramp_filter(projs, axis=filter_axis,
                                window=filter_window)
        # Riemann sum of the FBP integral over [0, pi): d_theta = pi / N
        # (this ramp convention carries no extra 1/2; validated against a
        # forward-projected phantom, scale error < 5%)
        return adjoint(projs, minvs) * (jnp.pi / n_tilt)

    if mesh is None:
        dev = resolve_device(device)
        proj_dev = jax.device_put(jnp.asarray(projections), dev)
        minv_dev = jax.device_put(jnp.asarray(minv), dev)
        result = jax.jit(backproject)(proj_dev, minv_dev)
    elif mesh_shard == "volume":
        # output-sharded: each device reconstructs its z slab from the
        # replicated (small) projections -- the full volume never
        # materialises on one device.  The slab offset folds into the
        # M^-1 translation column (coordinates are affine in z).
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.sharded import _shard_map
        axis = mesh.axis_names[0]
        nd = mesh.devices.size
        D = out_shape[0]
        padz = (-D) % nd
        local = (D + padz) // nd
        slab = (local,) + out_shape[1:]
        adjoint_s = _make_adjoint(minv, keep, slab, projections.shape[1:])
        proj_dev = jax.device_put(jnp.asarray(projections),
                                  NamedSharding(mesh, P()))
        minv_dev = jax.device_put(jnp.asarray(minv),
                                  NamedSharding(mesh, P()))

        def body(projs, minvs):
            if filter_window is not None:
                projs = ramp_filter(projs, axis=filter_axis,
                                    window=filter_window)
            idx = jax.lax.axis_index(axis)
            off = (idx * local).astype(jnp.float32)
            mv = minvs.at[:, :, 3].add(minvs[:, :, 0] * off)
            return adjoint_s(projs, mv) * (jnp.pi / n_tilt)

        fn = jax.jit(_shard_map(body, mesh=mesh, in_specs=(P(), P()),
                                out_specs=P(axis)))
        result = fn(proj_dev, minv_dev)
        if padz:
            result = result[:D]
    elif mesh_shard != "tilts":
        raise ValueError("mesh_shard must be 'tilts' or 'volume'")
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.sharded import _shard_map
        axis = mesh.axis_names[0]
        nd = mesh.devices.size
        padn = (-n_tilt) % nd
        if padn:
            # zero projections contribute nothing to the psum; the pi/N
            # scale inside backproject already uses the TRUE tilt count
            projections = np.concatenate(
                [projections,
                 np.zeros((padn,) + projections.shape[1:], np.float32)])
            minv = np.concatenate(
                [minv, np.repeat(np.eye(4, dtype=np.float32)[None],
                                 padn, axis=0)])
        proj_dev = jax.device_put(jnp.asarray(projections),
                                  NamedSharding(mesh, P(axis)))
        minv_dev = jax.device_put(jnp.asarray(minv),
                                  NamedSharding(mesh, P(axis)))

        def body(projs, minvs):
            return jax.lax.psum(backproject(projs, minvs), axis)

        result = jax.jit(_shard_map(body, mesh=mesh,
                                    in_specs=(P(axis), P(axis)),
                                    out_specs=P()))(proj_dev, minv_dev)
    return _result_out(result, output)


def sirt_reconstruct(projections, matrices, out_shape,
                     iterations: int = 30, relax: float = 1.0,
                     projection_axis: int = 0, nonneg: bool = False,
                     initial=None, device: str = "tpu",
                     output: Optional[str] = None, mesh=None,
                     _force_plan=None, _interpret: bool = False):
    """Simultaneous Iterative Reconstruction Technique (SIRT).

    Iterates ``x += relax * C A^T R (p - A x)`` where ``A`` is the
    tilt-series forward projector (rotate by each matrix, integrate over
    ``projection_axis`` — the exact operator
    :class:`TiltSeriesProjector` applies) and ``A^T`` the adjoint
    back-projection; ``R``/``C`` are the standard row/column inverse-sum
    normalisations (computed by projecting/back-projecting ones).  On
    limited-angle (missing-wedge) data SIRT recovers substantially more
    than filtered back-projection.

    The whole iteration runs as ONE jitted ``fori_loop`` device program —
    no host round trips between iterations.

    ``mesh``: optional 1-D ``jax.sharding.Mesh`` — volume-sharded SIRT,
    the memory-scaling axis for tomograms whose working set (volume +
    normalizers + adjoint accumulators) outgrows one device's HBM.  The
    volume's z-axis is sharded; each device forward-projects ONLY its own
    z-slab (per-tap zero extension is linear in the volume, so the
    ``psum`` of per-slab partial projections is exactly the full forward —
    no halo exchange needed) and back-projects its slab with the slab
    offset folded into the matrices (as in WBP ``mesh_shard='volume'``).
    The whole iteration stays one jitted ``shard_map`` program; no array
    of the full volume's size ever materialises on a single device.
    """
    import jax
    import jax.numpy as jnp

    from ..ops.sampling import affine_sample
    from ..utils import resolve_device

    projections = np.asarray(projections, np.float32)
    matrices = np.asarray(matrices, np.float32)
    if projections.ndim != 3:
        raise ValueError("projections must be (N, H', W')")
    if matrices.shape != (projections.shape[0], 4, 4):
        raise ValueError("matrices must be (N, 4, 4) matching projections")
    out_shape = tuple(int(s) for s in out_shape)
    if len(out_shape) != 3:
        raise ValueError("out_shape must be 3-D")
    projection_axis = _norm_axis(projection_axis)
    n_tilt = projections.shape[0]
    keep = [a for a in range(3) if a != projection_axis]
    minv = np.stack([np.linalg.inv(m) for m in matrices]).astype(np.float32)

    if mesh is not None:
        return _sirt_mesh(projections, matrices, minv, out_shape,
                          iterations, relax, projection_axis, nonneg,
                          initial, mesh, output)

    dev = resolve_device(device)
    proj_dev = jax.device_put(jnp.asarray(projections), dev)
    ms_dev = jax.device_put(jnp.asarray(matrices), dev)
    minv_dev = jax.device_put(jnp.asarray(minv), dev)

    # TPU fast path for the forward operator: the same grid-batched Pallas
    # program TiltSeriesProjector uses, with the source-layout prepare
    # INSIDE the jit (the volume changes every iteration).  The forward
    # sweep dominates SIRT's cost; the adjoint's 2-D gathers are cheap.
    pallas_fwd = None
    from ..transforms import _pick_impl
    if _force_plan is not None or _pick_impl(dev) == "pallas":
        from ..kernels import planner
        from ..transforms import select_variant
        env = (_force_plan if _force_plan is not None
               else select_variant(matrices, out_shape, "linear",
                                   "constant", dev))
        if env is not None:
            fits = [planner.fit_payload(env, m, out_shape, "linear",
                                        "constant") for m in matrices]
            if all(f is not None for f in fits):
                run_b = planner.plan_batch_sampler(env, n_tilt, 0.0,
                                                   interpret=_interpret)
                payloads = jax.device_put(
                    jnp.stack([planner.plan_payload(m, f)
                               for m, f in zip(matrices, fits)]), dev)

                def pallas_fwd(vol):
                    prep = planner.plan_prepare(vol, env)
                    return jnp.sum(run_b(prep, payloads),
                                   axis=1 + projection_axis)

    def forward(vol, ms):
        if pallas_fwd is not None:
            return pallas_fwd(vol)

        def one(m):
            rot = affine_sample(vol, m, "linear", "constant", 0.0,
                                out_shape=out_shape)
            return jnp.sum(rot, axis=projection_axis)
        return jax.vmap(one)(ms)

    adjoint = _make_adjoint(minv, keep, out_shape, projections.shape[1:])

    @jax.jit
    def run(projs, ms, minvs, x0):
        eps = jnp.float32(1e-6)
        row_sum = forward(jnp.ones(out_shape, jnp.float32), ms)
        col_sum = adjoint(jnp.ones_like(projs), minvs)
        rinv = jnp.where(row_sum > eps, 1.0 / row_sum, 0.0)
        cinv = jnp.where(col_sum > eps, 1.0 / col_sum, 0.0)

        def step(_, x):
            resid = (projs - forward(x, ms)) * rinv
            x = x + jnp.float32(relax) * cinv * adjoint(resid, minvs)
            if nonneg:   # projected SIRT: density is non-negative
                x = jnp.maximum(x, 0.0)
            return x

        return jax.lax.fori_loop(0, iterations, step, x0)

    x0 = (jnp.zeros(out_shape, jnp.float32) if initial is None
          else jax.device_put(jnp.asarray(initial, jnp.float32), dev))
    result = run(proj_dev, ms_dev, minv_dev, x0)
    return _result_out(result, output)


def _sirt_mesh(projections, matrices, minv, out_shape, iterations, relax,
               projection_axis, nonneg, initial, mesh, output):
    """Volume-sharded SIRT: z-slab of the volume per device.

    Decomposition (exact, not approximate):

    * **Forward** ``A x``: a trilinear sample is linear in the volume under
      per-tap zero extension, so the sample of the full volume equals the
      sum of samples of disjoint z-slabs (each zero-extended).  Every
      device projects its own slab with the slab offset subtracted from
      the source z coordinate, applies the scipy whole-sample 'constant'
      mask from GLOBAL coordinates, and the partial projections are
      ``psum``-reduced over ICI.  A z-tap straddling a slab boundary is
      split across the two owners with its exact weights — no halo
      exchange, no ownership bookkeeping.
    * **Adjoint** ``A^T r``: output-sharded exactly like WBP's
      ``mesh_shard='volume'`` (``wbp_reconstruct``): each device
      back-projects the (replicated, small) residual into its slab with
      the slab offset folded into ``M^-1``'s translation column.
    * Normalizers, residuals, and the iterate all live sharded; the only
      replicated arrays are projection-sized.  The whole loop is ONE
      jitted ``shard_map``-ed ``fori_loop``.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.sharded import _shard_map

    keep = [a for a in range(3) if a != projection_axis]
    n_tilt = projections.shape[0]
    proj_shape = projections.shape[1:]
    axis = mesh.axis_names[0]
    nd = mesh.devices.size
    D = out_shape[0]
    padz = (-D) % nd
    local = (D + padz) // nd
    slab = (local,) + out_shape[1:]

    adjoint_s = _make_adjoint(minv, keep, slab, proj_shape)

    A, B = out_shape[keep[0]], out_shape[keep[1]]
    n_proj = out_shape[projection_axis]

    def fwd_partial(x_slab, ms, off):
        """This device's contribution to the forward projections: sum over
        the projection axis of per-tap samples of the zero-extended slab,
        masked by the global scipy-'constant' inside test."""
        ia = jax.lax.broadcasted_iota(jnp.float32, (A, B), 0)
        ib = jax.lax.broadcasted_iota(jnp.float32, (A, B), 1)

        def one_tilt(m):
            def plane(t, acc):
                w = [None, None, None]
                w[projection_axis] = t.astype(jnp.float32)
                w[keep[0]] = ia
                w[keep[1]] = ib
                s = [m[r, 0] * w[0] + m[r, 1] * w[1] + m[r, 2] * w[2]
                     + m[r, 3] for r in range(3)]
                inside = ((s[0] >= 0) & (s[0] <= out_shape[0] - 1)
                          & (s[1] >= 0) & (s[1] <= out_shape[1] - 1)
                          & (s[2] >= 0) & (s[2] <= out_shape[2] - 1))
                val = _trilinear3d_pertap(x_slab, s[0] - off, s[1], s[2])
                return acc + jnp.where(inside, val, 0.0)

            return jax.lax.fori_loop(0, n_proj, plane,
                                     jnp.zeros((A, B), jnp.float32))

        return jax.lax.psum(jax.vmap(one_tilt)(ms), axis)

    def body(projs, ms, minvs, x0):
        idx = jax.lax.axis_index(axis)
        off = (idx * local).astype(jnp.float32)
        mv = minvs.at[:, :, 3].add(minvs[:, :, 0] * off)
        eps = jnp.float32(1e-6)
        row_sum = fwd_partial(jnp.ones(slab, jnp.float32), ms, off)
        col_sum = adjoint_s(jnp.ones((n_tilt,) + proj_shape, jnp.float32),
                            mv)
        rinv = jnp.where(row_sum > eps, 1.0 / row_sum, 0.0)
        cinv = jnp.where(col_sum > eps, 1.0 / col_sum, 0.0)

        def step(_, x):
            resid = (projs - fwd_partial(x, ms, off)) * rinv
            x = x + jnp.float32(relax) * cinv * adjoint_s(resid, mv)
            if nonneg:
                x = jnp.maximum(x, 0.0)
            return x

        return jax.lax.fori_loop(0, iterations, step, x0)

    repl = NamedSharding(mesh, P())
    proj_dev = jax.device_put(jnp.asarray(projections), repl)
    ms_dev = jax.device_put(jnp.asarray(matrices), repl)
    minv_dev = jax.device_put(jnp.asarray(minv), repl)
    if initial is None:
        x0_np = np.zeros((D + padz,) + out_shape[1:], np.float32)
    else:
        x0_np = np.zeros((D + padz,) + out_shape[1:], np.float32)
        x0_np[:D] = np.asarray(initial, np.float32)
    x0 = jax.device_put(jnp.asarray(x0_np), NamedSharding(mesh, P(axis)))

    fn = jax.jit(_shard_map(body, mesh=mesh, in_specs=(P(), P(), P(),
                                                       P(axis)),
                            out_specs=P(axis)))
    result = fn(proj_dev, ms_dev, minv_dev, x0)
    if padz:
        result = result[:D]
    return _result_out(result, output)
