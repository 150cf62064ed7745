"""Multi-chip execution: sharded volumes and data-parallel transform batches.

The reference's entire multi-device story is *device selection* — bind one
GPU per call (``voltools/utils/general.py:84-88``); it has no collectives.
This module is the TPU-native capability extension described in SURVEY.md §2:

* :class:`ShardedVolume` — a volume sharded along its slowest axis over a
  1-D ``jax.sharding.Mesh``.  Affine transforms run under ``shard_map``:
  each chip computes its output slab.  For *local* transforms (translations,
  small rotations: every output voxel's source stays within a bounded halo
  of its own slab) only a halo exchange over ICI is needed.  For global
  ones (arbitrary rotations mix all slabs) the default is a GATHER-FREE
  ring stream: interpolation taps are linear in the source under per-tap
  zero extension (every tap index lands in exactly one z-slab), so each
  chip's output slab is the sum over source slabs of partial per-tap
  samples — the reduce-scatter form of the psum decomposition the
  volume-sharded SIRT forward proved exact
  (``models/reconstruction.py:507-531``).  Source slabs ride a ``ppermute``
  ring; no array of the full volume's size ever exists on any chip, so
  volumes larger than one chip's HBM stay transformable.
  ``global_strategy='gather'`` opts back into the all-gather body (faster
  when the whole volume comfortably fits per-chip, since the Pallas kernel
  can then serve the slab).  All paths produce results identical to the
  single-chip kernel.
* :func:`sharded_affine_batch` — N matrices applied data-parallel across the
  mesh (each chip transforms the full volume for its share of the matrices),
  the natural scaling axis for tilt-series / orientation-sweep workloads.

Everything works on a CPU-emulated mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=N``), which is how the
tests exercise it without TPU hardware.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "shard"):
    """A 1-D device mesh over the first ``n_devices`` available devices."""
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    return Mesh(np.array(devices[:n_devices]), (axis_name,))




def _shard_map(body, mesh, in_specs, out_specs):
    """shard_map with the varying-mesh-axes check disabled: pallas_call
    outputs carry no vma annotation, which the checker (new jax.shard_map)
    would reject.  Falls back to the experimental API on older jax."""
    import jax
    if hasattr(jax, "shard_map"):
        return jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    from jax.experimental.shard_map import shard_map
    try:
        # the replication checker is on by default on older jax and rejects
        # pallas_call outputs — exactly what this wrapper exists to bypass
        return shard_map(body, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)
    except TypeError:   # very old signatures lack check_rep
        return shard_map(body, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs)


def halo_for_matrix(shape, matrix, interpolation: str = "linear") -> Optional[int]:
    """Voxels of axis-0 halo needed so each output slab can be computed from
    its own source slab.  None when the transform is non-local (needs the
    full volume, e.g. large rotations)."""
    m = np.asarray(matrix, dtype=np.float64)
    d0, d1, d2 = shape
    # max |src_z - out_z| over the output domain: linear function maximised
    # at the corners of the index box
    corners = np.array([[z, y, x, 1.0] for z in (0, d0 - 1)
                        for y in (0, d1 - 1) for x in (0, d2 - 1)]).T
    src_z = (m[0] @ corners)
    disp = np.abs(src_z - corners[0]).max()
    apron = 1 if interpolation == "linear" else 2
    halo = int(np.ceil(disp)) + apron
    if halo >= d0:
        return None
    return halo


def _exchange_halo(vol_shard, halo: int, axis: str, n: int, edge: str):
    """Ring-exchange ``halo`` planes with both mesh neighbours over ICI and
    patch the two GLOBAL edges with the boundary extension a single-chip
    kernel would see: ``edge='zero'`` (mode='border' -- out-of-range taps
    contribute nothing) or ``edge='mirror'`` (scipy-'constant' samplers and
    the prefilter's ``_fir_matrix``).  Returns the slab extended by ``halo``
    planes on each side.  Shared by the local-transform samplers and the
    sharded prefilter so the boundary semantics live in exactly one place."""
    import jax
    import jax.numpy as jnp
    idx = jax.lax.axis_index(axis)
    up = jax.lax.ppermute(vol_shard[-halo:], axis,      # from lower neighbour
                          [(i, (i + 1) % n) for i in range(n)])
    down = jax.lax.ppermute(vol_shard[:halo], axis,     # from upper neighbour
                            [(i, (i - 1) % n) for i in range(n)])
    if edge == "zero":
        bottom_ext = jnp.zeros_like(up)
        top_ext = jnp.zeros_like(down)
    else:
        bottom_ext = jnp.flip(vol_shard[1:halo + 1], 0)
        top_ext = jnp.flip(vol_shard[-halo - 1:-1], 0)
    up = jnp.where(idx == 0, bottom_ext, up)
    down = jnp.where(idx == n - 1, top_ext, down)
    return jnp.concatenate([up, vol_shard, down], axis=0)


def _partial_sample_pertap(slab, coords, z0, true_shape,
                           interpolation: str, mode: str):
    """This z-slab's contribution to a whole-volume interpolation sample.

    ``slab`` holds source rows ``[z0, z0 + slab.shape[0])`` of a volume
    whose TRUE extent is ``true_shape``; ``coords`` are GLOBAL fractional
    source coordinates.  Tap indices are resolved exactly as the
    single-chip samplers do (``ops/interpolation.py:89-187``: clip for
    linear-'constant', mirror for cubic-'constant', zero outside for
    'border'), then each tap contributes only when its z index lands in
    this slab — per-tap zero extension, under which the sample is linear
    in the source over disjoint slabs, so summing the partials over all
    slabs reproduces the full-volume sample exactly (same argument as the
    volume-sharded SIRT forward, ``models/reconstruction.py:122-157``).
    The whole-sample inside/cval mask is the caller's job (it needs only
    global coordinates, no volume data)."""
    import jax.numpy as jnp

    from ..ops.interpolation import _mirror_index, cubic_bspline_weights

    d0, d1, d2 = true_shape
    loc = slab.shape[0]
    flat = slab.reshape(-1)
    sz, sy, sx = coords[0], coords[1], coords[2]
    z0f, y0f, x0f = jnp.floor(sz), jnp.floor(sy), jnp.floor(sx)
    zb = z0f.astype(jnp.int32)
    yb = y0f.astype(jnp.int32)
    xb = x0f.astype(jnp.int32)
    fz, fy, fx = sz - z0f, sy - y0f, sx - x0f

    constant = mode == "constant"
    from ..ops.interpolation import spline_order
    order = spline_order(interpolation)

    def tap(zg, yg, xg, ok, w):
        """Accumulate one tap: global (already edge-resolved) indices, an
        optional 'border' validity mask, and the separable weight."""
        zl = zg - z0
        own = (zl >= 0) & (zl < loc)
        if ok is not None:
            own = own & ok
        lin = (jnp.clip(zl, 0, loc - 1) * d1 + jnp.clip(yg, 0, d1 - 1)) \
            * d2 + jnp.clip(xg, 0, d2 - 1)
        v = jnp.take(flat, lin.reshape(-1), mode="clip").reshape(lin.shape)
        return jnp.where(own, v, 0.0) * w

    out = jnp.zeros_like(sz)
    if order == 1:
        for dz in (0, 1):
            wz = fz if dz else 1.0 - fz
            for dy in (0, 1):
                wy = fy if dy else 1.0 - fy
                for dx in (0, 1):
                    wx = fx if dx else 1.0 - fx
                    z, y, x = zb + dz, yb + dy, xb + dx
                    if constant:
                        # single-chip semantics: taps clip (an in-range
                        # point's +1 tap only clips with weight 0)
                        out = out + tap(jnp.clip(z, 0, d0 - 1), y, x,
                                        None, wz * wy * wx)
                    else:
                        ok = ((z >= 0) & (z < d0) & (y >= 0) & (y < d1)
                              & (x >= 0) & (x < d2))
                        out = out + tap(jnp.clip(z, 0, d0 - 1), y, x,
                                        ok, wz * wy * wx)
        return out

    wzs = cubic_bspline_weights(fz)
    wys = cubic_bspline_weights(fy)
    wxs = cubic_bspline_weights(fx)

    def cidx(base, t, n):
        idx = base + (t - 1)
        if constant:   # scipy: taps mirror-reflect at the global edges
            return _mirror_index(idx, n), None
        return jnp.clip(idx, 0, n - 1), (idx >= 0) & (idx < n)

    for dz in range(4):
        z, okz = cidx(zb, dz, d0)
        for dy in range(4):
            y, oky = cidx(yb, dy, d1)
            w_zy = wzs[dz] * wys[dy]
            for dx in range(4):
                x, okx = cidx(xb, dx, d2)
                ok = None if constant else (okz & oky & okx)
                out = out + tap(z, y, x, ok, w_zy * wxs[dx])
    return out


class ShardedVolume:
    """A volume sharded along axis 0 across a device mesh.

    Parameters mirror :class:`voltools_tpu.StaticVolume`; the volume is
    prefiltered once (shard-wise where possible) for ``filt_bspline*``.
    ``global_strategy`` picks the body for non-local transforms:
    ``'stream'`` (default) is the gather-free ppermute ring — per-slab
    partial taps summed as the source slabs stream past, O(slab) memory on
    every chip; ``'gather'`` all-gathers the source over ICI first — less
    per-chip compute (and Pallas-served on TPU), but it materialises the
    full volume per chip, which defeats sharding's memory purpose for
    volumes that don't fit.
    """

    def __init__(self, data: np.ndarray, interpolation: str = "linear",
                 mesh=None, mode: str = "constant", cval: float = 0.0,
                 global_strategy: str = "stream"):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        if data.ndim != 3:
            raise ValueError("Expected a 3D array")
        from ..ops.interpolation import AVAILABLE_INTERPOLATIONS, MODES
        if interpolation not in AVAILABLE_INTERPOLATIONS:
            raise ValueError(
                f"Interpolation must be one of {AVAILABLE_INTERPOLATIONS}")
        if mode not in MODES:
            raise ValueError(f"mode must be one of {MODES}, got {mode!r}")
        if global_strategy not in ("stream", "gather"):
            raise ValueError("global_strategy must be 'stream' or 'gather', "
                             f"got {global_strategy!r}")
        self.global_strategy = global_strategy
        self.mesh = mesh if mesh is not None else make_mesh()
        self.axis_name = self.mesh.axis_names[0]
        n = self.mesh.devices.size
        self.interpolation = interpolation
        self.mode = mode
        self.cval = float(cval)
        self.shape = tuple(data.shape)

        # non-divisible axis 0: pad to the next multiple of the mesh with
        # mode-correct boundary planes (mirror for scipy-'constant', zeros
        # for 'border'), so every in-TRUE-volume tap reads exactly what the
        # single-chip oracle would; out-of-volume output voxels are re-
        # masked in the global frame and the pad rows cropped on output.
        # Cubic taps reach 2 planes past the edge, so keep pad >= 2 (one
        # extra mesh round when the remainder is 1).
        pad = (-data.shape[0]) % n
        if pad and pad < 2:
            pad += n
        if pad and mode != "border" and pad > data.shape[0] - 1:
            # mirror extension reads plane d0-2-k: only d0-1 planes exist
            # to reflect, so thinner volumes cannot be mode-correctly
            # padded (the clamped slice would silently produce a
            # wrong-length array and an opaque device_put error)
            raise ValueError(
                f"volume depth {data.shape[0]} is too small to mirror-pad "
                f"to a multiple of the {n}-device mesh (pad {pad} planes "
                f"needed, at most {data.shape[0] - 1} available); use a "
                f"smaller mesh, a deeper volume, or mode='border'")
        self._pad = pad
        self._d0p = data.shape[0] + pad

        from ..ops.interpolation import needs_prefilter
        from ..ops.prefilter import _FIR_HALF_WIDTH
        sharding = NamedSharding(self.mesh, P(self.axis_name))
        local = self._d0p // n

        def _pad_planes(vol):
            if not pad:
                return vol
            if mode == "border":
                ext = jnp.zeros((pad,) + vol.shape[1:], vol.dtype)
            else:   # scipy mirror: plane d0+k reads plane d0-2-k
                ext = jnp.flip(vol[-pad - 1:-1], 0)
            return jnp.concatenate([vol, ext], axis=0)

        if not needs_prefilter(interpolation):
            vol = jnp.asarray(data, jnp.float32)
            self.data = jax.device_put(jax.jit(_pad_planes)(vol), sharding)
        elif pad == 0 and local > _FIR_HALF_WIDTH:
            # shard FIRST, prefilter shard-wise: axes 1/2 are local; the
            # axis-0 pass exchanges an 18-plane halo over ICI.  The full
            # volume never materialises on one device (construction no
            # longer needs the whole volume in a single HBM).
            raw = jax.device_put(jnp.asarray(data, jnp.float32), sharding)
            self.data = self._sharded_prefilter(raw)
        else:
            # slabs thinner than the filter support (or padded): global
            # prefilter on the TRUE extent before padding + sharding
            # (mirror-padding coefficients == coefficients of the mirror
            # extension, since the prefilter itself uses mirror boundary)
            from ..ops.prefilter import bspline_prefilter

            def prep(v):
                return _pad_planes(bspline_prefilter(v))

            vol = jax.jit(prep)(jnp.asarray(data, jnp.float32))
            self.data = jax.device_put(vol, sharding)
        self._samplers = {}

    def _sharded_prefilter(self, raw):
        """B-spline prefilter under shard_map: per-shard FIR along the two
        local axes; the sharded axis runs the same truncated inverse filter
        as :func:`..ops.prefilter.prefilter_fir` against an 18-plane halo
        exchanged over ICI (mirror-extended at the global edges), which is
        the FIR equivalent of the reference's serial z-pass
        (``bspline.h:58-99``) without gathering the volume."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import PartitionSpec as P

        from ..ops.prefilter import _FIR_HALF_WIDTH, POLE, prefilter_fir

        axis = self.axis_name
        n = self.mesh.devices.size
        k = _FIR_HALF_WIDTH
        taps = jnp.asarray(
            np.sqrt(3.0) * POLE ** np.abs(np.arange(-k, k + 1,
                                                    dtype=np.float64)),
            jnp.float32)

        def body(local_vol):
            # mirror extension at the global edges (matches _fir_matrix)
            ext = _exchange_halo(local_vol, k, axis, n, edge="mirror")
            loc = local_vol.shape[0]
            out = sum(taps[t] * jax.lax.dynamic_slice_in_dim(ext, t, loc, 0)
                      for t in range(2 * k + 1))
            out = prefilter_fir(out, 1)
            return prefilter_fir(out, 2)

        fn = jax.jit(_shard_map(body, mesh=self.mesh, in_specs=P(axis),
                                out_specs=P(axis)))
        return fn(raw)

    # -------------------------------------------------------------- samplers

    def _plan_for(self, transform_m, halo: Optional[int]):
        """Pallas kernel plan for the per-device local computation, or None
        on non-TPU backends (the CPU-emulated mesh runs the XLA bodies).

        The per-device matrices differ only by slab-offset translations, so
        one plan chosen for the n-matrix envelope serves every chip."""
        from ..transforms import _pick_impl
        if _pick_impl(self.mesh.devices.flat[0]) != "pallas":
            return None
        from ..kernels.planner import choose_plan
        n = self.mesh.devices.size
        local = self._d0p // n
        m = np.asarray(transform_m, np.float64)
        out_shape = (local,) + self.shape[1:]
        ms = []
        for i in range(n):
            shift_out = np.eye(4)
            shift_out[0, 3] = i * local
            if halo is None:
                ms.append(m @ shift_out)
            else:
                shift_src = np.eye(4)
                shift_src[0, 3] = halo - i * local
                ms.append(shift_src @ m @ shift_out)
        src_shape = ((self._d0p,) + self.shape[1:] if halo is None
                     else (local + 2 * halo,) + self.shape[1:])
        return choose_plan(np.stack(ms), src_shape, self.interpolation,
                           self.mode, out_shape=out_shape)

    def _get_sampler(self, halo: Optional[int], plan=None):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        key = (halo, plan, self.global_strategy)
        if key in self._samplers:
            return self._samplers[key]

        interp, mode, cval = self.interpolation, self.mode, self.cval
        axis = self.axis_name
        mesh = self.mesh
        n = mesh.devices.size
        d0 = self.shape[0]          # TRUE extent: all masking uses this
        local = self._d0p // n      # padded slab height
        pad = self._pad
        shape = self.shape
        from ..ops.sampling import affine_sample

        def mask_true_z(out, m_dev):
            """Re-mask the sharded axis against the TRUE volume extent (the
            kernels' inside test sees the padded frame)."""
            zi = jax.lax.broadcasted_iota(jnp.float32, out.shape, 0)
            yi = jax.lax.broadcasted_iota(jnp.float32, out.shape, 1)
            xi = jax.lax.broadcasted_iota(jnp.float32, out.shape, 2)
            zsrc = (m_dev[0, 0] * zi + m_dev[0, 1] * yi
                    + m_dev[0, 2] * xi + m_dev[0, 3])
            if mode == "border":
                inside = (zsrc > -0.5) & (zsrc < d0 - 0.5)
            else:
                inside = (zsrc >= 0) & (zsrc <= d0 - 1)
            return jnp.where(inside, out, jnp.float32(cval))

        if halo is None and self.global_strategy == "stream":
            def body(vol_shard, matrix):
                # gather-free global transform: source slabs stream around
                # a ppermute ring; each chip accumulates its own output
                # slab as the sum of per-tap partial samples of whichever
                # slab is resident this step (per-tap zero extension makes
                # the sum exact -- see _partial_sample_pertap).  Peak
                # per-chip live set: two slab buffers + the output slab +
                # coords; never the full volume.
                from ..ops.sampling import affine_coords
                idx = jax.lax.axis_index(axis)
                start = (idx * local).astype(jnp.float32)
                # exact f32 shift composition (a jnp matmul would run at
                # bf16 matmul precision on TPU and shred the matrix)
                m_dev = matrix.at[:, 3].add(matrix[:, 0] * start)
                out_shape = (local,) + shape[1:]
                coords = affine_coords(out_shape, m_dev)   # global frame
                acc = jnp.zeros(out_shape, jnp.float32)
                src = vol_shard
                src_idx = idx
                for k in range(n):
                    z0 = src_idx * local
                    acc = acc + _partial_sample_pertap(
                        src, coords, z0, shape, interp, mode)
                    if k < n - 1:
                        src = jax.lax.ppermute(
                            src, axis, [(i, (i + 1) % n) for i in range(n)])
                        src_idx = (src_idx - 1) % n
                # whole-sample mask in the global frame (all three axes,
                # exactly the single-chip samplers' inside test)
                if mode == "border":
                    inside = ((coords[0] > -0.5) & (coords[0] < d0 - 0.5)
                              & (coords[1] > -0.5)
                              & (coords[1] < shape[1] - 0.5)
                              & (coords[2] > -0.5)
                              & (coords[2] < shape[2] - 0.5))
                else:
                    inside = ((coords[0] >= 0) & (coords[0] <= d0 - 1)
                              & (coords[1] >= 0)
                              & (coords[1] <= shape[1] - 1)
                              & (coords[2] >= 0)
                              & (coords[2] <= shape[2] - 1))
                return jnp.where(inside, acc, jnp.float32(cval))
        elif halo is None and plan is not None:
            from ..kernels.planner import plan_sample

            def body(vol_shard, matrix):
                # global transform, pallas: gather the source over ICI and
                # run the planner's kernel on this chip's output slab (the
                # matrix carries the slab shift)
                full = jax.lax.all_gather(vol_shard, axis, axis=0,
                                          tiled=True)
                idx = jax.lax.axis_index(axis)
                start = (idx * local).astype(jnp.float32)
                # exact f32 shift composition (a jnp matmul would run at
                # bf16 matmul precision on TPU and shred the matrix)
                m_dev = matrix.at[:, 3].add(matrix[:, 0] * start)
                out = plan_sample(full, m_dev, plan, cval)
                return mask_true_z(out, m_dev) if pad else out
        elif halo is None:
            def body(vol_shard, matrix):
                # global transform: gather the full source volume over ICI,
                # compute only this chip's output slab
                full = jax.lax.all_gather(vol_shard, axis, axis=0, tiled=True)
                idx = jax.lax.axis_index(axis)
                start = (idx * local).astype(jnp.float32)
                # exact f32 shift composition (a jnp matmul would run at
                # bf16 matmul precision on TPU and shred the matrix)
                m_dev = matrix.at[:, 3].add(matrix[:, 0] * start)
                out_shape = (local,) + self.shape[1:]
                out = affine_sample(full, m_dev, interp, mode,
                                    cval, prefiltered=True,
                                    out_shape=out_shape)
                return mask_true_z(out, m_dev) if pad else out
        elif plan is not None:
            from ..kernels.planner import plan_sample

            def body(vol_shard, matrix):
                # local transform, pallas: halo-exchange over ICI, run the
                # planner's kernel on the extended slab, then re-mask the
                # sharded axis in the GLOBAL frame (the kernel's own
                # inside test sees only the extended-slab frame)
                idx = jax.lax.axis_index(axis)
                ext = _exchange_halo(vol_shard, halo, axis, n,
                                     edge="zero" if mode == "border"
                                     else "mirror")

                start = (idx * local).astype(jnp.float32)
                # exact f32 shift composition (a jnp matmul would run at
                # bf16 matmul precision on TPU and shred the matrix):
                # out-shift folds into column 3 via column 0; the source
                # z-shift adds to row 0's translation
                m_glob = matrix.at[:, 3].add(matrix[:, 0] * start)
                m_ext = m_glob.at[0, 3].add(jnp.float32(halo) - start)
                out = plan_sample(ext, m_ext, plan, cval)

                # global-frame z mask (y/x are unsharded: the kernel's own
                # masking already matches the global frame there)
                zi = jax.lax.broadcasted_iota(
                    jnp.float32, out.shape, 0)
                yi = jax.lax.broadcasted_iota(
                    jnp.float32, out.shape, 1)
                xi = jax.lax.broadcasted_iota(
                    jnp.float32, out.shape, 2)
                zsrc = (m_glob[0, 0] * zi + m_glob[0, 1] * yi
                        + m_glob[0, 2] * xi + m_glob[0, 3])
                if mode == "border":
                    inside = (zsrc > -0.5) & (zsrc < d0 - 0.5)
                else:
                    inside = (zsrc >= 0) & (zsrc <= d0 - 1)
                return jnp.where(inside, out, jnp.float32(cval))
        else:
            from ..ops.sampling import affine_coords
            from ..ops.interpolation import sample as sample_at_coords

            def body(vol_shard, matrix):
                # local transform: exchange `halo` planes with the ring
                # neighbours over ICI, then sample from the extended slab
                idx = jax.lax.axis_index(axis)
                ext = _exchange_halo(vol_shard, halo, axis, n,
                                     edge="zero" if mode == "border"
                                     else "mirror")

                # source coordinates in the global frame (out voxel z offset
                # by this chip's slab start)
                out_shape = (local,) + self.shape[1:]
                start = (idx * local).astype(jnp.float32)
                # exact f32 out-shift (avoids TPU bf16 matmul precision)
                m_dev = matrix.at[:, 3].add(matrix[:, 0] * start)
                coords = affine_coords(out_shape, m_dev)
                # sample in the extended-slab frame ...
                ext_coords = coords.at[0].add(jnp.float32(halo) - start)
                out = sample_at_coords(ext, ext_coords, interp, mode, cval,
                                       prefiltered=True)
                # ... but mask in the global frame (the ext-frame in/out test
                # is too permissive near the slab edges)
                if mode == "border":
                    inside = ((coords[0] > -0.5) & (coords[0] < d0 - 0.5))
                else:
                    inside = ((coords[0] >= 0) & (coords[0] <= d0 - 1))
                return jnp.where(inside, out, jnp.float32(cval))

        fn = _shard_map(body, mesh=mesh,
                        in_specs=(P(axis), P()),
                        out_specs=P(axis))
        fn = jax.jit(fn)
        self._samplers[key] = fn
        return fn

    # ------------------------------------------------------------------- API

    def affine(self, transform_m: np.ndarray, output=None):
        """Apply a 4x4 pull-back matrix across the mesh."""
        import jax.numpy as jnp
        halo = halo_for_matrix(self.shape, transform_m, self.interpolation)
        local = self._d0p // self.mesh.devices.size
        if halo is not None and halo + 1 > local:
            halo = None  # halo exceeds the slab; treat as a global transform
        if halo is None and self.global_strategy == "stream":
            plan = None  # the ring body needs no kernel plan
        else:
            plan = self._plan_for(transform_m, halo)
        fn = self._get_sampler(halo, plan)
        result = fn(self.data, jnp.asarray(transform_m, jnp.float32))
        if self._pad:
            result = result[:self.shape[0]]   # crop the pad rows
        if isinstance(output, str) and output == "device":
            return result
        result.block_until_ready()
        from ..transforms import _finish
        # validates the buffer shape (a wrong-shaped buffer must raise,
        # not broadcast); returns None when a buffer is supplied
        return _finish(np.asarray(result), output)

    def rotate(self, rotation, rotation_units="deg", rotation_order="rzxz",
               output=None):
        from ..utils import rotation_matrix
        return self.affine(
            rotation_matrix(rotation, rotation_units, rotation_order), output)

    def transform(self, **kwargs):
        from ..utils import transform_matrix
        from ..transforms import _as_triple
        output = kwargs.pop("output", None)
        center = kwargs.pop("center", None)
        if center is None:
            center = np.divide(np.subtract(self.shape, 1), 2, dtype=np.float32)
        for k in ("scale", "shear", "rotation", "translation"):
            if k in kwargs:
                kwargs[k] = _as_triple(kwargs[k])
        m = transform_matrix(center=_as_triple(center), **kwargs)
        return self.affine(m, output)


def sharded_affine_batch(volume, matrices, interpolation: str = "linear",
                         mesh=None, mode: str = "constant", cval: float = 0.0,
                         _plan=None, _interpret: bool = False):
    """Apply N matrices to one volume, data-parallel over the mesh.

    The volume is replicated; the matrix batch is sharded.  Returns the
    (N, *shape) stack on host.  A batch that does not divide over the mesh
    is padded with repeats of the last matrix and cropped on return.

    On TPU meshes each device runs the planner's grid-batched Pallas kernel
    over its matrix share (one envelope plan serves the whole sweep;
    per-matrix geometry rides in runtime payloads), falling back to the XLA
    gather sampler outside the kernel regime.  ``_plan``/``_interpret`` are
    test hooks forcing a specific plan / interpreter-mode kernels.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = mesh if mesh is not None else make_mesh()
    axis = mesh.axis_names[0]
    n = mesh.devices.size
    matrices = np.asarray(matrices, dtype=np.float32)
    if matrices.ndim != 3 or matrices.shape[1:] != (4, 4):
        raise ValueError("matrices must be (N, 4, 4)")
    n_true = matrices.shape[0]
    pad = (-n_true) % n
    if pad:   # pad with repeats of the last matrix, crop on return
        matrices = np.concatenate(
            [matrices, np.repeat(matrices[-1:], pad, axis=0)])
    shape = tuple(volume.shape)

    from ..transforms import _pick_impl
    plan = _plan
    if plan is None and _pick_impl(mesh.devices.flat[0]) == "pallas":
        from ..kernels.planner import choose_plan
        plan = choose_plan(np.asarray(matrices, np.float64), shape,
                           interpolation, mode)

    if plan is not None:
        from ..kernels.planner import (fit_payload, plan_batch_sampler,
                                       plan_payload, plan_prepare)
        from ..ops.interpolation import needs_prefilter
        fits = [fit_payload(plan, m, shape, interpolation, mode)
                for m in matrices]
        if all(f is not None for f in fits):
            npd = matrices.shape[0] // n
            run_b = plan_batch_sampler(plan, npd, cval,
                                       interpret=_interpret)

            def prepare(v):
                v = jnp.asarray(v, jnp.float32)
                if needs_prefilter(interpolation):
                    from ..ops.prefilter import bspline_prefilter
                    v = bspline_prefilter(v)
                return plan_prepare(v, plan)

            prepared = jax.device_put(
                jax.jit(prepare)(jnp.asarray(volume, jnp.float32)),
                NamedSharding(mesh, P()))
            payloads = jax.device_put(
                jnp.stack([plan_payload(m, f)
                           for m, f in zip(matrices, fits)]),
                NamedSharding(mesh, P(axis)))
            fn = jax.jit(_shard_map(lambda prep, pls: run_b(prep, pls),
                                    mesh=mesh, in_specs=(P(), P(axis)),
                                    out_specs=P(axis)))
            return np.asarray(fn(prepared, payloads))[:n_true]

    from ..ops.sampling import affine_sample_batch

    vol = jax.device_put(jnp.asarray(volume, jnp.float32),
                         NamedSharding(mesh, P()))
    ms = jax.device_put(jnp.asarray(matrices),
                        NamedSharding(mesh, P(axis)))

    @functools.partial(jax.jit, out_shardings=NamedSharding(mesh, P(axis)))
    def run(vol, ms):
        return affine_sample_batch(vol, ms, interpolation, mode, cval)

    return np.asarray(run(vol, ms))[:n_true]
