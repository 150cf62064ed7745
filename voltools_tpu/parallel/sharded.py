"""Multi-chip execution: sharded volumes and data-parallel transform batches.

The reference's entire multi-device story is *device selection* — bind one
GPU per call (``voltools/utils/general.py:84-88``); it has no collectives.
This module is the TPU-native capability extension described in SURVEY.md §2:

* :class:`ShardedVolume` — a volume sharded along its slowest axis over a
  1-D ``jax.sharding.Mesh``.  Affine transforms run under ``shard_map``:
  each chip computes its output slab.  For *local* transforms (translations,
  small rotations: every output voxel's source stays within a bounded halo
  of its own slab) only a halo exchange over ICI is needed; for global ones
  (arbitrary rotations mix all slabs) the source volume is all-gathered —
  both paths produce results identical to the single-chip kernel.
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


class ShardedVolume:
    """A volume sharded along axis 0 across a device mesh.

    Parameters mirror :class:`voltools_tpu.StaticVolume`; the volume is
    prefiltered once (globally, before sharding) for ``filt_bspline*``.
    """

    def __init__(self, data: np.ndarray, interpolation: str = "linear",
                 mesh=None, mode: str = "constant", cval: float = 0.0):
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
        self.mesh = mesh if mesh is not None else make_mesh()
        self.axis_name = self.mesh.axis_names[0]
        n = self.mesh.devices.size
        if data.shape[0] % n != 0:
            raise ValueError(
                f"axis 0 ({data.shape[0]}) must divide evenly over the "
                f"{n}-device mesh")
        self.interpolation = interpolation
        self.mode = mode
        self.cval = float(cval)
        self.shape = tuple(data.shape)

        vol = jnp.asarray(data, jnp.float32)
        from ..ops.interpolation import needs_prefilter
        if needs_prefilter(interpolation):
            from ..ops.prefilter import bspline_prefilter
            vol = jax.jit(bspline_prefilter)(vol)
        sharding = NamedSharding(self.mesh, P(self.axis_name))
        self.data = jax.device_put(vol, sharding)
        self._samplers = {}

    # -------------------------------------------------------------- samplers

    def _get_sampler(self, halo: Optional[int]):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P
        from jax.experimental.shard_map import shard_map

        key = halo
        if key in self._samplers:
            return self._samplers[key]

        interp, mode, cval = self.interpolation, self.mode, self.cval
        axis = self.axis_name
        mesh = self.mesh
        n = mesh.devices.size
        d0 = self.shape[0]
        local = d0 // n
        from ..ops.sampling import affine_sample

        if halo is None:
            def body(vol_shard, matrix):
                # global transform: gather the full source volume over ICI,
                # compute only this chip's output slab
                full = jax.lax.all_gather(vol_shard, axis, axis=0, tiled=True)
                idx = jax.lax.axis_index(axis)
                shift_m = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(
                    (idx * local).astype(jnp.float32))
                out_shape = (local,) + self.shape[1:]
                return affine_sample(full, matrix @ shift_m, interp, mode,
                                     cval, prefiltered=True,
                                     out_shape=out_shape)
        else:
            from ..ops.sampling import affine_coords
            from ..ops.interpolation import sample as sample_at_coords

            def body(vol_shard, matrix):
                # local transform: exchange `halo` planes with the ring
                # neighbours over ICI, then sample from the extended slab
                idx = jax.lax.axis_index(axis)
                up = jax.lax.ppermute(          # from the lower neighbour
                    vol_shard[-halo:], axis,
                    [(i, (i + 1) % n) for i in range(n)])
                down = jax.lax.ppermute(        # from the upper neighbour
                    vol_shard[:halo], axis,
                    [(i, (i - 1) % n) for i in range(n)])
                # at the global edges the ring wraps around; replace the
                # wrapped planes with the boundary extension the single-chip
                # kernel would see: mirror for scipy-'constant', zeros for
                # 'border' (out-of-range taps contribute nothing there)
                if mode == "border":
                    bottom_ext = jnp.zeros_like(up)
                    top_ext = jnp.zeros_like(down)
                else:
                    bottom_ext = jnp.flip(vol_shard[1:halo + 1], 0)
                    top_ext = jnp.flip(vol_shard[-halo - 1:-1], 0)
                up = jnp.where(idx == 0, bottom_ext, up)
                down = jnp.where(idx == n - 1, top_ext, down)
                ext = jnp.concatenate([up, vol_shard, down], axis=0)

                # source coordinates in the global frame (out voxel z offset
                # by this chip's slab start)
                out_shape = (local,) + self.shape[1:]
                start = (idx * local).astype(jnp.float32)
                shift_out = jnp.eye(4, dtype=jnp.float32).at[0, 3].set(start)
                coords = affine_coords(out_shape, matrix @ shift_out)
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

        fn = shard_map(body, mesh=mesh,
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
        local = self.shape[0] // self.mesh.devices.size
        if halo is not None and halo + 1 > local:
            halo = None  # halo would exceed the slab; use the gather path
        fn = self._get_sampler(halo)
        result = fn(self.data, jnp.asarray(transform_m, jnp.float32))
        if isinstance(output, str) and output == "device":
            return result
        result.block_until_ready()
        out_np = np.asarray(result)
        if output is None:
            return out_np
        np.copyto(output, out_np)
        return None

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
        kwargs["scale"] = _as_triple(kwargs.get("scale"))
        kwargs["shear"] = _as_triple(kwargs.get("shear"))
        m = transform_matrix(center=center, **kwargs)
        return self.affine(m, output)


def sharded_affine_batch(volume, matrices, interpolation: str = "linear",
                         mesh=None, mode: str = "constant", cval: float = 0.0):
    """Apply N matrices to one volume, data-parallel over the mesh.

    The volume is replicated; the matrix batch is sharded.  Returns the
    (N, *shape) stack on host.  N must divide by the mesh size.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = mesh if mesh is not None else make_mesh()
    axis = mesh.axis_names[0]
    n = mesh.devices.size
    matrices = np.asarray(matrices, dtype=np.float32)
    if matrices.shape[0] % n != 0:
        raise ValueError(f"batch ({matrices.shape[0]}) must divide over "
                         f"{n} devices")

    from ..ops.sampling import affine_sample_batch

    vol = jax.device_put(jnp.asarray(volume, jnp.float32),
                         NamedSharding(mesh, P()))
    ms = jax.device_put(jnp.asarray(matrices),
                        NamedSharding(mesh, P(axis)))

    @functools.partial(jax.jit, out_shardings=NamedSharding(mesh, P(axis)))
    def run(vol, ms):
        return affine_sample_batch(vol, ms, interpolation, mode, cval)

    return np.asarray(run(vol, ms))
