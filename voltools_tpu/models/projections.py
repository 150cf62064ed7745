"""Tilt-series projection pipeline.

Covers (and extends) the reference's ``examples/projections.py`` workflow:
rotate a resident volume through a series of orientations and integrate along
an axis to synthesize projections (the cryo-ET forward model).

The reference loops one rotation per kernel launch and sums on host; here the
entire tilt series is one fused device program — rotation batch via ``vmap``
plus a projection reduction — with optional sharding of the tilt batch over a
device mesh.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..ops.interpolation import needs_prefilter
from ..utils import transform_matrix


class TiltSeriesProjector:
    """Projects a volume over a series of tilt angles.

    Parameters
    ----------
    data : (D, H, W) numpy array
    interpolation : any library interpolation mode
    projection_axis : axis integrated over (default 0, like summing slices)
    rotation_order : Euler convention for the tilt (default 'rzxz' — as the
        reference examples use)
    """

    def __init__(self, data: np.ndarray, interpolation: str = "linear",
                 projection_axis: int = 0, rotation_order: str = "rzxz",
                 device: str = "tpu", mode: str = "constant"):
        import jax
        import jax.numpy as jnp

        if data.ndim != 3:
            raise ValueError("Expected a 3D array")
        self.shape = tuple(data.shape)
        self.projection_axis = projection_axis
        self.rotation_order = rotation_order
        self.interpolation = interpolation
        self.center = np.divide(np.subtract(data.shape, 1), 2,
                                dtype=np.float32)

        from ..utils import resolve_device
        vol = jax.device_put(jnp.asarray(data, jnp.float32),
                             resolve_device(device))
        if needs_prefilter(interpolation):
            from ..ops.prefilter import bspline_prefilter
            vol = jax.jit(bspline_prefilter)(vol)
        self.data = vol

        from ..ops.sampling import affine_sample

        self._mode = mode
        self._device = device

        def project_one(volume, matrix):
            rotated = affine_sample(volume, matrix, interpolation, mode, 0.0,
                                    prefiltered=True)
            return jnp.sum(rotated, axis=projection_axis)

        self._project_batch = jax.jit(
            jax.vmap(project_one, in_axes=(None, 0)))
        self._variant_projectors = {}

    def _projector_for(self, ms_np):
        """Kernel fast path when an envelope variant covers the tilt sweep."""
        from ..transforms import select_variant
        from ..utils import resolve_device
        variant = select_variant(ms_np, self.shape, self.interpolation,
                                 self._mode, resolve_device(self._device))
        if variant is None:
            return self._project_batch
        if variant not in self._variant_projectors:
            import jax
            import jax.numpy as jnp
            from ..kernels.pallas_affine import affine_sample_pallas_variant
            axis = self.projection_axis

            def run(vol, ms):
                return jax.lax.map(
                    lambda m: jnp.sum(
                        affine_sample_pallas_variant(vol, m, variant, 0.0),
                        axis=axis), ms)

            self._variant_projectors[variant] = jax.jit(run)
        return self._variant_projectors[variant]

    def tilt_matrices(self, angles_deg: Sequence[float],
                      tilt_axis: int = 1) -> np.ndarray:
        """Rotation matrices for a single-axis tilt series about the center."""
        triple = [0.0, 0.0, 0.0]
        ms = []
        for a in angles_deg:
            t = list(triple)
            t[tilt_axis] = float(a)
            ms.append(transform_matrix(rotation=t,
                                       rotation_order=self.rotation_order,
                                       center=self.center))
        return np.stack(ms).astype(np.float32)

    def project(self, angles_deg: Sequence[float], tilt_axis: int = 1,
                output: Optional[str] = None):
        """Full tilt series in one device program.

        Returns an (N, H', W') stack of projections (numpy, or the device
        array with ``output='device'``)."""
        import jax.numpy as jnp
        ms_np = self.tilt_matrices(angles_deg, tilt_axis)
        projector = self._projector_for(ms_np)
        result = projector(self.data, jnp.asarray(ms_np))
        if isinstance(output, str) and output == "device":
            return result
        return np.asarray(result)
