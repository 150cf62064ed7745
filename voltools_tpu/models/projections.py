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
        self._prepared_layouts = {}
        import threading
        self._layout_lock = threading.RLock()
        self._interpret = False   # test hook: run kernels interpreted

    def _prepared_source(self, plan):
        """The plan's prepared HBM source layout, cached per layout key (the
        resident volume pays the transpose/pad/stack once per layout)."""
        from ..kernels.planner import prepared_source
        return prepared_source(self.data, plan, self._prepared_layouts,
                               self._layout_lock)

    def _projector_for(self, ms_np):
        """Batched kernel fast path when an envelope plan covers the sweep.

        Dispatches through the unified planner (walk OR select-tree plans —
        feeding a :class:`WalkVariant` into the select-tree kernel was the
        round-2 TPU crash), with per-matrix runtime payloads so the whole
        tilt series shares one batched program.  Returns a callable
        ``(volume, (N,4,4) numpy matrices) -> (N, H', W') projections``."""
        from ..kernels import planner
        from ..transforms import select_variant
        from ..utils import resolve_device
        import jax.numpy as jnp
        env = select_variant(ms_np, self.shape, self.interpolation,
                             self._mode, resolve_device(self._device))
        if env is None:
            return lambda vol, ms: self._project_batch(vol, jnp.asarray(ms))
        # per-matrix payload plans on env's exact binary + layout (kax/y_lo
        # are runtime payload for walk plans; identity for tree plans)
        fits = [planner.fit_payload(env, m, self.shape, self.interpolation,
                                    self._mode) for m in ms_np]
        if any(f is None for f in fits):   # pragma: no cover - defensive
            return lambda vol, ms: self._project_batch(vol, jnp.asarray(ms))
        n = len(ms_np)
        key = (planner.plan_group_key(env), n)
        cached = self._variant_projectors.get(key)
        if cached is None:
            import jax
            axis = self.projection_axis
            batch = planner.plan_batch_sampler(env, n, 0.0,
                                               interpret=self._interpret)
            reduce_ = jax.jit(lambda x: jnp.sum(x, axis=axis + 1))

            def cached(vol, ms, plans, _env=env, _batch=batch,
                       _reduce=reduce_):
                del vol  # the prepared layout stands in for the volume
                payloads = jnp.stack([planner.plan_payload(m, p)
                                      for m, p in zip(ms, plans)])
                prepared = self._prepared_source(_env)
                return _reduce(_batch(prepared, payloads))

            self._variant_projectors[key] = cached

        # hand the already-validated fits to the closure so each sweep pays
        # the per-matrix host planning once, not twice — but honor the
        # documented contract for callers that reuse the callable with
        # OTHER matrices: kax/y_lo bands are per-matrix, so serving the
        # planning-time fits for foreign matrices would be silently wrong
        planned = np.asarray(ms_np, np.float32)

        def bound(vol, ms, _c=cached, _plans=fits, _planned=planned,
                  _env=env):
            ms_arr = np.asarray(ms, np.float32)
            if ms_arr.shape != _planned.shape:
                # different sweep length: the batched program is built for
                # n matrices — re-plan from scratch
                return self._projector_for(ms_arr)(vol, ms_arr)
            plans = _plans
            if not np.array_equal(ms_arr, _planned):
                plans = [planner.fit_payload(_env, m, self.shape,
                                             self.interpolation, self._mode)
                         for m in ms_arr]
                if any(p is None for p in plans):
                    return self._project_batch(vol, jnp.asarray(ms))
            return _c(vol, ms, plans)

        return bound

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
        ms_np = self.tilt_matrices(angles_deg, tilt_axis)
        projector = self._projector_for(ms_np)
        result = projector(self.data, ms_np)
        if isinstance(output, str) and output == "device":
            return result
        return np.asarray(result)
