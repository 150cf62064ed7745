"""StaticVolume: a device-resident volume for repeated transforms.

TPU-native analogue of the reference's texture-resident ``StaticVolume``
(``voltools/volume.py``): upload once, prefilter once (for ``filt_bspline*``),
compile the sampler once — then every transform ships only a 4x4 matrix to
the device (reference ``volume.py:70``), and optionally keeps the result on
device (``output='device'``, the analogue of the caller-provided GPU buffer).

Differences from the reference, by design:

* The volume is an immutable ``jax.Array`` in HBM rather than a CUDA texture;
  "compiled kernel + launch dims" become one cached jitted function.
* ``affine_batch`` applies N matrices in one fused device program — the
  batched sweep the reference benchmark loops in Python
  (``tests/benchmark.py:59-65``) runs as a single launch here.
* ``reshape`` is unsupported, as in the reference (``volume.py:14-16``).
"""

from __future__ import annotations

import functools
import threading
from typing import Optional, Tuple, Union

import numpy as np

from .ops.interpolation import AVAILABLE_INTERPOLATIONS, MODES, needs_prefilter
from .transforms import _as_triple, _devices, _finish, affine as _affine_fn
from .utils import (
    ProfileTimer,
    resolve_device,
    rotation_matrix,
    scale_matrix,
    shear_matrix,
    transform_matrix,
    translation_matrix,
)

Triple = Union[float, Tuple[float, float, float], np.ndarray]


def _check_output_arg(output, device, allow_donate=True):
    """Reject unknown ``output`` values upfront with the library's clear
    ValueError (a typo'd string like 'Device' used to surface as an
    AttributeError deep inside the copy-out helper)."""
    if output is None or isinstance(output, np.ndarray):
        return
    if isinstance(output, str):
        if output == "device":
            if device == "cpu":
                raise ValueError("output='device' requires a jax device")
            return
        raise ValueError(
            "output must be None, a numpy array to fill, 'device', or a "
            f"donated device array; got {output!r}")
    if allow_donate and device != "cpu":
        import jax
        if isinstance(output, jax.Array):
            return
    raise ValueError(
        "output must be None, a numpy array to fill, or 'device'; got "
        f"{type(output).__name__}")


class StaticVolume:
    """Keeps a (prefiltered) volume resident on a device for cheap repeated
    transforms.  ``reshape`` is not available on this API (see module doc)."""

    def __init__(self, data: np.ndarray, interpolation: str = "linear",
                 device: str = "tpu", mode: str = "constant", cval: float = 0.0,
                 prefilter_boundary: str = "mirror",
                 autotune: Optional[int] = None):
        if data.ndim != 3:
            raise ValueError("Expected a 3D array")
        if interpolation not in AVAILABLE_INTERPOLATIONS:
            raise ValueError(
                f"Interpolation must be one of {AVAILABLE_INTERPOLATIONS}")
        if mode not in MODES:
            raise ValueError(f"mode must be one of {MODES}, got {mode!r}")
        from .ops.prefilter import BOUNDARIES
        if prefilter_boundary not in BOUNDARIES:
            raise ValueError(
                f"prefilter_boundary must be one of {BOUNDARIES}, "
                f"got {prefilter_boundary!r}")
        # lru-cached registry: repeated constructions don't re-probe the
        # backend (and a broken-backend warning fires once, not per volume)
        available = _devices()
        if device not in available:
            raise ValueError(
                f"Unknown device ({device}), must be one of {available}")

        self.device = device
        self.interpolation = interpolation
        self.mode = mode
        self.cval = float(cval)
        self.shape = tuple(data.shape)
        # best-of-K empirical plan autotune (0/1 = off): each NEW plan
        # costs K-1 extra Mosaic compiles + a few measured runs, then the
        # measured-fastest config serves every repeat of that matrix --
        # worth it for long-lived resident volumes with hot orientations.
        # Default (None) = auto: K=3 for LINEAR whole-resident walk plans
        # (the <=~120^3 regime, where the cost model's error band is
        # measured loose -- 50^3 best-of-3 gains mean 16.7%, one rotation
        # 74%, exp_r5_autotune_small -- and the small kernels compile in
        # seconds), off for windowed plans (250^3 best-of-3 measured 0.0%
        # gain on every slow-class rotation: the model pick is already
        # measured-best there, exp_r3_autotune round 5).
        self._autotune = autotune if autotune is None else int(autotune)
        self._autotuned = {}

        if device == "cpu":
            # prefilter once at construction (the reference's GPU path did
            # this for textures, volume.py:48-50; its CPU path re-filtered on
            # every call) — subsequent calls sample the coefficients directly
            if needs_prefilter(interpolation):
                from scipy.ndimage import spline_filter
                # honor prefilter_boundary on CPU exactly as the device
                # path does: 'clamp' (edge replicate) is scipy 'nearest'
                scipy_mode = {"mirror": "mirror", "clamp": "nearest"}[
                    prefilter_boundary]
                self.data = spline_filter(data, order=3, mode=scipy_mode,
                                          output=np.float32)
                self._cpu_interp = ("bspline" if interpolation == "filt_bspline"
                                    else "bspline_simple")
            else:
                # private float32 copy: the class documents a RESIDENT
                # volume, so later caller mutation of the input must not
                # change results (and CPU results match the device path's
                # float32, not the input dtype)
                self.data = np.array(data, np.float32)
                self._cpu_interp = interpolation
            return

        import jax
        import jax.numpy as jnp

        jdev = resolve_device(device)
        vol = jax.device_put(jnp.asarray(data, jnp.float32), jdev)
        if needs_prefilter(interpolation):
            from .ops.prefilter import bspline_prefilter
            vol = jax.jit(functools.partial(
                bspline_prefilter, boundary=prefilter_boundary))(vol)
        self.data = vol

        interp = interpolation
        m_mode, m_cval = mode, self.cval
        self._jdev = jdev

        def _sample(volume, matrix):
            from .ops.sampling import affine_sample
            return affine_sample(volume, matrix, interp, m_mode, m_cval,
                                 prefiltered=True)

        self._sampler = jax.jit(_sample)

        def _sample_into(volume, matrix, out_buf):
            del out_buf   # donated: aliased to the output by shape/dtype
            return _sample(volume, matrix)

        # donating XLA-path sampler (fallback when no pallas plan applies)
        self._sampler_into = jax.jit(_sample_into, donate_argnums=(2,),
                                     keep_unused=True)
        self._batch_sampler = jax.jit(jax.vmap(_sample, in_axes=(None, 0)))
        self._variant_samplers = {}
        self._walk_layouts = {}
        # RLock: _device_sampler builds samplers under the lock and calls
        # _prepared_source, which locks the same guard for the layout
        # cache -- a plain Lock deadlocks the first fresh walk plan
        self._variant_lock = threading.RLock()
        # warm the compile so the first .affine() call is launch-only
        self._sampler(self.data, jnp.eye(4, dtype=jnp.float32))

    def _prepared_source(self, plan):
        """The plan's prepared HBM source layout, cached per layout key so
        resident sweeps pay the transpose/pad/stack once, not per angle."""
        from .kernels.planner import prepared_source
        return prepared_source(self.data, plan, self._walk_layouts,
                               self._variant_lock)

    def _device_sampler(self, transform_m, into: bool = False):
        """Pick the pallas fast path when the matrix qualifies (the data is
        already prefiltered, so the kernel samples it directly).  Plan
        selection handles compiled-kernel reuse (sticky fits for walk plans,
        cost-gated envelopes for select-tree plans), so angle sweeps don't
        recompile per step.  ``into=True`` returns the donating form
        ``(vol, m, out_buf) -> result`` (out_buf's HBM backs the result)."""
        from .transforms import select_variant
        plan = select_variant(transform_m, self.shape, self.interpolation,
                              self.mode, self._jdev)
        if plan is None:
            return self._sampler_into if into else self._sampler
        tune_k = self._autotune
        if tune_k is None:
            # auto policy: measure best-of-3 only where the cost model's
            # error band is measured loose (whole-resident plans; see the
            # constructor comment for the hardware tables).  Linear only:
            # the cubic whole-resident band is measured TIGHT (50^3
            # best-of-3 mean gain 1.2%, 100^3 0.4% -- EXP_INTERP=
            # filt_bspline exp_r5_autotune_small, round 5), nowhere near
            # worth the minutes-scale Mosaic compile per extra cubic
            # candidate.
            tune_k = (3 if (getattr(plan, "whole", False)
                            and getattr(plan, "order", 0) == 1) else 0)
        if tune_k > 1:
            from .kernels.planner import autotune_plan, plan_covers
            with self._variant_lock:
                tuned = self._autotuned.get(plan)
            if tuned is None or not plan_covers(
                    tuned, np.asarray(transform_m, np.float64), self.shape,
                    self.interpolation, self.mode):
                try:
                    tuned = autotune_plan(self.data,
                                          np.asarray(transform_m, np.float32),
                                          self.interpolation, self.mode,
                                          self.cval, k=tune_k)
                except Exception:
                    # best-effort: a candidate that fails to compile/run
                    # (e.g. a backend without Mosaic) must never break the
                    # call -- cache and serve the model pick instead
                    tuned = plan
                with self._variant_lock:
                    self._autotuned[plan] = tuned
                    if len(self._autotuned) > 96:
                        for k in list(self._autotuned)[:32]:
                            del self._autotuned[k]
            if tuned is not None:
                plan = tuned
        with self._variant_lock:
            skey = (plan, "into") if into else plan
            sampler = self._variant_samplers.get(skey)
            if sampler is None:
                from .kernels.planner import plan_sampler, plan_sampler_into
                prep = self._prepared_source(plan)
                if into:
                    run = plan_sampler_into(plan, self.cval)

                    def sampler(vol, m, out_buf, _run=run, _prep=prep):
                        del vol
                        return _run(_prep, m, out_buf)
                else:
                    run = plan_sampler(plan, self.cval)

                    def sampler(vol, m, _run=run, _prep=prep):
                        del vol  # the prepared layout stands in
                        return _run(_prep, m)

                self._variant_samplers[skey] = sampler
                # walk plans differ per matrix only in runtime payload
                # fields; keep the wrapper dict bounded anyway
                if len(self._variant_samplers) > 96:
                    for k in list(self._variant_samplers)[:32]:
                        del self._variant_samplers[k]
            return sampler

    # chunk sizes for grouped batch programs: each (group, size) pair is one
    # compiled program, so group remainders are padded UP to a ladder size
    # (with repeats of a real matrix, dropped afterwards) rather than
    # compiling a program per arbitrary n
    _BATCH_SIZES = (1, 2, 3, 4, 6, 8, 12, 16, 24, 32)

    def _grouped_batch(self, transform_ms, finalize=None):
        """Run a stack of matrices through per-group batched programs.

        Each matrix gets its own plan (sticky kernel reuse applies); matrices
        whose plans share a group key (same Mosaic binary + data layout) run
        together under ``lax.map`` with per-matrix runtime payloads -- the
        batched equivalent the reference's one-matrix-per-launch design
        couldn't express (``voltools/volume.py:61-91``).  Returns a list of
        per-matrix device arrays in input order."""
        import jax.numpy as jnp

        from .kernels.planner import (plan_batch_sampler, plan_group_key,
                                      plan_payload)
        from .transforms import select_variant

        from .kernels.planner import fit_payload, plan_cost, refit_to_group
        from .kernels.pallas_walk import WalkVariant

        plans = [select_variant(m, self.shape, self.interpolation,
                                self.mode, self._jdev)
                 for m in transform_ms]

        # prefer ONE batch-wide envelope plan: smooth sweeps (tilt series)
        # otherwise fragment across quantization boundaries into many small
        # batched programs, each paying launch+compile overhead.  The
        # envelope is accepted when its modeled cost is close to the mean
        # of the per-matrix optima (true for single-axis sweeps; random
        # orientation batches fail the envelope or the cost gate and fall
        # through to per-matrix grouping with refits).
        if all(isinstance(p, WalkVariant) for p in plans):
            env = select_variant(transform_ms, self.shape,
                                 self.interpolation, self.mode, self._jdev)
            if isinstance(env, WalkVariant) and plan_cost(env) <= \
                    1.5 * float(np.mean([plan_cost(p) for p in plans])):
                fits = [fit_payload(env, m, self.shape, self.interpolation,
                                    self.mode) for m in transform_ms]
                if all(f is not None for f in fits):
                    plans = fits

        # coalesce: per-matrix plan selection is free to pick any axis
        # permutation, which fragments groups; refit each matrix onto an
        # earlier group (same binary AND layout) when its geometry allows
        groups = {}
        reps = {}
        for i, p in enumerate(plans):
            if p is None:
                groups.setdefault(None, []).append(i)
                continue
            key = plan_group_key(p)
            if key not in groups:
                for gkey, rep in reps.items():
                    refit = refit_to_group(rep, p, transform_ms[i],
                                           self.shape, self.interpolation,
                                           self.mode)
                    if refit is not None:
                        plans[i] = refit
                        key = gkey
                        break
            groups.setdefault(key, []).append(i)
            reps.setdefault(key, plans[i])

        results = [None] * len(transform_ms)
        if finalize is None:
            def finalize(x):
                return x
        for key, idxs in groups.items():
            if key is None:
                for i in idxs:
                    results[i] = finalize(self._sampler(
                        self.data, jnp.asarray(transform_ms[i],
                                               jnp.float32)))
                continue
            rep = plans[idxs[0]]
            prep = self._prepared_source(rep)
            if len(idxs) < 4:
                # small groups aren't worth a dedicated batched program
                # (random orientations rarely share a layout); run them
                # through the per-matrix samplers, which share canonical
                # kernel binaries already
                for i in idxs:
                    sampler = self._device_sampler(transform_ms[i])
                    results[i] = finalize(sampler(
                        self.data, jnp.asarray(transform_ms[i],
                                               jnp.float32)))
                continue
            vol_bytes = 4 * int(np.prod(self.shape))
            allowed = max(1, self._BATCH_BYTES_BUDGET // vol_bytes)
            pos = 0
            while pos < len(idxs):
                rest = min(len(idxs) - pos, allowed)
                if rest >= self._BATCH_SIZES[-1]:
                    take, size = self._BATCH_SIZES[-1], self._BATCH_SIZES[-1]
                else:
                    # pad the remainder up to the next ladder size so the
                    # set of compiled (group, n) programs stays bounded
                    size = min(s for s in self._BATCH_SIZES if s >= rest)
                    if size > allowed:
                        # HBM byte budget caps the chunk: round DOWN to a
                        # ladder entry so the compiled-size set stays bounded
                        size = max(s for s in self._BATCH_SIZES
                                   if s <= allowed)
                    take = min(rest, size)
                chunk = idxs[pos:pos + take]
                padded = chunk + [chunk[-1]] * (size - take)
                payloads = jnp.stack([
                    plan_payload(transform_ms[i], plans[i]) for i in padded])
                with self._variant_lock:
                    skey = ("batch", key, size)
                    run = self._variant_samplers.get(skey)
                    if run is None:
                        run = plan_batch_sampler(rep, size, self.cval)
                        self._variant_samplers[skey] = run
                outs = run(prep, payloads)
                if chunk == list(range(chunk[0], chunk[0] + take)):
                    # contiguous chunk: hand the whole stacked block to the
                    # assembler (per-element slicing would dispatch one op
                    # per matrix -- ~30 ms each through an RPC tunnel)
                    results[chunk[0]] = ("block", take,
                                         finalize(outs[:take]))
                    for i in chunk[1:]:
                        results[i] = ("inblock",)
                else:
                    for j, i in enumerate(chunk):
                        results[i] = finalize(outs[j])
                pos += take
        return results

    # ------------------------------------------------------------------ core

    def affine(self, transform_m: np.ndarray, profile: bool = False,
               output=None) -> Union[np.ndarray, None]:
        """Apply a 4x4 pull-back matrix.  Per-call host->device traffic is the
        matrix only (reference ``volume.py:61-91``).

        ``output`` may be: None (return numpy), a numpy array to fill,
        ``'device'`` (return a fresh device array), or a **device array** of
        the volume's shape/dtype — the array is DONATED
        (``jax.jit(..., donate_argnums)``) so the result reuses its HBM
        instead of allocating a fresh buffer, and the new device array is
        returned.  This is the jax-native form of the reference's
        caller-provided GPU output (``volume.py:72-75``): chain
        ``out = sv.affine(m, output=out)`` for an allocation-free sweep.
        The donated array is consumed and must not be used afterwards."""
        _check_output_arg(output, self.device)
        if self.device == "cpu":
            return _affine_fn(self.data, transform_m,
                              interpolation=self._cpu_interp,
                              profile=profile, output=output, device="cpu",
                              mode=self.mode, cval=self.cval)

        import jax
        import jax.numpy as jnp
        donate = isinstance(output, jax.Array)
        if donate and (tuple(output.shape) != self.shape
                       or output.dtype != jnp.float32):
            raise ValueError(
                "device output buffer must match the volume's shape and be "
                f"float32, got {output.shape} {output.dtype}")
        sampler = self._device_sampler(transform_m, into=donate)
        timer = ProfileTimer() if profile else None
        if timer:
            timer.__enter__()
        try:
            if donate:
                result = sampler(self.data,
                                 jnp.asarray(transform_m, jnp.float32),
                                 output)
                if timer is not None:
                    # the profile contract covers the transform, not just
                    # its dispatch: complete device execution inside the
                    # timer bracket on the async (device-output) paths too
                    result.block_until_ready()
                return result
            result = sampler(self.data,
                             jnp.asarray(transform_m, jnp.float32))
            if isinstance(output, str) and output == "device":
                if timer is not None:
                    result.block_until_ready()
                return result
            result.block_until_ready()
        finally:
            if timer:
                timer.__exit__(None, None, None)
        return _finish(np.asarray(result), output)

    # keep the device output stack under ~2 GB so big sweeps don't exhaust HBM
    _BATCH_BYTES_BUDGET = 2 << 30

    def affine_batch(self, transform_ms: np.ndarray, profile: bool = False,
                     output=None):
        """Apply a stack of N matrices in one device program; returns
        (N, *shape).  TPU-only extension.  Large sweeps are chunked so the
        output stack stays within HBM (chunk size from _BATCH_BYTES_BUDGET);
        ``output='device'`` requires the whole stack to fit."""
        _check_output_arg(output, self.device, allow_donate=False)
        transform_ms = np.asarray(transform_ms, dtype=np.float32)
        if transform_ms.shape[0] == 0:
            # an empty sweep is an empty stack, not a numpy internals error
            if isinstance(output, str):
                import jax.numpy as jnp
                return jnp.zeros((0,) + self.shape, jnp.float32)
            empty = np.zeros((0,) + self.shape, np.float32)
            if output is None:
                return empty
            _finish(empty, output)
            return output if self.device == "cpu" else None
        if self.device == "cpu":
            timer = ProfileTimer() if profile else None
            if timer:
                timer.__enter__()
            try:
                result_np = np.stack([
                    _affine_fn(self.data, m, interpolation=self._cpu_interp,
                               device="cpu", mode=self.mode, cval=self.cval)
                    for m in transform_ms])
            finally:
                if timer:
                    timer.__exit__(None, None, None)
            # CPU parity: with output= the filled array is returned, like
            # every CPU path (reference transforms.py:159-162); only the
            # device branches return None (reference GPU branch :224-226).
            # _finish still validates the buffer shape.
            if output is None:
                return result_np
            _finish(result_np, output)
            return output
        import jax.numpy as jnp

        def assemble(results, expand, concat):
            parts = []
            i = 0
            while i < len(results):
                r = results[i]
                if isinstance(r, tuple) and r and r[0] == "block":
                    parts.append(r[2])
                    i += r[1]
                else:
                    parts.append(expand(r))
                    i += 1
            return parts[0] if len(parts) == 1 else concat(parts)

        timer = ProfileTimer() if profile else None
        if timer:
            timer.__enter__()
        try:
            # per-matrix plans, grouped into shared batched programs (each
            # group = one Mosaic binary + data layout; kappa/y_lo per matrix
            # ride in the runtime payload)
            if isinstance(output, str) and output == "device":
                result = assemble(self._grouped_batch(transform_ms),
                                  lambda r: jnp.expand_dims(r, 0),
                                  jnp.concatenate)
                if timer is not None:
                    # profile covers execution, not dispatch (see affine())
                    result.block_until_ready()
                return result
            # host return: materialize each chunk's results immediately so
            # the device never holds more than one chunk of output stack
            result_np = assemble(
                self._grouped_batch(transform_ms, finalize=np.asarray),
                lambda r: r[None], np.concatenate)
        finally:
            if timer:
                timer.__exit__(None, None, None)
        return _finish(result_np, output)

    # ------------------------------------------------------------- transforms

    def transform(self, scale: Triple = None, shear: Triple = None,
                  rotation: Triple = None, rotation_units: str = "deg",
                  rotation_order: str = "rzxz",
                  translation: Triple = None, center: Triple = None,
                  profile: bool = False, output=None):
        if center is None:
            center = np.divide(np.subtract(self.shape, 1), 2, dtype=np.float32)
        m = transform_matrix(_as_triple(scale), _as_triple(shear),
                             _as_triple(rotation), rotation_units,
                             rotation_order, _as_triple(translation),
                             _as_triple(center))
        return self.affine(m, profile, output)

    def translate(self, translation, profile: bool = False, output=None):
        return self.affine(translation_matrix(translation), profile, output)

    def shear(self, coefficients: Triple, profile: bool = False, output=None):
        return self.affine(shear_matrix(_as_triple(coefficients)), profile,
                           output)

    def scale(self, coefficients: Triple, profile: bool = False, output=None):
        return self.affine(scale_matrix(_as_triple(coefficients)), profile,
                           output)

    def rotate(self, rotation, rotation_units: str = "deg",
               rotation_order: str = "rzxz", profile: bool = False,
               output=None):
        m = rotation_matrix(rotation=rotation, rotation_units=rotation_units,
                            rotation_order=rotation_order)
        return self.affine(m, profile, output)
