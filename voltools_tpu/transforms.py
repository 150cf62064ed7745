"""Public one-shot transform API.

Mirrors the reference surface (``voltools/transforms.py``): ``transform``,
``affine``, ``translate``, ``shear``, ``scale``, ``rotate``, each accepting
``interpolation``, ``reshape``, ``profile``, ``output`` and ``device``.

Device strings:

* ``'cpu'``            — scipy.ndimage reference path (reference
  ``transforms.py:120-162``).
* ``'tpu'``/``'tpu:N'`` — the JAX/XLA(+Pallas) accelerated path on a specific
  TPU chip (equivalent of the reference's ``'gpu'``/``'gpu:N'``).
* ``'jax'``            — the default JAX backend, whatever it is; lets the
  accelerated code path run on hosts without a TPU attached.

Output semantics (a deliberate deviation from the reference, which both
overwrote its input device array and returned host numpy — see
``transforms.py:207-223`` there): inputs are **never mutated**.  By default a
host ``numpy.ndarray`` is returned.  Passing ``output=<numpy array>`` fills
that array in place; the CPU path then returns the filled array and device
paths return ``None`` — exactly the reference's split (its CPU branch returns
``output`` at ``transforms.py:159-162``, its GPU branch ``None`` at
``transforms.py:224-226``).  Passing ``output='device'`` returns the device
array without a device-to-host copy — the functional analogue of the
reference's caller-provided GPU output buffer.
"""

from __future__ import annotations

import functools
import numbers
import threading
from typing import Tuple, Union

import numpy as np

from .ops.interpolation import (AVAILABLE_INTERPOLATIONS, MODES,
                                needs_prefilter, spline_order)
from .utils import (
    ProfileTimer,
    compute_post_transform_dimensions,
    get_available_devices,
    resolve_device,
    rotation_matrix,
    scale_matrix,
    shear_matrix,
    transform_matrix,
    translation_matrix,
)

Triple = Union[float, Tuple[float, float, float], np.ndarray]


@functools.lru_cache(maxsize=1)
def _devices_probe():
    # computed lazily so `import voltools_tpu` never initializes a jax
    # backend (device='cpu' users pay nothing)
    return get_available_devices()


def _devices():
    devs = _devices_probe()
    if "jax" not in devs:
        # broken-backend fallback (bare ['cpu']): don't freeze it for the
        # process lifetime — the backend may come up later (transient
        # tunnel/plugin failures), so let the next construction re-probe
        _devices_probe.cache_clear()
    # a copy: the cached list must not be corruptible through the public
    # AVAILABLE_DEVICES attribute (devs.remove(...) would otherwise break
    # device validation for the rest of the process)
    return list(devs)


def __getattr__(name):
    if name == "AVAILABLE_DEVICES":
        return _devices()
    raise AttributeError(name)


def _as_triple(value):
    # numbers.Number catches numpy scalars (np.float32(2.0) is not a
    # Python float, so a bare isinstance(int, float) check would skip
    # the expansion and crash later in the matrix builders); a 0-d numpy
    # array (np.array(1.5)) is not a Number but is a scalar all the same
    if isinstance(value, numbers.Number) or (
            isinstance(value, np.ndarray) and value.ndim == 0):
        return (float(value),) * 3
    return value


def _finish(result_np, output):
    if output is None:
        return result_np
    # exact-shape check: np.copyto would happily *broadcast* a result
    # into a wrong-shaped buffer (e.g. a (N,D,H,W) stack buffer),
    # silently replicating one transform into every slice.  The scipy
    # CPU path raises for a shape mismatch; the device path must too.
    if tuple(output.shape) != tuple(result_np.shape):
        raise ValueError(
            f"output shape {tuple(output.shape)} does not match result "
            f"shape {tuple(result_np.shape)}")
    if not np.can_cast(result_np.dtype, output.dtype, casting="same_kind"):
        # a clear error instead of np.copyto's raw TypeError (an int
        # buffer would silently truncate float results if force-cast)
        raise ValueError(
            f"output dtype {output.dtype} cannot hold {result_np.dtype} "
            f"results without unsafe casting")
    np.copyto(output, result_np)
    return None


def _affine_cpu(volume, transform_m, interpolation, reshape, output,
                backend: str = "scipy", mode: str = "constant",
                cval: float = 0.0):
    if backend not in ("scipy", "native"):
        raise ValueError(
            f"cpu_backend must be 'scipy' or 'native', got {backend!r}")
    if mode == "border" and backend != "native":
        # scipy has no texture-border mode; the native backend implements it
        from . import native
        if not native.available():
            raise ValueError(
                "mode='border' on device='cpu' requires the native backend "
                "(cpu_backend='native'), which is unavailable on this host")
        backend = "native"
    order = spline_order(interpolation)
    prefilter = needs_prefilter(interpolation)

    if reshape:
        pad_before, _, output_shape = compute_post_transform_dimensions(
            volume.shape, transform_m)
        # scipy pads implicitly via output_shape; shift the map so the
        # original content lands pad_before voxels in.
        transform_m = transform_m @ translation_matrix(pad_before,
                                                       np.asarray(transform_m).dtype)
        output_shape = tuple(int(d) for d in output_shape)
    else:
        output_shape = volume.shape

    # same error class as the device path's _finish (scipy would raise a
    # RuntimeError for the same user mistake; native would write through
    # a wrong-shaped buffer)
    if isinstance(output, np.ndarray) and (
            tuple(output.shape) != tuple(output_shape)):
        raise ValueError(
            f"output shape {tuple(output.shape)} does not match result "
            f"shape {tuple(output_shape)}")

    if backend == "native":
        from . import native
        out = native.affine_transform(
            volume, transform_m, interpolation, mode=mode, cval=cval,
            out_shape=output_shape,
            output=output if isinstance(output, np.ndarray) else None)
        # reference CPU parity: with output= the filled array is returned
        # (reference transforms.py:159-162); only device paths return None
        return output if isinstance(output, np.ndarray) else out

    from scipy.ndimage import affine_transform
    out = affine_transform(volume, transform_m, output_shape=output_shape,
                           output=output if isinstance(output, np.ndarray) else None,
                           order=order, prefilter=prefilter, cval=cval)
    if isinstance(output, np.ndarray):
        return output
    return out


@functools.lru_cache(maxsize=64)
def _jitted_affine(interpolation: str, mode: str, cval: float,
                   variant, device, out_shape=None):
    """Per-(config, device) compiled sampler; the volume and matrix stay as
    traced arguments so repeated calls with new matrices reuse the binary.
    ``variant`` is a pallas kernel config (or None for the XLA path)."""
    import jax

    del device  # part of the cache key; placement is via device_put on args

    from .kernels.pallas_walk import WalkVariant
    from .ops.interpolation import needs_prefilter

    if isinstance(variant, WalkVariant):
        # one-shot fast path: the whole chain (prefilter + prepare + kernel
        # + unblock) as ONE fused device program -- the analogue of the
        # reference's single cp_transform launch.  Population-capped: a
        # sticky-fit sweep rotating through permutations falls back to the
        # eagerly-composed stages below, which share one Mosaic binary per
        # canonical form across permutations.
        from .kernels.pallas_walk import (_eager_walk_sampler,
                                          oneshot_walk_sampler)
        fused = oneshot_walk_sampler(variant, cval,
                                     needs_prefilter(interpolation))
        if fused is not None:
            return fused
        # eager composition of independently-cached jitted stages: the
        # expensive Mosaic binary is shared by every variant with the same
        # canonical form, so angle sweeps don't recompile per orientation
        return _eager_walk_sampler(variant, cval,
                                   needs_prefilter(interpolation))

    def run(volume, matrix):
        if variant is not None:
            from .kernels.planner import plan_sample
            if needs_prefilter(interpolation):
                from .ops.prefilter import bspline_prefilter
                volume = bspline_prefilter(volume)
            return plan_sample(volume, matrix, variant, cval)
        from .ops.sampling import affine_sample
        return affine_sample(volume, matrix, interpolation, mode, cval,
                             out_shape=out_shape)

    return jax.jit(run)


def _pick_impl(device) -> str:
    """'pallas' on TPU-family platforms, 'xla' elsewhere (the Mosaic kernel
    cannot compile for CPU or CUDA/ROCm backends)."""
    if device is None:
        return "xla"
    platform = device.platform
    if platform in ("cpu", "cuda", "gpu", "rocm", "metal"):
        return "xla"
    return "pallas"


class PerformanceFallbackWarning(RuntimeWarning):
    """A transform left the Pallas kernel regime and ran on the (much slower)
    XLA gather path.  Silenceable via the warnings module; see
    :func:`last_dispatch` for per-call dispatch introspection."""


_RECENT_VARIANTS: list = []   # small MRU of compiled kernel configs
_PLAN_CACHE: dict = {}        # exact-matrix plan memo (repeated sweeps)
_VARIANT_LOCK = threading.Lock()
_LAST_DISPATCH = threading.local()


def _record_dispatch(**info):
    _LAST_DISPATCH.info = info


def _plan_cache_put(mkey, plan):
    """Insert under _VARIANT_LOCK (held by the caller); on overflow evict the
    oldest half FIRST so the fresh entry survives."""
    if len(_PLAN_CACHE) >= 4096:
        for k in list(_PLAN_CACHE)[:2048]:
            del _PLAN_CACHE[k]
    _PLAN_CACHE[mkey] = plan


def last_dispatch():
    """Diagnostics: a dict describing how the calling thread's most recent
    accelerated transform was served — ``{'impl': 'pallas'|'xla',
    'variant': Variant|None, 'reason': str}``.  Lets a user sweeping random
    orientations see which tier (and kernel config) served each call."""
    return getattr(_LAST_DISPATCH, "info", None)


def select_variant(transform_m, vol_shape, interpolation, mode, device,
                   out_shape=None):
    """Host-side pallas kernel config for a concrete matrix, or None.

    Recently-compiled variants are reused when their envelope covers the
    matrix, so one-shot calls over an angle sweep share kernels.  A regime
    fallback (matrix outside every variant's window budget) emits one
    :class:`PerformanceFallbackWarning` so sweeps aren't mysteriously slow."""
    if _pick_impl(device) != "pallas":
        _record_dispatch(impl="xla", variant=None,
                         reason="non-TPU backend")
        return None
    try:
        from .kernels.pallas_affine import Variant, variant_cost
        from .kernels.planner import choose_plan, plan_covers
        m = np.asarray(transform_m, np.float64)
        # exact-matrix memo: repeated sweeps (tilt series per tomogram,
        # benchmark loops) skip planning entirely on the second pass
        mkey = (m.tobytes(), tuple(vol_shape), interpolation, mode,
                None if out_shape is None else tuple(out_shape))
        with _VARIANT_LOCK:
            if mkey in _PLAN_CACHE:
                cached = _PLAN_CACHE[mkey]
                _record_dispatch(impl="pallas" if cached is not None
                                 else "xla", variant=cached,
                                 reason="memoized plan")
                return cached
        variant = choose_plan(m, vol_shape, interpolation, mode,
                              out_shape=out_shape)
        if isinstance(variant, Variant):
            # cost-gated reuse for select-tree variants: a cached envelope
            # that covers the matrix may still scan a much larger window
            # than the tight optimum, so reuse only within 1.35x of it
            # (walk plans handle reuse inside choose_plan via sticky fits)
            budget = 1.35 * variant_cost(variant)
            with _VARIANT_LOCK:
                for cached in _RECENT_VARIANTS:
                    if (isinstance(cached, Variant)
                            and variant_cost(cached) <= budget
                            and plan_covers(cached, m, vol_shape,
                                            interpolation, mode,
                                            out_shape=out_shape)):
                        _record_dispatch(impl="pallas", variant=cached,
                                         reason="cached variant envelope")
                        _plan_cache_put(mkey, cached)
                        return cached
        with _VARIANT_LOCK:
            _plan_cache_put(mkey, variant)
        if variant is not None:
            with _VARIANT_LOCK:
                _RECENT_VARIANTS.append(variant)
                del _RECENT_VARIANTS[:-32]
            _record_dispatch(impl="pallas", variant=variant,
                             reason="new variant")
        else:
            import warnings
            _record_dispatch(impl="xla", variant=None,
                             reason="matrix outside kernel regime")
            warnings.warn(
                "transform matrix is outside the Pallas kernel regime; "
                "running on the XLA gather path, which is much slower "
                "(see voltools_tpu.last_dispatch() for details)",
                PerformanceFallbackWarning, stacklevel=3)
        return variant
    except Exception as exc:
        # fall back to the XLA path, but never silently: a bug here would
        # otherwise just make everything mysteriously slow
        import warnings
        _record_dispatch(impl="xla", variant=None,
                         reason=f"variant selection failed: {exc!r}")
        warnings.warn(f"pallas variant selection failed ({exc!r}); "
                      f"falling back to the XLA sampler", RuntimeWarning)
        return None


def _affine_jax(volume, transform_m, interpolation, reshape, output,
                device_str, mode="constant", cval=0.0):
    import jax
    import jax.numpy as jnp

    device = resolve_device(device_str)
    transform_m = np.asarray(transform_m, dtype=np.float32)

    out_shape = None
    if reshape:
        # sample the ORIGINAL volume onto a larger output grid with the map
        # shifted by pad_before — same geometry as the scipy branch, so edge
        # semantics stay identical (the reference instead zero-padded the
        # device volume, transforms.py:171-178, making its GPU reshape edges
        # blend where its CPU ones clipped)
        pad_before, _, new_dims = compute_post_transform_dimensions(
            volume.shape, transform_m)
        transform_m = transform_m @ translation_matrix(pad_before,
                                                       transform_m.dtype)
        out_shape = tuple(int(d) for d in new_dims)

    vol = jax.device_put(jnp.asarray(volume, jnp.float32), device)
    # reshape runs through the same kernels: the variant is chosen for the
    # enlarged output grid with the pad-shifted matrix (the reference ran
    # its one kernel for reshape too, transforms.py:171-212 there)
    variant = select_variant(transform_m, vol.shape, interpolation, mode,
                             device, out_shape=out_shape)
    fn = _jitted_affine(interpolation, mode, float(cval), variant, device,
                        out_shape)
    result = fn(vol, jnp.asarray(transform_m))

    if isinstance(output, str) and output == "device":
        return result
    result.block_until_ready()
    return _finish(np.asarray(result), output)


def affine(volume: np.ndarray,
           transform_m: np.ndarray,
           interpolation: str = "linear",
           reshape: bool = False,
           profile: bool = False,
           output=None,
           device: str = "cpu",
           mode: str = "constant",
           cval: float = 0.0,
           cpu_backend: str = "scipy"):
    """Apply a 4x4 pull-back matrix to a 3-D volume.

    Central dispatcher, the analogue of reference ``transforms.py:109-229``.
    ``cpu_backend='native'`` uses the multithreaded C++ resampler instead of
    scipy on the CPU path (identical semantics; coordinate rounding can
    differ at exactly-integer source coordinates).
    """
    if volume.ndim != 3:
        raise ValueError("Expected a 3D array")
    if interpolation not in AVAILABLE_INTERPOLATIONS:
        raise ValueError(
            f"Interpolation must be one of {AVAILABLE_INTERPOLATIONS}")
    if mode not in MODES:
        raise ValueError(f"mode must be one of {MODES}, got {mode!r}")
    if device not in _devices():
        raise ValueError(
            f"Unknown device ({device}), must be one of {_devices()}")
    if output is not None and not (isinstance(output, np.ndarray)
                                   or (isinstance(output, str)
                                       and output == "device")):
        raise ValueError(
            "output must be None, a numpy array to fill, or 'device' to keep "
            "the result on the accelerator (jax arrays are immutable; for "
            "allocation-free device-output sweeps pass a device array to "
            "StaticVolume.affine(output=...), which donates its buffer)")

    timer = ProfileTimer() if profile else None
    if timer:
        timer.__enter__()
    try:
        if device == "cpu":
            if isinstance(output, str):
                raise ValueError("output='device' requires a jax device")
            return _affine_cpu(volume, transform_m, interpolation, reshape,
                               output, cpu_backend, mode, cval)
        result = _affine_jax(volume, transform_m, interpolation, reshape,
                             output, device, mode, cval)
        if timer is not None and hasattr(result, "block_until_ready"):
            # output='device' returns without a host copy; the profile
            # contract (reference transforms.py:157,219: the printed ms
            # covers the transform) requires completing device execution
            # inside the timer bracket, not just dispatch
            result.block_until_ready()
        return result
    finally:
        if timer:
            timer.__exit__(None, None, None)


def transform(volume: np.ndarray,
              scale: Triple = None,
              shear: Triple = None,
              rotation: Triple = None,
              rotation_units: str = "deg",
              rotation_order: str = "rzxz",
              translation: Triple = None,
              center: Triple = None,
              interpolation: str = "linear",
              reshape: bool = False,
              profile: bool = False,
              output=None,
              device: str = "cpu",
              mode: str = "constant",
              cval: float = 0.0):
    """Compose scale/shear/rotation/translation about ``center`` and apply.

    ``center`` defaults to the volume midpoint ``(shape - 1) / 2``
    (reference ``transforms.py:38-39``).
    """
    if center is None:
        center = np.divide(np.subtract(volume.shape, 1), 2, dtype=np.float32)
    # every Triple-typed parameter accepts a scalar (uniform expansion),
    # not just scale/shear — the matrix builders index [0:3]
    m = transform_matrix(_as_triple(scale), _as_triple(shear),
                         _as_triple(rotation), rotation_units, rotation_order,
                         _as_triple(translation), _as_triple(center))
    return affine(volume, m, interpolation, reshape, profile, output, device,
                  mode, cval)


def translate(volume: np.ndarray,
              translation: Tuple[float, float, float],
              interpolation: str = "linear",
              reshape: bool = False,
              profile: bool = False,
              output=None,
              device: str = "cpu",
              **kw):
    return affine(volume, translation_matrix(translation), interpolation,
                  reshape, profile, output, device, **kw)


def shear(volume: np.ndarray,
          coefficients: Triple,
          interpolation: str = "linear",
          reshape: bool = False,
          profile: bool = False,
          output=None,
          device: str = "cpu",
          **kw):
    return affine(volume, shear_matrix(_as_triple(coefficients)), interpolation,
                  reshape, profile, output, device, **kw)


def scale(volume: np.ndarray,
          coefficients: Triple,
          interpolation: str = "linear",
          reshape: bool = False,
          profile: bool = False,
          output=None,
          device: str = "cpu",
          **kw):
    return affine(volume, scale_matrix(_as_triple(coefficients)), interpolation,
                  reshape, profile, output, device, **kw)


def rotate(volume: np.ndarray,
           rotation: Tuple[float, float, float],
           rotation_units: str = "deg",
           rotation_order: str = "rzxz",
           interpolation: str = "linear",
           reshape: bool = False,
           profile: bool = False,
           output=None,
           device: str = "cpu",
           **kw):
    """Rotate about the origin (no implicit centering — use ``transform`` for
    center-relative rotation, reference ``transforms.py:95-106``)."""
    m = rotation_matrix(rotation=rotation, rotation_units=rotation_units,
                        rotation_order=rotation_order)
    return affine(volume, m, interpolation, reshape, profile, output, device, **kw)
