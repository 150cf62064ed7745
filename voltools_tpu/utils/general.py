"""Device registry, reshape geometry, and profiling helpers.

TPU-native replacements for the reference's CUDA device/launch utilities
(``voltools/utils/general.py``):

* ``get_available_devices`` enumerates ``'cpu'`` plus JAX accelerators as
  ``'tpu'`` / ``'tpu:N'`` (mirroring the reference's ``'gpu'`` / ``'gpu:N'``
  registry, reference ``general.py:61-80``).  A ``'jax'`` alias always maps to
  the default JAX backend so the accelerated path can be exercised on any
  host (including the CPU-emulated meshes used in tests).
* There is no launch-dimension math here: on TPU, XLA/Mosaic own scheduling.
* ``compute_post_transform_dimensions`` re-derives the ``reshape=True``
  bounding-box geometry (reference ``general.py:92-123``).
"""

from __future__ import annotations

import time
import warnings
from typing import Tuple

import numpy as np


def _jax():
    import jax  # deferred so 'cpu'-only use never initialises a backend
    return jax


def get_available_devices():
    """List usable device strings: always ['cpu', ...]; adds 'jax' plus
    'tpu'/'tpu:N' entries when an accelerator backend is present."""
    devices = ["cpu"]
    try:
        jax = _jax()
        jax_devices = jax.devices()
    except Exception as e:  # pragma: no cover - no usable jax backend at all
        try:
            warnings.warn("no usable JAX backend found "
                          f"({type(e).__name__}: {e}); only 'cpu' is "
                          "available.", RuntimeWarning, stacklevel=2)
        except Exception:
            # warning filters may escalate warnings to exceptions
            # (python -W error); the ['cpu'] fallback contract must hold
            pass
        return devices

    devices.append("jax")
    platform = jax_devices[0].platform if jax_devices else "cpu"
    if _is_tpu_platform(platform):
        devices.append("tpu")
        for i, _ in enumerate(jax_devices):
            devices.append(f"tpu:{i}")
    return devices


def _is_tpu_platform(platform: str) -> bool:
    """True only for TPU-family platforms.  'tpu' is a contract: on a
    CUDA/ROCm/Metal host ``device='tpu'`` must NOT silently bind a GPU --
    the generic accelerator alias there is ``'jax'``.  Remote-TPU plugins
    (e.g. this rig's tunnel) report ``platform == 'tpu'`` too; experimental
    ones that embed 'tpu' in the name are also accepted."""
    return "tpu" in platform.lower()


def resolve_device(device: str):
    """Map a device string to a concrete jax.Device (or None for 'cpu')."""
    if device == "cpu":
        return None
    jax = _jax()
    if device == "jax":
        return jax.devices()[0]
    if device == "tpu" or device.startswith("tpu:"):
        jax_devices = jax.devices()
        if not _is_tpu_platform(jax_devices[0].platform):
            raise ValueError("No TPU backend available; use device='cpu' or 'jax'")
        if device == "tpu":
            idx = 0
        else:
            try:
                # 'tpu:' (empty ordinal) and 'tpu:x' are malformed, not tpu:0
                idx = int(device[4:])
            except ValueError:
                raise ValueError(f"Unknown device string: {device!r}") \
                    from None
        if not 0 <= idx < len(jax_devices):
            raise ValueError(
                f"Unknown device ({device!r}): only {len(jax_devices)} TPU "
                f"device(s) present (tpu:0..tpu:{len(jax_devices) - 1})")
        return jax_devices[idx]
    raise ValueError(f"Unknown device string: {device!r}")


def compute_post_transform_dimensions(
        shape: Tuple[int, int, int],
        transform_m: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Padding and output shape needed so the transformed volume fits fully.

    Pushes the 8 corners of the volume's bounding box through the *forward*
    map (inverse of the pull-back matrix) and derives per-axis padding.
    Returns ``(pad_before, pad_after, new_dims)`` as int arrays of length 3.
    """
    d0, d1, d2 = shape
    corners = np.array(
        [[z, y, x, 1.0] for z in (0, d0) for y in (0, d1) for x in (0, d2)],
        dtype=np.float64).T  # (4, 8)

    try:
        forward = np.linalg.inv(np.asarray(transform_m, dtype=np.float64))
    except np.linalg.LinAlgError:
        raise np.linalg.LinAlgError(
            "transform matrix is singular; cannot derive reshape geometry")

    moved = np.round(forward @ corners).astype(int)  # (4, 8)
    dims = np.array([d0, d1, d2, 1])

    pad_before = -np.minimum(moved, 0).min(axis=1)
    overhang = np.maximum(moved - dims[:, None], 0).max(axis=1)
    new_dims = pad_before + dims + overhang
    return pad_before[:3], overhang[:3], new_dims[:3]


class ProfileTimer:
    """Wall-clock bracket that prints in the reference's format
    ('transform finished in X.XXXms', reference ``transforms.py:157,219``)."""

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        elapsed_ms = (time.perf_counter() - self._t0) * 1000.0
        print(f"transform finished in {elapsed_ms:.3f}ms")
        return False
