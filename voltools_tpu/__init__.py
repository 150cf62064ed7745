"""voltools_tpu — TPU-native 3D affine volume transforms.

A ground-up JAX/XLA/Pallas re-design of the capabilities of ``voltools``
(CUDA-accelerated 3D affine transformations): five interpolation modes
(trilinear + four cubic B-spline variants), a one-shot functional API, a
device-resident ``StaticVolume`` for repeated transforms, batched and
multi-chip sharded execution, and a scipy CPU fallback.
"""

from .transforms import (
    PerformanceFallbackWarning,
    affine,
    last_dispatch,
    rotate,
    scale,
    shear,
    transform,
    translate,
)


def __getattr__(name):
    # lazy: enumerating devices initializes the jax backend, which pure-CPU
    # users should never pay for at import time
    if name == "AVAILABLE_DEVICES":
        from .transforms import _devices
        return _devices()
    raise AttributeError(name)
from .ops.interpolation import AVAILABLE_INTERPOLATIONS
from .volume import StaticVolume
from . import ops, utils

__version__ = "0.6.0"

__all__ = [
    "transform",
    "affine",
    "rotate",
    "scale",
    "shear",
    "translate",
    "StaticVolume",
    "PerformanceFallbackWarning",
    "last_dispatch",
    "AVAILABLE_INTERPOLATIONS",
    "AVAILABLE_DEVICES",
    "ops",
    "utils",
    "__version__",
]
