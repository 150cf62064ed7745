"""Pallas TPU fast path for affine resampling (hot kernel).

Placeholder wiring: the XLA gather path is the current implementation while
the Mosaic kernel is developed.  ``PALLAS_AVAILABLE`` gates dispatch from
:mod:`voltools_tpu.transforms`.
"""

from __future__ import annotations

PALLAS_AVAILABLE = False


def affine_sample_pallas(volume, matrix, interpolation="linear",
                         mode="constant", cval=0.0, prefiltered=False):
    from ..ops.sampling import affine_sample
    return affine_sample(volume, matrix, interpolation, mode, cval,
                         prefiltered=prefiltered)
