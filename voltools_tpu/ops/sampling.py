"""Affine resampling: pull-back coordinate grids + interpolation.

``affine_sample`` is the jit-friendly functional core of the library: the
TPU-native equivalent of the reference's generated CUDA ``transform`` kernel
(``voltools/transforms.py:232-287``).  Instead of a grid-stride loop over
flat voxel ids with texture fetches, the coordinate grid is expressed with
broadcasted iotas (fused by XLA) and interpolation is a vectorised gather.

All functions take the 4x4 **pull-back** matrix convention used by scipy and
the reference: ``src = m[:3, :3] @ out + m[:3, 3]``.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .interpolation import sample


def affine_coords(out_shape: Tuple[int, int, int], matrix) -> jnp.ndarray:
    """Source coordinates for every output voxel; shape (3, *out_shape)."""
    m = jnp.asarray(matrix, dtype=jnp.float32)
    d0, d1, d2 = out_shape
    i = jax.lax.broadcasted_iota(jnp.float32, out_shape, 0)
    j = jax.lax.broadcasted_iota(jnp.float32, out_shape, 1)
    k = jax.lax.broadcasted_iota(jnp.float32, out_shape, 2)
    coords = [m[a, 0] * i + m[a, 1] * j + m[a, 2] * k + m[a, 3] for a in range(3)]
    return jnp.stack(coords)


def affine_sample(volume, matrix, interpolation: str = "linear",
                  mode: str = "constant", cval: float = 0.0,
                  prefiltered: bool = False,
                  out_shape: Tuple[int, int, int] = None):
    """Resample ``volume`` through the pull-back ``matrix``.

    Pure function of jax arrays — safe to ``jit``/``vmap``/differentiate.
    """
    volume = jnp.asarray(volume, jnp.float32)
    if out_shape is None:
        out_shape = volume.shape
    coords = affine_coords(out_shape, matrix)
    return sample(volume, coords, interpolation, mode, cval, prefiltered)


def map_coordinates(volume, coords, interpolation: str = "linear",
                    mode: str = "constant", cval: float = 0.0,
                    prefiltered: bool = False):
    """Sample a volume at arbitrary coordinates (scipy map_coordinates
    analogue with the library's interpolation modes).  ``coords``: (3, ...)."""
    volume = jnp.asarray(volume, jnp.float32)
    coords = jnp.asarray(coords, jnp.float32)
    return sample(volume, coords, interpolation, mode, cval, prefiltered)


def affine_sample_batch(volume, matrices, interpolation: str = "linear",
                        mode: str = "constant", cval: float = 0.0,
                        prefiltered: bool = False):
    """Apply N pull-back matrices to one volume in a single fused program.

    A capability the reference's one-matrix-per-kernel-launch design could
    not offer; on TPU it amortises the volume reads across transforms.
    Returns an array of shape (N, *volume.shape).
    """
    fn = lambda m: affine_sample(volume, m, interpolation, mode, cval, prefiltered)
    return jax.vmap(fn)(jnp.asarray(matrices, jnp.float32))
