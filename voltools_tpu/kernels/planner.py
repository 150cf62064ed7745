"""Unified kernel planning: pick the right Pallas kernel for a matrix.

Two TPU kernels cover complementary regimes of the transform space (the
reference's single CUDA kernel leaned on the texture unit for both —
``voltools/transforms.py:232-287``):

* :mod:`.pallas_affine` — axis-dominant matrices (translations, scales,
  shears, single-axis rotations, small/medium general rotations).  Per
  output tile it selects rows out of a bounded source slab; cost grows with
  the slab's row count, so it has a hard regime boundary.
* :mod:`.pallas_walk` — general 3-D rotations.  Per output vreg it walks
  the z-planes of the footprint; cost is O(planes x taps), independent of
  how slanted the footprint is.

The planner tiers them: an *unrolled* affine variant (the fast, small-window
tier) wins when it exists; otherwise the plane walk; otherwise the affine
kernel's fori-loop tier (bigger slabs, slower but still far ahead of XLA's
gather path); otherwise ``None`` and the caller falls back to XLA.
"""

from __future__ import annotations

from typing import Optional, Union

from .pallas_affine import (Variant, affine_sample_pallas_variant,
                            choose_variant, variant_covers)
from .pallas_walk import (WalkVariant, affine_sample_pallas_walk,
                          choose_walk_variant, known_canonicals,
                          prepare_walk_volume, walk_layout_key,
                          walk_sample_prepared, walk_variant_covers)

Plan = Union[Variant, WalkVariant]


def choose_plan(matrix, vol_shape, interpolation: str,
                mode: str = "constant") -> Optional[Plan]:
    """Pick a kernel plan for ``matrix`` ((4,4) or (N,4,4) envelope).

    The walk chooser is seeded with the already-compiled canonical forms so
    orientation sweeps stick to existing Mosaic binaries when one is within
    a modest cost factor of the per-matrix optimum."""
    variant = choose_variant(matrix, vol_shape, interpolation, mode)
    if variant is not None and variant.unroll:
        return variant
    # sticky=3: a Mosaic compile costs ~13 s while a 2x-cost kernel costs
    # ~15 ms extra per call -- reuse wins for any sweep under ~900 calls
    walk = choose_walk_variant(matrix, vol_shape, interpolation, mode,
                               known=known_canonicals(), sticky=3.0)
    if walk is not None:
        return walk
    return variant


def plan_covers(plan: Plan, matrix, vol_shape, interpolation: str,
                mode: str = "constant") -> bool:
    """True when a compiled plan's envelope covers ``matrix``."""
    if isinstance(plan, WalkVariant):
        return walk_variant_covers(plan, matrix, vol_shape, interpolation,
                                   mode)
    return variant_covers(plan, matrix, vol_shape, interpolation, mode)


def plan_sample(volume, matrix, plan: Plan, cval: float = 0.0):
    """Run the plan's kernel on an unprepared source volume."""
    if isinstance(plan, WalkVariant):
        return affine_sample_pallas_walk(volume, matrix, plan, cval)
    return affine_sample_pallas_variant(volume, matrix, plan, cval)


def plan_layout_key(plan: Plan):
    """Hashable key of the prepared-source layout (None when the plan's
    kernel takes the volume as-is)."""
    if isinstance(plan, WalkVariant):
        return walk_layout_key(plan)
    return None


def plan_prepare(volume, plan: Plan):
    """Build the plan's prepared source layout (identity for plans whose
    kernel reads the raw volume)."""
    if isinstance(plan, WalkVariant):
        return prepare_walk_volume(volume, plan)
    return volume


def plan_sample_prepared(prepared, matrix, plan: Plan, cval: float = 0.0):
    """Run the plan's kernel on a prepared source layout."""
    if isinstance(plan, WalkVariant):
        return walk_sample_prepared(prepared, matrix, plan, cval)
    return affine_sample_pallas_variant(prepared, matrix, plan, cval)


def plan_sampler(plan: Plan, cval: float = 0.0):
    """A callable ``(prepared, matrix) -> output`` with caching appropriate
    to the plan's kernel.

    Walk plans compose independently-cached jitted stages, so the expensive
    Mosaic binary is shared across every variant with the same canonical
    form (an angle sweep re-traces only the cheap data-movement ends).
    Select-tree plans are wrapped in a single jit (their kernel is already
    specialized per variant)."""
    if isinstance(plan, WalkVariant):
        def run(prepared, matrix):
            return walk_sample_prepared(prepared, matrix, plan, cval)
        return run
    import jax

    return jax.jit(lambda vol, m: affine_sample_pallas_variant(
        vol, m, plan, cval))
