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

The planner tiers them: the plane walk wins whenever a walk variant exists
(measured faster than the select-tree across every regime and size where
both apply -- e.g. 250^3 translate 2.2 vs 5.4 ms, single-axis cubic 10.9 vs
29.4 ms; its per-vreg work scales with the footprint's plane count rather
than the window's row count); the select-tree covers what the walk can't
(volumes too small for its bands, plus its fori-loop tier for odd shapes);
otherwise ``None`` and the caller falls back to XLA.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np

from .pallas_affine import (Variant, affine_sample_pallas_variant,
                            choose_variant, variant_covers)
from .pallas_walk import (WalkVariant, affine_sample_pallas_walk,
                          choose_walk_variant, known_canonicals,
                          prepare_walk_volume, walk_layout_key,
                          walk_sample_prepared, walk_variant_covers)

Plan = Union[Variant, WalkVariant]


def choose_plan(matrix, vol_shape, interpolation: str,
                mode: str = "constant", out_shape=None,
                sticky: Optional[float] = 3.0) -> Optional[Plan]:
    """Pick a kernel plan for ``matrix`` ((4,4) or (N,4,4) envelope).

    The walk chooser is seeded with the already-compiled canonical forms so
    orientation sweeps stick to existing Mosaic binaries when one is within
    ``sticky`` x the per-matrix optimum's modeled cost (a Mosaic compile
    costs ~13 s, so reuse wins for sweeps up to thousands of calls).  Pass
    ``sticky=None`` to always take the tight per-matrix optimum (steady-
    state benchmarking; latency-insensitive long-running services)."""
    known = known_canonicals() if sticky is not None else ()
    # sticky=None (tight mode) also disables the parameter-quantization
    # ladders: no binary sharing is wanted, so each matrix gets its exact
    # hz/slop/y_lo (the ladders otherwise pad the per-vreg walk and the
    # gather slot count by ~5-15%)
    walk = choose_walk_variant(matrix, vol_shape, interpolation, mode,
                               known=known, sticky=sticky or 1.0,
                               out_shape=out_shape,
                               quantize=sticky is not None)
    if walk is not None:
        return walk
    return choose_variant(matrix, vol_shape, interpolation, mode,
                          out_shape=out_shape)


def autotune_plan(volume, matrix, interpolation: str,
                  mode: str = "constant", cval: float = 0.0,
                  k: int = 3, iters: int = 33,
                  out_shape=None, interpret: bool = False) -> Optional[Plan]:
    """Empirical best-of-``k`` plan selection: compile the k cheapest
    MODELED walk configs (distinct Mosaic binaries) and keep the one that
    measures fastest on the device.

    The cost model carries ~±10-20% error, so measuring a few near-optimal
    candidates recovers that band — worth it when the plan will be reused
    many times (resident-volume sweeps, long-running services): each extra
    candidate costs one Mosaic compile (~3-15 s, cached across processes
    via the persistent compilation cache) plus ~``iters`` kernel runs.

    Timing uses the chained-slope method (N dependent applications inside
    one jit, minus the 1-iteration run) so it is valid even on remote-TPU
    rigs where ``block_until_ready`` does not actually block.  Falls back
    to :func:`choose_plan` when fewer than two walk candidates cover the
    matrix.
    """
    import time

    import jax
    import jax.numpy as jnp

    vol_shape = tuple(volume.shape)
    cands = choose_walk_variant(matrix, vol_shape, interpolation, mode,
                                out_shape=out_shape, quantize=False,
                                topk=k)
    if not cands:
        return choose_plan(matrix, vol_shape, interpolation, mode,
                           out_shape=out_shape, sticky=None)
    if len(cands) == 1:
        return cands[0]

    def slope(plan):
        prep = plan_prepare(volume, plan)

        @jax.jit
        def chained(n, p, mat):
            def body(_, carry):
                mm, acc = carry
                if isinstance(plan, WalkVariant):
                    out = walk_sample_prepared(p, mm, plan, cval,
                                               interpret=interpret)
                else:
                    out = plan_sample_prepared(p, mm, plan, cval)
                probe = out[0, 0, 0] * jnp.float32(1e-38)
                return mm + probe, acc + probe
            mm, acc = jax.lax.fori_loop(0, n, body,
                                        (mat, jnp.float32(0.0)))
            return mm[0, 0] + acc

        mj = jnp.asarray(np.asarray(matrix), jnp.float32)
        float(chained(1, prep, mj))          # compile both trip counts
        float(chained(iters, prep, mj))

        def run(n):
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(chained(n, prep, mj))
                best = min(best, time.perf_counter() - t0)
            return best

        return (run(iters) - run(1)) / (iters - 1)

    return min(cands, key=slope)


def plan_covers(plan: Plan, matrix, vol_shape, interpolation: str,
                mode: str = "constant", out_shape=None) -> bool:
    """True when a compiled plan's envelope covers ``matrix``."""
    if isinstance(plan, WalkVariant):
        return walk_variant_covers(plan, matrix, vol_shape, interpolation,
                                   mode, out_shape=out_shape)
    return variant_covers(plan, matrix, vol_shape, interpolation, mode,
                          out_shape=out_shape)


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


def prepared_source(volume, plan: Plan, cache: dict, lock=None):
    """Cached prepared HBM source layout for ``plan`` over a resident
    ``volume``: pays the transpose/pad/stack once per layout key.  Shared
    by StaticVolume and TiltSeriesProjector so the caching (and its
    thread-safety, when a ``lock`` is supplied) lives in one place.

    The build runs UNDER the lock: the prepared layout can be several
    x-shifted copies of the whole volume in HBM, so racing first-touch
    builds would transiently double that footprint (and the work).
    ``plan_prepare`` already dispatches through a jitted, lru-cached
    preparer per layout key, so no extra jit wrapper is needed here."""
    import contextlib
    key = plan_layout_key(plan)
    if key is None:
        return volume
    with (lock if lock is not None else contextlib.nullcontext()):
        prep = cache.get(key)
        if prep is None:
            prep = plan_prepare(volume, plan)
            cache[key] = prep
    return prep


def plan_sample_prepared(prepared, matrix, plan: Plan, cval: float = 0.0):
    """Run the plan's kernel on a prepared source layout."""
    if isinstance(plan, WalkVariant):
        return walk_sample_prepared(prepared, matrix, plan, cval)
    return affine_sample_pallas_variant(prepared, matrix, plan, cval)


def plan_group_key(plan: Plan):
    """Key under which matrices can share one compiled batch program: the
    Mosaic binary (canonical form) plus the host-side data layout (ps/po).
    Per-matrix kappa/y_lo ride in the runtime payload, so walk plans that
    differ only in those group together."""
    from .pallas_walk import canonical_walk_variant
    if isinstance(plan, WalkVariant):
        return (canonical_walk_variant(plan), plan.ps, plan.po)
    return plan


def plan_cost(plan: Plan) -> float:
    """Kind-matched cost estimate (NOT comparable across kinds)."""
    from .pallas_affine import variant_cost
    from .pallas_walk import _variant_cost
    if isinstance(plan, WalkVariant):
        return _variant_cost(plan)
    return variant_cost(plan)


def fit_payload(rep: Plan, matrix, vol_shape, interpolation: str,
                mode: str = "constant") -> Optional[Plan]:
    """Adjust only the runtime payload fields (kax/y_lo) of ``rep`` so it
    covers ``matrix`` under rep's exact binary and layout, or None."""
    import dataclasses

    from .pallas_affine import _adjusted_matrix
    from .pallas_walk import _KAXES, _geometry, walk_variant_covers

    if not isinstance(rep, WalkVariant):
        if variant_covers(rep, matrix, vol_shape, interpolation, mode):
            return rep
        return None
    order = 1 if interpolation == "linear" else 3
    if rep.order != order or rep.mode != mode:
        return None
    matrices = np.asarray(matrix, dtype=np.float64)
    if matrices.ndim == 2:
        matrices = matrices[None]
    for kax in _KAXES:
        geos = [_geometry(_adjusted_matrix(m, rep.ps, rep.po), order,
                          rep.vb, rep.wb, kax) for m in matrices]
        if any(g is None for g in geos):
            continue
        cand = dataclasses.replace(rep, kax=kax,
                                   y_lo=int(min(g[2] for g in geos)))
        if walk_variant_covers(cand, matrices, vol_shape, interpolation,
                               mode):
            return cand
    return None


def refit_to_group(rep: Plan, own: Plan, matrix, vol_shape,
                   interpolation: str,
                   mode: str = "constant") -> Optional[Plan]:
    """Re-plan ``matrix`` onto ``rep``'s exact execution group (same Mosaic
    binary AND same data layout), adjusting only runtime payload fields.
    ``own`` is the matrix's per-matrix optimal plan; rep must be the same
    kind and within 1.35x of its cost (the gate keeps one big early group
    from re-imposing the envelope penalty on every later matrix).  Returns
    the adjusted plan, or None."""
    if type(rep) is not type(own) or plan_cost(rep) > 1.35 * plan_cost(own):
        return None
    return fit_payload(rep, matrix, vol_shape, interpolation, mode)


def plan_batch_sampler(plan: Plan, n: int, cval: float = 0.0,
                       interpret: bool = False):
    """A callable ``(prepared, payloads[n]) -> outputs[n]`` resolving a
    stack of n same-group matrices.

    Walk plans use the grid-batched kernel -- ONE pallas launch whose grid
    has a leading matrix dimension and whose per-matrix geometry rides in
    SMEM payloads -- composed eagerly with the cached un-blocker, so the
    Mosaic binary is shared across every group with the same canonical
    form.  Select-tree plans use their own grid-batched runner (same
    leading-batch-grid scheme, raw matrices as payloads)."""
    if isinstance(plan, WalkVariant):
        from .pallas_walk import (_unblocker, _walk_runner,
                                  canonical_walk_variant)
        vc = canonical_walk_variant(plan)
        runner = _walk_runner(vc, float(cval), bool(interpret), n)
        unblock = _unblocker(plan.out_d, plan.vb, plan.wb, plan.gu,
                             plan.gv, plan.po, n)

        def run(prepared, payloads):
            return unblock(runner(prepared, payloads))

        return run

    from .pallas_affine import _tree_runner
    return _tree_runner(plan, float(cval), n, bool(interpret))


def plan_payload(matrix, plan: Plan):
    """Per-matrix kernel input: the permuted matrix + runtime payload for
    walk plans, the raw matrix otherwise."""
    if isinstance(plan, WalkVariant):
        from .pallas_walk import permute_matrix
        return permute_matrix(matrix, plan)
    import jax.numpy as jnp
    return jnp.asarray(matrix, jnp.float32)


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


def plan_sampler_into(plan: Plan, cval: float = 0.0):
    """A callable ``(prepared, matrix, out_buf) -> output`` that DONATES
    ``out_buf`` (a device array of the output shape/dtype) so the result
    reuses its HBM instead of allocating fresh — the jax-native equivalent
    of the reference's caller-provided device output array
    (``voltools/volume.py:72-75``).  The donated array is consumed."""
    if isinstance(plan, WalkVariant):
        from .pallas_walk import walk_sample_prepared_into

        def run(prepared, matrix, out_buf):
            return walk_sample_prepared_into(prepared, matrix, plan,
                                             out_buf, cval)
        return run
    import jax

    def _tree(vol, m, out_buf):
        del out_buf   # donated: aliased to the output by shape/dtype
        return affine_sample_pallas_variant(vol, m, plan, cval)

    return jax.jit(_tree, donate_argnums=(2,), keep_unused=True)
