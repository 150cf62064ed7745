"""Plane-walk kernel tests (interpreter mode — no TPU needed).

The walk kernel covers the general-rotation regime the select-tree kernel
rejects (reference workload: 100 random 'sxyz' rotations per size,
``/root/reference/tests/benchmark.py:52``).  It must agree with the XLA
reference implementation for arbitrary full-3D rotations, and the planner
must tier it between the unrolled select-tree kernel and the XLA fallback.

Interpret-mode runs are kept few and small: XLA:CPU takes O(10s) to compile
each simulated kernel (the real-TPU compiled path is exercised by
``benchmarks/tpu_parity_smoke.py`` on hardware).

Comparisons mask voxels whose source coordinate sits within ~1e-4 of an
integer: XLA:CPU sometimes rematerializes a coordinate chain into several
fusions with different FMA contraction, so two copies of the same f32 value
can disagree by 1 ulp and flip a floor() inconsistently.  The kernel's math
was verified exact at such a knife-edge voxel by a full f32 replication of
its band/gather mechanics in numpy; the divergence is an artifact of the
simulated (interpret) executable only.
"""

import numpy as np
import pytest

from voltools_tpu.kernels.pallas_affine import Variant, choose_variant
from voltools_tpu.kernels.pallas_walk import (
    WalkVariant,
    affine_sample_pallas_walk,
    choose_walk_variant,
    prepare_walk_volume,
    walk_sample_prepared,
    walk_variant_covers,
)
from voltools_tpu.kernels.planner import choose_plan, plan_covers
from voltools_tpu.ops.sampling import affine_sample
from voltools_tpu.utils import transform_matrix


@pytest.fixture(scope="module")
def volume():
    rng = np.random.default_rng(5)
    return rng.random((40, 48, 56)).astype(np.float32)


def random_rotation(seed, shape):
    rng = np.random.default_rng(seed)
    ang = rng.uniform(-180, 180, 3)
    return transform_matrix(rotation=tuple(ang), rotation_order="sxyz",
                            center=tuple(s / 2 for s in shape))


def knife_edge_mask(m, shape, tol=1e-4):
    """True where any source coordinate is within ``tol`` of an integer
    (where interpret-mode f32 rematerialization can flip floor())."""
    idx = np.indices(shape, dtype=np.float64).reshape(3, -1)
    src = (np.asarray(m)[:3, :3] @ idx + np.asarray(m)[:3, 3:4])
    near = np.abs(src - np.round(src)) < tol
    return near.any(axis=0).reshape(shape)


def assert_close_off_edges(got, want, m, atol=5e-5):
    err = np.abs(got - want)
    err = np.where(knife_edge_mask(m, got.shape), 0.0, err)
    assert err.max() <= atol, f"max err {err.max():.2e} off knife edges"


@pytest.mark.parametrize("interpolation", ["linear", "bspline"])
@pytest.mark.parametrize("seed", [0, 1])
def test_walk_matches_xla_random_rotations(volume, interpolation, seed):
    m = random_rotation(seed, volume.shape)
    v = choose_walk_variant(m, volume.shape, interpolation, "constant")
    assert v is not None, "walk chooser must accept arbitrary rotations here"
    expected = np.asarray(affine_sample(volume, m, interpolation, "constant",
                                        prefiltered=True))
    got = np.asarray(affine_sample_pallas_walk(volume, m, v, 0.0,
                                               interpret=True))
    assert_close_off_edges(got, expected, m)


def test_walk_tight_mode_matches_xla(volume):
    """quantize=False (tight mode: exact hz/slop/y_lo, no binary-sharing
    ladders) must stay scipy-exact — the geometry slack it removes is
    padding, not correctness margin."""
    m = random_rotation(7, volume.shape)
    v = choose_walk_variant(m, volume.shape, "linear", "constant",
                            quantize=False)
    assert v is not None
    vq = choose_walk_variant(m, volume.shape, "linear", "constant")
    assert v.hz <= vq.hz and v.w0 <= vq.w0
    expected = np.asarray(affine_sample(volume, m, "linear", "constant",
                                        prefiltered=True))
    got = np.asarray(affine_sample_pallas_walk(volume, m, v, 0.0,
                                               interpret=True))
    assert_close_off_edges(got, expected, m)


def test_walk_border_mode(volume):
    m = random_rotation(2, volume.shape)
    v = choose_walk_variant(m, volume.shape, "linear", "border")
    assert v is not None
    expected = np.asarray(affine_sample(volume, m, "linear", "border",
                                        prefiltered=True))
    got = np.asarray(affine_sample_pallas_walk(volume, m, v, 0.0,
                                               interpret=True))
    assert_close_off_edges(got, expected, m)


def test_walk_prepared_split_nonzero_cval(volume):
    """The prepare/sample split must agree with the XLA oracle, including a
    non-default cval (one compile covers both properties)."""
    m = random_rotation(4, volume.shape)
    v = choose_walk_variant(m, volume.shape, "linear", "constant")
    assert v is not None
    prep = prepare_walk_volume(volume, v)
    got = np.asarray(walk_sample_prepared(prep, m, v, 5.0, interpret=True))
    expected = np.asarray(affine_sample(volume, m, "linear", "constant",
                                        cval=5.0, prefiltered=True))
    assert_close_off_edges(got, expected, m)


def test_walk_grid_batched_matches_oneshot(volume):
    """The grid-batched runner (leading matrix grid dim, per-matrix SMEM
    payloads) must agree with per-matrix launches for a group of matrices
    sharing one canonical binary."""
    import jax.numpy as jnp

    from voltools_tpu.kernels.pallas_walk import (_unblocker, _walk_runner,
                                                  canonical_walk_variant,
                                                  permute_matrix)
    from voltools_tpu.kernels.planner import refit_to_group

    # a cube so group refits can use any axis permutation
    cube = np.random.default_rng(9).random((48, 48, 48)).astype(np.float32)
    shape = cube.shape
    m0 = random_rotation(30, shape)
    v0 = choose_walk_variant(m0, shape, "linear", "constant")
    assert v0 is not None
    ms, plans = [m0], [v0]
    seed = 31
    while len(ms) < 3 and seed < 60:
        m = random_rotation(seed, shape)
        seed += 1
        own = choose_walk_variant(m, shape, "linear", "constant")
        fit = refit_to_group(v0, own, m, shape, "linear", "constant")
        if fit is not None:
            ms.append(m)
            plans.append(fit)
    if len(ms) < 2:
        # no rotation fit the group: still exercise the batched plumbing
        # with a repeated matrix
        ms.append(ms[0])
        plans.append(plans[0])
    volume = cube
    prep = prepare_walk_volume(volume, v0)
    payloads = jnp.stack([permute_matrix(m, p) for m, p in zip(ms, plans)])
    n = payloads.shape[0]
    vc = canonical_walk_variant(v0)
    outs = np.asarray(_unblocker(v0.out_d, v0.vb, v0.wb, v0.gu, v0.gv,
                                 v0.po, n)(_walk_runner(vc, 0.0, True, n)(
                                     prep, payloads)))
    for j, (m, p) in enumerate(zip(ms, plans)):
        want = np.asarray(affine_sample(volume, m, "linear", "constant",
                                        prefiltered=True))
        assert_close_off_edges(outs[j], want, m)


def test_walk_reshape_out_shape(volume):
    """Caller-supplied out_shape (the reshape=True path): the kernel samples
    the ORIGINAL volume onto an enlarged output grid with the pad-shifted
    matrix (reference ran its same kernel for reshape,
    ``voltools/transforms.py:171-212``)."""
    from voltools_tpu.utils import (compute_post_transform_dimensions,
                                    translation_matrix)

    m = random_rotation(6, volume.shape)
    pad_before, _, new_dims = compute_post_transform_dimensions(
        volume.shape, m)
    m2 = m @ translation_matrix(pad_before, m.dtype)
    out_shape = tuple(int(d) for d in new_dims)
    v = choose_walk_variant(m2, volume.shape, "linear", "constant",
                            out_shape=out_shape)
    assert v is not None
    assert tuple(out_shape[v.po[k]] for k in range(3)) == v.out_d
    got = np.asarray(affine_sample_pallas_walk(volume, m2, v, 0.0,
                                               interpret=True))
    assert got.shape == out_shape
    expected = np.asarray(affine_sample(volume, m2, "linear", "constant",
                                        prefiltered=True,
                                        out_shape=out_shape))
    err = np.abs(got - expected)
    idx = np.indices(out_shape, dtype=np.float64).reshape(3, -1)
    src = (np.asarray(m2)[:3, :3] @ idx + np.asarray(m2)[:3, 3:4])
    near = (np.abs(src - np.round(src)) < 1e-4).any(axis=0).reshape(out_shape)
    assert np.where(near, 0.0, err).max() <= 5e-5


def test_walk_covers_reuses_envelope(volume):
    """A batch envelope variant must cover each member matrix."""
    ms = np.stack([random_rotation(10 + i, volume.shape) for i in range(4)])
    v = choose_walk_variant(ms, volume.shape, "linear", "constant")
    assert v is not None
    for m in ms:
        assert walk_variant_covers(v, m, volume.shape, "linear", "constant")
    # a different interpolation or shape must not be covered
    assert not walk_variant_covers(v, ms[0], volume.shape, "bspline",
                                   "constant")
    assert not walk_variant_covers(v, ms[0], (64, 64, 64), "linear",
                                   "constant")


def test_walk_quasi2d_cubic_constant_no_crash():
    """Quasi-2D volumes (an axis extent <= xpad) must not select a mirror-
    padded x layout they cannot build (round-2 advisor finding: _preparer's
    mirror slice came up short and the reshape crashed)."""
    vol = np.random.default_rng(3).random((2, 64, 64)).astype(np.float32)
    for shape in [(2, 64, 64), (64, 2, 64), (64, 64, 1)]:
        v = np.random.default_rng(3).random(shape).astype(np.float32)
        m = random_rotation(8, shape)
        var = choose_walk_variant(m, shape, "bspline", "constant")
        if var is not None:
            assert shape[var.ps[2]] > var.xpad
            prepare_walk_volume(v, var)   # must not raise


def test_planner_tiers(volume):
    # the walk kernel serves every regime where its bands fit -- including
    # axis-dominant matrices (measured faster than the select-tree there)
    m_axis = transform_matrix(rotation=(0, 60, 0), rotation_order="sxyz",
                              center=tuple(s / 2 for s in volume.shape))
    plan = choose_plan(m_axis, volume.shape, "linear")
    assert isinstance(plan, WalkVariant)

    # fully-3D rotation at a size where the select-tree window explodes ->
    # the plane-walk kernel
    shape = (160, 160, 160)
    m_gen = random_rotation(20, shape)
    tree = choose_variant(m_gen, shape, "linear")
    assert tree is None or not tree.unroll
    plan = choose_plan(m_gen, shape, "linear")
    assert isinstance(plan, WalkVariant)
    assert plan_covers(plan, m_gen, shape, "linear")

    # tiny volumes stay on the select-tree kernel (walk bands don't fit)
    m_tiny = random_rotation(21, (5, 5, 5))
    plan = choose_plan(m_tiny, (5, 5, 5), "linear")
    assert plan is None or isinstance(plan, Variant)


def test_walk_strip_windows_match_xla(volume):
    """Band-following strip windows (cs>0): per cs-plane chunk the DMA
    copies only the tile's band rows, and the kernel re-derives each
    chunk's strip origin from the same SMEM scalars.  Forced here via a
    stripified windowed variant (the model only picks strips where window
    DMA dominates, which small interpret volumes never are)."""
    import dataclasses
    import math

    from voltools_tpu.kernels.pallas_affine import _adjusted_matrix
    from voltools_tpu.kernels.pallas_walk import _STRIP_CS, _geometry

    shape = volume.shape
    m = random_rotation(1, shape)
    cands = choose_walk_variant(np.asarray(m, np.float32), shape,
                                "bspline", "constant", topk=8,
                                quantize=False)
    base = next((v for v in cands if not v.whole), None)
    assert base is not None, "expected a windowed candidate"
    a = _adjusted_matrix(np.asarray(m, np.float64), base.ps, base.po)
    _, _, _, _, kappa = _geometry(a, base.order, base.vb, base.wb,
                                  base.kax)
    E = (8.0 * base.gu - 1.0, base.vb * base.gv - 1.0, base.wb - 1.0)
    res = [abs(a[1, i] - kappa * a[0, i]) for i in range(3)]
    cs = _STRIP_CS
    w0 = min(-cs * (-base.w0 // cs), base.d[0])
    assert w0 % cs == 0
    need = (int(math.ceil(sum(res[i] * E[i] for i in range(3))
                          + abs(kappa) * (cs + 1))) + 3 + base.hy)
    sh = min(-8 * (-need // 8), base.d[1])
    v = dataclasses.replace(base, cs=cs, sh=sh, w1=sh, w0=w0)
    assert walk_variant_covers(v, m, shape, "bspline", "constant")
    assert v.nch >= 2

    got = affine_sample_pallas_walk(volume, m, v, cval=0.0, interpret=True)
    want = affine_sample(volume, m, "bspline", "constant", cval=0.0)
    assert_close_off_edges(np.asarray(got), np.asarray(want), m)


def test_full_depth_walk_covers_long_span():
    """A rotation whose per-vreg z-span exceeds the volume depth is still
    walkable: hz = d0 walks the whole depth (zorg clips to 0), covering
    every in-volume tap.  covers() used to compare the RAW geometric span
    against v.hz and reject these (observed: a 25^3 cubic rotation fell to
    the 10x-slower select-tree kernel)."""
    shape = (25, 25, 25)
    rng = np.random.default_rng(0)
    rng.random(shape, dtype=np.float64)       # align exp_r3_small's stream
    m = None
    for i in range(7):
        ang = rng.uniform(-180, 180, 3)
        m = transform_matrix(rotation=tuple(ang), rotation_order="sxyz",
                             center=tuple(s / 2 for s in shape))
    v = choose_walk_variant(np.asarray(m, np.float32), shape, "bspline",
                            "constant", sticky=None, quantize=False)
    assert v is not None, "full-depth walk must cover the long-span case"
    assert v.hz <= shape[0]
    assert walk_variant_covers(v, m, shape, "bspline", "constant")

    vol = rng.random(shape).astype(np.float32)
    got = affine_sample_pallas_walk(vol, np.asarray(m, np.float32), v,
                                    0.0, interpret=True)
    want = affine_sample(vol, m, "bspline", "constant")
    assert_close_off_edges(np.asarray(got), np.asarray(want), m)


def test_autotune_plan_interpret(volume):
    """autotune_plan measures the top-K candidates and returns one of
    them; the winner must cover the matrix and sample correctly."""
    from voltools_tpu.kernels.planner import autotune_plan, plan_covers

    vol = volume[:32, :32, :32]
    m = random_rotation(4, vol.shape)
    plan = autotune_plan(np.asarray(vol), np.asarray(m, np.float32),
                         "linear", "constant", k=2, iters=4,
                         interpret=True)
    assert plan is not None
    assert plan_covers(plan, m, vol.shape, "linear", "constant")
    assert isinstance(plan, WalkVariant)
    got = np.asarray(affine_sample_pallas_walk(
        np.asarray(vol), np.asarray(m, np.float32), plan, 0.0,
        interpret=True))
    want = affine_sample(np.asarray(vol), m, "linear", "constant")
    assert_close_off_edges(got, np.asarray(want), m)


def test_chooser_fuzz_random_shapes_self_consistent():
    """Host-only fuzz: over random (possibly tiny/anisotropic) shapes and
    matrices, every plan the walk chooser returns must pass its own scalar
    coverage validator, in both sticky (quantized) and tight mode — the
    class of inconsistency behind the round-2 quasi-2D crash."""
    rng = np.random.default_rng(42)
    checked = 0
    for _ in range(60):
        shape = tuple(int(s) for s in rng.integers(1, 97, 3))
        ang = rng.uniform(-180, 180, 3)
        scale = tuple(float(s) for s in rng.uniform(0.6, 1.6, 3))
        m = np.asarray(transform_matrix(
            rotation=tuple(ang), rotation_order="sxyz", scale=scale,
            center=tuple(s / 2 for s in shape)), np.float32)
        for quantize in (True, False):
            v = choose_walk_variant(m, shape, "linear", "constant",
                                    quantize=quantize)
            if v is not None:
                checked += 1
                assert walk_variant_covers(v, m, shape, "linear",
                                           "constant"), (shape, ang, scale,
                                                         quantize)
                if v.whole:
                    assert v.w0 == v.d[0] and v.w1 == v.d[1]
                if v.cs:
                    assert v.w0 % v.cs == 0 and v.sh == v.w1
    assert checked > 30   # the fuzz actually exercised the chooser


def test_planner_fuzz_extreme_scales_self_consistent():
    """Every plan the unified planner returns must pass plan_covers, even
    for strong zooms/translations where window spans exceed the volume
    extents and cap at d (a full-extent window/walk covers everything;
    the validators used to compare the RAW spans and reject those)."""
    from voltools_tpu.kernels.planner import choose_plan, plan_covers

    rng = np.random.default_rng(7)
    checked = 0
    for _ in range(25):
        shape = tuple(int(s) for s in rng.integers(4, 48, 3))
        m = np.asarray(transform_matrix(
            rotation=tuple(rng.uniform(-180, 180, 3)),
            rotation_order="sxyz",
            scale=tuple(float(s) for s in rng.uniform(0.3, 2.5, 3)),
            translation=tuple(float(t) for t in rng.uniform(-20, 20, 3)),
            center=tuple(s / 2 for s in shape)), np.float32)
        for interp in ("linear", "bspline"):
            p = choose_plan(m, shape, interp, "constant", sticky=None)
            if p is not None:
                checked += 1
                assert plan_covers(p, m, shape, interp, "constant"), (
                    shape, interp)
    assert checked > 15


def test_whole_mode_size_boundary():
    """The whole-resident mode is selected where the prepared volume fits
    VMEM (~<=120^3 f32) and never above it."""
    m = np.asarray(random_rotation(3, (100, 100, 100)), np.float32)
    v_small = choose_walk_variant(m, (100, 100, 100), "linear", "constant")
    assert v_small is not None and v_small.whole
    m2 = np.asarray(random_rotation(3, (192, 192, 192)), np.float32)
    v_big = choose_walk_variant(m2, (192, 192, 192), "linear", "constant")
    assert v_big is not None and not v_big.whole


def test_quantized_chooser_falls_back_to_tight():
    """At tiny volumes the sticky-mode parameter ladders can round a band
    bound over a hard limit where the exact config still fits; the chooser
    must fall back to the tight config, not return None (observed: 4/100
    random rotations at 25^3 hit XLA fallback in sticky mode)."""
    shape = (25, 25, 25)
    rng = np.random.default_rng(0)
    fallbacks = 0
    for i in range(80):
        ang = rng.uniform(-180, 180, 3)
        m = transform_matrix(rotation=tuple(ang), rotation_order="sxyz",
                             center=tuple(s / 2 for s in shape))
        plan = choose_plan(np.asarray(m, np.float32), shape, "linear",
                           "constant", sticky=3.0)
        if plan is None:
            fallbacks += 1
    assert fallbacks == 0


def test_topk_candidates_diverse_and_covering(volume):
    """topk>1 returns structurally-diverse coverage-validated variants,
    cheapest modeled first (the enumeration behind best-of-K autotune)."""
    from voltools_tpu.kernels.pallas_walk import _variant_cost

    shape = volume.shape
    m = random_rotation(7, shape)
    cands = choose_walk_variant(m, shape, "linear", "constant",
                                topk=4, quantize=False)
    assert isinstance(cands, list) and 1 <= len(cands) <= 4
    keys = {(v.ps, v.po, v.vb, v.wb, v.kax, v.whole, v.cs) for v in cands}
    assert len(keys) == len(cands)          # structural diversity
    costs = [_variant_cost(v) for v in cands]
    for v in cands:
        assert walk_variant_covers(v, m, shape, "linear", "constant")
    # candidates stay within the autotune gate of the modeled optimum
    assert max(costs) <= 1.6 * min(costs) + 1e-6

    # degenerate shape: empty list, not None
    assert choose_walk_variant(np.eye(4, dtype=np.float32), (1, 1, 1),
                               "linear", "constant", topk=3) == []


def test_oneshot_sampler_population_cap(volume, monkeypatch):
    """oneshot_walk_sampler caps its fused-program population: beyond the
    cap NEW (canonical, permutation) keys return None (the caller then
    composes the cached eager stages), while already-admitted keys keep
    their sampler — the sticky-sweep recompile guard in transforms.py."""
    import voltools_tpu.kernels.pallas_walk as pw

    shape = volume.shape
    m1 = random_rotation(11, shape)
    v1 = choose_walk_variant(m1, shape, "linear", "constant", sticky=None,
                             quantize=False)
    assert v1 is not None
    # a second variant with a different output permutation = a new key
    import dataclasses
    perms = [p for p in __import__("itertools").permutations((0, 1, 2))
             if p != v1.po]
    v2 = dataclasses.replace(v1, po=perms[0],
                             out_d=tuple(shape[j] for j in perms[0]))

    monkeypatch.setattr(pw, "_ONESHOT_RUNNERS", {})
    monkeypatch.setattr(pw, "_ONESHOT_CAP", 1)
    s1 = pw.oneshot_walk_sampler(v1, 0.0, False)
    assert s1 is not None and len(pw._ONESHOT_RUNNERS) == 1
    # cap reached: a NEW key is refused ...
    assert pw.oneshot_walk_sampler(v2, 0.0, False) is None
    # ... but the admitted key still returns a sampler
    assert pw.oneshot_walk_sampler(v1, 0.0, False) is not None
    assert len(pw._ONESHOT_RUNNERS) == 1
    # a program that fails to compile/run releases its cap slot (a failed
    # build must not consume capacity forever): stub the runner so the
    # first call raises, then check the key was evicted and the cap is
    # free for a new key again
    pw._ONESHOT_RUNNERS.clear()

    def _broken_runner(*_a, **_k):
        def run(volume, cols):
            raise RuntimeError("simulated compile failure")
        return run

    monkeypatch.setattr(pw, "_oneshot_runner", _broken_runner)
    s2 = pw.oneshot_walk_sampler(v2, 0.0, False)
    assert s2 is not None and len(pw._ONESHOT_RUNNERS) == 1
    with pytest.raises(RuntimeError):
        s2(np.zeros(shape, np.float32), m1)
    assert len(pw._ONESHOT_RUNNERS) == 0
    assert pw.oneshot_walk_sampler(v1, 0.0, False) is not None


def _chooser_agreement(monkeypatch, shapes, n_cases, configs):
    """Shared body: the jitted-on-CPU chooser core (_fast_search) and the
    numpy reference must agree — same feasibility, and modeled cost within
    the float32 tie band (the winner is cover-validated either way, so a
    tie flip only trades model-equal configs)."""
    import voltools_tpu.kernels.pallas_walk as pw

    # compile the chooser core inline (the production default warms it in
    # a background thread and serves numpy until ready)
    monkeypatch.setattr(pw, "_FAST_SYNC", True)
    for i in range(n_cases):
        shape = shapes[i % len(shapes)]
        m = random_rotation(100 + i, shape)
        for interp, quant in configs:
            pw._FAST_BAD.clear()
            va = choose_walk_variant(m, shape, interp, "constant",
                                     sticky=None, quantize=quant)
            # the fast path must have actually run, not blacklisted itself
            assert not pw._FAST_BAD
            monkeypatch.setattr(pw, "_FAST_CHOOSER", False)
            vb = choose_walk_variant(m, shape, interp, "constant",
                                     sticky=None, quantize=quant)
            monkeypatch.setattr(pw, "_FAST_CHOOSER", True)
            assert (va is None) == (vb is None), (shape, interp, quant)
            if va is not None:
                ca = pw._variant_cost(va)
                cb = pw._variant_cost(vb)
                assert abs(ca - cb) <= 0.05 * max(ca, cb), (
                    shape, interp, quant, va, vb)


def test_fast_chooser_matches_numpy_quick(monkeypatch):
    """Quick-set representative of the full 9x3 agreement grid below."""
    _chooser_agreement(monkeypatch, [(40, 48, 56)], 1,
                       (("linear", True),))


def test_fast_chooser_matches_numpy(monkeypatch):
    """The full 9-rotation x 3-config agreement grid (slow set)."""
    _chooser_agreement(monkeypatch,
                       [(40, 48, 56), (25, 25, 25), (100, 100, 100)], 9,
                       (("linear", True), ("linear", False),
                        ("filt_bspline", True)))


def test_chooser_extreme_matrix_no_overflow():
    """Extreme kappa/zoom matrices must not wrap the int32 band/window
    bounds (a wrapped negative bound would un-mask bogus configs and the
    cast emits RuntimeWarning under warnings-as-errors).  The chooser must
    answer cleanly — either a cover-validated variant or None."""
    import warnings
    import voltools_tpu.kernels.pallas_walk as pw

    shape = (64, 64, 64)
    # near-singular row-0 entry (just past the 1e-6 kok gate) against a
    # large row-1 entry drives kappa ~ 1e7 and kapM*(w0+1) past 2^31
    m = np.array([[1e-6, 4.0, 0.0, 0.0],
                  [10.0, 0.0, 0.0, 0.0],
                  [0.0, 0.0, 1.0, 0.0],
                  [0.0, 0.0, 0.0, 1.0]], np.float64)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        for quant in (True, False):
            v = choose_walk_variant(m, shape, "linear", "constant",
                                    sticky=None, quantize=quant)
            if v is not None:
                assert walk_variant_covers(v, m, shape, "linear",
                                           "constant")
                assert v.w1 > 0 and v.hy > 0


def test_oneshot_failure_degrades_sibling_closures(volume, monkeypatch):
    """Regression: when one sampler closure's failure released the cap
    slot, OTHER live closures for the same key kept executing the fused
    program — the population could exceed the cap.  The fallback state is
    shared per key, so every closure degrades together."""
    import voltools_tpu.kernels.pallas_walk as pw

    shape = volume.shape
    m1 = random_rotation(11, shape)
    v1 = choose_walk_variant(m1, shape, "linear", "constant", sticky=None,
                             quantize=False)
    assert v1 is not None
    monkeypatch.setattr(pw, "_ONESHOT_RUNNERS", {})

    def _broken_runner(*_a, **_k):
        def run(volume, cols):
            raise RuntimeError("simulated compile failure")
        return run

    monkeypatch.setattr(pw, "_oneshot_runner", _broken_runner)
    sentinel = object()
    monkeypatch.setattr(pw, "_eager_walk_sampler",
                        lambda *a, **k: (lambda vol, m: sentinel))
    sa = pw.oneshot_walk_sampler(v1, 0.0, False)
    sb = pw.oneshot_walk_sampler(v1, 0.0, False)   # second closure, same key
    assert len(pw._ONESHOT_RUNNERS) == 1
    with pytest.raises(RuntimeError):
        sa(np.zeros(shape, np.float32), m1)
    assert len(pw._ONESHOT_RUNNERS) == 0
    # the sibling must not keep the released fused program alive
    assert sb(np.zeros(shape, np.float32), m1) is sentinel
    assert sa(np.zeros(shape, np.float32), m1) is sentinel
