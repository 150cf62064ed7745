"""TiltSeriesProjector tests: projections must equal rotate-then-sum built
from the verified transform primitives."""

import numpy as np
import pytest

import voltools_tpu as vt
from voltools_tpu.models import TiltSeriesProjector


def test_projection_matches_rotate_then_sum(cube_volume):
    proj = TiltSeriesProjector(cube_volume, interpolation="linear",
                               device="jax")
    angles = [-30.0, 0.0, 30.0]
    stack = proj.project(angles, tilt_axis=1)
    assert stack.shape == (3,) + cube_volume.shape[1:]
    c = (np.asarray(cube_volume.shape) - 1) / 2
    for i, a in enumerate(angles):
        rotated = vt.transform(cube_volume, rotation=(0.0, a, 0.0),
                               rotation_order="rzxz", center=c, device="jax")
        np.testing.assert_allclose(stack[i], rotated.sum(axis=0), atol=1e-3)


def test_projection_zero_angle_is_plain_sum(cube_volume):
    proj = TiltSeriesProjector(cube_volume, device="jax")
    stack = proj.project([0.0])
    np.testing.assert_allclose(stack[0], cube_volume.sum(axis=0), atol=1e-3)


def test_projection_prefiltered_mode(cube_volume):
    proj = TiltSeriesProjector(cube_volume, interpolation="filt_bspline",
                               device="jax")
    stack = proj.project([15.0], tilt_axis=1)
    c = (np.asarray(cube_volume.shape) - 1) / 2
    rotated = vt.transform(cube_volume, rotation=(0.0, 15.0, 0.0),
                           rotation_order="rzxz", center=c,
                           interpolation="filt_bspline", device="jax")
    np.testing.assert_allclose(stack[0], rotated.sum(axis=0), atol=1e-3)


def test_projection_validation(cube_volume):
    with pytest.raises(ValueError):
        TiltSeriesProjector(cube_volume[0], device="jax")


def test_projector_walk_plan_interpret(monkeypatch):
    """Round-2 TPU regression: when the planner preferred WalkVariant plans,
    ``_projector_for`` fed them into the select-tree kernel and crashed with
    ``AttributeError: 'WalkVariant' object has no attribute 'dx_pad'``.
    Force a walk plan through the projector (interpret mode, no TPU) and
    check the projections against the XLA vmap path."""
    import jax.numpy as jnp

    import voltools_tpu.transforms as vtt
    from voltools_tpu.kernels.pallas_walk import (WalkVariant,
                                                  choose_walk_variant)

    rng = np.random.default_rng(7)
    vol = rng.random((40, 48, 56)).astype(np.float32)
    proj = TiltSeriesProjector(vol, interpolation="linear", device="jax")
    proj._interpret = True
    angles = [-20.0, 10.0]
    ms = proj.tilt_matrices(angles, tilt_axis=1)

    def force_walk(transform_m, vol_shape, interpolation, mode, device,
                   out_shape=None):
        v = choose_walk_variant(transform_m, vol_shape, interpolation, mode)
        assert v is not None, "tilt sweep must admit a walk plan here"
        return v

    monkeypatch.setattr(vtt, "select_variant", force_walk)
    stack = proj.project(angles, tilt_axis=1)
    # the walk batched program must actually have served the call
    assert any(isinstance(key[0][0], WalkVariant)
               for key in proj._variant_projectors)

    expected = np.asarray(proj._project_batch(proj.data, jnp.asarray(ms)))
    # mask projection columns containing knife-edge voxels (interpret-mode
    # f32 rematerialization can flip floor() there; see test_walk.py)
    idx = np.indices(vol.shape, dtype=np.float64).reshape(3, -1)
    for i, m in enumerate(ms):
        src = np.asarray(m, np.float64)[:3, :3] @ idx + \
            np.asarray(m, np.float64)[:3, 3:4]
        near = (np.abs(src - np.round(src)) < 1e-4).any(axis=0)
        col_ok = ~near.reshape(vol.shape).any(axis=proj.projection_axis)
        err = np.abs(stack[i] - expected[i])
        assert np.where(col_ok, err, 0.0).max() <= 1e-3


def test_wbp_reconstruction_round_trip():
    """Project a smooth phantom over 180° and reconstruct it: WBP must
    recover the interior with high fidelity and near-unit scale (the
    framework's inverse problem — absent from the CUDA reference)."""
    from scipy.ndimage import gaussian_filter

    from voltools_tpu.models import TiltSeriesProjector, wbp_reconstruct

    shape = (24, 24, 24)
    rng = np.random.default_rng(0)
    vol = gaussian_filter(rng.standard_normal(shape), 2.0).astype(np.float32)
    proj = TiltSeriesProjector(vol, interpolation="linear", device="jax")
    angles = np.arange(0.0, 180.0, 5.0)
    ms = proj.tilt_matrices(angles, tilt_axis=0)
    p = proj.project(angles, tilt_axis=0)
    rec = wbp_reconstruct(p, ms, shape, device="jax")
    assert rec.shape == shape

    c = 5
    a = vol[c:-c, c:-c, c:-c].ravel()
    b = rec[c:-c, c:-c, c:-c].ravel()
    r = np.corrcoef(a, b)[0, 1]
    scale = float(np.dot(a, b) / np.dot(b, b))
    assert r > 0.97, r
    assert 0.85 < scale < 1.2, scale

    # point phantom localizes exactly
    vol_pt = np.zeros(shape, np.float32)
    vol_pt[12, 12, 12] = 1.0
    proj_pt = TiltSeriesProjector(vol_pt, interpolation="linear",
                                  device="jax")
    p_pt = proj_pt.project(angles, tilt_axis=0)
    rec_pt = wbp_reconstruct(p_pt, ms, shape, device="jax")
    assert np.unravel_index(np.argmax(rec_pt), shape) == (12, 12, 12)

    # unfiltered back-projection is supported (blurrier, still correlated)
    rec_bp = wbp_reconstruct(p, ms, shape, device="jax", filter_window=None)
    assert np.corrcoef(a, rec_bp[c:-c, c:-c, c:-c].ravel())[0, 1] > 0.5


def test_wbp_mesh_parallel_matches_single():
    """Tilt-sharded WBP over a mesh (partial back-projections psum-reduced
    over ICI, non-divisible batch zero-padded) equals the single-device
    reconstruction."""
    from scipy.ndimage import gaussian_filter

    from voltools_tpu.models import TiltSeriesProjector, wbp_reconstruct

    from voltools_tpu.parallel import make_mesh
    mesh8 = make_mesh(8)
    shape = (16, 16, 16)
    rng = np.random.default_rng(1)
    vol = gaussian_filter(rng.standard_normal(shape), 1.5).astype(np.float32)
    proj = TiltSeriesProjector(vol, interpolation="linear", device="jax")
    angles = np.arange(0.0, 180.0, 10.0)   # 18 tilts: 18 % 8 != 0
    ms = proj.tilt_matrices(angles, tilt_axis=0)
    p = proj.project(angles, tilt_axis=0)
    rec1 = wbp_reconstruct(p, ms, shape, device="jax")
    rec8 = wbp_reconstruct(p, ms, shape, mesh=mesh8)
    np.testing.assert_allclose(rec8, rec1, atol=1e-5)
    # output-sharded variant: each device reconstructs its z slab from the
    # replicated projections (memory-scaling axis); 16 % 8 == 0 here, and
    # the padded-slab case is covered with a non-divisible extent
    recv = wbp_reconstruct(p, ms, shape, mesh=mesh8, mesh_shard="volume")
    np.testing.assert_allclose(recv, rec1, atol=1e-5)
    shape_odd = (13,) + shape[1:]
    vol_odd = vol[:13]
    proj_o = TiltSeriesProjector(vol_odd, interpolation="linear",
                                 device="jax")
    ms_o = proj_o.tilt_matrices(angles, tilt_axis=0)
    p_o = proj_o.project(angles, tilt_axis=0)
    rec_o1 = wbp_reconstruct(p_o, ms_o, shape_odd, device="jax")
    rec_ov = wbp_reconstruct(p_o, ms_o, shape_odd, mesh=mesh8,
                             mesh_shard="volume")
    np.testing.assert_allclose(rec_ov, rec_o1, atol=1e-5)


def test_sirt_beats_wbp_on_missing_wedge():
    """SIRT (one jitted fori_loop of forward/adjoint sweeps with row/col
    normalisation) must converge toward unit scale and beat WBP on
    limited-angle (±60° missing wedge) data."""
    from scipy.ndimage import gaussian_filter

    from voltools_tpu.models import (TiltSeriesProjector, sirt_reconstruct,
                                     wbp_reconstruct)

    shape = (20, 20, 20)
    rng = np.random.default_rng(0)
    vol = gaussian_filter(rng.standard_normal(shape), 1.8).astype(np.float32)
    proj = TiltSeriesProjector(vol, interpolation="linear", device="jax")
    angles = np.arange(-60.0, 61.0, 5.0)
    ms = proj.tilt_matrices(angles, tilt_axis=0)
    p = proj.project(angles, tilt_axis=0)

    c = 4
    a = vol[c:-c, c:-c, c:-c].ravel()
    rec_w = wbp_reconstruct(p, ms, shape, device="jax")
    r_wbp = np.corrcoef(a, rec_w[c:-c, c:-c, c:-c].ravel())[0, 1]
    rec_s = sirt_reconstruct(p, ms, shape, iterations=30, device="jax")
    b = rec_s[c:-c, c:-c, c:-c].ravel()
    r_sirt = np.corrcoef(a, b)[0, 1]
    scale = float(np.dot(a, b) / np.dot(b, b))
    assert r_sirt > r_wbp, (r_sirt, r_wbp)
    assert r_sirt > 0.9
    assert 0.85 < scale < 1.2, scale


def test_sirt_pallas_forward_matches_xla():
    """SIRT's TPU fast path (grid-batched walk kernel as the forward
    operator, prepare inside the jit) must match the XLA forward exactly
    over several iterations."""
    from scipy.ndimage import gaussian_filter

    from voltools_tpu.kernels.planner import choose_plan
    from voltools_tpu.models import TiltSeriesProjector, sirt_reconstruct

    shape = (20, 20, 20)
    rng = np.random.default_rng(0)
    vol = gaussian_filter(rng.standard_normal(shape), 1.5).astype(np.float32)
    proj = TiltSeriesProjector(vol, interpolation="linear", device="jax")
    angles = np.arange(-60.0, 61.0, 20.0)
    ms = proj.tilt_matrices(angles, tilt_axis=0)
    p = proj.project(angles, tilt_axis=0)
    plan = choose_plan(np.asarray(ms, np.float64), shape, "linear",
                       "constant")
    assert plan is not None
    rec_xla = sirt_reconstruct(p, ms, shape, iterations=4, device="jax")
    rec_pal = sirt_reconstruct(p, ms, shape, iterations=4, device="jax",
                               _force_plan=plan, _interpret=True)
    np.testing.assert_allclose(rec_pal, rec_xla, atol=1e-5)


def test_adjoint_rowgather_matches_general():
    """For single-axis tilt geometry the back-projection's 2-D gather
    degenerates to whole-row takes; the fast path must match the general
    per-element gather exactly."""
    import jax

    from voltools_tpu.models import TiltSeriesProjector
    from voltools_tpu.models.reconstruction import _make_adjoint

    shape = (18, 20, 22)
    proj = TiltSeriesProjector(np.zeros(shape, np.float32),
                               interpolation="linear", device="jax")
    angles = np.arange(-60.0, 61.0, 15.0)
    ms = proj.tilt_matrices(angles, tilt_axis=0)
    minv = np.stack([np.linalg.inv(m) for m in ms]).astype(np.float32)
    rng = np.random.default_rng(4)
    projs = rng.random((len(ms), shape[1], shape[2])).astype(np.float32)

    keep = [1, 2]
    fast = _make_adjoint(minv, keep, shape, projs.shape[1:])
    slow = _make_adjoint(minv, keep, shape, projs.shape[1:],
                         _force_general=True)
    a = np.asarray(jax.jit(fast)(projs, minv))
    b = np.asarray(jax.jit(slow)(projs, minv))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_sirt_arbitrary_orientations():
    """Reconstruction from RANDOM full-sphere orientations (the
    subtomogram-averaging / dual-axis regime): the general adjoint path
    plus XLA forward recover the phantom with high fidelity."""
    import warnings

    import jax
    import jax.numpy as jnp
    from scipy.ndimage import gaussian_filter

    from voltools_tpu.models import sirt_reconstruct
    from voltools_tpu.ops.sampling import affine_sample
    from voltools_tpu.utils import transform_matrix

    shape = (18, 18, 18)
    vol = gaussian_filter(np.random.default_rng(0).standard_normal(shape),
                          1.6).astype(np.float32)
    rng = np.random.default_rng(1)
    ms = np.stack([np.asarray(transform_matrix(
        rotation=tuple(rng.uniform(-180, 180, 3)), rotation_order="sxyz",
        center=tuple(s / 2 for s in shape)), np.float32)
        for _ in range(24)])
    fwd = jax.jit(jax.vmap(lambda m: jnp.sum(
        affine_sample(jnp.asarray(vol), m, "linear", "constant"), axis=0)))
    p = np.asarray(fwd(jnp.asarray(ms)))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")   # XLA fallback for random envelopes
        rec = sirt_reconstruct(p, ms, shape, iterations=20, device="jax")
    c = 4
    a = vol[c:-c, c:-c, c:-c].ravel()
    b = rec[c:-c, c:-c, c:-c].ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.97


def test_sirt_nonneg_constraint():
    """Projected SIRT (nonneg=True) keeps the volume non-negative without
    losing fidelity on a non-negative phantom."""
    from scipy.ndimage import gaussian_filter

    from voltools_tpu.models import TiltSeriesProjector, sirt_reconstruct

    shape = (18, 18, 18)
    rng = np.random.default_rng(0)
    vol = np.abs(gaussian_filter(rng.standard_normal(shape),
                                 1.6)).astype(np.float32)
    proj = TiltSeriesProjector(vol, interpolation="linear", device="jax")
    angles = np.arange(-60.0, 61.0, 10.0)
    ms = proj.tilt_matrices(angles, tilt_axis=0)
    p = proj.project(angles, tilt_axis=0)
    rec = sirt_reconstruct(p, ms, shape, iterations=20, device="jax",
                           nonneg=True)
    assert rec.min() >= 0.0
    c = 4
    a = vol[c:-c, c:-c, c:-c].ravel()
    assert np.corrcoef(a, rec[c:-c, c:-c, c:-c].ravel())[0, 1] > 0.9


@pytest.mark.parametrize("pax,tilt_axis", [(1, 0), (2, 1)])
def test_wbp_other_projection_axes(pax, tilt_axis):
    """The reconstruction loop closes for every projection axis, not just
    the default beam-along-axis-0 geometry."""
    from scipy.ndimage import gaussian_filter

    from voltools_tpu.models import TiltSeriesProjector, wbp_reconstruct

    shape = (20, 22, 24)
    rng = np.random.default_rng(0)
    vol = gaussian_filter(rng.standard_normal(shape), 1.6).astype(np.float32)
    proj = TiltSeriesProjector(vol, interpolation="linear", device="jax",
                               projection_axis=pax)
    angles = np.arange(0.0, 180.0, 10.0)
    ms = proj.tilt_matrices(angles, tilt_axis=tilt_axis)
    p = proj.project(angles, tilt_axis=tilt_axis)
    rec = wbp_reconstruct(p, ms, shape, projection_axis=pax, device="jax")
    c = 5
    a = vol[c:-c, c:-c, c:-c].ravel()
    b = rec[c:-c, c:-c, c:-c].ravel()
    assert np.corrcoef(a, b)[0, 1] > 0.95


def test_sirt_mesh_volume_sharded_matches_single():
    """Volume-sharded SIRT (z-slab per device: per-slab zero-extension
    forward psum'd over the mesh, slab-offset adjoint) equals the
    single-device SIRT — including with a z extent that does not divide
    the mesh, a non-default projection axis, and nonneg projection."""
    from scipy.ndimage import gaussian_filter

    from voltools_tpu.models import TiltSeriesProjector, sirt_reconstruct
    from voltools_tpu.parallel import make_mesh

    mesh8 = make_mesh(8)
    shape = (24, 20, 20)
    rng = np.random.default_rng(3)
    vol = gaussian_filter(rng.standard_normal(shape), 2.0).astype(np.float32)
    proj = TiltSeriesProjector(vol, interpolation="linear", device="jax")
    angles = np.arange(-60.0, 61.0, 15.0)
    ms = proj.tilt_matrices(angles, tilt_axis=0)
    p = proj.project(angles, tilt_axis=0)

    rec1 = sirt_reconstruct(p, ms, shape, iterations=5, device="jax")
    rec8 = sirt_reconstruct(p, ms, shape, iterations=5, mesh=mesh8)
    np.testing.assert_allclose(rec8, rec1, atol=5e-5)

    # odd z extent (24 -> 23: slabs padded), nonneg projection
    shape_o = (23, 20, 20)
    vol_o = vol[:23]
    proj_o = TiltSeriesProjector(vol_o, interpolation="linear", device="jax")
    ms_o = proj_o.tilt_matrices(angles, tilt_axis=1)
    p_o = proj_o.project(angles, tilt_axis=1)
    rec1_o = sirt_reconstruct(p_o, ms_o, shape_o, iterations=4,
                              nonneg=True, device="jax")
    rec8_o = sirt_reconstruct(p_o, ms_o, shape_o, iterations=4,
                              nonneg=True, mesh=mesh8)
    np.testing.assert_allclose(rec8_o, rec1_o, atol=5e-5)


def test_projector_callable_honors_foreign_matrices():
    """Regression: the callable from _projector_for froze the planning-time
    per-matrix fits; handing it OTHER matrices paired fresh payloads with
    stale kax/y_lo bands (silently wrong projections).  It must re-plan."""
    rng = np.random.default_rng(11)
    vol = rng.random((24, 24, 24)).astype(np.float32)
    proj = TiltSeriesProjector(vol, interpolation="linear", device="jax")
    ms_a = proj.tilt_matrices([-30.0, 15.0], tilt_axis=1)
    ms_b = proj.tilt_matrices([40.0, -5.0], tilt_axis=1)
    p = proj._projector_for(ms_a)
    got = np.asarray(p(proj.data, ms_b))
    want = np.asarray(proj.project([40.0, -5.0], tilt_axis=1))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # different length: re-plans from scratch rather than feeding an
    # n=2 batched program three matrices
    ms_c = proj.tilt_matrices([0.0, 25.0, -25.0], tilt_axis=1)
    got3 = np.asarray(p(proj.data, ms_c))
    want3 = np.asarray(proj.project([0.0, 25.0, -25.0], tilt_axis=1))
    np.testing.assert_allclose(got3, want3, atol=1e-5)


def test_reconstruct_projection_axis_normalized():
    """Regression: negative (numpy-style) projection_axis silently corrupted
    the keep-axes geometry (keep-list compares against range(3) literals)."""
    from voltools_tpu.models import (TiltSeriesProjector, sirt_reconstruct,
                                     wbp_reconstruct)
    rng = np.random.default_rng(5)
    vol = rng.random((16, 16, 16)).astype(np.float32)
    proj = TiltSeriesProjector(vol, device="jax")
    ms = proj.tilt_matrices([-20.0, 0.0, 20.0], tilt_axis=1)
    p = np.asarray(proj.project([-20.0, 0.0, 20.0], tilt_axis=1))
    a = wbp_reconstruct(p, ms, vol.shape, projection_axis=0, device="jax")
    b = wbp_reconstruct(p, ms, vol.shape, projection_axis=-3, device="jax")
    np.testing.assert_array_equal(a, b)
    s0 = sirt_reconstruct(p, ms, vol.shape, iterations=2, projection_axis=0,
                          device="jax")
    s3 = sirt_reconstruct(p, ms, vol.shape, iterations=2, projection_axis=-3,
                          device="jax")
    np.testing.assert_array_equal(s0, s3)
    with pytest.raises(ValueError, match="projection_axis"):
        wbp_reconstruct(p, ms, vol.shape, projection_axis=3, device="jax")
    with pytest.raises(ValueError, match="projection_axis"):
        sirt_reconstruct(p, ms, vol.shape, projection_axis=-4, device="jax")


def test_reconstruct_output_contract():
    """Regression: wbp/sirt ignored a numpy output buffer (left it stale)
    and treated misspelled output strings as None."""
    from voltools_tpu.models import (TiltSeriesProjector, sirt_reconstruct,
                                     wbp_reconstruct)
    rng = np.random.default_rng(6)
    vol = rng.random((12, 12, 12)).astype(np.float32)
    proj = TiltSeriesProjector(vol, device="jax")
    ms = proj.tilt_matrices([-15.0, 15.0], tilt_axis=1)
    p = np.asarray(proj.project([-15.0, 15.0], tilt_axis=1))
    want = wbp_reconstruct(p, ms, vol.shape, device="jax")
    buf = np.zeros(vol.shape, np.float32)
    assert wbp_reconstruct(p, ms, vol.shape, output=buf,
                           device="jax") is None
    np.testing.assert_array_equal(buf, want)
    sw = sirt_reconstruct(p, ms, vol.shape, iterations=2, device="jax")
    sbuf = np.zeros(vol.shape, np.float32)
    assert sirt_reconstruct(p, ms, vol.shape, iterations=2,
                            output=sbuf, device="jax") is None
    np.testing.assert_array_equal(sbuf, sw)
    with pytest.raises(ValueError, match="output"):
        wbp_reconstruct(p, ms, vol.shape, output="Device", device="jax")
    with pytest.raises(ValueError, match="output shape"):
        wbp_reconstruct(p, ms, vol.shape, device="jax",
                        output=np.zeros((2,) + vol.shape, np.float32))
    # sirt validates inputs like wbp now
    with pytest.raises(ValueError, match="projections"):
        sirt_reconstruct(p[0], ms[:1], vol.shape, device="jax")
    with pytest.raises(ValueError, match="out_shape"):
        sirt_reconstruct(p, ms, (12, 12), device="jax")
