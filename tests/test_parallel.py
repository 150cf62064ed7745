"""Multi-chip tests on the CPU-emulated 8-device mesh: ShardedVolume halo and
gather paths, data-parallel matrix batches — all asserted against the
single-chip kernel (and transitively against scipy)."""

import numpy as np
import pytest

import voltools_tpu as vt
from voltools_tpu.parallel import (
    ShardedVolume,
    halo_for_matrix,
    make_mesh,
    sharded_affine_batch,
)
from voltools_tpu.utils import rotation_matrix, transform_matrix, translation_matrix


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


@pytest.fixture(scope="module")
def volume():
    rng = np.random.default_rng(99)
    return rng.random((64, 24, 24)).astype(np.float32)


def test_mesh_has_8_devices(mesh):
    assert mesh.devices.size == 8


def test_halo_estimation(volume):
    m = translation_matrix((2.0, 0.0, 0.0))
    h = halo_for_matrix(volume.shape, m, "linear")
    assert h is not None and 3 <= h <= 4
    # rotation about axis 1 swaps axes 0 and 2: source z spans the volume
    big = rotation_matrix((0.0, 90.0, 0.0), "deg", "sxyz")
    h_big = halo_for_matrix(volume.shape, big, "linear")
    assert h_big is None or h_big > 8


@pytest.mark.parametrize("interpolation", ["linear", "filt_bspline"])
def test_sharded_local_transform(mesh, volume, interpolation):
    """Small translation -> halo-exchange path; must equal single-chip."""
    sv = ShardedVolume(volume, interpolation=interpolation, mesh=mesh)
    m = transform_matrix(translation=(1.3, -0.8, 0.4),
                         rotation=(0, 0, 2.0), rotation_order="rzxz",
                         center=np.divide(np.subtract(volume.shape, 1), 2))
    assert halo_for_matrix(volume.shape, m, interpolation) is not None
    got = sv.affine(m)
    expected = vt.affine(volume, m, interpolation=interpolation, device="jax")
    np.testing.assert_allclose(got, expected, atol=3e-5)


@pytest.mark.parametrize("strategy", ["stream", "gather"])
@pytest.mark.parametrize("interpolation", ["linear", "bspline"])
def test_sharded_global_transform(mesh, volume, interpolation, strategy):
    """Large rotation -> global path (gather-free ring stream by default,
    all-gather opt-in); both must equal single-chip."""
    sv = ShardedVolume(volume, interpolation=interpolation, mesh=mesh,
                       global_strategy=strategy)
    m = transform_matrix(rotation=(70.0, 30.0, -10.0), rotation_order="rzxz",
                         center=np.divide(np.subtract(volume.shape, 1), 2))
    got = sv.affine(m)
    expected = vt.affine(volume, m, interpolation=interpolation, device="jax")
    np.testing.assert_allclose(got, expected, atol=3e-5)


@pytest.mark.parametrize("mode", ["constant", "border"])
def test_sharded_stream_full_3d_rotation(mesh, mode):
    """Gather-free ring stream vs the single-chip oracle for a full-3D
    rotation (all source slabs contribute to every output slab), both
    interpolation families, both edge modes, cval != 0."""
    from voltools_tpu.ops.sampling import affine_sample

    rng = np.random.default_rng(17)
    vol = rng.random((48, 20, 28)).astype(np.float32)
    m = np.asarray(transform_matrix(
        rotation=(111.0, -67.0, 148.0), rotation_order="sxyz",
        center=tuple(s / 2 for s in vol.shape)), np.float32)
    assert halo_for_matrix(vol.shape, m, "linear") is None  # truly global
    for interpolation in ("linear", "filt_bspline"):
        sv = ShardedVolume(vol, interpolation=interpolation, mesh=mesh,
                           mode=mode, cval=0.25)
        got = sv.affine(m)
        want = np.asarray(affine_sample(vol, m, interpolation, mode, 0.25))
        err = np.abs(got - want)
        err[_knife_mask(m, vol.shape)] = 0
        assert err.max() < 5e-4, (interpolation, mode, err.max())


def _shardmap_body_shapes(fn, *args):
    """All output avals' shapes inside the shard_map body of ``fn``."""
    import jax

    closed = jax.make_jaxpr(fn)(*args)
    shapes = []

    def subjaxprs(value):
        vals = value if isinstance(value, (tuple, list)) else (value,)
        for v in vals:
            if hasattr(v, "jaxpr"):        # ClosedJaxpr
                yield v.jaxpr
            elif hasattr(v, "eqns"):       # Jaxpr
                yield v

    def walk(jaxpr, in_body):
        for eqn in jaxpr.eqns:
            inner = in_body or eqn.primitive.name == "shard_map"
            if in_body:
                for var in eqn.outvars:
                    aval = getattr(var, "aval", None)
                    shape = getattr(aval, "shape", None)
                    if shape:
                        shapes.append(tuple(shape))
            for p in eqn.params.values():
                for sj in subjaxprs(p):
                    walk(sj, inner)

    walk(closed.jaxpr, False)
    return shapes


def test_stream_global_never_materialises_full_volume(mesh, volume):
    """The memory contract of the default global path: no array of the
    full volume's size exists inside the shard_map body (each chip holds
    slab-sized buffers only), while the opt-in 'gather' body does
    materialise one (positive control for the detector)."""
    import jax.numpy as jnp

    m = jnp.asarray(transform_matrix(
        rotation=(70.0, 30.0, -10.0), rotation_order="rzxz",
        center=np.divide(np.subtract(volume.shape, 1), 2)), jnp.float32)
    d0 = volume.shape[0]
    local = d0 // mesh.devices.size

    sv = ShardedVolume(volume, mesh=mesh)   # default: stream
    fn = sv._get_sampler(None, None)
    big = [s for s in _shardmap_body_shapes(fn, sv.data, m)
           if len(s) == 3 and s[0] > local]
    assert not big, f"full-size arrays inside the stream body: {big}"

    svg = ShardedVolume(volume, mesh=mesh, global_strategy="gather")
    fng = svg._get_sampler(None, None)
    bigg = [s for s in _shardmap_body_shapes(fng, svg.data, m)
            if len(s) == 3 and s[0] >= d0]
    assert bigg, "detector failed to see the all-gather body's full volume"


def test_sharded_edge_semantics(mesh, volume):
    """Content pushed past the global edge must vanish, not wrap between
    shards (ring-permute wraparound must not leak)."""
    sv = ShardedVolume(volume, mesh=mesh)
    m = translation_matrix((5.0, 0.0, 0.0))  # shift content +5 along axis 0
    got = sv.affine(m)
    expected = vt.affine(volume, m, device="jax")
    np.testing.assert_allclose(got, expected, atol=3e-5)
    assert np.allclose(got[:5], 0.0, atol=1e-6)


def test_sharded_output_device(mesh, volume):
    import jax
    sv = ShardedVolume(volume, mesh=mesh)
    res = sv.affine(np.eye(4, dtype=np.float32), output="device")
    assert isinstance(res, jax.Array)
    np.testing.assert_allclose(np.asarray(res), volume, atol=1e-6)


def test_sharded_validation(mesh):
    with pytest.raises(ValueError):
        ShardedVolume(np.zeros((8, 8), np.float32), mesh=mesh)


def _knife_mask(m, shape, tol=1e-4):
    """Near-integer AND near-half-integer (border discard band) source
    coordinates, where independent f32 evaluations may disagree by 1 ulp."""
    idx = np.indices(shape, dtype=np.float64).reshape(3, -1)
    src = np.asarray(m, np.float64)[:3, :3] @ idx + \
        np.asarray(m, np.float64)[:3, 3:4]
    near = np.abs(src - np.round(src)) < tol
    near |= np.abs(src - np.round(src + 0.5) + 0.5) < tol
    return near.any(axis=0).reshape(shape)


@pytest.mark.parametrize("shape", [(61, 24, 24), (9, 24, 26)])
@pytest.mark.parametrize("mode", ["constant", "border"])
def test_sharded_non_divisible_extent(mesh, shape, mode):
    """Axis-0 extents that don't divide over the mesh are padded with
    mode-correct boundary planes (mirror/zeros), masked against the TRUE
    extent, and cropped on output -- results match the single-chip oracle
    on both the halo and the gather path."""
    from voltools_tpu.ops.sampling import affine_sample

    rng = np.random.default_rng(3)
    vol = rng.random(shape).astype(np.float32)
    sv = ShardedVolume(vol, mesh=mesh, interpolation="filt_bspline",
                       mode=mode)
    for rot in [(3, -4, 5), (40, 55, -70)]:   # halo path, gather path
        m = np.asarray(transform_matrix(
            rotation=rot, rotation_order="sxyz",
            center=tuple(s / 2 for s in shape)), np.float32)
        got = sv.affine(m)
        assert got.shape == shape
        want = np.asarray(affine_sample(vol, m, "filt_bspline", mode))
        err = np.abs(got - want)
        err[_knife_mask(m, shape)] = 0
        assert err.max() < 5e-4, (shape, mode, rot, err.max())


def test_sharded_affine_batch(mesh, volume):
    ms = np.stack([rotation_matrix((a, 0, 0), "deg", "rzxz")
                   for a in np.linspace(0, 35, 8)])
    got = sharded_affine_batch(volume, ms, mesh=mesh)
    assert got.shape == (8,) + volume.shape
    for i in (0, 3, 7):
        expected = vt.affine(volume, ms[i], device="jax")
        np.testing.assert_allclose(got[i], expected, atol=3e-5)


def test_sharded_batch_pallas_plan(mesh):
    """The DP sweep must run the planner's grid-batched kernel under
    shard_map (round-2 verdict: it previously always routed through the XLA
    gather sampler).  Forced walk plan, interpreter-mode kernels, asserted
    against the XLA path off knife edges."""
    from voltools_tpu.kernels.pallas_walk import choose_walk_variant

    rng = np.random.default_rng(3)
    vol = rng.random((48, 48, 48)).astype(np.float32)
    c = (np.asarray(vol.shape) - 1) / 2
    ms = np.stack([
        np.asarray(transform_matrix(rotation=(0.0, a, 0.0),
                                    rotation_order="rzxz", center=c),
                   np.float32)
        for a in np.linspace(-21.0, 21.0, 8)])
    plan = choose_walk_variant(ms, vol.shape, "linear", "constant")
    assert plan is not None, "tilt envelope must admit a walk plan here"
    got = sharded_affine_batch(vol, ms, mesh=mesh, _plan=plan,
                               _interpret=True)
    want = sharded_affine_batch(vol, ms, mesh=mesh)
    idx = np.indices(vol.shape, dtype=np.float64).reshape(3, -1)
    for i, m in enumerate(ms):
        src = (np.asarray(m, np.float64)[:3, :3] @ idx
               + np.asarray(m, np.float64)[:3, 3:4])
        near = (np.abs(src - np.round(src)) < 1e-4).any(axis=0)
        err = np.where(near.reshape(vol.shape), 0.0,
                       np.abs(got[i] - want[i]))
        assert err.max() <= 5e-5


def test_sharded_batch_validation(mesh, volume):
    with pytest.raises(ValueError):
        sharded_affine_batch(volume, np.eye(4, dtype=np.float32), mesh=mesh)


def test_sharded_batch_non_divisible(mesh, volume):
    """A batch that doesn't divide over the mesh is padded with repeats of
    the last matrix and cropped on return."""
    rng = np.random.default_rng(2)
    ms = np.stack([np.asarray(transform_matrix(
        rotation=tuple(rng.uniform(-20, 20, 3)), rotation_order="sxyz",
        center=tuple(s / 2 for s in volume.shape)), np.float32)
        for _ in range(3)])   # 3 % 8 != 0
    got = sharded_affine_batch(volume, ms, mesh=mesh)
    assert got.shape == (3,) + volume.shape
    from voltools_tpu.ops.sampling import affine_sample
    for i in range(3):
        want = np.asarray(affine_sample(volume, ms[i], "linear", "constant"))
        np.testing.assert_allclose(got[i], want, atol=5e-5)


def test_sharded_prefilter_matches_global(mesh):
    """With slabs thicker than the FIR support, construction prefilters
    shard-wise (halo FIR over ICI) and must match the global prefilter."""
    rng = np.random.default_rng(7)
    vol = rng.random((192, 16, 16)).astype(np.float32)
    sv = ShardedVolume(vol, interpolation="filt_bspline", mesh=mesh)
    import jax
    from voltools_tpu.ops.prefilter import bspline_prefilter
    want = np.asarray(jax.jit(bspline_prefilter)(vol))
    np.testing.assert_allclose(np.asarray(sv.data), want, atol=2e-5)
    # and a transform through it still matches the single-chip result
    m = transform_matrix(rotation=(10, 4, -7), rotation_order="rzxz",
                         center=(95.5, 7.5, 7.5))
    got = sv.affine(m)
    want_t = vt.affine(vol, m, interpolation="filt_bspline", device="jax")
    np.testing.assert_allclose(got, want_t, atol=5e-5)


def test_sharded_output_buffer_guard(mesh, volume):
    """A wrong-shaped user buffer raises (np.copyto used to broadcast one
    transform into every slice); a right-shaped one is filled, returns None."""
    shv = ShardedVolume(volume, mesh=mesh)
    m = rotation_matrix((5.0, 0.0, 0.0), "deg", "rzxz")
    with pytest.raises(ValueError, match="output shape"):
        shv.affine(m, output=np.empty((2,) + volume.shape, np.float32))
    buf = np.empty(volume.shape, np.float32)
    assert shv.affine(m, output=buf) is None
    np.testing.assert_allclose(buf, shv.affine(m), atol=0)


def test_sharded_thin_volume_mirror_pad_error(mesh):
    """Regression: a volume too thin to mirror-pad to the mesh multiple
    crashed with an opaque device_put sharding error; it must raise a
    ValueError naming the constraint (mode='border' zero-pads fine)."""
    thin = np.random.default_rng(0).random((7, 16, 16)).astype(np.float32)
    with pytest.raises(ValueError, match="mirror-pad"):
        ShardedVolume(thin, mesh=mesh)
    shv = ShardedVolume(thin, mesh=mesh, mode="border")
    assert shv.shape == (7, 16, 16)
