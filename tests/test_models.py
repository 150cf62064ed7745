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
