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
