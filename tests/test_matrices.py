"""Matrix-layer unit tests.

Oracles: scipy.spatial.transform.Rotation for the Euler machinery (fully
independent of our implementation) plus structural identities.  The reference
promised but never wrote these tests (``tests/test_transforms.py:1-8``)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from voltools_tpu.utils import (
    AVAILABLE_ROTATIONS,
    AVAILABLE_UNITS,
    rotation_matrix,
    scale_matrix,
    shear_matrix,
    transform_matrix,
    translation_matrix,
)


def test_rotation_order_registry():
    assert len(AVAILABLE_ROTATIONS) == 24
    assert set(AVAILABLE_UNITS) == {"rad", "deg"}
    for name in ["sxyz", "rzxz", "szyz", "rxyx", "ryzy"]:
        assert name in AVAILABLE_ROTATIONS


@pytest.mark.parametrize("order", [
    # static frame = scipy extrinsic (lowercase); rotating = intrinsic (upper)
    "sxyz", "sxzy", "szyx", "szxz", "szyz", "syxy",
    "rzxz", "rxyz", "rzyx", "rzyz", "ryzy", "rxzx",
])
def test_rotation_matrix_vs_scipy(order):
    angles = np.array([17.0, -33.0, 71.0])
    ours = rotation_matrix(angles, "deg", order)[:3, :3]
    seq = order[1:] if order[0] == "s" else order[1:].upper()
    # our convention negates the angles ("CCW" pull-back notation)
    ref = Rotation.from_euler(seq, -angles, degrees=True).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_rotating_equals_reversed_static():
    """Gohlke convention: r-order(a1,a2,a3) == s-reversed-order(a3,a2,a1)."""
    angles = (10.0, 20.0, 30.0)
    r = rotation_matrix(angles, "deg", "rzxz")
    s = rotation_matrix(angles[::-1], "deg", "szxz")
    np.testing.assert_allclose(r, s, atol=1e-6)


def test_rotation_units():
    deg = rotation_matrix((90, 0, 0), "deg", "sxyz")
    rad = rotation_matrix((np.pi / 2, 0, 0), "rad", "sxyz")
    np.testing.assert_allclose(deg, rad, atol=1e-6)
    with pytest.raises(ValueError):
        rotation_matrix((1, 2, 3), "grad", "sxyz")
    with pytest.raises(ValueError):
        rotation_matrix((1, 2, 3), "deg", "xyzw")


def test_rotation_is_orthonormal():
    for order in AVAILABLE_ROTATIONS:
        m = rotation_matrix((31.0, -47.0, 113.0), "deg", order)[:3, :3]
        np.testing.assert_allclose(m @ m.T, np.eye(3), atol=1e-6)
        assert np.isclose(np.linalg.det(m), 1.0, atol=1e-6)


def test_translation_negated():
    m = translation_matrix((1.0, 2.0, 3.0))
    np.testing.assert_allclose(m[:3, 3], [-1.0, -2.0, -3.0])
    np.testing.assert_allclose(m[:3, :3], np.eye(3))


def test_scale_shear_layout():
    s = scale_matrix((2.0, 3.0, 4.0))
    np.testing.assert_allclose(np.diag(s), [2.0, 3.0, 4.0, 1.0])
    sh = shear_matrix((0.1, 0.2, 0.3))
    assert sh[0, 1] == np.float32(0.1)
    assert sh[0, 2] == np.float32(0.2)
    assert sh[1, 2] == np.float32(0.3)
    assert np.count_nonzero(sh - np.eye(4)) == 3


def test_transform_matrix_composition_order():
    scale = (1.5, 0.8, 1.1)
    shear = (0.05, -0.02, 0.03)
    rot = (20.0, 10.0, -5.0)
    trans = (2.0, -1.0, 0.5)
    center = (8.0, 9.0, 10.0)
    m = transform_matrix(scale, shear, rot, "deg", "rzxz", trans, center)
    expected = (translation_matrix(trans)
                @ translation_matrix([-c for c in center])
                @ rotation_matrix(rot, "deg", "rzxz")
                @ shear_matrix(shear)
                @ scale_matrix(scale)
                @ translation_matrix(center))
    expected /= expected[3, 3]
    np.testing.assert_allclose(m, expected, atol=1e-5)


def test_transform_matrix_identity():
    np.testing.assert_allclose(transform_matrix(), np.eye(4))
    # center alone must cancel out
    np.testing.assert_allclose(transform_matrix(center=(5, 6, 7)), np.eye(4),
                               atol=1e-6)
