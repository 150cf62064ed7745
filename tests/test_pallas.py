"""Pallas kernel tests (interpreter mode — no TPU needed).

The kernel must agree with the XLA reference implementation (itself verified
against scipy) for every matrix class the variant chooser accepts."""

import numpy as np
import pytest

from voltools_tpu.kernels.pallas_affine import (
    affine_sample_pallas_variant,
    choose_variant,
)
from voltools_tpu.ops.sampling import affine_sample
from voltools_tpu.utils import transform_matrix, translation_matrix


@pytest.fixture(scope="module")
def volume():
    rng = np.random.default_rng(11)
    return rng.random((40, 48, 56)).astype(np.float32)


CENTER = (19.5, 23.5, 27.5)
CASES = {
    "identity": np.eye(4, dtype=np.float32),
    "translate": translation_matrix((1.5, -2.25, 0.75)),
    "scale": transform_matrix(scale=(1.3, 0.8, 1.1), center=CENTER),
    "rot_small": transform_matrix(rotation=(10, 5, -3), rotation_order="rzxz",
                                  center=CENTER),
    "rot_single_axis_60": transform_matrix(rotation=(0, 60, 0),
                                           rotation_order="sxyz",
                                           center=CENTER),
    "rot_z_170": transform_matrix(rotation=(170, 0, 0),
                                  rotation_order="rzxz", center=CENTER),
    "shear": transform_matrix(shear=(0.1, -0.05, 0.2), center=CENTER),
}


@pytest.mark.parametrize("interpolation", ["linear", "bspline"])
@pytest.mark.parametrize("mode", ["constant", "border"])
@pytest.mark.parametrize("case", list(CASES))
def test_pallas_matches_xla(volume, interpolation, mode, case):
    m = CASES[case]
    v = choose_variant(m, volume.shape, interpolation, mode)
    if v is None:
        pytest.skip("matrix outside the kernel's axis-dominant regime")
    expected = np.asarray(affine_sample(volume, m, interpolation, mode))
    got = np.asarray(affine_sample_pallas_variant(volume, m, v, 0.0,
                                                  interpret=True))
    np.testing.assert_allclose(got, expected, atol=2e-5)


def test_variant_always_exists_for_local_transforms(volume):
    for name in ("identity", "translate", "scale", "shear",
                 "rot_single_axis_60", "rot_z_170"):
        for interp in ("linear", "bspline"):
            assert choose_variant(CASES[name], volume.shape, interp) \
                is not None, (name, interp)


def test_variant_rejects_full_3d_rotation(volume):
    m = transform_matrix(rotation=(45, 45, 45), rotation_order="rzxz",
                         center=CENTER)
    # a heavily mixing rotation must not silently pick an unsound variant
    v = choose_variant(m, volume.shape, "bspline")
    if v is not None:
        got = np.asarray(affine_sample_pallas_variant(
            volume, m, v, 0.0, interpret=True))
        expected = np.asarray(affine_sample(volume, m, "bspline"))
        np.testing.assert_allclose(got, expected, atol=2e-5)


def test_tree_grid_batched_matches_oneshot(volume):
    """The select-tree grid-batched runner (leading matrix grid dim,
    per-matrix SMEM rows) must agree with per-matrix launches for a tilt
    sweep sharing one envelope variant."""
    from voltools_tpu.kernels.pallas_affine import _tree_runner

    ms = np.stack([
        np.asarray(transform_matrix(rotation=(0.0, a, 0.0),
                                    rotation_order="rzxz", center=CENTER),
                   np.float32)
        for a in (-8.0, 3.0, 11.0)])
    v = choose_variant(ms, volume.shape, "linear", "constant")
    assert v is not None, "tilt envelope must land on a tree variant here"
    outs = np.asarray(_tree_runner(v, 0.0, 3, True)(volume, ms))
    for j, m in enumerate(ms):
        want = np.asarray(affine_sample_pallas_variant(volume, m, v, 0.0,
                                                       interpret=True))
        np.testing.assert_allclose(outs[j], want, atol=1e-6)


def test_pallas_nonuniform_shape():
    rng = np.random.default_rng(3)
    vol = rng.random((17, 150, 260)).astype(np.float32)
    m = CASES["translate"]
    v = choose_variant(m, vol.shape, "linear")
    assert v is not None
    got = np.asarray(affine_sample_pallas_variant(vol, m, v, 0.0,
                                                  interpret=True))
    expected = np.asarray(affine_sample(vol, m, "linear"))
    np.testing.assert_allclose(got, expected, atol=2e-5)
