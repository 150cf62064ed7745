"""Native C++ CPU backend tests (skipped when no toolchain is available)."""

import numpy as np
import pytest
from scipy.ndimage import affine_transform, spline_filter

import voltools_tpu as vt
from voltools_tpu import native
from voltools_tpu.utils import transform_matrix

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native backend not built")


def random_matrix(seed, shape):
    rng = np.random.default_rng(seed)
    center = np.divide(np.subtract(shape, 1), 2)
    return transform_matrix(
        scale=1.0 + 0.2 * rng.standard_normal(3),
        shear=0.05 * rng.standard_normal(3),
        rotation=rng.uniform(-180, 180, 3), rotation_order="rzxz",
        translation=rng.uniform(-2, 2, 3), center=center)


@pytest.mark.parametrize("interpolation,order,prefilter", [
    ("linear", 1, False), ("bspline", 3, False), ("filt_bspline", 3, True),
])
def test_native_matches_scipy(small_volume, interpolation, order, prefilter):
    m = random_matrix(21, small_volume.shape)
    got = native.affine_transform(small_volume, m, interpolation)
    expected = affine_transform(small_volume, m, order=order,
                                prefilter=prefilter)
    np.testing.assert_allclose(got, expected, atol=3e-5)


def test_native_prefilter_matches_scipy(small_volume):
    got = native.bspline_prefilter(small_volume)
    expected = spline_filter(small_volume, order=3, mode="mirror",
                             output=np.float32)
    np.testing.assert_allclose(got, expected, atol=3e-5)


def test_native_border_mode(small_volume):
    from voltools_tpu.ops.sampling import affine_sample
    m = random_matrix(22, small_volume.shape)
    got = native.affine_transform(small_volume, m, "linear", mode="border")
    expected = np.asarray(affine_sample(small_volume, m, "linear", "border"))
    np.testing.assert_allclose(got, expected, atol=3e-5)


def test_cpu_backend_kwarg(small_volume):
    m = random_matrix(23, small_volume.shape)
    via_api = vt.affine(small_volume, m, device="cpu", cpu_backend="native")
    via_scipy = vt.affine(small_volume, m, device="cpu")
    np.testing.assert_allclose(via_api, via_scipy, atol=3e-5)


def test_native_output_buffer(small_volume):
    m = random_matrix(24, small_volume.shape)
    buf = np.empty_like(small_volume)
    ret = vt.affine(small_volume, m, device="cpu", cpu_backend="native",
                    output=buf)
    # CPU paths return the filled output array (reference transforms.py:159-
    # 162 parity); only device paths return None
    assert ret is buf
    np.testing.assert_allclose(
        buf, vt.affine(small_volume, m, device="cpu"), atol=3e-5)


def test_native_reshape(small_volume):
    m = random_matrix(25, small_volume.shape)
    got = vt.affine(small_volume, m, device="cpu", cpu_backend="native",
                    reshape=True)
    expected = vt.affine(small_volume, m, device="cpu", reshape=True)
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=3e-5)


def test_native_output_validation(small_volume):
    """Review fix: wrong-dtype/shape output buffers must raise, not produce
    silently reinterpreted garbage."""
    m = random_matrix(26, small_volume.shape)
    with pytest.raises(ValueError, match="float32"):
        native.affine_transform(small_volume, m, "linear",
                                output=np.zeros(small_volume.shape))
    with pytest.raises(ValueError, match="shape"):
        native.affine_transform(small_volume, m, "linear",
                                output=np.zeros((2, 2, 2), np.float32))


@pytest.mark.parametrize("n", [2, 3, 4, 5, 8])
def test_native_prefilter_exact_on_short_lines(n):
    """Regression: the native causal init truncated the mirror geometric
    series, missing the periodic fold — up to 0.6 absolute coefficient
    error at n=2 (decaying through n~16).  The init now folds the whole
    2n-2 period exactly."""
    from scipy.ndimage import spline_filter

    from voltools_tpu import native
    if not native.available():
        pytest.skip("no native toolchain")
    x = np.random.default_rng(0).random((n, n, n)).astype(np.float32)
    want = spline_filter(x, order=3, mode="mirror", output=np.float32)
    np.testing.assert_allclose(native.bspline_prefilter(x), want, atol=2e-6)


def test_border_mode_backends_agree_on_small_shapes():
    """The two independent mode='border' implementations (XLA sampler and
    native C++) must agree, including prefiltered cubic on small axes
    (where the old truncated prefilter init diverged by up to 0.07)."""
    import voltools_tpu as vt
    from voltools_tpu import native
    from voltools_tpu.utils import transform_matrix
    if not native.available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(3)
    for shape in ((2, 19, 11), (15, 5, 2), (7, 3, 6)):
        vol = rng.random(shape).astype(np.float32)
        m = np.asarray(transform_matrix(
            rotation=(33.0, -47.0, 121.0), rotation_order="rzxz",
            translation=(1.2, -0.7, 0.4),
            center=tuple((s - 1) / 2 for s in shape)), np.float32)
        for interp in ("linear", "filt_bspline"):
            a = vt.affine(vol, m, interpolation=interp, device="jax",
                          mode="border", cval=0.0)
            b = vt.affine(vol, m, interpolation=interp, device="cpu",
                          mode="border", cval=0.0, cpu_backend="native")
            np.testing.assert_allclose(a, b, atol=2e-4)
