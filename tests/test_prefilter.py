"""B-spline prefilter tests: scan vs FIR vs scipy vs a direct (numpy) port of
the reference's recursive IIR semantics."""

import numpy as np
import pytest
from scipy.ndimage import spline_filter

from voltools_tpu.ops.prefilter import (
    POLE,
    bspline_prefilter,
    prefilter_fir,
    prefilter_scan,
)


def reference_iir_clamp(x):
    """Literal (host) transcription of the reference recursion semantics
    (``voltools/kernels/bspline.h:2-54``): clamped boundary, horizon 12."""
    p, lam = POLE, (1 - POLE) * (1 - 1 / POLE)
    c = x.astype(np.float64).copy()
    n = len(c)
    horizon = min(12, n)
    zn, acc = p, c[0]
    for k in range(horizon):
        acc += zn * c[k]
        zn *= p
    c[0] = prev = lam * acc
    for k in range(1, n):
        c[k] = prev = lam * c[k] + p * prev
    c[n - 1] = prev = (p / (p - 1.0)) * c[n - 1]
    for k in range(n - 2, -1, -1):
        c[k] = prev = p * (prev - c[k])
    return c.astype(np.float32)


@pytest.mark.parametrize("method", ["scan", "fir"])
def test_prefilter_matches_scipy_mirror(small_volume, method):
    expected = spline_filter(small_volume, order=3, mode="mirror",
                             output=np.float32)
    got = np.asarray(bspline_prefilter(small_volume, "mirror", method))
    np.testing.assert_allclose(got, expected, atol=3e-5)


@pytest.mark.parametrize("n", [5, 12, 13, 41, 128])
def test_clamp_boundary_matches_reference_iir(n, rng):
    x = rng.random(n).astype(np.float32)
    expected = reference_iir_clamp(x)
    got = np.asarray(prefilter_scan(x[None, None, :], 2, "clamp"))[0, 0]
    np.testing.assert_allclose(got, expected, atol=1e-4 * max(1, n // 16))


@pytest.mark.parametrize("shape", [(7, 9, 11), (16, 16, 16), (13, 8, 21)])
def test_prefilter_then_sample_is_interpolating(shape, rng):
    """Cubic sampling of the prefiltered volume at grid points must return
    the original samples (that is the definition of the prefilter)."""
    from voltools_tpu.ops import affine_sample

    vol = rng.random(shape).astype(np.float32)
    coeffs = np.asarray(bspline_prefilter(vol, "mirror", "fir"))
    got = np.asarray(affine_sample(coeffs, np.eye(4, dtype=np.float32),
                                   "bspline"))
    np.testing.assert_allclose(got, vol, atol=2e-5)


def test_fir_equals_scan_interior(rng):
    vol = rng.random((40, 40, 40)).astype(np.float32)
    a = np.asarray(bspline_prefilter(vol, "mirror", "fir"))
    b = np.asarray(bspline_prefilter(vol, "mirror", "scan"))
    np.testing.assert_allclose(a, b, atol=3e-5)


def test_tiny_axes_do_not_crash(rng):
    vol = rng.random((1, 2, 50)).astype(np.float32)
    for method in ("scan", "fir"):
        out = np.asarray(bspline_prefilter(vol, "mirror", method))
        assert out.shape == vol.shape
        assert np.isfinite(out).all()


def test_prefilter_fir_rejects_clamp():
    """Regression: prefilter_fir accepted boundary='clamp' but its FIR
    formulation is mirror-only (~5e-2 edge error vs the exact scan); it
    must raise instead of silently returning wrong edge coefficients."""
    x = np.random.default_rng(1).random((8, 8, 8)).astype(np.float32)
    with pytest.raises(ValueError, match="mirror"):
        prefilter_fir(x, 0, "clamp")
