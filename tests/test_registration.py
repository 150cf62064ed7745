"""Volume registration: phase cross-correlation + gradient-descent
alignment (a capability beyond the CUDA reference — see
voltools_tpu/models/registration.py module docstring)."""

import numpy as np
import pytest

import jax.numpy as jnp

from voltools_tpu.models import (RegistrationResult, phase_cross_correlation,
                                 register)
from voltools_tpu.ops.sampling import affine_sample


def _smooth(shape, seed=0, sigma=2.0):
    from scipy.ndimage import gaussian_filter
    rng = np.random.default_rng(seed)
    v = gaussian_filter(rng.standard_normal(shape), sigma)
    return (v / np.abs(v).max()).astype(np.float32)


def _content_shift_matrix(t):
    """Pull-back matrix moving content by +t (src = x - t)."""
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = -np.asarray(t, np.float32)
    return m


# ---------------------------------------------------------------------------
# phase cross-correlation
# ---------------------------------------------------------------------------

def test_pcc_integer_shift_exact():
    ref = np.asarray(_smooth((24, 26, 22), seed=1))
    mov = np.roll(ref, (4, -3, 2), axis=(0, 1, 2))
    # np.roll content by +s: registering shift is -s
    shift = np.asarray(phase_cross_correlation(ref, mov))
    np.testing.assert_array_equal(shift, [-4.0, 3.0, -2.0])


def test_pcc_subpixel_fourier_shift():
    """Tight bound on the estimator itself: ground truth is an exact
    Fourier shift, for which phase correlation is unbiased."""
    ref = _smooth((32, 32, 32), seed=2, sigma=2.5)
    t = np.asarray([1.3, -0.6, 0.4], np.float32)
    F = np.fft.fftn(ref)
    k = [np.fft.fftfreq(n) for n in ref.shape]
    ph = np.exp(-2j * np.pi * (k[0][:, None, None] * t[0]
                               + k[1][None, :, None] * t[1]
                               + k[2][None, None, :] * t[2]))
    mov = np.fft.ifftn(F * ph).real.astype(np.float32)
    shift = np.asarray(phase_cross_correlation(ref, mov, upsample=20))
    np.testing.assert_allclose(shift, -t, atol=0.06)


def test_pcc_subpixel_resampled():
    """Interpolated resampling distorts high-frequency phase; plain
    cross-correlation weighting (normalization=None) handles it."""
    ref = _smooth((32, 32, 32), seed=2, sigma=1.2)
    t = np.asarray([1.3, -0.6, 0.4], np.float32)
    mov = np.asarray(affine_sample(ref, _content_shift_matrix(t), "linear"))
    shift = np.asarray(phase_cross_correlation(ref, mov, upsample=20,
                                               normalization=None))
    np.testing.assert_allclose(shift, -t, atol=0.15)


def test_pcc_matches_translate_verb():
    """The returned shift plugs directly into the library's translate."""
    from voltools_tpu import transform

    ref = _smooth((20, 20, 20), seed=3)
    mov = np.roll(ref, (3, 0, -2), axis=(0, 1, 2))
    shift = np.asarray(phase_cross_correlation(ref, mov))
    back = transform(mov, translation=tuple(shift), device="cpu")
    c = 5
    np.testing.assert_allclose(back[c:-c, c:-c, c:-c],
                               ref[c:-c, c:-c, c:-c], atol=1e-4)


def test_pcc_jit_vmap():
    """The estimator is a pure jax function: batch it over subtomograms
    with vmap under jit (the claim in the module docstring)."""
    import functools

    import jax

    ref = np.asarray(_smooth((16, 16, 16), seed=10))
    movs = np.stack([np.roll(ref, (2, -1, 3), (0, 1, 2)),
                     np.roll(ref, (-4, 0, 1), (0, 1, 2))])
    f = jax.jit(jax.vmap(functools.partial(
        phase_cross_correlation, jnp.asarray(ref), upsample=4)))
    out = np.asarray(f(jnp.asarray(movs)))
    np.testing.assert_allclose(out, [[-2, 1, -3], [4, 0, -1]], atol=1e-6)


def test_pcc_validation():
    v = np.zeros((8, 8, 8), np.float32)
    with pytest.raises(ValueError):
        phase_cross_correlation(v, np.zeros((8, 8, 9), np.float32))
    with pytest.raises(ValueError):
        phase_cross_correlation(v, v, upsample=0)
    with pytest.raises(ValueError):
        phase_cross_correlation(v, v, normalization="bogus")


# ---------------------------------------------------------------------------
# gradient-descent registration
# ---------------------------------------------------------------------------

def test_register_translation_model():
    ref = _smooth((24, 24, 24), seed=4)
    t = np.asarray([0.8, -0.5, 0.3], np.float32)
    mov = np.asarray(affine_sample(ref, _content_shift_matrix(-t), "linear"))
    # mov's content sits at -t: registering content-shift is +t
    # (mse branch; every other test runs the default ncc)
    res = register(mov, ref, model="translation", steps=120, lr=0.05,
                   loss="mse")
    assert isinstance(res, RegistrationResult)
    np.testing.assert_allclose(res.params["t"], t, atol=0.05)
    assert res.loss_history[-1] < res.loss_history[0]


def test_register_rigid_recovers_rotation_and_shift():
    from voltools_tpu.utils import rodrigues_matrix

    ref = _smooth((24, 24, 24), seed=5, sigma=1.8)
    center = tuple((s - 1) / 2 for s in ref.shape)
    w_true = np.asarray([0.06, -0.09, 0.07], np.float32)   # ~7.5 deg total
    t_true = np.asarray([0.6, -0.4, 0.3], np.float32)
    m_true = np.array(rodrigues_matrix(jnp.asarray(w_true), center))
    m_true[:3, 3] -= t_true  # compose a content shift onto the rotation
    mov_target = np.asarray(affine_sample(ref, m_true, "linear"))

    # register ref onto mov_target: recovered params should equal (w, t)
    res = register(ref, mov_target, model="rigid", steps=250, lr=0.02)
    err_deg = np.degrees(np.linalg.norm(res.params["w"] - w_true))
    assert err_deg < 0.3, f"rotation off by {err_deg:.3f} deg"
    # verify by applying: matrix reproduces the target volume
    out = np.asarray(affine_sample(ref, res.matrix, "linear"))
    c = 4
    err = np.abs(out - mov_target)[c:-c, c:-c, c:-c].max()
    assert err < 0.02, f"registered volume off by {err:.4f}"


def test_register_ncc_intensity_invariant():
    ref = _smooth((20, 20, 20), seed=6)
    t = np.asarray([0.7, 0.2, -0.4], np.float32)
    mov = np.asarray(affine_sample(ref, _content_shift_matrix(-t), "linear"))
    res = register(mov, 3.0 * ref + 1.0, model="translation", loss="ncc",
                   steps=120, lr=0.05, init_translation=None)
    np.testing.assert_allclose(res.params["t"], t, atol=0.08)


def test_register_affine_recovers_scale():
    ref = _smooth((24, 24, 24), seed=7, sigma=2.2)
    center = np.asarray([(s - 1) / 2 for s in ref.shape], np.float32)
    L = np.diag([1.06, 0.95, 1.03]).astype(np.float32)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = L
    m[:3, 3] = center - L @ center
    target = np.asarray(affine_sample(ref, m, "linear"))

    res = register(ref, target, model="affine", steps=300, lr=0.01,
                   init_translation=None)
    np.testing.assert_allclose(res.params["linear"], L, atol=0.02)


def test_register_multiscale_large_shift():
    """levels=2 pulls in a shift well outside the single-level capture
    range of the MSE basin (phase init disabled to make it earn it)."""
    ref = _smooth((32, 32, 32), seed=8, sigma=2.5)
    t = np.asarray([4.0, -3.0, 2.5], np.float32)
    mov = np.asarray(affine_sample(ref, _content_shift_matrix(-t), "linear"))
    res = register(mov, ref, model="translation", steps=150, lr=0.1,
                   levels=2, init_translation=None)
    np.testing.assert_allclose(res.params["t"], t, atol=0.15)


def test_register_apply_roundtrip():
    ref = _smooth((20, 20, 20), seed=9)
    t = np.asarray([0.5, -0.3, 0.2], np.float32)
    mov = np.asarray(affine_sample(ref, _content_shift_matrix(-t), "linear"))
    res = register(mov, ref, model="translation", steps=120, lr=0.05)
    out = res.apply(mov, device="cpu")
    # compare against the ground-truth resample of mov (the pristine ref is
    # unreachable: mov is already an interpolated copy)
    expected = np.asarray(affine_sample(mov, _content_shift_matrix(t),
                                        "linear"))
    c = 3
    np.testing.assert_allclose(out[c:-c, c:-c, c:-c],
                               expected[c:-c, c:-c, c:-c], atol=0.02)


def test_register_validation():
    v = np.zeros((8, 8, 8), np.float32)
    with pytest.raises(ValueError):
        register(v, v, model="projective")
    with pytest.raises(ValueError):
        register(v, v, loss="ssim")
    with pytest.raises(ValueError):
        register(v, v, levels=0)
    with pytest.raises(ValueError):
        register(v, np.zeros((8, 8, 9), np.float32))
    # an edge crop that leaves no voxels would make the loss NaN silently
    with pytest.raises(ValueError, match="edge"):
        register(v, v, model="translation", edge=4)


def test_register_coarse_level_edge_clamped():
    """A full-resolution-valid edge must survive pyramid downscaling: at a
    coarse level the rounded edge could otherwise empty the crop and NaN
    the whole level's loss."""
    v = _smooth((32, 12, 12), seed=5)
    # edge=5 is valid at full res (2*5 < 12); at level 2 the z-rounded
    # edge round(5*8/32)=1 is fine but lshape=(8,4,4) demands clamping
    # against min(lshape)=4 for any larger rounding
    res = register(v, v, model="translation", edge=5, levels=3, steps=2,
                   init_translation=None)
    assert np.isfinite(np.asarray(res.loss_history)).all()


def test_register_filt_bspline_prefilters_once():
    """Regression: the level program re-ran the 3-axis B-spline prefilter
    (and its gradient) inside every Adam step; it must prefilter once per
    level and still converge identically (the math is unchanged)."""
    ref = _smooth((20, 20, 20), seed=8)
    t = np.asarray([0.7, -0.4, 0.2], np.float32)
    mov = np.asarray(affine_sample(ref, _content_shift_matrix(-t),
                                   "filt_bspline"))
    res = register(mov, ref, model="translation", steps=100, lr=0.05,
                   interpolation="filt_bspline", loss="mse")
    np.testing.assert_allclose(res.params["t"], t, atol=0.06)
    assert res.loss_history[-1] < res.loss_history[0]
