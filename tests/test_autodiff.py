"""Differentiability of the sampling core (a genuinely TPU-native capability
the CUDA reference could not offer): gradients through the transform w.r.t.
both the matrix and the volume, checked against finite differences."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from voltools_tpu.ops.sampling import affine_sample
from voltools_tpu.utils import transform_matrix


@pytest.fixture(scope="module")
def setup(request):
    rng = np.random.default_rng(17)
    vol = jnp.asarray(rng.random((12, 13, 14)).astype(np.float32))
    target = jnp.asarray(rng.random((12, 13, 14)).astype(np.float32))
    m = jnp.asarray(transform_matrix(rotation=(9.0, 4.0, -7.0),
                                     rotation_order="rzxz",
                                     translation=(0.3, -0.2, 0.1),
                                     center=(5.5, 6.0, 6.5)))
    return vol, target, m


def test_grad_wrt_matrix_matches_map_coordinates(setup):
    """Oracle: jax's own map_coordinates (an independent gather/lerp
    implementation) must produce the same matrix gradient.  (Finite
    differences are unusable here: a piecewise-linear interpolant has
    derivative kinks at every voxel boundary.)"""
    from jax.scipy.ndimage import map_coordinates

    from voltools_tpu.ops.sampling import affine_coords

    vol, target, m = setup

    c = 2  # interior crop: the two implementations' out-of-domain
    # conventions differ, and so do their (sub)gradients exactly on the edge

    def loss_ours(matrix):
        out = affine_sample(vol, matrix, "linear")
        return jnp.mean((out[c:-c, c:-c, c:-c] - target[c:-c, c:-c, c:-c]) ** 2)

    def loss_ref(matrix):
        coords = affine_coords(vol.shape, matrix)
        out = map_coordinates(vol, [coords[0], coords[1], coords[2]],
                              order=1, mode="constant", cval=0.0)
        return jnp.mean((out[c:-c, c:-c, c:-c] - target[c:-c, c:-c, c:-c]) ** 2)

    g_ours = np.asarray(jax.grad(loss_ours)(m))
    g_ref = np.asarray(jax.grad(loss_ref)(m))
    assert np.isfinite(g_ours).all()
    np.testing.assert_allclose(g_ours, g_ref, rtol=1e-3, atol=1e-6)


def test_grad_wrt_matrix_cubic_finite(setup):
    vol, target, m = setup

    def loss(matrix):
        out = affine_sample(vol, matrix, "bspline")
        return jnp.mean((out - target) ** 2)

    g = np.asarray(jax.grad(loss)(m))
    assert np.isfinite(g).all()
    assert np.abs(g[:3]).max() > 0


def test_grad_wrt_volume(setup):
    vol, target, m = setup

    def loss(v):
        out = affine_sample(v, m, "linear")
        return jnp.mean((out - target) ** 2)

    g = np.asarray(jax.grad(loss)(vol))
    assert g.shape == vol.shape
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


def test_gradient_descent_recovers_translation():
    """Tiny registration problem: recover a known shift by gradient descent
    on the matrix translation entries."""
    rng = np.random.default_rng(3)
    base = rng.random((16, 16, 16)).astype(np.float32)
    # smooth it so the loss landscape is well-behaved
    from scipy.ndimage import gaussian_filter
    base = gaussian_filter(base, 2.0).astype(np.float32)
    vol = jnp.asarray(base)
    true_shift = jnp.asarray([0.7, -0.4, 0.3], jnp.float32)

    def apply_shift(shift):
        m = jnp.eye(4, dtype=jnp.float32).at[:3, 3].set(-shift)
        return affine_sample(vol, m, "linear")

    target = apply_shift(true_shift)

    def loss(shift):
        out = apply_shift(shift)
        c = 3  # ignore edge band
        return jnp.mean((out[c:-c, c:-c, c:-c] - target[c:-c, c:-c, c:-c]) ** 2)

    shift = jnp.zeros(3, jnp.float32)
    grad_fn = jax.jit(jax.grad(loss))
    for _ in range(200):
        shift = shift - 2000.0 * grad_fn(shift)
    np.testing.assert_allclose(np.asarray(shift), np.asarray(true_shift),
                               atol=0.05)


def test_rodrigues_matches_transform_matrix():
    """rodrigues_matrix (differentiable) equals transform_matrix with the
    negated sxyz angle for single-axis rotations, center composition
    included."""
    from voltools_tpu.utils import rodrigues_matrix

    c = (5.0, 6.0, 7.0)
    for axis in range(3):
        w = np.zeros(3, np.float32)
        w[axis] = 0.3
        mr = np.asarray(rodrigues_matrix(jnp.asarray(w), center=c))
        t = [0.0, 0.0, 0.0]
        t[axis] = -np.degrees(0.3)
        mt = np.asarray(transform_matrix(rotation=tuple(t),
                                         rotation_order="sxyz", center=c),
                        np.float32)
        np.testing.assert_allclose(mr, mt, atol=1e-5)


def test_gradient_alignment_recovers_rotation():
    """Gradient-based rigid alignment: recover a known small rotation by
    descending the MSE through the differentiable sampling path — the
    registration workflow the CUDA reference cannot support."""
    optax = pytest.importorskip("optax")
    from voltools_tpu.utils import rodrigues_matrix

    rng = np.random.default_rng(11)
    from scipy.ndimage import gaussian_filter
    vol = jnp.asarray(gaussian_filter(
        rng.standard_normal((24, 24, 24)), 1.8).astype(np.float32))
    center = tuple((s - 1) / 2 for s in vol.shape)

    w_true = jnp.asarray([0.06, -0.1, 0.08], jnp.float32)   # ~8° total
    target = affine_sample(vol, rodrigues_matrix(w_true, center), "linear")

    def loss(w):
        out = affine_sample(vol, rodrigues_matrix(w, center), "linear")
        return jnp.mean((out - target) ** 2)

    opt = optax.adam(2e-2)
    w = jnp.zeros(3, jnp.float32)
    state = opt.init(w)

    @jax.jit
    def step(w, state):
        g = jax.grad(loss)(w)
        updates, state = opt.update(g, state)
        return optax.apply_updates(w, updates), state

    for _ in range(150):
        w, state = step(w, state)
    err = np.degrees(float(jnp.linalg.norm(w - w_true)))
    assert err < 0.2, f"alignment off by {err:.3f} deg"


@pytest.mark.parametrize("interp,mode", [
    ("linear", "constant"), ("filt_bspline", "border"),
    ("bspline", "constant"), ("filt_bspline_simple", "constant"),
])
def test_grad_finite_difference_zero_shell(interp, mode):
    """Central-difference check of d(loss)/d(rotation) across the
    interpolation x mode matrix.  The volume carries a 3-voxel zero shell:
    the scipy-constant mask makes the loss DISCONTINUOUS where content
    crosses the boundary (fd across a jump reads hundreds), so a clean fd
    check needs boundary values of zero — found while fuzzing; the
    analytic gradients were correct all along."""
    import jax

    from voltools_tpu.ops.sampling import affine_sample
    from voltools_tpu.utils import rodrigues_matrix

    rng = np.random.default_rng(17)
    shape = (12, 13, 11)
    vol = np.zeros(shape, np.float32)
    vol[3:-3, 3:-3, 3:-3] = rng.random(tuple(s - 6 for s in shape),
                                       ).astype(np.float32)
    w0 = jnp.asarray(rng.uniform(-0.1, 0.1, 3).astype(np.float32))
    center = tuple((s - 1) / 2 for s in shape)

    def loss(w):
        m = rodrigues_matrix(w, center)
        return jnp.sum(affine_sample(vol, m, interp, mode) ** 2)

    g = np.asarray(jax.grad(loss)(w0))
    eps = 1e-3
    for i in range(3):
        e = np.zeros(3, np.float32)
        e[i] = eps
        fd = (float(loss(w0 + e)) - float(loss(w0 - e))) / (2 * eps)
        assert abs(fd - g[i]) <= 0.03 * max(1.0, abs(fd), abs(g[i])), \
            (interp, mode, i, float(g[i]), fd)
