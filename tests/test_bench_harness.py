"""Benchmark-harness unit tests (bench.py is the driver-facing artifact;
its AOT program store must never poison a run on a different backend)."""

import gzip
import hashlib

import numpy as np
import pytest


def test_aot_skips_foreign_platform_blob(tmp_path, monkeypatch):
    """A committed blob exported for another backend (the primed TPU store
    read during the documented continue-on-CPU fallback) deserializes fine
    but raises at its first *call* — outside _aot's try/except.  _aot must
    treat it as a miss and build live instead of crashing the bench."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    import bench

    monkeypatch.setattr(bench, "_aot_dir", lambda: str(tmp_path))

    def build():
        return jax.jit(lambda x: x * 2.0)

    x = jnp.ones((4,), jnp.float32)
    try:
        exp = jexport.export(build(), platforms=("tpu",))(x)
    except Exception as e:  # pragma: no cover - lowering support drift
        pytest.skip(f"cross-platform export unavailable: {e}")
    key_parts = ("unit-test-foreign-blob", 1)
    key = hashlib.sha1(repr(key_parts).encode()).hexdigest()[:20]
    (tmp_path / (key + ".hlo.gz")).write_bytes(
        gzip.compress(exp.serialize()))

    fn = bench._aot(key_parts, build, (x,))
    np.testing.assert_allclose(np.asarray(fn(x)), 2.0 * np.ones(4))


def test_aot_roundtrip_same_platform(tmp_path, monkeypatch):
    """Save-then-load on the live backend serves the blob (the warm path
    the driver's run depends on)."""
    import jax
    import jax.numpy as jnp

    import bench

    monkeypatch.setattr(bench, "_aot_dir", lambda: str(tmp_path))

    def build():
        return jax.jit(lambda x: x + 1.0)

    x = jnp.zeros((3,), jnp.float32)
    key_parts = ("unit-test-roundtrip", 1)
    fn1 = bench._aot(key_parts, build, (x,))     # miss: builds + saves
    np.testing.assert_allclose(np.asarray(fn1(x)), 1.0)
    assert list(tmp_path.glob("*.hlo.gz")), "blob was not saved"

    def build_must_not_run():  # pragma: no cover - loading must hit
        raise AssertionError("blob should have served this call")

    fn2 = bench._aot(key_parts, build_must_not_run, (x,))
    np.testing.assert_allclose(np.asarray(fn2(x)), 1.0)
