"""Real-TPU parity smoke: compiled (Mosaic) kernels vs the XLA oracle.

The pytest suite exercises the Pallas kernels in *interpret* mode on CPU;
this script drives the actually-compiled binaries on TPU hardware and
asserts parity for every dispatch tier:

* axis-dominant matrices (plane-walk kernel since the round-2 tier flip;
  the select-tree kernel covers volumes too small for walk bands)
* plane-walk kernel on random full-3D rotations, linear + cubic
* reshape=True through the kernels
* grid-batched walk launches (StaticVolume.affine_batch)
* ShardedVolume halo + all-gather paths on a 1-chip mesh

Comparisons mask voxels whose source coordinate sits within 1e-3 of an
integer (f32 knife edges where floor() legitimately differs between
independent f32 evaluations).  Run:  python benchmarks/tpu_parity_smoke.py
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def masked_err(got, want, m, out_shape=None):
    """Max |got-want| excluding f32 knife-edge voxels.

    An axis whose matrix row is exactly integral (one-hot integer +
    integer translation) produces exactly-integer coordinates everywhere;
    those are computed exactly in f32, have no knife edge, and must NOT be
    masked (masking them would blank the whole volume for single-axis
    matrices and make the check vacuous)."""
    shape = got.shape
    idx = np.indices(shape, dtype=np.float64).reshape(3, -1)
    mm = np.asarray(m, np.float64)
    src = mm[:3, :3] @ idx + mm[:3, 3:4]
    near = np.zeros(src.shape, bool)
    for i in range(3):
        row = mm[i]
        if (np.all(row == np.round(row))
                and np.count_nonzero(row[:3]) <= 1):
            continue   # exactly-integral axis: no knife edge
        near[i] = np.abs(src[i] - np.round(src[i])) < 1e-3
    near = near.any(axis=0).reshape(shape)
    frac = float(near.mean())
    assert frac < 0.2, f"mask covers {frac:.0%} of voxels: check degenerate"
    return float(np.where(near, 0.0, np.abs(got - want)).max())


def main():
    import jax

    import voltools_tpu as vt
    from voltools_tpu.transforms import last_dispatch
    from voltools_tpu.utils import transform_matrix

    if jax.devices()[0].platform in ("cpu", "cuda", "gpu", "rocm"):
        print("no TPU-family backend; smoke requires hardware")
        return 1

    rng = np.random.default_rng(12)
    size = 96
    vol = rng.random((size,) * 3).astype(np.float32)
    center = (size / 2,) * 3
    failures = []

    def check(name, got, want, m, tol=1e-4):
        err = masked_err(np.asarray(got), np.asarray(want), m)
        status = "ok" if err <= tol else "FAIL"
        print(f"{name:<42} err={err:.2e} [{status}]")
        if err > tol:
            failures.append(name)

    # 1. select-tree tier
    m_axis = transform_matrix(rotation=(0, 60, 0), rotation_order="sxyz",
                              center=center)
    got = vt.affine(vol, m_axis, device="tpu")
    assert last_dispatch()["impl"] == "pallas"
    want = vt.affine(vol, m_axis, device="cpu")
    check("axis-dominant linear", got, want, m_axis)

    # 2. walk tier, linear + cubic, random rotations
    for interp in ("linear", "filt_bspline"):
        ang = rng.uniform(-180, 180, 3)
        m = transform_matrix(rotation=tuple(ang), rotation_order="sxyz",
                             center=center)
        got = vt.affine(vol, m, interpolation=interp, device="tpu")
        kind = type(last_dispatch()["variant"]).__name__
        want = vt.affine(vol, m, interpolation=interp, device="cpu")
        check(f"walk {interp} ({kind})", got, want, m)

    # 3. reshape through the kernels
    ang = rng.uniform(-180, 180, 3)
    m = transform_matrix(rotation=tuple(ang), rotation_order="sxyz",
                         center=center)
    got = vt.affine(vol, m, reshape=True, device="tpu")
    want = vt.affine(vol, m, reshape=True, device="cpu")
    from voltools_tpu.utils import (compute_post_transform_dimensions,
                                    translation_matrix)
    pb, _, _ = compute_post_transform_dimensions(vol.shape, m)
    check("reshape=True", got, want, m @ translation_matrix(pb, m.dtype))

    # 4. batched launches
    sv = vt.StaticVolume(vol, interpolation="linear", device="tpu")
    ms = np.stack([transform_matrix(rotation=(0, a, 0),
                                    rotation_order="sxyz", center=center)
                   for a in (-40, -20, 0, 20, 40, 60)]).astype(np.float32)
    outs = sv.affine_batch(ms)
    for i in (0, 5):
        want = vt.affine(vol, ms[i], device="cpu")
        check(f"affine_batch[{i}]", outs[i], want, ms[i])

    # 5. sharded paths on a 1-chip mesh
    from voltools_tpu.parallel import ShardedVolume, make_mesh
    svs = ShardedVolume(vol, interpolation="linear", mesh=make_mesh(1))
    m_small = transform_matrix(rotation=(5, 3, -4), rotation_order="rzxz",
                               center=center)
    check("sharded halo path", svs.affine(m_small),
          vt.affine(vol, m_small, device="cpu"), m_small)
    m_big = transform_matrix(rotation=tuple(rng.uniform(-180, 180, 3)),
                             rotation_order="sxyz", center=center)
    check("sharded gather path", svs.affine(m_big),
          vt.affine(vol, m_big, device="cpu"), m_big)

    # 6. data-parallel batched kernel under shard_map on hardware (the
    # shard_map + pallas_call + Mosaic composition the CPU-mesh tests can
    # only exercise in interpret mode)
    from voltools_tpu.parallel import sharded_affine_batch
    ms_dp = np.stack([
        transform_matrix(rotation=tuple(rng.uniform(-180, 180, 3)),
                         rotation_order="sxyz", center=center)
        for _ in range(3)]).astype(np.float32)
    outs_dp = sharded_affine_batch(vol, ms_dp, mesh=make_mesh(1))
    for i in (0, 2):
        want = vt.affine(vol, ms_dp[i], device="cpu")
        check(f"sharded_affine_batch[{i}]", outs_dp[i], want, ms_dp[i])

    # 7. donated device-output buffer (output= reuse via donate_argnums)
    ref = sv.affine(ms[1])
    out_buf = sv.affine(ms[1], output="device")
    out_buf = sv.affine(ms[1], output=out_buf)
    check("donated device output", np.asarray(out_buf), ref, ms[1])

    if failures:
        print(f"\n{len(failures)} FAILURES: {failures}")
        return 1
    print("\nall compiled-kernel parity checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
