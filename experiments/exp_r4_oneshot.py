"""Round-4: MEASURED one-shot path + slow-class autotune probe (one serial
TPU process — tunnel discipline).

1. Parity-drives the fused one-shot program (transforms.affine fast path)
   at 96^3 against the CPU oracle.
2. Measures the 250^3 one-shot decomposition the judge asked for
   (VERDICT #3): host planning, fused-chain device slope (prepare +
   kernel + unblock in ONE program), H2D/D2H byte counts (verified
   explicit via transfer guard) and their tunnel wall times.
3. Best-of-6 autotune probe on the two worst ndx=4 rotations (12, 3):
   modeled vs measured per candidate.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/voltools_tpu_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import voltools_tpu as vt
    import voltools_tpu.kernels.pallas_walk as pw
    from voltools_tpu.utils import transform_matrix
    from exp_r3_walkprofile import slope_time

    # --- 1. fused one-shot parity drive (96^3) ---------------------------
    rng = np.random.default_rng(5)
    vol96 = rng.random((96,) * 3).astype(np.float32)
    m96 = transform_matrix(rotation=(33., -70., 140.),
                           rotation_order="sxyz", center=(48.,) * 3)
    got = vt.affine(vol96, m96, device="tpu")
    want = vt.affine(vol96, m96, device="cpu")
    src = (np.asarray(m96)[:3, :3] @ np.indices((96,)*3).reshape(3, -1)
           + np.asarray(m96)[:3, 3:4])
    knife = (np.abs(src - np.round(src)) < 1e-3).any(0).reshape((96,)*3)
    err = np.where(knife, 0, np.abs(got - want)).max()
    print(f"fused one-shot parity (96^3): err={err:.2e} "
          f"fused_keys={len(pw._ONESHOT_RUNNERS)}", flush=True)
    assert len(pw._ONESHOT_RUNNERS) >= 1, "fused path not taken"

    # --- 2. one-shot measurement (250^3 linear) --------------------------
    size = 250
    vrng = np.random.default_rng(0)
    vol_np = vrng.random((size,) * 3, dtype=np.float64).astype(np.float32)
    center = (size / 2,) * 3
    rot_rng = np.random.default_rng(0)
    rot_rng.random((size,) * 3, dtype=np.float64)
    angs = [rot_rng.uniform(-180, 180, 3) for _ in range(16)]

    # host planning (fresh matrices, production quantized mode)
    from voltools_tpu.kernels.planner import choose_plan
    t0 = time.perf_counter()
    for a in angs:
        m = transform_matrix(rotation=tuple(a), rotation_order="sxyz",
                             center=center)
        choose_plan(m, (size,) * 3, "linear", "constant")
    plan_ms = (time.perf_counter() - t0) / 16 * 1e3
    print(f"host planning: {plan_ms:.2f} ms/matrix (fresh)", flush=True)

    # H2D / D2H: explicit, byte-counted (tunnel wall time reported as-is)
    t0 = time.perf_counter()
    vol_dev = jax.device_put(jnp.asarray(vol_np))
    vol_dev.block_until_ready()
    h2d_s = time.perf_counter() - t0
    print(f"H2D: {vol_np.nbytes} bytes, tunnel wall {h2d_s*1e3:.0f} ms "
          f"(locally-attached PCIe4 ~= {vol_np.nbytes/25e9*1e3:.1f} ms)",
          flush=True)

    # fused-chain device slope for a fast- and a slow-class rotation
    from voltools_tpu.kernels.pallas_walk import (_oneshot_runner,
                                                  canonical_walk_variant,
                                                  _permuter)
    for ri in (5, 12):
        m = transform_matrix(rotation=tuple(angs[ri]),
                             rotation_order="sxyz", center=center)
        v = pw.choose_walk_variant(m, (size,) * 3, "linear", "constant",
                                   quantize=False)
        run = _oneshot_runner(canonical_walk_variant(v), v.ps, v.po,
                              0.0, False)
        permute = _permuter(v.ps, v.po, v.xpad, v.kax)
        y_lo = jnp.int32(v.y_lo)

        def fused(vol, mat, _r=run, _p=permute, _y=y_lo):
            return _r(vol, _p(mat, _y))

        t = slope_time(fused, vol_dev, jnp.asarray(m, jnp.float32))
        # transfer guard: prove the fused chain moves no host bytes
        with jax.transfer_guard("disallow"):
            out = fused(vol_dev, jnp.asarray(np.asarray(m, np.float32)))
        print(f"one-shot fused chain rot {ri}: {t:.2f} ms/call "
              f"(prepare+kernel+unblock, no host transfers)", flush=True)
    t0 = time.perf_counter()
    host = np.asarray(out)
    d2h_s = time.perf_counter() - t0
    print(f"D2H: {host.nbytes} bytes, tunnel wall {d2h_s*1e3:.0f} ms "
          f"(locally-attached PCIe4 ~= {host.nbytes/25e9*1e3:.1f} ms)",
          flush=True)

    # --- 3. slow-class best-of-6 autotune probe --------------------------
    for ri in (12, 3):
        m = transform_matrix(rotation=tuple(angs[ri]),
                             rotation_order="sxyz", center=center)
        cands = pw.choose_walk_variant(m, (size,) * 3, "linear",
                                       "constant", quantize=False, topk=6)
        print(f"rot {ri}: {len(cands)} candidates", flush=True)
        for v in cands:
            prep = pw.prepare_walk_volume(vol_dev, v)
            cols = pw.permute_matrix(m, v)
            vc = canonical_walk_variant(v)
            runner = pw._walk_runner(vc, 0.0, False)
            t = slope_time(lambda p, c, _r=runner: _r(p, c), prep, cols)
            print(f"  ndx={len(v.dxs)} hz={v.hz} hy={v.hy} "
                  f"pack={v.vb},{v.wb} g={v.gu},{v.gv} whole={v.whole} "
                  f"dyn={v.dyn_x} model={pw._variant_cost(v)/1e6:6.2f} "
                  f"meas={t:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
