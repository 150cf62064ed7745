"""Round-5: inner-loop pressure probes for the cubic slow class (250^3).

The measured/model ratio is ~0.74 for every linear rotation and for cubic
ndx=5 rotations, but rises to 0.84-0.88 for cubic ndx>=6 / ycand=3
rotations (bench rots 8, 11, 12 measure 32-34 ms) — a live-range /
scheduling knee above ~15 gathers per plane that the model's ndx^1.5 term
does not capture.  Round 4 probed unroll tiers and dx splits on the LINEAR
ndx=4 class only (within noise / slower, exp_r4_ndx4); this measures the
same hooks in the high-pressure cubic regime, where the knee actually
lives:

  base    -- production kernel (fully unrolled walk)
  u4/u2   -- partially unrolled walk (spill probe: the unrolled ndx=6
             ycand=3 body is ~19 planes x 18 gathers straight-line)
  split2/3 -- dx slots in groups with band rows re-read per group
             (live-range probe)

Each variant's output is checked against base (sum|diff|) before timing.
Run serially; never kill mid-compile (tunnel discipline).

Usage: python -u experiments/exp_r5_cubic_pressure.py [rot_idx ...]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    import voltools_tpu.kernels.pallas_walk as pw
    from voltools_tpu.utils import transform_matrix
    sys.path.insert(0, "/root/repo/experiments")
    from exp_r3_walkprofile import slope_time

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/voltools_tpu_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    pw._FAST_CHOOSER = False

    size = 250
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((size,) * 3, dtype=np.float64)
                      .astype(np.float32))
    center = (size / 2,) * 3
    angs = [rng.uniform(-180, 180, 3) for _ in range(16)]

    idxs = [int(a) for a in sys.argv[1:]] or [12, 8, 0]
    variants = [("base", {}),
                ("u4", {"_UNROLL_OVERRIDE": 4}),
                ("u2", {"_UNROLL_OVERRIDE": 2}),
                ("split2", {"_DX_SPLIT": 2}),
                ("split3", {"_DX_SPLIT": 3})]
    import os
    sel = os.environ.get("EXP_VARIANTS")
    if sel:   # e.g. EXP_VARIANTS=base,u4 — cheap targeted re-probes
        keep = set(sel.split(","))
        variants = [v for v in variants if v[0] in keep]

    for ri in idxs:
        m = transform_matrix(rotation=tuple(angs[ri]),
                             rotation_order="sxyz", center=center)
        v = pw.choose_walk_variant(m, (size,) * 3, "filt_bspline",
                                   "constant", quantize=False, sticky=1.0)
        prep = pw.prepare_walk_volume(vol, v)
        cols = pw.permute_matrix(m, v)
        vc = pw.canonical_walk_variant(v)
        pressure = v.ycand * len(v.dxs)
        print(f"\nrot {ri}: ndx={len(v.dxs)} hy={v.hy} hz={v.hz} "
              f"pack={v.vb},{v.wb} g={v.gu},{v.gv} "
              f"gathers/plane={pressure}", flush=True)
        base_out = None
        for name, hooks in variants:
            if pressure < 12 and name not in ("base", "u4", "split2"):
                continue   # control rotation: fewer variants suffice
            for k in ("_UNROLL_OVERRIDE", "_DX_SPLIT"):
                setattr(pw, k, hooks.get(k, None if k == "_UNROLL_OVERRIDE"
                                         else 0))
            try:
                t0 = time.time()
                runner = pw._walk_runner(vc, 0.0, False)
                out = runner(prep, cols)
                if base_out is None:
                    base_out = out
                    dif = 0.0
                else:
                    dif = float(jnp.abs(out - base_out).sum())
                t = slope_time(lambda p, c: runner(p, c), prep, cols)
                print(f"  {name:<7} {t:7.2f} ms  sum|diff|={dif:.2e} "
                      f"(compile+first {time.time() - t0:.0f}s)",
                      flush=True)
            finally:
                pw._UNROLL_OVERRIDE = None
                pw._DX_SPLIT = 0


if __name__ == "__main__":
    main()
