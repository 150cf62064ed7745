"""Round-4: inner-loop variants for the ndx=4 slow class (250^3 linear).

Measures, on hardware, the walk kernel's device slope for bench rotation 12
(the worst ndx=4 rotation, 12.57 ms in BENCH_r03) and rotation 5 (an ndx=3
control) under the experiment hooks:

  base    -- production kernel
  u8/u4/u2 -- partially unrolled walk (spill/scheduling probe: the fully
              unrolled ndx=4 body is ~21 planes x 8 gathers of straight-line
              vector code)
  split2  -- dx slots processed in groups of 2 with band rows re-read per
              group (live-range probe)
  mxu     -- x-resolve as a one-hot MXU contraction at HIGHEST precision
             (the judge's scheme (a); parity-exact by construction)

Each variant's output is checked against the base output on device
(sum|diff|) before timing.  Run serially in one process; never kill it
mid-compile (tunnel discipline, docs_notes_round4.md)."""
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

    size = 250
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((size,) * 3, dtype=np.float64)
                      .astype(np.float32))
    center = (size / 2,) * 3
    angs = []
    for i in range(16):
        angs.append(rng.uniform(-180, 180, 3))

    rots = {12: "ndx4-worst", 14: "ndx4-mild", 5: "ndx3-control"}
    variants = [("base", {}),
                ("u8", {"_UNROLL_OVERRIDE": 8}),
                ("u4", {"_UNROLL_OVERRIDE": 4}),
                ("u2", {"_UNROLL_OVERRIDE": 2}),
                ("split2", {"_DX_SPLIT": 2})]
    # round-5 note: the "mxu" one-hot variant was removed from the kernel
    # after its round-4 closure (measured 8-11x slower on hardware; see
    # BENCHMARKS.md "Resolve-scheme probes") -- the hook carried a silent
    # sublane-constant assumption not worth keeping live.

    for ri, tag in rots.items():
        m = transform_matrix(rotation=tuple(angs[ri]),
                             rotation_order="sxyz", center=center)
        v = pw.choose_walk_variant(m, (size,) * 3, "linear", "constant",
                                   quantize=False)
        prep = pw.prepare_walk_volume(vol, v)
        cols = pw.permute_matrix(m, v)
        vc = pw.canonical_walk_variant(v)
        print(f"\nrot {ri} ({tag}): ndx={len(v.dxs)} hz={v.hz} hy={v.hy} "
              f"pack={v.vb},{v.wb} g={v.gu},{v.gv}", flush=True)
        base_out = None
        for name, hooks in variants:
            if tag == "ndx3-control" and name not in ("base", "u4"):
                continue
            for k in ("_UNROLL_OVERRIDE", "_DX_SPLIT"):
                setattr(pw, k, hooks.get(k, None if k == "_UNROLL_OVERRIDE"
                                         else 0))
            # hook values are part of _walk_runner's cache key now; no
            # cache_clear needed for the single-matrix runner path
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
                  f"(compile+first {time.time()-t0:.0f}s)", flush=True)
    # restore production hooks
    pw._UNROLL_OVERRIDE = None
    pw._DX_SPLIT = 0


if __name__ == "__main__":
    main()
