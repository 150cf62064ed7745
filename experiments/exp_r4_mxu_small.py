"""Round-4: whole-resident MXU one-hot x-resolve probe at 50^3/100^3.

The judge's scheme (a) (VERDICT #1) scoped the MXU one-hot contraction to
WHOLE-RESIDENT volumes (<=~120^3, where the full prepared volume sits in
VMEM and the gather redundancy is the measured bottleneck).  The 250^3
probe (exp_r4_ndx4.py) measured the MXU resolve 8-11x slower than lane
gathers; this measures the same hook in whole-resident mode at the sizes
the verdict names, on the same seed-0 rotation stream exp_r3_small.py and
BENCHMARKS.md's sticky tables use.

Parity is by construction (one-hot selection at HIGHEST precision picks
exactly the gathered element); each variant's output is nevertheless
checked against the base kernel's on device before timing.
"""
import sys

sys.exit(
    "RETIRED (round 5): the _MXU_RESOLVE kernel hook this probe exercised "
    "was removed after its round-4 closure (measured 8-11x slower than "
    "lane gathers at every size; tables preserved in BENCHMARKS.md "
    "'Resolve-scheme probes').  The script is kept for provenance of the "
    "measurement method only.")

# --- original probe body below (inert) ---
# import time
#
# import numpy as np
#
# sys.path.insert(0, "/root/repo")
# sys.path.insert(0, "/root/repo/experiments")
#
#
# def main():
#     import jax
#     import jax.numpy as jnp
#
#     jax.config.update("jax_compilation_cache_dir",
#                       "/tmp/voltools_tpu_bench_cache")
#     jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
#
#     import voltools_tpu.kernels.pallas_walk as pw
#     from voltools_tpu.utils import transform_matrix
#     from exp_r3_walkprofile import slope_time
#
#     for size in (50, 100):
#         iters = max(16, int(2 ** np.ceil(np.log2(4e5 / size ** 2))))
#         rng = np.random.default_rng(0)
#         vol = jnp.asarray(rng.random((size,) * 3, dtype=np.float64)
#                           .astype(np.float32))
#         center = (size / 2,) * 3
#         angs = [rng.uniform(-180, 180, 3) for _ in range(8)]
#         print(f"\n=== {size}^3 (iters={iters}) ===", flush=True)
#         for ri in (0, 3, 6):
#             m = transform_matrix(rotation=tuple(angs[ri]),
#                                  rotation_order="sxyz", center=center)
#             v = pw.choose_walk_variant(m, (size,) * 3, "linear",
#                                        "constant", quantize=False)
#             prep = pw.prepare_walk_volume(vol, v)
#             cols = pw.permute_matrix(m, v)
#             vc = pw.canonical_walk_variant(v)
#             print(f"rot {ri}: ndx={len(v.dxs)} hz={v.hz} hy={v.hy} "
#                   f"pack={v.vb},{v.wb} whole={v.whole}", flush=True)
#             base_out = None
#             for name, mxu in (("base", False), ("mxu", True)):
#                 pw._MXU_RESOLVE = mxu
#                 pw._walk_runner.cache_clear()
#                 t0 = time.time()
#                 runner = pw._walk_runner(vc, 0.0, False)
#                 out = runner(prep, cols)
#                 if base_out is None:
#                     base_out = out
#                     dif = 0.0
#                 else:
#                     dif = float(jnp.abs(out - base_out).sum())
#                 t = slope_time(lambda p, c, _r=runner: _r(p, c), prep, cols,
#                                iters=iters)
#                 print(f"  {name:<5} {t*1e3:8.1f} us  sum|diff|={dif:.2e} "
#                       f"(compile+first {time.time()-t0:.0f}s)", flush=True)
#             pw._MXU_RESOLVE = False
#     pw._walk_runner.cache_clear()
#
#
# if __name__ == "__main__":
#     main()
#
