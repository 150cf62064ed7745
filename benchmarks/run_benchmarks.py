"""Full benchmark sweep, mirroring the reference's ``tests/benchmark.py``:
sizes 5^3..250^3, N random 'sxyz' rotations each (center=size/2, exactly the
reference's workload at ``benchmark.py:52-54``), one column per code path.

Columns (reference ``benchmark.py:59-65`` equivalents):
  scipy          - scipy.ndimage.affine_transform on host (wall clock)
  transform      - vt.affine with a host numpy volume: includes H2D + D2H
                   (wall clock; on the remote-TPU tunnel this column is
                   dominated by ~30 ms RPC latency per call and overstates
                   what a locally-attached TPU would show)
  static_vol_out - resident StaticVolume, device output: pure device time
                   per rotation via chained-iteration slope (the headline
                   column, comparable to the reference's static_vol_out)
  batch_out      - StaticVolume.affine_batch over the whole sweep, device
                   output; amortised wall per rotation (grouped batched
                   programs; includes host-side planning)

Device-time methodology: ``block_until_ready`` does not block through the
RPC tunnel, so per-call wall timing is meaningless there; the slope method
chains N dependent kernel applications inside one jit and subtracts the
1-iteration run.  Kernel compiles are excluded (the reference compiled its
kernel once before its timed loop).

Run:  python benchmarks/run_benchmarks.py [--quick] [--interpolation ...]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def wall_ms(fn, repeats=5):
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def slope_ms(plan, prep, m, cval, iters=8):
    """Device ms per application of ``plan`` (chained-slope method).
    Tiny volumes need many chained iterations for the slope to rise above
    timer noise."""
    import jax
    import jax.numpy as jnp

    from voltools_tpu.kernels.planner import plan_sample_prepared

    @jax.jit
    def chained(n, p, mat):
        # n is traced (dynamic fori trip count) so ONE compile serves both
        # slope points — a static n would recompile the Mosaic kernel per
        # point through the enclosing jit
        def body(_, carry):
            mm, acc = carry
            out = plan_sample_prepared(p, mm, plan, cval)
            probe = out[0, 0, 0] * jnp.float32(1e-38)
            return mm + probe, acc + probe
        mm, acc = jax.lax.fori_loop(0, n, body, (mat, jnp.float32(0.0)))
        return mm[0, 0] + acc

    mj = jnp.asarray(m, jnp.float32)
    float(chained(1, prep, mj))
    float(chained(iters, prep, mj))

    def run(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(n, prep, mj))
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(iters) - run(1)) / (iters - 1) * 1e3


_PEAK_GBPS = 819.0   # TPU v5e HBM


def plan_bytes(plan, out_voxels):
    """HBM bytes one application of ``plan`` moves: window DMAs (redundant,
    overlapping reads) + output write (+ the un-blocking relayout's
    read+write for walk plans)."""
    from voltools_tpu.kernels.pallas_walk import WalkVariant
    out_bytes = out_voxels * 4
    if isinstance(plan, WalkVariant):
        U, V, W = plan.out_d
        nwin = ((-(-U // (8 * plan.gu))) * (-(-V // (plan.vb * plan.gv)))
                * (-(-W // plan.wb)))
        if plan.whole:   # whole-resident: the volume is DMA'd exactly once
            nwin = 1
        win = nwin * plan.nbw * plan.w0 * plan.w1 * 128 * 4
        return win + 3 * out_bytes
    og, os_, ol = plan.out_d
    ntiles = og * (-(-os_ // 8)) * (-(-ol // 128))
    return ntiles * plan.nb * plan.w0 * plan.w1 * 128 * 4 + out_bytes


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true",
                        help="2 rotations per size, sizes up to 100")
    parser.add_argument("--interpolation", default="linear",
                        choices=["linear", "bspline", "bspline_simple",
                                 "filt_bspline", "filt_bspline_simple"])
    parser.add_argument("--device", default="tpu")
    parser.add_argument("--rotations", type=int, default=None)
    parser.add_argument("--bandwidth", action="store_true",
                        help="print achieved HBM GB/s (bytes moved / slope "
                             "time) and %% of the v5e's ~819 GB/s next to "
                             "the static_vol_out column")
    args = parser.parse_args()

    import jax

    import voltools_tpu as vt
    from scipy.ndimage import affine_transform
    from voltools_tpu.kernels.planner import plan_prepare
    from voltools_tpu.ops.interpolation import needs_prefilter, spline_order
    from voltools_tpu.transforms import select_variant
    from voltools_tpu.utils import resolve_device, transform_matrix

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/voltools_tpu_bench_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    sizes = [5, 25, 50, 100] if args.quick else [5, 25, 50, 100, 250]
    n_rot = args.rotations or (2 if args.quick else 4)
    rng = np.random.default_rng(42)
    order = spline_order(args.interpolation)
    prefilter = needs_prefilter(args.interpolation)
    jdev = resolve_device(args.device)

    header = (f"{'size':>6} {'scipy':>10} {'transform':>10} "
              f"{'static_vol_out':>15} {'batch_out':>10}")
    print(f"interpolation={args.interpolation} device={args.device} "
          f"rotations={n_rot} (ms per rotation; device columns are "
          f"slope-timed, see module docstring)")
    print(header)

    for size in sizes:
        vol = rng.random((size,) * 3).astype(np.float32)
        center = (size / 2,) * 3
        ms = np.stack([
            transform_matrix(rotation=tuple(rng.uniform(-180, 180, 3)),
                             rotation_order="sxyz", center=center)
            for _ in range(n_rot)]).astype(np.float32)

        scipy_t = np.mean([wall_ms(lambda m=m: affine_transform(
            vol, m, order=order, prefilter=prefilter), repeats=2)
            for m in ms])

        t_transform = np.mean([wall_ms(lambda m=m: vt.affine(
            vol, m, interpolation=args.interpolation, device=args.device),
            repeats=2) for m in ms])

        sv = vt.StaticVolume(vol, interpolation=args.interpolation,
                             device=args.device)
        slopes = []
        gbps = []
        for m in ms:
            plan = select_variant(m, sv.shape, sv.interpolation, sv.mode,
                                  jdev)
            if plan is None:
                slopes.append(float("nan"))
                continue
            prep = sv._prepared_source(plan)
            t = slope_ms(plan, prep, m, sv.cval,
                         iters=64 if size <= 50 else 8)
            slopes.append(t)
            if args.bandwidth and t > 0:
                gbps.append(plan_bytes(plan, size ** 3) / t / 1e6)
        t_static_out = float(np.nanmean(slopes))

        sv.affine_batch(ms, output="device")   # compile warmup
        t_batch = wall_ms(lambda: np.asarray(
            sv.affine_batch(ms, output="device")[0].ravel()[0]),
            repeats=2) / n_rot

        bw = ""
        if args.bandwidth and gbps:
            g = float(np.mean(gbps))
            bw = f"  {g:>6.0f} GB/s ({g / _PEAK_GBPS:>4.0%} of peak)"
        print(f"{size:>6} {scipy_t:>10.2f} {t_transform:>10.2f} "
              f"{t_static_out:>15.2f} {t_batch:>10.2f}{bw}")


if __name__ == "__main__":
    main()
