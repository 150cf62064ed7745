"""Full benchmark sweep, mirroring the reference's ``tests/benchmark.py``:
sizes 25^3..250^3, N random rotations each, one column per code path.

Columns (reference ``benchmark.py:59-65`` equivalents):
  scipy          - scipy.ndimage.affine_transform on host
  transform      - vt.affine with a host numpy volume (includes H2D + D2H)
  transform_out  - vt.affine keeping the result on device (no D2H)
  static_vol     - StaticVolume.affine (resident volume, matrix-only upload)
  static_vol_out - StaticVolume.affine with device output
  batch_out      - StaticVolume.affine_batch, whole sweep in one program
                   (TPU extension; per-rotation amortised time)

Device timings use chained-iteration slopes where the backend is the remote
TPU tunnel (wall clocks there include ~25ms RPC latency); host paths use
plain wall clock.  Run:  python benchmarks/run_benchmarks.py [--quick]
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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true",
                        help="3 rotations per size, sizes up to 100")
    parser.add_argument("--interpolation", default="linear",
                        choices=["linear", "bspline", "bspline_simple",
                                 "filt_bspline", "filt_bspline_simple"])
    parser.add_argument("--device", default="tpu")
    args = parser.parse_args()

    import voltools_tpu as vt
    from scipy.ndimage import affine_transform
    from voltools_tpu.ops.interpolation import needs_prefilter, spline_order
    from voltools_tpu.utils import rotation_matrix

    sizes = [25, 50, 100] if args.quick else [25, 50, 100, 250]
    n_rot = 3 if args.quick else 10
    rng = np.random.default_rng(42)
    order = spline_order(args.interpolation)
    prefilter = needs_prefilter(args.interpolation)

    header = (f"{'size':>6} {'scipy':>10} {'transform':>10} "
              f"{'transform_out':>14} {'static_vol':>11} "
              f"{'static_vol_out':>15} {'batch_out':>10}")
    print(f"interpolation={args.interpolation} device={args.device} "
          f"rotations={n_rot}")
    print(header)

    for size in sizes:
        vol = rng.random((size,) * 3).astype(np.float32)
        ms = np.stack([
            rotation_matrix(rng.uniform(-180, 180, 3), "deg", "sxyz")
            for _ in range(n_rot)]).astype(np.float32)

        scipy_t = wall_ms(lambda: affine_transform(
            vol, ms[0], order=order, prefilter=prefilter), repeats=2)

        t_transform = np.mean([wall_ms(lambda m=m: vt.affine(
            vol, m, interpolation=args.interpolation, device=args.device),
            repeats=2) for m in ms])
        t_transform_out = np.mean([wall_ms(lambda m=m: vt.affine(
            vol, m, interpolation=args.interpolation, device=args.device,
            output="device"), repeats=3) for m in ms])

        sv = vt.StaticVolume(vol, interpolation=args.interpolation,
                             device=args.device)
        t_static = np.mean([wall_ms(lambda m=m: sv.affine(m), repeats=3)
                            for m in ms])
        t_static_out = np.mean([wall_ms(
            lambda m=m: sv.affine(m, output="device"), repeats=3) for m in ms])

        t_batch = wall_ms(lambda: sv.affine_batch(ms, output="device"),
                          repeats=2) / n_rot

        print(f"{size:>6} {scipy_t:>10.2f} {t_transform:>10.2f} "
              f"{t_transform_out:>14.2f} {t_static:>11.2f} "
              f"{t_static_out:>15.2f} {t_batch:>10.2f}")


if __name__ == "__main__":
    main()
