"""Tilt-series rotate+project pipeline (reference ``examples/projections.py``
equivalent).

Demonstrates the three API levels:
  1. one-shot ``vt.transform`` per tilt (what the reference loops),
  2. resident ``StaticVolume`` per tilt (matrix-only transfer),
  3. ``TiltSeriesProjector`` — the whole series as ONE device program.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import voltools_tpu as vt
from voltools_tpu.models import TiltSeriesProjector


def make_volume(n=96):
    rng = np.random.default_rng(0)
    vol = np.zeros((n, n, n), np.float32)
    for _ in range(12):  # a few random dense blobs
        c = rng.integers(n // 4, 3 * n // 4, 3)
        r = rng.integers(4, 10)
        z, y, x = np.ogrid[:n, :n, :n]
        vol[(z - c[0]) ** 2 + (y - c[1]) ** 2 + (x - c[2]) ** 2 < r * r] += 1.0
    return vol


def main():
    volume = make_volume()
    angles = np.arange(-60.0, 61.0, 3.0)
    device = "tpu" if "tpu" in vt.AVAILABLE_DEVICES else "jax"
    center = np.divide(np.subtract(volume.shape, 1), 2)

    # 1) one-shot API
    t0 = time.perf_counter()
    proj_oneshot = np.stack([
        vt.transform(volume, rotation=(0.0, a, 0.0), rotation_order="sxyz",
                     center=center, device=device).sum(axis=0)
        for a in angles])
    t1 = time.perf_counter()

    # 2) resident volume
    sv = vt.StaticVolume(volume, interpolation="linear", device=device)
    t2 = time.perf_counter()
    proj_resident = np.stack([
        sv.transform(rotation=(0.0, a, 0.0), rotation_order="sxyz",
                     center=center).sum(axis=0) for a in angles])
    t3 = time.perf_counter()

    # 3) fused projector
    proj = TiltSeriesProjector(volume, device=device, rotation_order="sxyz")
    t4 = time.perf_counter()
    proj_fused = proj.project(angles, tilt_axis=1)
    t5 = time.perf_counter()

    print(f"tilts: {len(angles)}  volume: {volume.shape}")
    print(f"one-shot transform loop : {(t1 - t0) * 1e3:9.1f} ms")
    print(f"StaticVolume loop       : {(t3 - t2) * 1e3:9.1f} ms")
    print(f"TiltSeriesProjector     : {(t5 - t4) * 1e3:9.1f} ms (one program)")
    print("agreement one-shot vs resident:",
          np.abs(proj_oneshot - proj_resident).max())
    print("agreement one-shot vs fused   :",
          np.abs(proj_oneshot - proj_fused).max())

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, 5, figsize=(16, 3.5))
        for ax, i in zip(axes, np.linspace(0, len(angles) - 1, 5).astype(int)):
            ax.imshow(proj_fused[i], cmap="gray")
            ax.set_title(f"{angles[i]:+.0f} deg")
            ax.axis("off")
        fig.tight_layout()
        fig.savefig("projections_example.png", dpi=120)
        print("wrote projections_example.png")
    except ImportError:
        print("matplotlib not available; skipping figure")


if __name__ == "__main__":
    main()
