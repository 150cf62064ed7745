"""Tomographic reconstruction demo: project a phantom through a tilt
series, then invert it with WBP and SIRT (capabilities the CUDA reference
does not have — its pipeline stops at the forward projection).

Workflow:
  1. ``TiltSeriesProjector`` renders a ±60° tilt series (missing wedge,
     the standard cryo-ET geometry) as ONE device program,
  2. ``wbp_reconstruct`` — filtered back-projection (one program),
  3. ``sirt_reconstruct`` — 30 SIRT iterations (one program), visibly
     sharper under the missing wedge.

Writes ``reconstruction_example.png`` with central slices of all four.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import voltools_tpu as vt  # noqa: E402
from voltools_tpu.models import (TiltSeriesProjector,  # noqa: E402
                                 sirt_reconstruct, wbp_reconstruct)


def make_volume(n=64):
    rng = np.random.default_rng(0)
    vol = np.zeros((n, n, n), np.float32)
    for _ in range(10):
        c = rng.integers(n // 4, 3 * n // 4, 3)
        r = rng.integers(3, 8)
        z, y, x = np.ogrid[:n, :n, :n]
        vol[(z - c[0]) ** 2 + (y - c[1]) ** 2
            + (x - c[2]) ** 2 < r * r] += 1.0
    return vol


def main():
    device = "tpu" if "tpu" in vt.AVAILABLE_DEVICES else "jax"
    vol = make_volume()
    shape = vol.shape
    proj = TiltSeriesProjector(vol, interpolation="linear", device=device)
    angles = np.arange(-60.0, 61.0, 3.0)
    ms = proj.tilt_matrices(angles, tilt_axis=0)

    t0 = time.perf_counter()
    tilts = proj.project(angles, tilt_axis=0)
    t1 = time.perf_counter()
    rec_wbp = wbp_reconstruct(tilts, ms, shape, device=device)
    t2 = time.perf_counter()
    rec_sirt = sirt_reconstruct(tilts, ms, shape, iterations=30,
                                device=device)
    t3 = time.perf_counter()

    c = 8
    sl = np.s_[c:-c, c:-c, c:-c]
    for name, rec in (("WBP", rec_wbp), ("SIRT", rec_sirt)):
        r = np.corrcoef(vol[sl].ravel(), rec[sl].ravel())[0, 1]
        print(f"{name:>5} interior correlation: {r:.4f}")
    print(f"project {(t1 - t0) * 1e3:8.1f} ms  |  WBP {(t2 - t1) * 1e3:8.1f}"
          f" ms  |  SIRT(30) {(t3 - t2) * 1e3:8.1f} ms  (wall, incl compile)")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        print("matplotlib unavailable; skipping figure")
        return
    mid = shape[0] // 2
    fig, axes = plt.subplots(1, 4, figsize=(13, 3.4))
    for ax, (title, img) in zip(axes, [
            ("phantom", vol[mid]),
            (f"projection 0° ({len(angles)} tilts)",
             tilts[len(angles) // 2]),
            ("WBP", rec_wbp[mid]),
            ("SIRT (30 it)", rec_sirt[mid])]):
        ax.imshow(img, cmap="gray")
        ax.set_title(title, fontsize=9)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig("reconstruction_example.png", dpi=120)
    print("wrote reconstruction_example.png")


if __name__ == "__main__":
    main()
