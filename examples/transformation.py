"""CPU-vs-TPU comparison of a single transform (reference
``examples/transformation.py`` equivalent).

Builds a test volume, applies the same center rotation + translation on the
scipy CPU path and on the TPU path, prints the agreement, and (when
matplotlib is present) writes a side-by-side middle-slice figure.
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import voltools_tpu as vt


def make_volume(n=64):
    z, y, x = np.meshgrid(*(np.linspace(-1, 1, n),) * 3, indexing="ij")
    ball = (z ** 2 + y ** 2 + x ** 2 < 0.6).astype(np.float32)
    stripes = (np.sin(8 * np.pi * x) > 0).astype(np.float32)
    return ball * (1 + stripes)


def main():
    volume = make_volume()
    kwargs = dict(rotation=(45.0, 0.0, 0.0), rotation_order="rzxz",
                  translation=(0.0, 4.0, -2.0),
                  interpolation="filt_bspline")

    cpu = vt.transform(volume, device="cpu", profile=True, **kwargs)
    device = "tpu" if "tpu" in vt.AVAILABLE_DEVICES else "jax"
    acc = vt.transform(volume, device=device, profile=True, **kwargs)

    print(f"max |cpu - {device}| = {np.abs(cpu - acc).max():.2e}")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib not available; skipping figure")
        return

    mid = volume.shape[0] // 2
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    for ax, (img, title) in zip(axes, [(volume, "input"),
                                       (cpu, "cpu (scipy)"),
                                       (acc, device)]):
        ax.imshow(img[mid], cmap="gray")
        ax.set_title(title)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig("transformation_example.png", dpi=120)
    print("wrote transformation_example.png")


if __name__ == "__main__":
    main()
