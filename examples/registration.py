"""Volume registration demo: recover an unknown rigid misalignment
(a capability beyond the CUDA reference — its pipeline stops at applying
a *known* transform; see voltools_tpu/models/registration.py).

Workflow:
  1. misalign a blob phantom by a hidden rigid transform (~6° + subvoxel
     shift), rescale intensities and add noise,
  2. ``phase_cross_correlation`` — FFT global shift estimate (matrix-
     multiply upsampled DFT for the subpixel part),
  3. ``register(model='rigid', loss='ncc')`` — Adam through the
     differentiable sampler, the whole loop ONE compiled ``lax.scan``
     program per pyramid level,
  4. apply the recovered matrix through the production dispatcher.

Writes ``registration_example.png``: central slices of reference, moving,
registered, and the error maps before/after.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import voltools_tpu as vt  # noqa: E402
from voltools_tpu.models import phase_cross_correlation, register  # noqa: E402
from voltools_tpu.utils import rodrigues_matrix  # noqa: E402


def make_volume(n=64, seed=0):
    rng = np.random.default_rng(seed)
    vol = np.zeros((n, n, n), np.float32)
    z, y, x = np.ogrid[:n, :n, :n]
    for _ in range(14):
        c = rng.integers(n // 4, 3 * n // 4, 3)
        r = rng.integers(3, 9)
        vol[(z - c[0]) ** 2 + (y - c[1]) ** 2 + (x - c[2]) ** 2 < r * r] += 1.0
    from scipy.ndimage import gaussian_filter
    return gaussian_filter(vol, 1.2).astype(np.float32)


def main():
    import jax.numpy as jnp

    ref = make_volume()
    center = tuple((s - 1) / 2 for s in ref.shape)

    # hidden ground truth: ~6 deg total rotation + sub-voxel-accurate shift
    w_true = np.asarray([0.05, -0.07, 0.06], np.float32)
    t_true = np.asarray([3.4, -2.2, 1.8], np.float32)
    m_true = np.array(rodrigues_matrix(jnp.asarray(w_true), center))
    m_true[:3, 3] -= t_true
    from voltools_tpu.ops.sampling import affine_sample
    moving = np.asarray(affine_sample(ref, m_true, "linear"))
    rng = np.random.default_rng(1)
    moving = 1.7 * moving + 0.2 + rng.normal(0, 0.01, moving.shape)
    moving = moving.astype(np.float32)

    t0 = time.perf_counter()
    shift0 = np.asarray(phase_cross_correlation(ref, moving, upsample=10))
    t1 = time.perf_counter()
    res = register(moving, ref, model="rigid", loss="ncc",
                   steps=300, lr=0.02, levels=2)
    t2 = time.perf_counter()
    registered = np.asarray(res.apply(moving))

    # register(moving, ref) recovers the INVERSE of m_true (the matrix that
    # pulls `moving` back onto `ref`); the expected axis-angle is -w_true
    w_expect = -w_true
    R_inv = m_true[:3, :3].T
    c_arr = np.asarray(center, np.float32)
    # solve c - R'c - R't' = inv(m_true)[:3,3] for t'
    m_inv = np.linalg.inv(m_true)
    t_expect = np.linalg.solve(R_inv, c_arr - R_inv @ c_arr - m_inv[:3, 3])

    print(f"phase-correlation shift: {shift0.round(2)}  "
          f"({(t1 - t0) * 1e3:.0f} ms)")
    print(f"recovered rotation (rad): {res.params['w'].round(4)}  "
          f"expected (inverse): {w_expect}")
    print(f"recovered shift   (vox): {res.params['t'].round(3)}  "
          f"expected: {t_expect.round(3)}")
    werr = np.degrees(np.linalg.norm(res.params["w"] - w_expect))
    print(f"rotation error: {werr:.3f} deg   "
          f"register: {(t2 - t1) * 1e3:.0f} ms "
          f"({len(res.loss_history)} steps, 2 levels)")

    c = 6
    sl = np.s_[c:-c, c:-c, c:-c]
    # compare on normalised intensities (the moving volume was rescaled)
    def norm(v):
        v = v[sl]
        return (v - v.mean()) / v.std()
    err_before = np.abs(norm(moving) - norm(ref)).mean()
    err_after = np.abs(norm(registered) - norm(ref)).mean()
    print(f"normalised L1 misfit: before {err_before:.3f} -> "
          f"after {err_after:.3f}")

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        print("matplotlib unavailable; skipping PNG")
        return
    k = ref.shape[0] // 2
    panels = [("reference", ref[k]), ("moving", moving[k]),
              ("registered", registered[k]),
              ("|diff| before", np.abs(norm(moving) - norm(ref))[k - c]),
              ("|diff| after", np.abs(norm(registered) - norm(ref))[k - c])]
    fig, axes = plt.subplots(1, len(panels), figsize=(3.2 * len(panels), 3.4))
    for ax, (title, img) in zip(axes, panels):
        ax.imshow(img, cmap="gray")
        ax.set_title(title, fontsize=10)
        ax.axis("off")
    fig.suptitle("voltools_tpu rigid registration "
                 f"(rotation error {werr:.3f}°)", fontsize=12)
    fig.tight_layout()
    fig.savefig("registration_example.png", dpi=110)
    print("wrote registration_example.png")


if __name__ == "__main__":
    main()
