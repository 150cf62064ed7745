"""Round-5 probe: registration performance on the real TPU.

Measures, per size:
  * phase_cross_correlation (coarse + upsample=10) wall time, warm,
  * register(model='rigid', loss='ncc') — whole-scan wall time and the
    per-Adam-step cost (forward + VJP of the sampling core), warm,
  * the one-time compile cost of the scan program.

Timing: the axon tunnel's block_until_ready returns early and host
round-trips cost ~25-35 ms, but a 100-step lax.scan is a single device
program — np.asarray(final_theta) bounds the whole thing; per-step =
(t(steps=K2) - t(steps=K1)) / (K2 - K1) cancels the fixed dispatch just
like bench.py's slope method.

Run (serial TPU discipline, background + log):
  cd /root/repo && python experiments/exp_r5_registration.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    devs = jax.devices()
    print(f"backend: {devs}", flush=True)
    import jax.numpy as jnp

    from voltools_tpu.models.registration import (_level_program,
                                                  phase_cross_correlation)

    rng = np.random.default_rng(0)
    for size in (128, 250):
        vol = rng.random((size,) * 3).astype(np.float32)
        ref = jnp.asarray(vol)
        mov = jnp.asarray(np.roll(vol, (5, -3, 2), (0, 1, 2)))

        # --- phase correlation ------------------------------------------
        t0 = time.perf_counter()
        s = np.asarray(phase_cross_correlation(ref, mov, upsample=10))
        t_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        s = np.asarray(phase_cross_correlation(ref, mov, upsample=10))
        t_warm = time.perf_counter() - t0
        print(f"[{size}^3] pcc shift={s} cold={t_cold:.2f}s "
              f"warm={t_warm * 1e3:.1f}ms", flush=True)

        # --- rigid registration scan -------------------------------------
        shape = (size,) * 3
        theta0 = jnp.asarray(np.array([0, 0, 0, 5, -3, 2], np.float32))
        times = {}
        for steps in (25, 100):
            t0 = time.perf_counter()
            run = _level_program(shape, "rigid", "linear", "ncc",
                                 steps, 0.02, max(1, size // 20))
            th, hist = run(mov, ref, theta0)
            th = np.asarray(th)
            t_compile = time.perf_counter() - t0
            t0 = time.perf_counter()
            th2, hist = run(mov, ref, theta0)
            th2 = np.asarray(th2)
            times[steps] = time.perf_counter() - t0
            print(f"[{size}^3] rigid steps={steps}: compile+run "
                  f"{t_compile:.1f}s warm {times[steps]:.3f}s "
                  f"theta={th.round(3)}", flush=True)
        per_step = (times[100] - times[25]) / 75.0
        print(f"[{size}^3] rigid per-Adam-step (fwd+VJP, NCC): "
              f"{per_step * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
