"""Measure XLA relayout cost: blocked (U, V/vb, W/wb, vb*wb) -> (U, V, W)
at 250^3-scale, for candidate lane packings. This bounds the overhead a
packed-lane walk kernel would pay to write linear output."""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
from experiments.exp_r2_profile import slope_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    U, V, W = 256, 256, 256

    for vb, wb in ((4, 32), (2, 64), (8, 16), (16, 8)):
        blocked = jnp.asarray(
            rng.random((U, V // vb, W // wb, vb * wb)).astype(np.float32))
        dummy = jnp.float32(1.0)

        def unblock(x, s):
            y = (x * s).reshape(U, V // vb, W // wb, vb, wb)
            y = jnp.transpose(y, (0, 1, 3, 2, 4))
            return y.reshape(U, V, W).reshape(U, V // vb, W // wb, vb * wb) * 1.0

        # chain unblock->reblock shape-compatibly so slope timing works;
        # reported value is therefore ~2x one relayout
        t = slope_time(lambda v_, s: unblock(v_, s[0, 0]), blocked,
                       jnp.ones((4, 4), jnp.float32), iters=12)
        print(f"pack ({vb},{wb}): unblock+reblock {t:.2f} ms  (~{t/2:.2f} ms one way)")


if __name__ == "__main__":
    main()
