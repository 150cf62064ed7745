"""Headline benchmark: resident-volume rotation of a 250^3 float32 volume.

The metric mirrors BASELINE.json's StaticVolume configuration: a resident
(device-side) 250^3 volume rotated about one axis with per-call traffic
limited to the 4x4 matrix and the output kept on device — the reference's
``static_vol_out`` column (8.768 ms per rotation on a GTX 1050 Ti at 250^3
linear, BASELINE.md).

Prints ONE JSON line:
  {"metric": ..., "value": <ms per rotation>, "unit": "ms", "vs_baseline": <speedup x>}

Timing method: this environment reaches the TPU through an RPC tunnel where
``block_until_ready`` returns before execution finishes and a host round-trip
costs ~25 ms, so per-call wall timing is meaningless.  We time N dependent
kernel applications chained inside one jitted loop (forcing a scalar to host
at the end) and subtract the 1-iteration run: the slope is the true
per-transform device time.
"""

import functools
import json
import sys
import time

import numpy as np

BASELINE_MS = 8.768  # reference static_vol_out, 250^3 linear (BASELINE.md)


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from voltools_tpu.kernels.pallas_affine import (
        affine_sample_pallas_variant,
        choose_variant,
    )
    from voltools_tpu.ops.sampling import affine_sample
    from voltools_tpu.utils import transform_matrix

    size = 250
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random((size,) * 3, dtype=np.float64)
                      .astype(np.float32))
    center = ((size - 1) / 2,) * 3
    m = transform_matrix(rotation=(60.0, 0.0, 0.0), rotation_order="rzxz",
                         center=center)
    mj = jnp.asarray(m.astype(np.float32))

    variant = choose_variant(m, vol.shape, "linear")
    if variant is not None:
        impl = "pallas"
        def sample(v, mat):
            return affine_sample_pallas_variant(v, mat, variant, 0.0)
    else:  # pragma: no cover - defensive fallback
        impl = "xla"
        def sample(v, mat):
            return affine_sample(v, mat, "linear")

    @functools.partial(jax.jit, static_argnames="n")
    def chained(n, v, mat):
        def body(_, carry):
            vv, mm = carry
            return sample(vv, mm), mm
        out, _ = jax.lax.fori_loop(0, n, body, (v, mat))
        return out.ravel()[0]

    iters = 20
    float(chained(1, vol, mj))
    float(chained(iters, vol, mj))

    def run(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(n, vol, mj))
            best = min(best, time.perf_counter() - t0)
        return best

    per_call_ms = (run(iters) - run(1)) / (iters - 1) * 1e3

    print(json.dumps({
        "metric": (f"StaticVolume {size}^3 f32 linear rotation, resident "
                   f"volume, device output ({impl})"),
        "value": round(per_call_ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / per_call_ms, 2),
    }))


if __name__ == "__main__":
    main()
