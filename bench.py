"""Headline benchmark: 250^3 float32 linear transform on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": <ms>, "unit": "ms", "vs_baseline": <speedup x>}

Baseline: the reference's `cp_transform_out` column at 250^3 linear on a
GTX 1050 Ti = 12.678 ms (BASELINE.md).  vs_baseline > 1 means faster than
the reference.

Timing method: this environment reaches the TPU through an RPC tunnel where
``block_until_ready`` returns before execution finishes and a host round-trip
costs ~25 ms, so per-call wall timing is meaningless.  We time N dependent
transforms chained inside one jitted loop (forcing a scalar to host at the
end) and subtract the 1-iteration run: the slope is the true per-transform
device time.  Run directly on attached hardware the same code gives the same
numbers without the constant.
"""

import json
import sys
import time

import numpy as np

BASELINE_MS = 12.678  # reference cp_transform_out, 250^3 linear, GTX 1050 Ti


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from voltools_tpu.transforms import _pick_impl
    from voltools_tpu.utils import rotation_matrix

    size = 250
    rng = np.random.default_rng(0)
    vol_np = rng.random((size, size, size), dtype=np.float64).astype(np.float32)
    vol = jnp.asarray(vol_np)

    m = rotation_matrix((32.0, 14.0, -7.0), "deg", "rzxz").astype(np.float32)
    mj = jnp.asarray(m)

    device = jax.devices()[0]
    impl = _pick_impl(device)
    if impl == "pallas":
        from voltools_tpu.kernels.pallas_affine import affine_sample_pallas as sampler_fn

        def sample(v, mat):
            return sampler_fn(v, mat, "linear", "constant", 0.0)
    else:
        from voltools_tpu.ops.sampling import affine_sample

        def sample(v, mat):
            return affine_sample(v, mat, "linear", "constant", 0.0)

    import functools

    @functools.partial(jax.jit, static_argnames="n")
    def chained(n, v, mat):
        def body(_, carry):
            vv, mm = carry
            return sample(vv, mm), mm
        out, _ = jax.lax.fori_loop(0, n, body, (v, mat))
        return out.ravel()[0]

    iters = 10
    # warm both compilations
    float(chained(1, vol, mj))
    float(chained(iters, vol, mj))

    def run(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(n, vol, mj))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = run(1)
    tn = run(iters)
    per_call_ms = (tn - t1) / (iters - 1) * 1e3

    print(json.dumps({
        "metric": f"{size}^3 float32 linear affine transform ({impl})",
        "value": round(per_call_ms, 3),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / per_call_ms, 2),
    }))


if __name__ == "__main__":
    main()
