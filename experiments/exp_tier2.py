import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import sys; sys.path.insert(0, "/root/repo")
from voltools_tpu.kernels.pallas_affine import choose_variant, affine_sample_pallas_variant
from voltools_tpu.ops.sampling import affine_sample
from voltools_tpu.utils import transform_matrix

rng = np.random.default_rng(5)
vol = rng.random((40, 48, 56)).astype(np.float32)
C = (19.5, 23.5, 27.5)
cases = {
  "rot_mid": transform_matrix(rotation=(32, 14, -7), rotation_order="rzxz", center=C),
  "rot454545": transform_matrix(rotation=(45, 45, 45), rotation_order="rzxz", center=C),
  "rot_rand": transform_matrix(rotation=(113, 67, -155), rotation_order="sxyz", center=C),
}
for interp in ("linear", "bspline"):
    for name, m in cases.items():
        v = choose_variant(m, vol.shape, interp)
        if v is None:
            print(f"{interp}/{name}: NO VARIANT"); continue
        ref = np.asarray(affine_sample(vol, m, interp))
        got = np.asarray(affine_sample_pallas_variant(vol, m, v, 0.0, interpret=True))
        err = np.abs(ref-got).max()
        print(f"{interp}/{name}: {'OK' if err < 2e-5 else 'BAD'} err={err:.2e} nv={v.nv} unroll={v.unroll}")
