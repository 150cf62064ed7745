import os
os.environ.setdefault("T","1")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import sys; sys.path.insert(0, "/root/repo")

from voltools_tpu.kernels.pallas_affine import choose_variant, affine_sample_pallas_variant
from voltools_tpu.ops.sampling import affine_sample
from voltools_tpu.utils import transform_matrix, rotation_matrix, translation_matrix

rng = np.random.default_rng(5)
vol = rng.random((40, 48, 56)).astype(np.float32)

cases = {
  "identity": np.eye(4, dtype=np.float32),
  "translate": translation_matrix((1.5, -2.25, 0.75)),
  "scale": transform_matrix(scale=(1.3, 0.8, 1.1), center=(19.5, 23.5, 27.5)),
  "rot_small": transform_matrix(rotation=(10, 5, -3), rotation_order="rzxz", center=(19.5, 23.5, 27.5)),
  "rot_singleaxis60": transform_matrix(rotation=(0, 60, 0), rotation_order="sxyz", center=(19.5, 23.5, 27.5)),
  "rot_mid": transform_matrix(rotation=(32, 14, -7), rotation_order="rzxz", center=(19.5, 23.5, 27.5)),
  "shear": transform_matrix(shear=(0.1, -0.05, 0.2), center=(19.5, 23.5, 27.5)),
}

for interp in ("linear", "bspline"):
    for mode in ("constant", "border"):
        for name, m in cases.items():
            v = choose_variant(m, vol.shape, interp, mode)
            if v is None:
                print(f"{interp}/{mode}/{name}: NO VARIANT")
                continue
            ref = np.asarray(affine_sample(vol, m, interp, mode))
            got = np.asarray(affine_sample_pallas_variant(vol, m, v, 0.0, interpret=True))
            err = np.abs(ref - got).max()
            tag = "OK " if err < 2e-5 else "BAD"
            print(f"{interp}/{mode}/{name}: {tag} err={err:.2e} nv={v.nv} ps={v.ps} po={v.po} w=({v.w0},{v.w1})")
