"""Round-4 diagnostic: per-rotation chosen walk configs for the bench
workload (250^3 linear, seed-0 'sxyz' rotations), host-only.

Prints the tight-mode plan parameters for each of the 16 bench rotations
so the slow class (ndx=4; rotations 3, 8, 11, 12, 14 at 9.8-12.6 ms in
BENCH_r03) can be attributed: slot count, walk length, band height,
gather blocks, packing/macro, and the modeled cost."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from voltools_tpu.kernels.pallas_walk import choose_walk_variant, _variant_cost
from voltools_tpu.utils import transform_matrix

size = 250
center = (size / 2,) * 3
rot_rng = np.random.default_rng(0)
rot_rng.random((size,) * 3, dtype=np.float64)  # align the stream (bench.py)

meas = [6.469, 6.154, 6.565, 11.533, 6.577, 6.592, 7.035, 6.485, 10.374,
        7.272, 2.556, 11.975, 12.567, 6.619, 9.817, 6.326]
print(f"{'i':>2} {'ms':>6} {'ndx':>3} {'hz':>3} {'hy':>3} {'nbw':>3} "
      f"{'pack':>6} {'macro':>5} {'dyn':>3} {'model_ms':>8}  slop  w0xw1xxw")
for i in range(16):
    ang = rot_rng.uniform(-180, 180, 3)
    m = transform_matrix(rotation=tuple(ang), rotation_order="sxyz",
                         center=center)
    v = choose_walk_variant(m, (size,) * 3, "linear", "constant",
                            quantize=False, sticky=1.0)
    print(f"{i:>2} {meas[i]:>6.2f} {len(v.dxs):>3} {v.hz:>3} {v.hy:>3} "
          f"{v.nbw:>3} {str((v.vb, v.wb)):>6} {str((v.gu, v.gv)):>5} "
          f"{str(v.dyn_x)[0]:>3} {_variant_cost(v)/1e6:>8.2f}  "
          f"({v.slop_lo},{v.slop_hi})  {v.w0}x{v.w1}x{v.xw} whole={v.whole}")
