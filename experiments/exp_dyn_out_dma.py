"""Probe: pallas output DMA at a dynamic row offset (VMEM stage -> HBM).

Validates the primitive the sheared-output design would need: per-grid-step
(8,128) tiles written to `out_hbm.at[pl.ds(dynamic_off, 8), :]`.  Measured
working on TPU v5e (values land at the requested offsets, later grid steps
overwrite earlier overlapping rows).  See docs_notes_round3.md for why the
full sheared-output idea still doesn't pay.
"""
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    def kernel(off_ref, out_hbm, stage_ref, sem):
        i = pl.program_id(0)
        stage_ref[...] = jnp.full((8, 128), i + 1, jnp.float32)
        cp = pltpu.make_async_copy(stage_ref,
                                   out_hbm.at[pl.ds(off_ref[i], 8), :], sem)
        cp.start()
        cp.wait()

    offs = jnp.asarray([0, 24, 4, 48], jnp.int32)
    out = pl.pallas_call(
        kernel,
        grid=(4,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )(offs)
    o = np.asarray(out)
    print(o[0, 0], o[24, 0], o[4, 0], o[48, 0])


if __name__ == "__main__":
    main()
