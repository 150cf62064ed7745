from .sharded import (
    ShardedVolume,
    halo_for_matrix,
    make_mesh,
    sharded_affine_batch,
)

__all__ = [
    "ShardedVolume",
    "halo_for_matrix",
    "make_mesh",
    "sharded_affine_batch",
]
