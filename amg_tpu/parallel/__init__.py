from .dist import (
    make_mesh,
    shard_hierarchy,
    shard_vector,
    DistAMGSolver,
)
from .halo import spmv_dia_ring
from .spmd_cycle import SpmdAMGSolver

__all__ = ["make_mesh", "shard_hierarchy", "shard_vector", "DistAMGSolver",
           "spmv_dia_ring", "SpmdAMGSolver"]
