from .dist import (
    make_mesh,
    shard_hierarchy,
    shard_vector,
    DistAMGSolver,
)
from .halo import spmv_dia_ring
from .spmd_cycle import SpmdAMGSolver
from .multihost import initialize, is_multiprocess, fetch, make_host_mesh

__all__ = ["make_mesh", "shard_hierarchy", "shard_vector", "DistAMGSolver",
           "spmv_dia_ring", "SpmdAMGSolver",
           "initialize", "is_multiprocess", "fetch", "make_host_mesh"]
