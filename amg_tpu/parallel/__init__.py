from .dist import (
    make_mesh,
    shard_hierarchy,
    shard_vector,
    DistAMGSolver,
)

__all__ = ["make_mesh", "shard_hierarchy", "shard_vector", "DistAMGSolver"]
