"""Device-mesh parallelism for grid tracing.

The tracer's pixel axis is embarrassingly parallel (reference
``scene.py:1927-1930`` exploits it with a double vmap on one device); here
it becomes the data axis of a :class:`jax.sharding.Mesh`. Wall arrays are
tiny and replicated; parameter gradients (TX position, RIS phases) are
all-reduced over ICI automatically by XLA's SPMD partitioner, overlapped
with the backward pass -- no hand-written collectives needed for the data
path. Multi-host runs use :func:`jax.distributed.initialize` plus
host-local sharded grids.
"""

from .cand_sharded import cand_mesh, power_map_cand_sharded
from .launcher import host_local_pixels, initialize_from_env
from .supervisor import GangResult, run_gang
from .sharding import (
    grid_mesh,
    initialize_distributed,
    make_train_step,
    power_map_sharded,
    shard_pixels,
)
from .wall_sharded import power_map_wall_sharded, wall_grid_mesh

__all__ = (
    "GangResult",
    "grid_mesh",
    "host_local_pixels",
    "initialize_distributed",
    "initialize_from_env",
    "make_train_step",
    "cand_mesh",
    "power_map_cand_sharded",
    "power_map_sharded",
    "run_gang",
    "power_map_wall_sharded",
    "shard_pixels",
    "wall_grid_mesh",
)
