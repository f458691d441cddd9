"""Multi-host launch support.

TPU pods expose one process per host; this module wires
:func:`jax.distributed.initialize` from standard environment variables and
provides host-local grid construction so each host feeds its own tile of
the receiver grid (DCN-friendly: pixel data never crosses hosts; only the
final map gather and parameter all-reduces do).

Environment contract (also accepted as keyword arguments):

* ``DIFFERT2D_COORDINATOR`` -- ``host:port`` of process 0;
* ``DIFFERT2D_NUM_PROCESSES`` -- total process count;
* ``DIFFERT2D_PROCESS_ID`` -- this process's index.

On Cloud TPU these are auto-detected by JAX and none are required.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharding import grid_mesh


def initialize_from_env(**overrides: Any) -> None:
    """Initialize multi-host JAX from the environment contract above.

    No-op when ``DIFFERT2D_NUM_PROCESSES`` is absent or 1 (single-host).
    """
    num = int(
        overrides.pop(
            "num_processes", os.environ.get("DIFFERT2D_NUM_PROCESSES", "1")
        )
    )
    if num <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=overrides.pop(
            "coordinator_address", os.environ.get("DIFFERT2D_COORDINATOR")
        ),
        num_processes=num,
        process_id=int(
            overrides.pop(
                "process_id", os.environ.get("DIFFERT2D_PROCESS_ID", "0")
            )
        ),
        **overrides,
    )


def host_local_pixels(
    X: jax.Array, Y: jax.Array, mesh: Optional[Mesh] = None, axis_name: str = "grid"
) -> tuple[jax.Array, int]:
    """Build a globally-sharded pixel array from a global grid, with each
    host materializing only its own rows.

    Uses :func:`jax.make_array_from_process_local_data`: the global flat
    pixel axis is split evenly over processes (padding the tail), each
    process supplies its local slice, and the result is a global array
    sharded over the mesh -- no cross-host data movement on construction.

    :return: (global sharded pixels ``[P_padded, 2]``, original length).
    """
    if mesh is None:
        mesh = grid_mesh(axis_name=axis_name)
    pixels = jnp.stack([X.ravel(), Y.ravel()], axis=-1)
    n = pixels.shape[0]
    num_devices = mesh.devices.size
    padded = -((-n) // num_devices) * num_devices
    if padded != n:
        pad = jnp.broadcast_to(pixels[-1], (padded - n, 2))
        pixels = jnp.concatenate([pixels, pad], axis=0)

    sharding = NamedSharding(mesh, P(axis_name))
    if jax.process_count() == 1:
        return jax.device_put(pixels, sharding), n

    # Every host can compute the full (tiny) pixel array, so build the
    # global array from explicit per-device shards: each addressable
    # device receives exactly the global rows the sharding assigns to it.
    # This is correct for any device enumeration order (process-contiguous
    # or topology-interleaved).
    host_pixels = np.asarray(pixels)
    index_map = sharding.addressable_devices_indices_map((padded, 2))
    shards = [
        jax.device_put(host_pixels[idx], device)
        for device, idx in index_map.items()
    ]
    global_arr = jax.make_array_from_single_device_arrays(
        (padded, 2), sharding, shards
    )
    return global_arr, n
