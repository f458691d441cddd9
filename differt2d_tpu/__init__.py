"""differt2d_tpu: a TPU-native differentiable 2D radio ray tracer.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
DiffeRT2d (jeertmans/DiffeRT2d): ray-path finding over 2D scene geometry
(image method, Fermat path tracing, min-path tracing) with smoothed
differentiable logic, so received power is differentiable w.r.t. TX/RX
positions and wall/RIS parameters.

Layers:

* :mod:`differt2d_tpu.logic` -- soft boolean logic (activations).
* :mod:`differt2d_tpu.ops` -- batched array geometry kernels.
* :mod:`differt2d_tpu.rt` -- native + NumPy path-candidate enumeration.
* :mod:`differt2d_tpu.geometry` -- objects and path solvers.
* :mod:`differt2d_tpu.optimize` -- differentiable inner optimizer.
* :mod:`differt2d_tpu.scene` -- scene container and accumulators.
* :mod:`differt2d_tpu.tracer` -- the batched TPU grid tracer (hot path).
* :mod:`differt2d_tpu.parallel` -- device-mesh sharding and multi-host.
* :mod:`differt2d_tpu.utils` -- physics utilities.
"""

__version__ = "0.5.0"

from . import logic, ops, rt  # noqa: F401
from ._runtime_typing import (  # noqa: F401
    TypeCheckError,
    no_typecheck,
    set_typecheck,
)
from .geometry import (  # noqa: F401
    FermatPath,
    ImagePath,
    MinPath,
    Path,
    Point,
    RIS,
    Ray,
    Vertex,
    Wall,
)
from .scene import Scene  # noqa: F401
from .utils import P0, received_power  # noqa: F401
