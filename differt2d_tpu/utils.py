"""Physics utilities (parity with reference ``differt2d/utils.py``)."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from ._runtime_typing import SCALAR_FLOAT, typecheck
from .defaults import DEFAULT_HEIGHT, DEFAULT_R_COEF

P0: float = 100.0
"""Received power at zero distance with default parameters
(reference ``utils.py:12``)."""


@typecheck(r_coef=SCALAR_FLOAT, height=SCALAR_FLOAT)
def received_power(
    transmitter,
    receiver,
    path,
    interacting_objects: Sequence,
    r_coef: float = DEFAULT_R_COEF,
    height: float = DEFAULT_HEIGHT,
) -> jax.Array:
    """Received power along a path: ``r_coef**n / (h^2 + r^2)``.

    ``n`` is the number of interactions, ``r`` the path length, ``h`` an
    antenna-height regularizer avoiding division by zero when TX == RX.
    Reference ``utils.py:18-54``. ``transmitter``, ``receiver`` and
    ``interacting_objects`` are accepted (and ignored) for the
    ``PathFun`` protocol.
    """
    r = path.length()
    n = path.xys.shape[0] - 2
    return (r_coef**n) / (height * height + r * r)


received_power.vectorized = True  # type: ignore[attr-defined]
"""Marker: safe to vmap over batched paths in the grid tracer fast path."""


def kink_excess(
    actual,
    desired,
    rtol: float = 1e-4,
    atol: float = 1e-5,
    frac: float = 0.005,
) -> tuple[int, float]:
    """Count gradient-map pixels beyond tolerance vs the kink allowance.

    Analytic in-kernel gradients agree with XLA AD everywhere except
    KINK pixels -- pixels within one f32 ulp of a soft-min/max
    crossover, where the two computations pick different (equally
    valid) subgradients (PARITY.md "Known numerical tolerances").
    Returns ``(n_bad, allowed)``: the comparison satisfies the contract
    iff ``n_bad <= allowed``. The allowance is ``max(4, frac * size)``
    -- kinks live on validity-transition *curves*, so small grids get
    an absolute floor rather than a share of the area.
    """
    import numpy as np

    a = np.asarray(actual)
    d = np.asarray(desired)
    bad = np.abs(a - d) > (atol + rtol * np.abs(d))
    return int(bad.sum()), max(4.0, frac * bad.size)
