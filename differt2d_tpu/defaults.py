"""Default values (parity with reference ``differt2d/defaults.py:3-15``)."""

DEFAULT_ALPHA: float = 100.0
"""Default slope for :func:`differt2d_tpu.logic.activation`."""

DEFAULT_PATCH: float = 0.0
"""Default patch value for intersection checks (virtually grows/shrinks
objects, see :meth:`Wall.intersects_cartesian`)."""

DEFAULT_R_COEF: float = 0.5
"""Default real reflection coefficient."""

DEFAULT_HEIGHT: float = 0.1
"""Default TX antenna height; a numerical artifact avoiding division by zero
in :func:`differt2d_tpu.utils.received_power`."""
