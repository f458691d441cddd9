"""Array-first geometry kernels (the TPU compute core).

Everything here operates on batched arrays with broadcasting — no Python
object dispatch — so the scene tracer can evaluate
``pixels x candidates x order x walls`` tensors in a single fused XLA
program. Shapes use trailing ``[..., 2]`` point axes.
"""

from .geometry_ops import (
    cartesian_to_parametric,
    mirror_point,
    normalize,
    parametric_to_cartesian,
    path_length,
    ris_residual,
    segments_intersect,
    specular_residual,
    wall_normal,
)

__all__ = (
    "cartesian_to_parametric",
    "mirror_point",
    "normalize",
    "parametric_to_cartesian",
    "path_length",
    "ris_residual",
    "segments_intersect",
    "specular_residual",
    "wall_normal",
)
