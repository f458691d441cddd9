"""Batched geometric primitives.

Numerics match the reference implementations cited on each function, but all
functions broadcast over arbitrary leading batch axes so they vectorize over
(pixels x candidates x walls) without Python loops. Every division is
guarded the same way the reference guards it, keeping ``JAX_DEBUG_NANS``
clean on degenerate geometry (colinear segments, zero-length walls).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..logic import greater_equal, less_equal, logical_and


def segments_intersect(
    p1: jax.Array,
    p2: jax.Array,
    p3: jax.Array,
    p4: jax.Array,
    tol: float = 0.005,
    approx: Optional[bool] = None,
    **kwargs: Any,
) -> jax.Array:
    r"""Soft/hard test whether segments ``p1-p2`` and ``p3-p4`` intersect.

    Graphics-Gems parametric test with the reference's exact guards
    (reference ``differt2d/geometry.py:84-173``): both line parameters must
    lie in ``[-tol, 1 + tol]``; a zero denominator (parallel/colinear) maps
    the parameter to ``+inf`` so the test is false without producing NaNs.

    All four point arguments broadcast over leading axes with trailing
    ``[..., 2]``, so one call evaluates a full ``segments x walls`` block.

    :return: Truthy array of the broadcast batch shape (float in soft mode,
        bool in hard mode).
    """
    tol = jnp.asarray(tol)
    a_vec = p2 - p1
    b_vec = p3 - p4
    c_vec = p1 - p3
    num_alpha = b_vec[..., 1] * c_vec[..., 0] - b_vec[..., 0] * c_vec[..., 1]
    num_beta = a_vec[..., 0] * c_vec[..., 1] - a_vec[..., 1] * c_vec[..., 0]
    den = a_vec[..., 1] * b_vec[..., 0] - a_vec[..., 0] * b_vec[..., 1]

    den_is_zero = den == 0.0
    safe_den = jnp.where(den_is_zero, 1.0, den)

    def in_unit_range(num: jax.Array) -> jax.Array:
        t = jnp.where(den_is_zero, jnp.inf, num / safe_den)
        return logical_and(
            greater_equal(t, -tol, approx=approx, **kwargs),
            less_equal(t, 1.0 + tol, approx=approx, **kwargs),
            approx=approx,
        )

    return logical_and(
        in_unit_range(num_alpha), in_unit_range(num_beta), approx=approx
    )


def path_length(points: jax.Array) -> jax.Array:
    """Total polyline length over the ``[..., N, 2]`` point axis.

    Adds machine epsilon to each segment vector so the gradient of the norm
    is finite at zero-length segments (reference ``geometry.py:178-203``).
    """
    vectors = jnp.diff(points, axis=-2)
    vectors = vectors + jnp.finfo(points.dtype).eps
    lengths = jnp.linalg.norm(vectors, axis=-1)
    return jnp.sum(lengths, axis=-1)


def normalize(vector: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Normalize ``[..., 2]`` vectors, returning (unit vector, length).

    Zero vectors map to (zero vector, length 1) exactly like reference
    ``geometry.py:206-230``.
    """
    length = jnp.linalg.norm(vector, axis=-1)
    safe = jnp.where(length == 0.0, jnp.ones_like(length), length)
    return vector / safe[..., None], safe


def wall_normal(walls: jax.Array) -> jax.Array:
    """Unit normal of ``[..., 2, 2]`` walls: rotate direction by -90 degrees.

    Matches reference ``geometry.py:563-573`` (``n = [t_y, -t_x]`` then
    normalize).
    """
    t = walls[..., 1, :] - walls[..., 0, :]
    n = jnp.stack([t[..., 1], -t[..., 0]], axis=-1)
    n, _ = normalize(n)
    return n


def mirror_point(point: jax.Array, walls: jax.Array) -> jax.Array:
    """Mirror image of ``[..., 2]`` points across ``[..., 2, 2]`` walls.

    Reference ``geometry.py:654-670``.
    """
    n = wall_normal(walls)
    incident = point - walls[..., 0, :]
    return point - 2.0 * jnp.sum(incident * n, axis=-1, keepdims=True) * n


def parametric_to_cartesian(walls: jax.Array, t: jax.Array) -> jax.Array:
    """Point on ``[..., 2, 2]`` walls at parameter ``t`` (broadcast scalar).

    Reference ``geometry.py:583-587``.
    """
    origin = walls[..., 0, :]
    direction = walls[..., 1, :] - walls[..., 0, :]
    return origin + t[..., None] * direction


def cartesian_to_parametric(walls: jax.Array, point: jax.Array) -> jax.Array:
    """Parameter of the projection of ``point`` onto ``[..., 2, 2]`` walls.

    Zero-length walls are guarded to parameter via squared length 1
    (reference ``geometry.py:591-598``).
    """
    direction = walls[..., 1, :] - walls[..., 0, :]
    other = point - walls[..., 0, :]
    sq_len = jnp.sum(direction * direction, axis=-1)
    sq_len = jnp.where(sq_len == 0.0, 1.0, sq_len)
    return jnp.sum(direction * other, axis=-1) / sq_len


def specular_residual(
    a: jax.Array, b: jax.Array, c: jax.Array, walls: jax.Array
) -> jax.Array:
    """Squared deviation of ``a -> b -> c`` from specular reflection on walls.

    ``|r_hat - reflect(i_hat, n)|^2``, zero iff the bounce at ``b`` is a
    perfect mirror reflection. Reference ``geometry.py:643-650``.
    """
    n = wall_normal(walls)
    i, _ = normalize(b - a)
    r, _ = normalize(c - b)
    reflected = i - 2.0 * jnp.sum(i * n, axis=-1, keepdims=True) * n
    e = r - reflected
    return jnp.sum(e * e, axis=-1)


def ris_residual(
    b: jax.Array, c: jax.Array, walls: jax.Array, phi: jax.Array
) -> jax.Array:
    """Residual forcing a constant reflection angle ``phi`` off a RIS.

    ``(sin a - sin phi)^2 + (cos a - cos phi)^2`` where ``a`` is the angle of
    the outgoing ray w.r.t. the surface normal. Independent of the incident
    ray, which is how the reference models a metasurface
    (reference ``geometry.py:698-711``).
    """
    n = wall_normal(walls)
    r, _ = normalize(c - b)
    sin_a = (-r[..., 0]) * n[..., 1] - (-r[..., 1]) * n[..., 0]
    cos_a = jnp.sum((-r) * n, axis=-1)
    return (sin_a - jnp.sin(phi)) ** 2 + (cos_a - jnp.cos(phi)) ** 2
