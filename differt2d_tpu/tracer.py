"""Batched grid tracer -- the TPU hot path.

The reference evaluates its power maps by tracing one scalar function per
pixel with a Python loop over candidates unrolled into the graph
(reference ``differt2d/scene.py:1892-1930``). This module restructures the
same numerics around dense batched arrays:

* a scene is ``walls[W, 2, 2]`` plus per-wall ``kind``/``phi`` arrays
  (kind 0 = mirror wall, 1 = RIS, 2 = diffraction vertex);
* candidates are ``int32[C, order]`` matrices grouped per order
  (static shapes, no padding);
* solvers, validity and power evaluate as
  ``pixels x candidates x order x walls`` tensor ops that XLA fuses into a
  single elementwise kernel over the pixel axis -- ideal for the TPU VPU,
  and the axis :mod:`differt2d_tpu.parallel` shards across device meshes.

Numerics match the reference exactly (same guards, same activation
saturation); see citations on each helper.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ._module import field, pytree_dataclass
from ._runtime_typing import (
    OPT_BOOL,
    OPT_CALLABLE,
    OPT_KEY_ARRAY,
    SCALAR_INT_STRICT,
    TypeCheckError,
    XY_ARRAY,
    literal_spec,
    typecheck,
)
from .defaults import DEFAULT_ALPHA, DEFAULT_HEIGHT, DEFAULT_PATCH, DEFAULT_R_COEF
from .geometry import RIS, Vertex, Wall
from .logic import hard_sigmoid
from .ops import geometry_ops as _ops
from .optimize import minimize
from .rt import path_candidate_matrices

KIND_WALL = 0
KIND_RIS = 1
KIND_VERTEX = 2


@pytree_dataclass
class SceneArrays:
    """Dense array representation of a scene's objects.

    ``walls[W, 2, 2]`` stores every object as a segment (a vertex stores
    its location in both endpoints, making its direction vector zero --
    all downstream kernels guard zero-length segments).
    """

    walls: jax.Array = field(converter=jnp.asarray)
    kind: jax.Array = field(converter=jnp.asarray)
    phi: jax.Array = field(converter=jnp.asarray)

    @property
    def num_objects(self) -> int:
        return self.walls.shape[0]


_SCENE_ARRAYS_CACHE: "weakref.WeakKeyDictionary" = None  # type: ignore[assignment]


def scene_arrays(scene) -> Optional[SceneArrays]:
    """Convert a :class:`Scene`'s objects to :class:`SceneArrays`.

    Returns ``None`` when an object type outside {Wall, RIS, Vertex} is
    present (the caller then falls back to the object-API path).

    Results are cached per scene instance (scenes are immutable PyTrees):
    repeated map calls on the same scene skip the per-object array
    assembly, which matters on remote-dispatch devices where every small
    op pays tunnel latency.
    """
    global _SCENE_ARRAYS_CACHE
    import weakref

    if _SCENE_ARRAYS_CACHE is None:
        _SCENE_ARRAYS_CACHE = weakref.WeakKeyDictionary()
    try:
        cached = _SCENE_ARRAYS_CACHE.get(scene)
    except TypeError:
        cached = None
    if cached is not None:
        return cached
    arrays = _scene_arrays_uncached(scene)
    try:
        _SCENE_ARRAYS_CACHE[scene] = arrays
    except TypeError:
        pass
    return arrays


def _scene_arrays_uncached(scene) -> Optional[SceneArrays]:
    walls, kinds, phis = [], [], []
    for obj in scene.objects:
        if isinstance(obj, RIS):
            walls.append(obj.xys)
            kinds.append(KIND_RIS)
            phis.append(obj.phi)
        elif isinstance(obj, Vertex):
            walls.append(jnp.stack([obj.xy, obj.xy]))
            kinds.append(KIND_VERTEX)
            phis.append(jnp.array(0.0))
        elif isinstance(obj, Wall):
            walls.append(obj.xys)
            kinds.append(KIND_WALL)
            phis.append(jnp.array(0.0))
        else:
            return None
    if not walls:
        return SceneArrays(
            walls=jnp.zeros((0, 2, 2)),
            kind=jnp.zeros((0,), dtype=jnp.int32),
            phi=jnp.zeros((0,)),
        )
    return SceneArrays(
        walls=jnp.stack(walls),
        kind=jnp.asarray(kinds, dtype=jnp.int32),
        phi=jnp.stack(phis),
    )


# -- batched solver / validity kernels --------------------------------------
# All take candidate-gathered walls ``cw[C, o, 2, 2]`` (+ kind/phi) and
# produce per-candidate results; the pixel axis comes from vmapping the
# per-pixel scalar accumulation in :func:`_accumulate_pixel`.


def _bounce_residuals(
    pts_full: jax.Array, cw: jax.Array, ckind: jax.Array, cphi: jax.Array
) -> jax.Array:
    """Sum of interaction residuals along each candidate path.

    ``pts_full[C, o+2, 2]``; residual per bounce selected by kind:
    wall -> specular (reference ``geometry.py:643-650``), RIS -> constant
    angle (``geometry.py:698-711``), vertex -> 0.
    """
    o = cw.shape[1]
    if o == 0:
        return jnp.zeros(pts_full.shape[0])
    a = pts_full[:, :-2, :]
    b = pts_full[:, 1:-1, :]
    c = pts_full[:, 2:, :]
    spec = _ops.specular_residual(a, b, c, cw)
    ris = _ops.ris_residual(b, c, cw, cphi)
    res = jnp.where(ckind == KIND_RIS, ris, spec)
    res = jnp.where(ckind == KIND_VERTEX, 0.0, res)
    return jnp.sum(res, axis=-1)


def _solve_image(
    tx: jax.Array, rx: jax.Array, cw: jax.Array, ckind: jax.Array
) -> jax.Array:
    """Image-method bounce points for every candidate, ``[C, o, 2]``.

    Forward mirror sweep then backward line-wall intersection with the
    reference's un == 0 guard (``geometry.py:1086-1110``). Vertex bounces
    are pinned to the vertex location (zero-length segment => mirror is the
    identity, so the pin is what makes mixed candidates meaningful).
    """
    C, o = cw.shape[0], cw.shape[1]
    if o == 0:
        return jnp.zeros((C, 0, 2))

    image = jnp.broadcast_to(tx, (C, 2))
    images = []
    for i in range(o):
        image = _ops.mirror_point(image, cw[:, i])
        images.append(image)

    point = jnp.broadcast_to(rx, (C, 2))
    points: list = [None] * o
    for i in range(o - 1, -1, -1):
        wall_i = cw[:, i]
        normal = _ops.wall_normal(wall_i)
        u = point - images[i]
        v = wall_i[:, 0, :] - point
        un = jnp.sum(u * normal, axis=-1)
        vn = jnp.sum(v * normal, axis=-1)
        safe_un = jnp.where(un == 0.0, 1.0, un)
        inc = jnp.where((un == 0.0)[:, None], 0.0, (vn / safe_un)[:, None] * u)
        point = point + inc
        # Pin vertex bounces to the vertex location.
        point = jnp.where(
            (ckind[:, i] == KIND_VERTEX)[:, None], wall_i[:, 0, :], point
        )
        points[i] = point
    return jnp.stack(points, axis=1)


def _theta_to_points(
    theta: jax.Array, cw: jax.Array, ckind: jax.Array
) -> jax.Array:
    """Map per-bounce parameters ``theta[..., o]`` to bounce points.

    Wall/RIS: point on the segment at parameter t; vertex: fixed location
    (its parameter is inert, so gradients w.r.t. it are zero and the
    optimization dynamics match the reference's packed-parameter form).
    """
    on_wall = _ops.parametric_to_cartesian(cw, theta)
    return jnp.where((ckind == KIND_VERTEX)[..., None], cw[..., 0, :], on_wall)


def _solve_opt(
    tx: jax.Array,
    rx: jax.Array,
    cw: jax.Array,
    ckind: jax.Array,
    cphi: jax.Array,
    keys: jax.Array,
    objective: str,
    steps: int,
    many: int,
    implicit: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fermat ('fermat') or MPT ('mpt') solve, vmapped over candidates.

    Same inner optimizer as the reference (adam(0.1) in a scan,
    ``optimize.py:46-97``), objectives per ``geometry.py:1184-1187`` and
    ``geometry.py:1274-1280``. Returns ``(points[C, o, 2], loss[C])``
    where ``loss`` matches the reference's convention: final objective for
    MPT, residual-at-solution for Fermat.

    ``implicit=True`` switches the solver's *gradients* to the
    implicit-function theorem at the solution (identical forward solve;
    see :func:`differt2d_tpu.optimize.minimize`).
    """
    C, o = cw.shape[0], cw.shape[1]
    if o == 0:
        return jnp.zeros((C, 0, 2)), jnp.zeros(C)

    def assemble(theta, cw_c, ckind_c, tx_=None, rx_=None):
        tx_ = tx if tx_ is None else tx_
        rx_ = rx if rx_ is None else rx_
        pts = _theta_to_points(theta, cw_c, ckind_c)
        return jnp.concatenate([tx_[None, :], pts, rx_[None, :]], axis=0)

    def solve_one(key, cw_c, ckind_c, cphi_c):
        # Differentiable data rides in ``p`` so the implicit-diff
        # custom_vjp sees it as an argument, never a closed-over tracer.
        p0 = (tx, rx, cw_c, ckind_c, cphi_c)

        def fermat_objective(theta, p):
            tx_, rx_, cw_p, ckind_p, _ = p
            return _ops.path_length(
                assemble(theta, cw_p, ckind_p, tx_, rx_)
            )

        def mpt_objective(theta, p):
            tx_, rx_, cw_p, ckind_p, cphi_p = p
            full = assemble(theta, cw_p, ckind_p, tx_, rx_)
            return _bounce_residuals(
                full[None], cw_p[None], ckind_p[None], cphi_p[None]
            )[0]

        fun = fermat_objective if objective == "fermat" else mpt_objective

        def run(k):
            x0 = jax.random.uniform(k, shape=(o,))
            return minimize(
                fun, x0, args=(p0,), steps=steps, implicit=implicit
            )

        if many == 1:
            theta, last = run(key)
        else:
            thetas, lasts = jax.vmap(run)(jax.random.split(key, many))
            i_min = jnp.argmin(lasts)
            theta, last = thetas[i_min], lasts[i_min]

        pts = _theta_to_points(theta, cw_c, ckind_c)
        full = assemble(theta, cw_c, ckind_c)
        if objective == "fermat":
            loss = _bounce_residuals(
                full[None], cw_c[None], ckind_c[None], cphi_c[None]
            )[0]
        else:
            loss = last
        return pts, loss

    return jax.vmap(solve_one)(keys, cw, ckind, cphi)


def _on_objects(
    pts: jax.Array,
    cw: jax.Array,
    ckind: jax.Array,
    approx: bool,
    alpha,
    function,
) -> jax.Array:
    """Soft/hard AND over "bounce i lies on object i" (``geometry.py:821-854``)."""
    C, o = pts.shape[0], pts.shape[1]
    if o == 0:
        return jnp.ones(C) if approx else jnp.ones(C, dtype=bool)
    t = _ops.cartesian_to_parametric(cw, pts)
    if approx:
        ge = function(t - 0.0, alpha)
        le = function(1.0 - t, alpha)
        contains = jnp.minimum(ge, le)
        contains = jnp.where(ckind == KIND_VERTEX, 1.0, contains)
        return jnp.min(contains, axis=-1)
    contains = (t >= 0.0) & (t <= 1.0)
    contains = jnp.where(ckind == KIND_VERTEX, True, contains)
    return jnp.all(contains, axis=-1)


def _blocked(
    pts_full: jax.Array,
    cand: jax.Array,
    arrays: SceneArrays,
    patch,
    approx: bool,
    alpha,
    function,
    tol_intersect=0.005,
) -> jax.Array:
    """Soft/hard OR over "segment s is blocked by non-adjacent object w".

    Vectorized form of reference ``geometry.py:856-906``: every path
    segment is tested against every wall, with the two walls adjacent to
    each segment masked out and vertices never blocking
    (``geometry.py:405-414``).
    """
    C = pts_full.shape[0]
    S = pts_full.shape[1] - 1  # number of segments (order + 1)
    W = arrays.num_objects
    if W == 0:
        return jnp.zeros(C) if approx else jnp.zeros(C, dtype=bool)

    seg_a = pts_full[:, :-1, :][:, :, None, :]  # [C, S, 1, 2]
    seg_b = pts_full[:, 1:, :][:, :, None, :]

    direction = arrays.walls[:, 1, :] - arrays.walls[:, 0, :]
    w_a = (arrays.walls[:, 0, :] - patch * direction)[None, None, :, :]
    w_b = (arrays.walls[:, 1, :] + patch * direction)[None, None, :, :]

    hit = _ops.segments_intersect(
        w_a,
        w_b,
        seg_a,
        seg_b,
        tol=tol_intersect,
        approx=approx,
        alpha=alpha,
        function=function,
    )  # [C, S, W]

    # Adjacency mask: interacting indices are [-1, cand..., -1]; segment s
    # connects node s to node s + 1 (reference geometry.py:881-890).
    minus = jnp.full((C, 1), -1, dtype=jnp.int32)
    idx = jnp.concatenate([minus, cand.astype(jnp.int32), minus], axis=1)  # [C, S+1]
    wall_ids = jnp.arange(W, dtype=jnp.int32)[None, None, :]
    ignore = (wall_ids == idx[:, :-1, None]) | (wall_ids == idx[:, 1:, None])
    # Vertices never block (zero-length segments would never hit anyway,
    # but mask explicitly to mirror Vertex.intersects_cartesian == false).
    ignore = ignore | (arrays.kind == KIND_VERTEX)[None, None, :]

    if approx:
        hit = jnp.where(ignore, 0.0, hit)
        return jnp.max(hit.reshape(C, -1), axis=-1)
    hit = jnp.where(ignore, False, hit)
    return jnp.any(hit.reshape(C, -1), axis=-1)


def _all_vertex_rows(kind: jax.Array, cand_np: np.ndarray) -> bool:
    """Host-side check that every candidate row consists only of vertices.

    ``kind`` is always concrete (it is derived from object types, never
    from traced values), but be defensive under exotic tracing.
    """
    try:
        kinds_np = np.asarray(kind)
    except Exception:
        return False
    return bool(np.all(kinds_np[cand_np] == KIND_VERTEX))


def _received_power_batched(
    pts_full: jax.Array, order: int, r_coef, height
) -> jax.Array:
    """Batched reference power model (``utils.py:18-54``)."""
    r = _ops.path_length(pts_full)
    return (r_coef**order) / (height * height + r * r)


def _accumulate_pixel(
    tx: jax.Array,
    rx: jax.Array,
    arrays: SceneArrays,
    groups: dict[int, np.ndarray],
    group_keys: dict[int, Optional[jax.Array]],
    *,
    solver: str,
    approx: bool,
    alpha,
    function,
    tol,
    patch,
    steps: int,
    many: int,
    power_fun: Callable[[jax.Array, int], jax.Array],
    implicit: bool = False,
) -> jax.Array:
    """Scalar accumulation for one pixel: sum over orders and candidates of
    ``valid * power``. The vectorized twin of reference
    ``scene.py:1892-1918``.
    """
    acc = jnp.array(0.0)
    for order, cand_np in sorted(groups.items()):
        if cand_np.shape[0] == 0:
            continue
        pts_full, loss, valid = _trace_group(
            tx, rx, arrays, order, cand_np, group_keys[order],
            solver=solver, approx=approx, alpha=alpha, function=function,
            tol=tol, patch=patch, steps=steps, many=many,
            implicit=implicit,
        )
        power = power_fun(pts_full, order)
        acc = acc + jnp.sum(valid * power)
    return acc


def _trace_group(
    tx: jax.Array,
    rx: jax.Array,
    arrays: SceneArrays,
    order: int,
    cand_np: np.ndarray,
    keys: Optional[jax.Array],
    *,
    solver: str,
    approx: bool,
    alpha,
    function,
    tol,
    patch,
    steps: int,
    many: int,
    implicit: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Solve + validate one order group of candidates.

    Shared by :func:`_accumulate_pixel` and :func:`trace_paths`.

    :return: ``(pts_full[C, order+2, 2], loss[C], valid[C])``.
    """
    C = cand_np.shape[0]
    cand = jnp.asarray(cand_np)
    cw = arrays.walls[cand]  # [C, o, 2, 2]
    ckind = arrays.kind[cand]
    cphi = arrays.phi[cand]

    if order == 0:
        pts = jnp.zeros((C, 0, 2))
        loss = jnp.zeros(C)
    elif solver == "image":
        pts = _solve_image(tx, rx, cw, ckind)
        full = jnp.concatenate(
            [jnp.broadcast_to(tx, (C, 1, 2)), pts,
             jnp.broadcast_to(rx, (C, 1, 2))],
            axis=1,
        )
        loss = _bounce_residuals(full, cw, ckind, cphi)
    elif _all_vertex_rows(arrays.kind, cand_np):
        # All-vertex candidates (the vertex-diffraction workflow): every
        # parameter is inert -- the solver's objective is constant, adam's
        # zero gradient leaves the init unchanged, and the bounce points
        # are just the vertex locations. Skip the optimization; the result
        # is bit-for-bit what running it would produce (vertex residuals
        # are identically zero, reference geometry.py:416-419).
        pts = cw[:, :, 0, :]
        loss = jnp.zeros(C)
    else:
        if keys is None:
            msg = f"solver {solver!r} requires a PRNG key"
            raise ValueError(msg)
        pts, loss = _solve_opt(
            tx, rx, cw, ckind, cphi, keys,
            objective=solver, steps=steps, many=many, implicit=implicit,
        )

    pts_full = jnp.concatenate(
        [jnp.broadcast_to(tx, (C, 1, 2)), pts,
         jnp.broadcast_to(rx, (C, 1, 2))],
        axis=1,
    )

    on = _on_objects(pts, cw, ckind, approx, alpha, function)
    blk = _blocked(pts_full, cand, arrays, patch, approx, alpha, function)
    if approx:
        loss_ok = function(tol - loss, alpha)
        valid = jnp.minimum(jnp.minimum(on, 1.0 - blk), loss_ok)
        valid = jnp.nan_to_num(valid)
    else:
        valid = on & (~blk) & (loss < tol)
    return pts_full, loss, valid


def make_pixels_fn(
    scene,
    *,
    min_order: int = 0,
    max_order: int = 1,
    order: Optional[int] = None,
    solver: str = "image",
    approx: Optional[bool] = None,
    alpha=DEFAULT_ALPHA,
    function=hard_sigmoid,
    tol=1e-2,
    patch=DEFAULT_PATCH,
    r_coef=DEFAULT_R_COEF,
    height=DEFAULT_HEIGHT,
    steps: int = 100,
    many: int = 1,
    solver_grad: str = "unroll",
    key: Optional[jax.Array] = None,
    filter_objects=None,
    on_transmitters: bool = False,
    grad: bool = False,
    value_and_grad: bool = False,
    power_fun: Optional[Callable[[jax.Array, int], jax.Array]] = None,
) -> Callable[[jax.Array], Any]:
    """Build the flat-pixel map function ``f(pixels[P, 2]) -> [P]``.

    The returned function is pure and jittable; it contains the full
    trace-validate-accumulate pipeline vmapped over the pixel axis and
    summed over the scene's fixed nodes. :func:`power_map` wraps it for
    2D grids; :mod:`differt2d_tpu.parallel` shards its input axis over a
    device mesh (pixels are independent, so no cross-device communication
    is needed in the forward pass).

    With ``grad=True`` the output is ``[P, 2]``; with ``value_and_grad``
    a ``([P], [P, 2])`` tuple.
    """
    from .logic import ENABLE_APPROX

    if approx is None:
        approx = ENABLE_APPROX

    arrays = scene_arrays(scene)
    if arrays is None:
        msg = "the grid tracer requires Wall/RIS/Vertex objects only"
        raise ValueError(msg)

    if filter_objects is None:
        filter_nodes = None
    else:
        filter_nodes = tuple(
            i for i, obj in enumerate(scene.objects) if not filter_objects(obj)
        )
    groups = path_candidate_matrices(
        arrays.num_objects,
        min_order=min_order,
        max_order=max_order,
        order=order,
        filter_nodes=filter_nodes,
    )

    # One PRNG key per candidate in global (order-major) enumeration order,
    # matching reference scene.py:1887-1890.
    group_keys: dict[int, Optional[jax.Array]] = {o: None for o in groups}
    if key is not None:
        total = sum(g.shape[0] for g in groups.values())
        keys = jax.random.split(key, total)
        start = 0
        for o in sorted(groups):
            C = groups[o].shape[0]
            group_keys[o] = keys[start : start + C]
            start += C

    if power_fun is None:
        power_fun = partial(_received_power_batched, r_coef=r_coef, height=height)

    fixed_points = (
        [rx.xy for rx in scene.receivers.values()]
        if on_transmitters
        else [tx.xy for tx in scene.transmitters.values()]
    )

    def per_pixel(fixed: jax.Array, pixel: jax.Array) -> jax.Array:
        tx, rx = (pixel, fixed) if on_transmitters else (fixed, pixel)
        return _accumulate_pixel(
            tx,
            rx,
            arrays,
            groups,
            group_keys,
            solver=solver,
            approx=approx,
            alpha=alpha,
            function=function,
            tol=tol,
            patch=patch,
            steps=steps,
            many=many,
            power_fun=power_fun,
            implicit=solver_grad == "implicit",
        )

    # Gradients w.r.t. the pixel coordinate are 2-dimensional, so
    # forward-mode (two JVP tangents) is far cheaper than reverse-mode
    # through the whole trace (measured ~3x on TPU): no residual saving,
    # single fused forward pass per tangent.
    if value_and_grad:

        def f(fixed, pixel):
            val, dx = jax.jvp(
                lambda p: per_pixel(fixed, p), (pixel,), (jnp.array([1.0, 0.0]),)
            )
            _, dy = jax.jvp(
                lambda p: per_pixel(fixed, p), (pixel,), (jnp.array([0.0, 1.0]),)
            )
            return val, jnp.stack([dx, dy])

    elif grad:

        def f(fixed, pixel):
            _, dx = jax.jvp(
                lambda p: per_pixel(fixed, p), (pixel,), (jnp.array([1.0, 0.0]),)
            )
            _, dy = jax.jvp(
                lambda p: per_pixel(fixed, p), (pixel,), (jnp.array([0.0, 1.0]),)
            )
            return jnp.stack([dx, dy])

    else:
        f = per_pixel

    vf = jax.vmap(f, in_axes=(None, 0))

    def run(pixels: jax.Array):
        if value_and_grad:
            Z = jnp.zeros(pixels.shape[0])
            dZ = jnp.zeros((pixels.shape[0], 2))
            for fixed in fixed_points:
                z, dz = vf(fixed, pixels)
                Z = Z + z
                dZ = dZ + dz
            return Z, dZ
        out = None
        for fixed in fixed_points:
            z = vf(fixed, pixels)
            out = z if out is None else out + z
        return out

    return run


_XLA_RUN_CACHE = None


def _kwargs_fingerprint(kwargs: dict, grad: bool, value_and_grad: bool):
    """Hashable fingerprint of a power_map request, or ``None`` when any
    option defies fingerprinting (then the call simply isn't cached)."""
    parts = [("grad", grad), ("vag", value_and_grad)]
    for name in sorted(kwargs):
        value = kwargs[name]
        if isinstance(value, (bool, int, float, str, type(None))):
            parts.append((name, value))
        elif isinstance(value, (jax.Array, np.ndarray)):
            try:
                parts.append((name, np.asarray(value).tobytes()))
            except Exception:  # traced / non-concrete arrays: don't cache
                return None
        elif callable(value):
            # Named functions hash stably; per-call lambdas just miss.
            parts.append((name, value))
        else:
            return None
    try:
        return hash(tuple(parts))
    except TypeError:
        return None


def _xla_run_cache_get(scene, fingerprint):
    global _XLA_RUN_CACHE
    import weakref

    if _XLA_RUN_CACHE is None:
        _XLA_RUN_CACHE = weakref.WeakKeyDictionary()
    try:
        return _XLA_RUN_CACHE.get(scene, {}).get(fingerprint)
    except TypeError:
        return None


def _xla_run_cache_put(scene, fingerprint, run):
    try:
        _XLA_RUN_CACHE.setdefault(scene, {})[fingerprint] = run
    except TypeError:
        pass


def _all_vertex_allowed(scene, filter_objects) -> bool:
    """Whether every object that can enter a path candidate (i.e. passes
    ``filter_objects``) is a :class:`~differt2d_tpu.geometry.Vertex`."""
    from .geometry import Vertex

    allowed = [
        obj
        for obj in scene.objects
        if filter_objects is None or filter_objects(obj)
    ]
    return bool(allowed) and all(isinstance(o, Vertex) for o in allowed)


def _pallas_eligible(scene, kwargs: dict) -> bool:
    """Whether the fused Pallas kernel covers this power_map request.

    The kernel implements the image solver forward pass with the stock
    power model and hard_sigmoid/sigmoid activations. TX-grid mode is
    path-reversal-symmetric for walls/vertices but not for RIS (the RIS
    residual is direction-dependent, reference ``geometry.py:698-711``),
    so RIS scenes fall back in that mode.
    """
    # The kernel targets the TPU Mosaic dialect; on CPU it runs in
    # interpreter mode. Any other backend (GPU, ...) uses the XLA tracer.
    if jax.default_backend() not in ("tpu", "cpu"):
        return False
    # The kernels are float32-only (TPU VPU-native); under jax_enable_x64
    # the grids arrive as f64 and must stay on the XLA tracer.
    if jax.config.jax_enable_x64:
        return False
    # Fermat auto-dispatches to the in-kernel adam solver now that its
    # bias-correction table is computed by XLA's own `decay**count`
    # lowering (bit-parity with optax; verified allclose on TPU).
    # MPT auto-dispatches under a documented TOLERANCE CONTRACT: its
    # residual objective has multiple basins, and 100-step trajectories
    # near basin boundaries amplify Mosaic-vs-XLA transcendental rounding
    # into occasional O(1) per-pixel differences. The contract (PARITY.md)
    # bounds the disagreement to <= 0.5% of pixels, each a basin-boundary
    # pixel where the two backends converge to different-but-valid
    # solutions (tests/test_pallas.py::test_mpt_flip_rate_contract pins
    # the bound; measured 5/4096 = 0.12% on TPU round 2). Callers needing
    # bit-stable maps across backends pass backend="xla".
    solver = kwargs.get("solver", "image")
    if solver in ("fermat", "mpt") and _all_vertex_allowed(
        scene, kwargs.get("filter_objects")
    ):
        # Vertex-only candidate sets make the solver a no-op: vertices
        # have zero parametric unknowns, the bounce point is pinned, and
        # the interaction residual is identically 0 (reference
        # ``geometry.py:353-431``) -- the request is exactly the image
        # kernel's KIND_VERTEX path, so it is Pallas-eligible on every
        # platform with no key/order restrictions.
        # (pallas_power_map re-derives this from the candidate groups and
        # routes to the image kernels.)
        pass
    elif solver in ("fermat", "mpt"):
        # Real TPU only: the 100-step in-kernel adam loop is pathological
        # under the CPU interpreter (instruction-level interpretation per
        # step per tile), and the XLA tracer is already fast on CPU.
        if jax.default_backend() != "tpu":
            return False
        if kwargs.get("key") is None:
            return False
        # The in-kernel solver covers order <= 1, non-vertex candidates.
        order = kwargs.get("order")
        max_order = kwargs.get("max_order", 1)
        if order is None and max_order > 1:
            return False
        if order is not None and order > 1:
            return False
        arrays_k = scene_arrays(scene)
        if arrays_k is None or bool(
            np.any(np.asarray(arrays_k.kind) == KIND_VERTEX)
        ):
            return False
    elif solver != "image":
        return False
    if kwargs.get("power_fun") is not None:
        return False
    if kwargs.get("many", 1) != 1:
        return False
    # Implicit-function-theorem solver gradients exist only on the XLA
    # path (optimize._minimize_implicit); the in-kernel solver always
    # differentiates through the unrolled trajectory.
    if kwargs.get("solver_grad", "unroll") != "unroll":
        return False
    # The fused dispatch bakes (alpha, tol, patch, r_coef, height) into
    # the trace and hashes them as a cache key, so they must be concrete
    # host scalars here. A JAX tracer (e.g. under jax.grad over alpha) or
    # a non-scalar array must take the XLA path, which treats them as
    # runtime inputs.
    for name in ("alpha", "tol", "patch", "r_coef", "height"):
        value = kwargs.get(name)
        if value is None:
            continue
        try:
            float(value)  # py/np scalars and concrete 0-d arrays only
        except (TypeError, ValueError):
            return False
    function = kwargs.get("function", hard_sigmoid)
    from .logic import sigmoid as _sigmoid

    if function not in (hard_sigmoid, _sigmoid):
        return False
    arrays = scene_arrays(scene)
    if arrays is None:
        return False
    if kwargs.get("on_transmitters", False):
        kinds = np.asarray(arrays.kind)
        if np.any(kinds == KIND_RIS):
            return False
    # (Candidate-set size no longer matters: pallas_power_map picks the
    # unrolled kernel for small sets and the fori_loop kernel for large
    # ones -- both beat the XLA tracer.)
    return True


@typecheck(
    tx=XY_ARRAY,
    rx=XY_ARRAY,
    approx=OPT_BOOL,
    key=OPT_KEY_ARRAY,
    min_order=SCALAR_INT_STRICT,
    max_order=SCALAR_INT_STRICT,
    filter_objects=OPT_CALLABLE,
    solver=literal_spec("image", "fermat", "mpt"),
)
def trace_paths(
    scene,
    tx: jax.Array,
    rx: jax.Array,
    *,
    min_order: int = 0,
    max_order: int = 1,
    order: Optional[int] = None,
    solver: str = "image",
    approx: Optional[bool] = None,
    alpha=DEFAULT_ALPHA,
    function=hard_sigmoid,
    tol=1e-2,
    patch=DEFAULT_PATCH,
    steps: int = 100,
    many: int = 1,
    key: Optional[jax.Array] = None,
    filter_objects=None,
) -> dict[int, dict[str, jax.Array]]:
    """Array-native path tracing for one TX-RX pair.

    Vectorized counterpart of :meth:`Scene.all_paths` (reference
    ``scene.py:1156-1228``): instead of a Python generator of per-path
    objects, returns per-order batched arrays ready for further jitted
    processing (serving, learned samplers, analysis).

    :return: ``{order: {"candidates": int32[C, order],
        "points": f32[C, order+2, 2], "loss": f32[C],
        "valid": truthy[C]}}``.
    """
    from .logic import ENABLE_APPROX

    if approx is None:
        approx = ENABLE_APPROX

    arrays = scene_arrays(scene)
    if arrays is None:
        msg = "trace_paths requires Wall/RIS/Vertex objects only"
        raise ValueError(msg)
    if filter_objects is None:
        filter_nodes = None
    else:
        filter_nodes = tuple(
            i for i, obj in enumerate(scene.objects) if not filter_objects(obj)
        )
    groups = path_candidate_matrices(
        arrays.num_objects,
        min_order=min_order,
        max_order=max_order,
        order=order,
        filter_nodes=filter_nodes,
    )

    group_keys: dict[int, Optional[jax.Array]] = {o: None for o in groups}
    if key is not None:
        total = sum(g.shape[0] for g in groups.values())
        keys = jax.random.split(key, total)
        start = 0
        for o in sorted(groups):
            C = groups[o].shape[0]
            group_keys[o] = keys[start : start + C]
            start += C

    tx = jnp.asarray(tx)
    rx = jnp.asarray(rx)
    out: dict[int, dict[str, jax.Array]] = {}
    for o, cand_np in sorted(groups.items()):
        if cand_np.shape[0] == 0:
            continue
        pts_full, loss, valid = _trace_group(
            tx, rx, arrays, o, cand_np, group_keys[o],
            solver=solver, approx=approx, alpha=alpha, function=function,
            tol=tol, patch=patch, steps=steps, many=many,
        )
        out[o] = {
            "candidates": jnp.asarray(cand_np),
            "points": pts_full,
            "loss": loss,
            "valid": valid,
        }
    return out


@typecheck(
    approx=OPT_BOOL,
    key=OPT_KEY_ARRAY,
    min_order=SCALAR_INT_STRICT,
    max_order=SCALAR_INT_STRICT,
    filter_objects=OPT_CALLABLE,
    solver=literal_spec("image", "fermat", "mpt"),
    backend=literal_spec("auto", "xla", "pallas"),
)
def power_map(
    scene,
    X: jax.Array,
    Y: jax.Array,
    *,
    grad: bool = False,
    value_and_grad: bool = False,
    jit: bool = True,
    backend: str = "auto",
    **kwargs: Any,
) -> jax.Array:
    """Fast received-power grid map, summed over the scene's fixed nodes.

    Array-core equivalent of
    ``Scene.accumulate_on_receivers_grid_over_paths(..., fun=received_power,
    reduce_all=True)`` (or the TX-grid twin with ``on_transmitters=True``),
    with identical numerics. ``solver`` is one of ``"image"``, ``"fermat"``,
    ``"mpt"``; see :func:`make_pixels_fn` for all options.

    ``backend``: ``"auto"`` uses the fused Pallas TPU kernel
    (:mod:`differt2d_tpu.ops.pallas_kernels`, ~3x the XLA path) whenever
    the request is an image-solver map (values or pixel gradients), the
    XLA tracer otherwise; ``"xla"`` / ``"pallas"`` force a backend.

    >>> import jax.numpy as jnp
    >>> from differt2d_tpu.scene import Scene
    >>> from differt2d_tpu.tracer import power_map
    >>> scene = Scene.basic_scene()
    >>> X, Y = jnp.meshgrid(jnp.linspace(0.1, 0.9, 4), jnp.linspace(0.1, 0.9, 3))
    >>> power_map(scene, X, Y, max_order=1, approx=True, backend="xla").shape
    (3, 4)
    >>> Z, dZ = power_map(scene, X, Y, max_order=1, approx=True,
    ...                   value_and_grad=True, backend="xla")
    >>> Z.shape, dZ.shape
    ((3, 4), (3, 4, 2))

    :return: ``[m, n]`` map (or ``[m, n, 2]`` grad / (value, grad) tuple).
    """
    # Boundary validation (the reference wraps every public function in
    # jaxtyped/beartype, reference ``logic.py:219-220``; this framework
    # validates at the API boundary instead of per-helper):
    X = jnp.asarray(X)
    Y = jnp.asarray(Y)
    if X.shape != Y.shape:
        msg = f"X and Y must have the same shape, got {X.shape} vs {Y.shape}"
        raise TypeCheckError(msg)
    if X.ndim != 2:
        msg = f"X and Y must be 2-D grids, got ndim={X.ndim}"
        raise TypeCheckError(msg)

    # Resolve the approx tri-state NOW (not at trace time inside
    # make_pixels_fn): the run cache below keys on kwargs, so an
    # unresolved None would let a map traced under one global logic mode
    # be replayed after set_approx() flipped it (reference semantics:
    # ENABLE_APPROX is read when tracing, ``logic.py:95-196``).
    if kwargs.get("approx") is None:
        from .logic import ENABLE_APPROX

        kwargs["approx"] = bool(ENABLE_APPROX)

    traced_scene = any(
        isinstance(leaf, jax.core.Tracer)
        for leaf in jax.tree_util.tree_leaves(scene)
    )
    if traced_scene and backend == "pallas":
        msg = (
            "backend='pallas' requires a concrete scene (the kernel bakes"
            " host-side wall data); differentiate or jit over scene"
            " parameters with backend='xla' or 'auto'"
        )
        raise ValueError(msg)
    # Gradient maps run in-kernel for the image solver only -- which
    # includes vertex-only Fermat/MPT requests, since those reduce to the
    # image kernels' KIND_VERTEX path (zero unknowns; see
    # ``_all_vertex_allowed``).
    def _grad_on_solver() -> bool:
        return (
            (grad or value_and_grad)
            and kwargs.get("solver", "image") != "image"
            and not _all_vertex_allowed(scene, kwargs.get("filter_objects"))
        )

    want_pallas = backend == "pallas" or (
        backend == "auto"
        and not traced_scene
        and _pallas_eligible(scene, kwargs)
        and not _grad_on_solver()
    )
    if want_pallas:
        from .logic import sigmoid as _sigmoid
        from .ops.pallas_kernels import pallas_power_map

        if _grad_on_solver():
            msg = (
                "backend='pallas' gradient maps support the image solver"
                " only; use backend='xla' or 'auto' for Fermat/MPT"
            )
            raise ValueError(msg)
        if backend == "pallas":
            # A forced backend must not silently change the requested
            # computation -- validate instead of dropping options.
            arrays_chk = scene_arrays(scene)
            has_ris = False
            if arrays_chk is not None:
                try:
                    has_ris = bool(
                        np.any(np.asarray(arrays_chk.kind) == KIND_RIS)
                    )
                except Exception:
                    has_ris = True
            unsupported = {
                "solver": kwargs.get("solver", "image")
                not in ("image", "fermat", "mpt"),
                "power_fun": kwargs.get("power_fun") is not None,
                "many": kwargs.get("many", 1) != 1,
                "solver_grad": kwargs.get("solver_grad", "unroll")
                != "unroll",
                "function": kwargs.get("function", hard_sigmoid)
                not in (hard_sigmoid, _sigmoid),
                # TX-grid mode relies on path-reversal symmetry, which the
                # direction-dependent RIS residual breaks.
                "on_transmitters (RIS scene)": kwargs.get(
                    "on_transmitters", False
                )
                and has_ris,
            }
            bad = sorted(name for name, is_bad in unsupported.items() if is_bad)
            if bad:
                msg = (
                    f"backend='pallas' does not support these options: {bad};"
                    " use backend='xla'"
                )
                raise ValueError(msg)
        function = kwargs.pop("function", hard_sigmoid)
        solver = kwargs.pop("solver", "image")
        key = kwargs.pop("key", None)  # the image solver ignores the key
        steps = kwargs.pop("steps", 100)
        # The kernels differentiate through the unrolled solve only;
        # solver_grad="implicit" requests are kept on XLA by
        # _pallas_eligible, so only the default survives to here.
        kwargs.pop("solver_grad", None)
        if solver in ("fermat", "mpt"):
            kwargs["solver"] = solver
            kwargs["key"] = key
            kwargs["steps"] = steps
        kwargs.pop("many", None)
        kwargs.pop("power_fun", None)
        on_transmitters = kwargs.pop("on_transmitters", False)
        target = scene
        if on_transmitters:
            # Path-reversal symmetry (walls only): trace from the fixed
            # receivers with the pixel at the TX end.
            from ._module import tree_at

            target = tree_at(
                scene,
                transmitters=scene.receivers,
                receivers=scene.transmitters,
            )
        return pallas_power_map(
            target,
            X,
            Y,
            sigmoid=function is _sigmoid,
            interpret=jax.default_backend() == "cpu",
            grad=grad,
            value_and_grad=value_and_grad,
            **kwargs,
        )

    kwargs.pop("backend", None)
    run = None
    fingerprint = None
    if jit and not traced_scene:
        fingerprint = _kwargs_fingerprint(kwargs, grad, value_and_grad)
        if fingerprint is not None:
            run = _xla_run_cache_get(scene, fingerprint)
    if run is None:
        run = make_pixels_fn(
            scene, grad=grad, value_and_grad=value_and_grad, **kwargs
        )
        if jit:
            run = jax.jit(run)
            if fingerprint is not None:
                _xla_run_cache_put(scene, fingerprint, run)
    pixels = jnp.stack([X.ravel(), Y.ravel()], axis=-1)  # [P, 2]
    result = run(pixels)

    if value_and_grad:
        Z, dZ = result
        return Z.reshape(X.shape), dZ.reshape(*X.shape, 2)
    if grad:
        return result.reshape(*X.shape, 2)
    return result.reshape(X.shape)
