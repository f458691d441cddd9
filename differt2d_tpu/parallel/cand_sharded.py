"""Candidate-axis sharding: scale path *count*, not just pixel count.

:func:`power_map_sharded` splits pixels (data parallel) and
:func:`power_map_wall_sharded` splits the wall axis of the order-1
visibility test.  This module shards the **candidate axis** — the set of
path candidates itself — which is the quantity that actually explodes
with scene size and reflection order (``C = W·(W−1)^(o−1)`` per order
``o``, reference ``differt2d/scene.py:120-174``).

Design (TPU-first, one collective):

1. every device holds the full (tiny) wall table ``[W, 2, 2]`` —
   replicating it costs nothing, unlike the per-pixel bounce tensors;
2. the candidate matrices of every order are padded to a shard multiple
   and split over the ``cand`` mesh axis, a boolean mask marking real
   rows (order 0's single LOS row lands on shard 0 the same way);
3. each device runs the batched tracer (:func:`tracer._trace_group` —
   the exact numerics of the replicated path) on its candidate shard
   only and accumulates ``mask · valid · power`` per pixel;
4. one ``psum`` over the ``cand`` axis completes the map.  Pixels shard
   over the first mesh axis as usual, so an ``(grid, cand)`` mesh scales
   both the grid and the scene.

Compared to the order-1-only wall sharding this needs **no all-gather of
bounce points** (comm volume drops from ``O(C·P_loc)`` to ``O(P_loc)``)
and supports any order, mixed Wall/RIS/Vertex scenes, and gradients:
pixel gradients run as the same two in-loop JVP tangents the tracer
uses, and scene-parameter gradients flow through the ``psum`` (its
transpose) when the call is placed under ``jax.grad``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .. import tracer as _tracer
from ..defaults import (
    DEFAULT_ALPHA,
    DEFAULT_HEIGHT,
    DEFAULT_PATCH,
    DEFAULT_R_COEF,
)
from ..logic import hard_sigmoid
from ..rt import path_candidate_matrices


def cand_mesh(n_cand: int, devices: Optional[list] = None) -> Mesh:
    """2D mesh: first axis shards pixels, second shards candidates.

    Same factoring as :func:`~differt2d_tpu.parallel.wall_grid_mesh`
    (which it delegates to), with axis names ``("grid", "cand")``.

    >>> import jax
    >>> m = cand_mesh(n_cand=len(jax.devices()))
    >>> m.axis_names
    ('grid', 'cand')
    """
    from .wall_sharded import wall_grid_mesh

    return wall_grid_mesh(
        n_cand, devices=devices, axis_names=("grid", "cand")
    )


def power_map_cand_sharded(
    scene,
    X: jax.Array,
    Y: jax.Array,
    *,
    mesh: Mesh,
    min_order: int = 0,
    max_order: int = 1,
    order: Optional[int] = None,
    approx: Optional[bool] = None,
    alpha=DEFAULT_ALPHA,
    function=hard_sigmoid,
    tol=1e-2,
    patch=DEFAULT_PATCH,
    r_coef=DEFAULT_R_COEF,
    height=DEFAULT_HEIGHT,
    grad: bool = False,
    value_and_grad: bool = False,
) -> Any:
    """Image-solver power map with pixels and candidates sharded.

    Equivalent (allclose; tested on the 8-virtual-device mesh) to
    ``tracer.power_map(..., backend="xla")`` for any order and object
    mix, with the per-order candidate set split over the second mesh
    axis. ``grad``/``value_and_grad`` return the pixel-gradient forms.

    The first mesh axis shards pixels, the second candidates — e.g.
    ``Mesh(np.array(jax.devices()).reshape(2, 4), ("grid", "cand"))``.
    """
    from ..logic import ENABLE_APPROX

    if approx is None:
        approx = bool(ENABLE_APPROX)

    arrays = _tracer.scene_arrays(scene)
    if arrays is None:
        msg = "candidate-sharded maps require Wall/RIS/Vertex objects only"
        raise ValueError(msg)

    grid_axis, cand_axis = mesh.axis_names
    n_cand = mesh.shape[cand_axis]
    n_grid = mesh.shape[grid_axis]

    groups = path_candidate_matrices(
        arrays.num_objects, min_order=min_order, max_order=max_order,
        order=order,
    )

    # Pad every order's candidate matrix to a shard multiple; mask marks
    # real rows. Order 0's single LOS row pads to one row per shard with
    # only shard 0's row unmasked — no special-casing inside the SPMD fn.
    cand_arrays: list[jax.Array] = []
    mask_arrays: list[jax.Array] = []
    group_orders = sorted(groups)
    for o in group_orders:
        cand_np = np.asarray(groups[o], dtype=np.int32)
        C = cand_np.shape[0]
        cand_np = cand_np.reshape(C, o)
        C_pad = max(-((-C) // n_cand) * n_cand, n_cand)
        padded = np.zeros((C_pad, o), dtype=np.int32)
        padded[:C] = cand_np
        mask = np.zeros((C_pad,), dtype=np.float32)
        mask[:C] = 1.0
        cand_arrays.append(jnp.asarray(padded))
        mask_arrays.append(jnp.asarray(mask))

    txs = jnp.stack([tx.xy for tx in scene.transmitters.values()])

    pixels = jnp.stack([X.ravel(), Y.ravel()], axis=-1)
    n_pixels = pixels.shape[0]
    P_pad = -((-n_pixels) // n_grid) * n_grid
    if P_pad != n_pixels:
        pad = jnp.broadcast_to(pixels[-1], (P_pad - n_pixels, 2))
        pixels = jnp.concatenate([pixels, pad], axis=0)

    walls, kind, phi = arrays.walls, arrays.kind, arrays.phi

    def local_fn(pix_loc, walls_r, phi_r, *cands_and_masks):
        k = len(group_orders)
        cands_loc = cands_and_masks[:k]
        masks_loc = cands_and_masks[k:]
        arrays_loc = _tracer.SceneArrays(walls=walls_r, kind=kind, phi=phi_r)

        def per_pixel(pixel):
            acc = jnp.array(0.0)
            for t in range(txs.shape[0]):
                tx = txs[t]
                for g, o in enumerate(group_orders):
                    pts_full, _, valid = _tracer._trace_group(
                        tx, pixel, arrays_loc, o, cands_loc[g], None,
                        solver="image", approx=approx, alpha=alpha,
                        function=function, tol=tol, patch=patch,
                        steps=0, many=1,
                    )
                    power = _tracer._received_power_batched(
                        pts_full, o, r_coef, height
                    )
                    acc = acc + jnp.sum(masks_loc[g] * valid * power)
            return acc

        if value_and_grad or grad:
            def f(pixel):
                val, dx = jax.jvp(
                    per_pixel, (pixel,), (jnp.array([1.0, 0.0]),)
                )
                _, dy = jax.jvp(
                    per_pixel, (pixel,), (jnp.array([0.0, 1.0]),)
                )
                return val, jnp.stack([dx, dy])

            val, dval = jax.vmap(f)(pix_loc)
            val = jax.lax.psum(val, cand_axis)
            dval = jax.lax.psum(dval, cand_axis)
            return val, dval
        out = jax.vmap(per_pixel)(pix_loc)
        return jax.lax.psum(out, cand_axis)

    sharded = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(grid_axis), P(), P(),
            *([P(cand_axis)] * len(group_orders) * 2),
        ),
        out_specs=(
            (P(grid_axis), P(grid_axis))
            if (grad or value_and_grad)
            else P(grid_axis)
        ),
        check_vma=False,
    )
    out = jax.jit(sharded)(
        pixels, walls, phi, *cand_arrays, *mask_arrays
    )
    if grad or value_and_grad:
        val, dval = out
        val = val[:n_pixels].reshape(X.shape)
        dval = dval[:n_pixels].reshape(*X.shape, 2)
        if value_and_grad:
            return val, dval
        return dval
    return out[:n_pixels].reshape(X.shape)
