"""Wall-primitive sharding: the tensor-parallel analog for huge scenes.

:func:`power_map_sharded` splits the pixel axis (data parallel). For
scenes with many walls the per-pixel cost itself is O(candidates x walls)
-- dominated by the blocked-visibility test -- so this module also splits
the *wall* axis over a second mesh dimension (SURVEY.md §7 step 7's
"wall-sharded variant + psum visibility combine"):

1. each device solves bounce points for its **candidate shard** (order-1
   candidates align 1:1 with walls, so candidates shard with walls);
2. bounce points are all-gathered over the wall axis (tiny: C x 2);
3. each device tests every candidate's path segments against its **local
   wall shard** only -- the O(C x W x pixels) work, split W-ways;
4. a ``pmax`` over the wall axis (soft OR is a max) completes the
   blocked test, and each device accumulates ``valid x power`` for its
   candidate shard, ``psum``-combined into the map.

Pixels shard over the first mesh axis as usual, so an ``(n_grid,
n_wall)`` mesh scales both the pixel count and the scene size. All
collectives ride ICI inside ``jax.shard_map``.

Scope: order <= 1 (LOS + single reflections) on wall-only scenes,
forward maps only. **This is a special case kept for scenes whose wall
table itself is too hot to replicate**; the recommended scene-scale
path is :func:`differt2d_tpu.parallel.power_map_cand_sharded`, which
supports any order, mixed object kinds and gradients with strictly less
communication (one ``psum``; no bounce-point all-gather) -- see
``docs/architecture.md``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .. import tracer as _tracer
from ..defaults import DEFAULT_ALPHA, DEFAULT_HEIGHT, DEFAULT_PATCH, DEFAULT_R_COEF
from ..logic import hard_sigmoid
from ..ops import geometry_ops as _ops


def wall_grid_mesh(
    n_wall: int,
    devices: Optional[list] = None,
    axis_names: tuple[str, str] = ("grid", "wall"),
) -> Mesh:
    """2D mesh: first axis shards pixels, second shards walls."""
    if devices is None:
        devices = jax.devices()
    n_grid = len(devices) // n_wall
    if n_grid * n_wall != len(devices):
        msg = f"{len(devices)} devices do not factor as n_grid x {n_wall}"
        raise ValueError(msg)
    return Mesh(
        np.asarray(devices).reshape(n_grid, n_wall), axis_names
    )


def power_map_wall_sharded(
    scene,
    X: jax.Array,
    Y: jax.Array,
    *,
    mesh: Mesh,
    max_order: int = 1,
    approx: Optional[bool] = None,
    alpha=DEFAULT_ALPHA,
    function=hard_sigmoid,
    tol=1e-2,
    patch=DEFAULT_PATCH,
    r_coef=DEFAULT_R_COEF,
    height=DEFAULT_HEIGHT,
) -> jax.Array:
    """Received-power map with pixels AND walls sharded over ``mesh``.

    Equivalent to ``tracer.power_map(..., max_order=max_order)`` on
    wall-only scenes (allclose; verified in tests), with the
    O(candidates x walls x pixels) visibility work split over the
    ``wall`` mesh axis.
    """
    from ..logic import ENABLE_APPROX

    if approx is None:
        approx = ENABLE_APPROX
    if max_order > 1:
        msg = "wall-sharded maps support max_order <= 1"
        raise ValueError(msg)

    arrays = _tracer.scene_arrays(scene)
    if arrays is None or bool(
        np.any(np.asarray(arrays.kind) != _tracer.KIND_WALL)
    ):
        msg = "wall-sharded maps require wall-only scenes"
        raise ValueError(msg)

    grid_axis, wall_axis = mesh.axis_names
    n_wall_shards = mesh.shape[wall_axis]
    W = arrays.num_objects
    # Pad the wall axis to a shard multiple with degenerate (zero-length)
    # walls: they never block (colinear guard) and their candidate rows
    # are masked out of the accumulation.
    W_pad = -((-W) // n_wall_shards) * n_wall_shards
    walls = arrays.walls
    if W_pad != W:
        walls = jnp.concatenate(
            [walls, jnp.zeros((W_pad - W, 2, 2))], axis=0
        )
    wall_valid = (jnp.arange(W_pad) < W).astype(jnp.float32)

    txs = jnp.stack([tx.xy for tx in scene.transmitters.values()])

    pixels = jnp.stack([X.ravel(), Y.ravel()], axis=-1)
    n_pixels = pixels.shape[0]
    n_grid_shards = mesh.shape[grid_axis]
    P_pad = -((-n_pixels) // n_grid_shards) * n_grid_shards
    if P_pad != n_pixels:
        pad = jnp.broadcast_to(pixels[-1], (P_pad - n_pixels, 2))
        pixels = jnp.concatenate([pixels, pad], axis=0)

    soft = bool(approx)

    def segments_hit(seg_a, seg_b, local_walls):
        """Soft/hard hit of segments [C, P_loc, 2] vs local walls [w, 2, 2]."""
        w_a = local_walls[:, 0, :]
        w_dir = local_walls[:, 1, :] - local_walls[:, 0, :]
        wa = (w_a - patch * w_dir)[:, None, None, :]
        wb = (local_walls[:, 1, :] + patch * w_dir)[:, None, None, :]
        hit = _ops.segments_intersect(
            wa, wb, seg_a[None], seg_b[None],
            approx=soft, alpha=alpha, function=function,
        )  # [w, C, P_loc]
        return hit

    def local_fn(pix_loc, walls_loc, wall_valid_loc):
        """One device: pixel shard x wall shard."""
        wall_index_base = jax.lax.axis_index(wall_axis) * (
            W_pad // n_wall_shards
        )
        acc = jnp.zeros(pix_loc.shape[0])
        for t in range(txs.shape[0]):
            tx = txs[t]
            # ---- order-1 candidate shard: one candidate per local wall.
            if max_order >= 1:
                # Solve bounce points for local candidates: [w_loc, P_loc, 2]
                images = _ops.mirror_point(tx, walls_loc)  # [w_loc, 2]
                normal = _ops.wall_normal(walls_loc)  # [w_loc, 2]
                u = pix_loc[None, :, :] - images[:, None, :]
                un = jnp.sum(u * normal[:, None, :], axis=-1)
                vn = jnp.sum(
                    (walls_loc[:, None, 0, :] - pix_loc[None, :, :])
                    * normal[:, None, :],
                    axis=-1,
                )
                un_zero = un == 0.0
                s = jnp.where(un_zero, 0.0, vn / jnp.where(un_zero, 1.0, un))
                bounce = pix_loc[None] + s[..., None] * u  # [w_loc, P_loc, 2]

                # All-gather candidate data over the wall axis so every
                # device can test every candidate against its local walls.
                bounce_all = jax.lax.all_gather(
                    bounce, wall_axis, axis=0, tiled=True
                )  # [C=W_pad, P_loc, 2]
                cand_walls_all = jax.lax.all_gather(
                    walls_loc, wall_axis, axis=0, tiled=True
                )  # [C, 2, 2]
                cand_valid_all = jax.lax.all_gather(
                    wall_valid_loc, wall_axis, axis=0, tiled=True
                )  # [C]

                C = bounce_all.shape[0]
                tx_tile = jnp.broadcast_to(tx, bounce_all.shape)
                pix_tile = jnp.broadcast_to(pix_loc[None], bounce_all.shape)

                # Blocked: local walls vs both segments of every candidate,
                # with the candidate's own wall masked out.
                hits1 = segments_hit(tx_tile, bounce_all, walls_loc)
                hits2 = segments_hit(bounce_all, pix_tile, walls_loc)
                local_ids = wall_index_base + jnp.arange(
                    walls_loc.shape[0]
                )
                cand_ids = jnp.arange(C)
                own = (
                    local_ids[:, None] == cand_ids[None, :]
                )  # [w_loc, C]
                hits = jnp.maximum(hits1, hits2) if soft else (hits1 | hits2)
                if soft:
                    hits = jnp.where(own[..., None], 0.0, hits)
                    blocked_part = jnp.max(hits, axis=0)  # [C, P_loc]
                    blocked = jax.lax.pmax(blocked_part, wall_axis)
                else:
                    hits = jnp.where(own[..., None], False, hits)
                    blocked_part = jnp.any(hits, axis=0)
                    blocked = jax.lax.pmax(
                        blocked_part.astype(jnp.float32), wall_axis
                    ) > 0.5

                # on_objects + residual for the candidate's own wall.
                t_par = _ops.cartesian_to_parametric(
                    cand_walls_all[:, None, :, :], bounce_all
                )
                if soft:
                    on = jnp.minimum(
                        function(t_par, alpha), function(1.0 - t_par, alpha)
                    )
                else:
                    on = (t_par >= 0.0) & (t_par <= 1.0)
                loss = _ops.specular_residual(
                    tx_tile, bounce_all, pix_tile,
                    cand_walls_all[:, None, :, :],
                )
                if soft:
                    loss_ok = function(tol - loss, alpha)
                    valid = jnp.minimum(
                        jnp.minimum(on, 1.0 - blocked), loss_ok
                    )
                    valid = jnp.nan_to_num(valid)
                else:
                    valid = on & (~blocked) & (loss < tol)

                eps = jnp.finfo(jnp.float32).eps
                r = _ops.path_length(
                    jnp.stack([tx_tile, bounce_all, pix_tile], axis=-2)
                )
                power = r_coef / (height * height + r * r)
                # After the all-gathers and the pmax, every wall shard
                # holds the identical full candidate sum, which matches
                # the replicated (wall-axis-unsharded) output spec.
                contrib = valid * power * cand_valid_all[:, None]
                acc = acc + jnp.sum(contrib, axis=0)

            # ---- order 0 (LOS): blocked over local walls, pmax-combined.
            tx_row = jnp.broadcast_to(tx, pix_loc.shape)[None]
            hits = segments_hit(tx_row, pix_loc[None], walls_loc)  # [w,1,P]
            if soft:
                blocked_part = jnp.max(hits[:, 0, :], axis=0)
                blocked0 = jax.lax.pmax(blocked_part, wall_axis)
                loss_ok0 = function(jnp.asarray(tol), alpha)
                valid0 = jnp.nan_to_num(
                    jnp.minimum(1.0 - blocked0, loss_ok0)
                )
            else:
                blocked_part = jnp.any(hits[:, 0, :], axis=0)
                blocked0 = (
                    jax.lax.pmax(
                        blocked_part.astype(jnp.float32), wall_axis
                    )
                    > 0.5
                )
                valid0 = ~blocked0
            eps = jnp.finfo(jnp.float32).eps
            d = pix_loc - tx
            r0 = jnp.sqrt((d[:, 0] + eps) ** 2 + (d[:, 1] + eps) ** 2)
            acc = acc + valid0 * (1.0 / (height * height + r0 * r0))

        return acc

    sharded = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(grid_axis), P(wall_axis), P(wall_axis)),
        out_specs=P(grid_axis),
        check_vma=False,
    )
    out = jax.jit(sharded)(pixels, walls, wall_valid)
    return out[:n_pixels].reshape(X.shape)