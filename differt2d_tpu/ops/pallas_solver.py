"""Fused Pallas kernel for order-1 optimizer-based solvers (Fermat / MPT).

The solver configs (RIS phase maps, reference
``examples/plot_ris_power_map.py``: MPT with up to 1000 adam steps per
pixel) are dominated by the per-pixel inner optimization. This kernel
runs the whole solve-validate-accumulate pipeline on one 8x128 pixel
tile: a ``fori_loop`` of adam steps whose objective derivative is taken
elementwise with in-kernel forward-mode (``jax.jvp``), followed by the
same validity and power math as the image kernel.

Numerical parity with :func:`differt2d_tpu.tracer._solve_opt` /
``optimize.minimize`` (reference ``optimize.py:46-97``):

* identical adam arithmetic (optax defaults: b1=0.9, b2=0.999, eps=1e-8,
  lr=0.1; bias correction; ``x = x + (-lr * m_hat / (sqrt(v_hat)+eps))``);
* identical loss convention: the reported loss is the objective at the
  *second-to-last* iterate (``losses[-1]`` of the reference scan);
* identical PRNG: the per-candidate uniform init is drawn outside the
  kernel with the same key split and fed in as a scalar.

Order-1 only (single bounce -> scalar parameter per pixel); wall and RIS
bounces (all-vertex candidates take the closed form upstream).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import (
    KIND_RIS,
    KIND_VERTEX,
    LANES,
    SUBLANES,
    TILE,
    _norm2,
    _normalize,
    _seg_intersect,
    _soft,
)

ADAM_B1 = 0.9
ADAM_B2 = 0.999
ADAM_EPS = 1e-8
ADAM_EPS_ROOT = 0.0
ADAM_LR = 0.1


def build_opt_order1_kernel(
    walls_np: np.ndarray,
    kinds_np: np.ndarray,
    cands: np.ndarray,
    *,
    objective: str,
    approx: bool,
    sigmoid: bool = False,
    steps: int = 100,
    interpret: bool = False,
):
    """Build ``f(pixels[P,2], tx[2], phi[W], x0[C], scalars[5]) -> [P]``
    accumulating all order-1 candidates in ``cands[C, 1]``.

    ``objective`` is ``"fermat"`` (path length) or ``"mpt"`` (interaction
    residual); ``x0`` is the per-candidate uniform init (PRNG parity with
    the reference's per-candidate key).
    """
    W = int(walls_np.shape[0])
    walls_c = [
        tuple(float(v) for v in walls_np[i].reshape(4)) for i in range(W)
    ]
    kinds_c = [int(k) for k in kinds_np]
    cand_list = [int(v) for v in cands[:, 0]]
    for i in cand_list:
        if kinds_c[i] == KIND_VERTEX:
            msg = "all-vertex candidates take the closed form upstream"
            raise ValueError(msg)
    soft_mode = ("sigmoid" if sigmoid else "hard") if approx else False

    def kernel(scal_ref, phi_ref, x0_ref, bc_ref, px_ref, py_ref, out_ref):
        txx = scal_ref[0]
        txy = scal_ref[1]
        alpha = scal_ref[2]
        tol = scal_ref[3]
        patch = scal_ref[4]
        r_coef = scal_ref[5]
        height = scal_ref[6]
        eps = float(np.finfo(np.float32).eps)

        px = px_ref[:]
        py = py_ref[:]

        import math as _math

        acc = jnp.zeros_like(px)
        for c, i in enumerate(cand_list):
            axw, ayw, bxw, byw = walls_c[i]
            dxw, dyw = bxw - axw, byw - ayw
            # Wall normal (compile-time constants).
            nlen = _math.sqrt(dyw * dyw + dxw * dxw)
            nx, ny = (dyw / nlen, -dxw / nlen) if nlen else (0.0, 0.0)
            is_ris = kinds_c[i] == KIND_RIS

            def bounce_point(theta):
                return axw + theta * dxw, ayw + theta * dyw

            def objective_fn(theta):
                bx_, by_ = bounce_point(theta)
                if objective == "fermat":
                    # path_length with the eps-on-vectors guard
                    # (reference geometry.py:199-203).
                    r1 = _norm2(bx_ - txx + eps, by_ - txy + eps)
                    r2 = _norm2(px - bx_ + eps, py - by_ + eps)
                    return r1 + r2
                # MPT: interaction residual (reference geometry.py:643-650
                # / 698-711).
                rx_, ry_ = _normalize(px - bx_, py - by_)
                if is_ris:
                    sin_a = (-rx_) * ny - (-ry_) * nx
                    cos_a = (-rx_) * nx + (-ry_) * ny
                    sin_p = jnp.sin(phi_ref[i])
                    cos_p = jnp.cos(phi_ref[i])
                    return (sin_a - sin_p) ** 2 + (cos_a - cos_p) ** 2
                ivx, ivy = _normalize(bx_ - txx, by_ - txy)
                d = ivx * nx + ivy * ny
                refx, refy = ivx - 2.0 * d * nx, ivy - 2.0 * d * ny
                ex, ey = rx_ - refx, ry_ - refy
                return ex * ex + ey * ey

            def value_and_deriv(theta):
                return jax.jvp(
                    objective_fn, (theta,), (jnp.ones_like(theta),)
                )

            # Adam, arithmetic-exact vs optax.adam(0.1) inside lax.scan
            # (reference optimize.py:83-97).
            theta0 = jnp.full_like(px, x0_ref[c])

            def body(t, carry):
                theta, m, v, _ = carry
                loss, g = value_and_deriv(theta)
                m = ADAM_B1 * m + (1.0 - ADAM_B1) * g
                v = ADAM_B2 * v + (1.0 - ADAM_B2) * (g * g)
                # Bias corrections b**(t+1) come from an SMEM table
                # precomputed by XLA's own `decay**count` lowering (see
                # run()), so they are bit-identical to optax.adam's
                # (Mosaic has no scalar powf, and exp(t log b) drifted
                # from XLA over 100-step trajectories).
                b1_t = bc_ref[t]
                b2_t = bc_ref[steps + t]
                m_hat = m / (1.0 - b1_t)
                v_hat = v / (1.0 - b2_t)
                theta = theta + (-ADAM_LR) * m_hat / (
                    jnp.sqrt(v_hat + ADAM_EPS_ROOT) + ADAM_EPS
                )
                return theta, m, v, loss

            theta, _, _, last_loss = jax.lax.fori_loop(
                0,
                steps,
                body,
                (theta0, jnp.zeros_like(px), jnp.zeros_like(px), jnp.zeros_like(px)),
            )

            bx_, by_ = bounce_point(theta)

            # Loss convention parity: MPT reports the scan's losses[-1]
            # (objective at the second-to-last iterate == last_loss);
            # Fermat reports the interaction residual at the solution.
            if objective == "mpt":
                loss = last_loss
            else:
                rx_, ry_ = _normalize(px - bx_, py - by_)
                if is_ris:
                    sin_a = (-rx_) * ny - (-ry_) * nx
                    cos_a = (-rx_) * nx + (-ry_) * ny
                    sin_p = jnp.sin(phi_ref[i])
                    cos_p = jnp.cos(phi_ref[i])
                    loss = (sin_a - sin_p) ** 2 + (cos_a - cos_p) ** 2
                else:
                    ivx, ivy = _normalize(bx_ - txx, by_ - txy)
                    d = ivx * nx + ivy * ny
                    refx, refy = ivx - 2.0 * d * nx, ivy - 2.0 * d * ny
                    ex, ey = rx_ - refx, ry_ - refy
                    loss = ex * ex + ey * ey

            # on_objects: the bounce parameter is theta itself.
            if soft_mode:
                on = jnp.minimum(
                    _soft(theta, alpha, sigmoid),
                    _soft(1.0 - theta, alpha, sigmoid),
                )
            else:
                on = (theta >= 0.0) & (theta <= 1.0)

            # blocked: both path segments vs every wall but this one.
            if soft_mode:
                blk = jnp.zeros_like(px)
            else:
                blk = jnp.zeros_like(px, dtype=jnp.bool_)
            tx_tile = jnp.full_like(px, txx)
            ty_tile = jnp.full_like(py, txy)
            for s, (sax, say, sbx, sby) in enumerate(
                [(tx_tile, ty_tile, bx_, by_), (bx_, by_, px, py)]
            ):
                for w in range(W):
                    if w == i or kinds_c[w] == KIND_VERTEX:
                        continue
                    wax, way, wbx, wby = walls_c[w]
                    wtx, wty = wbx - wax, wby - way
                    hit = _seg_intersect(
                        wax - patch * wtx,
                        way - patch * wty,
                        wbx + patch * wtx,
                        wby + patch * wty,
                        sax, say, sbx, sby,
                        soft_mode,
                        alpha,
                    )
                    blk = jnp.maximum(blk, hit) if soft_mode else (blk | hit)

            if soft_mode:
                loss_ok = _soft(tol - loss, alpha, sigmoid)
                valid = jnp.minimum(jnp.minimum(on, 1.0 - blk), loss_ok)
                valid = jnp.nan_to_num(valid)
            else:
                valid = on & (~blk) & (loss < tol)

            r = _norm2(bx_ - txx + eps, by_ - txy + eps) + _norm2(
                px - bx_ + eps, py - by_ + eps
            )
            power = r_coef / (height * height + r * r)
            acc = acc + valid * power

        out_ref[:] = acc

    def run(
        pixels: jax.Array,
        tx: jax.Array,
        phi: jax.Array,
        x0: jax.Array,
        scalars: jax.Array,
    ):
        P = pixels.shape[0]
        padded = -((-P) // TILE) * TILE
        px = pixels[:, 0]
        py = pixels[:, 1]
        if padded != P:
            px = jnp.concatenate([px, jnp.zeros(padded - P)], axis=0)
            py = jnp.concatenate([py, jnp.zeros(padded - P)], axis=0)
        rows = padded // LANES
        px = px.reshape(rows, LANES)
        py = py.reshape(rows, LANES)

        packed = jnp.concatenate([tx, scalars]).astype(jnp.float32)
        # Adam bias-correction table, computed with the exact same XLA
        # `decay**count` lowering optax.scale_by_adam uses (count is the
        # 1-based step index), then read per step from SMEM.
        counts = jnp.arange(1, steps + 1, dtype=jnp.float32)
        bc = jnp.concatenate(
            [
                jnp.float32(ADAM_B1) ** counts,
                jnp.float32(ADAM_B2) ** counts,
            ]
        )
        tile_spec = pl.BlockSpec(
            (SUBLANES, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        out = pl.pallas_call(
            kernel,
            grid=(rows // SUBLANES,),
            in_specs=[smem, smem, smem, smem, tile_spec, tile_spec],
            out_specs=tile_spec,
            out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
            interpret=interpret,
        )(packed, phi.astype(jnp.float32), x0.astype(jnp.float32), bc, px, py)
        return out.reshape(padded)[:P]

    return run
