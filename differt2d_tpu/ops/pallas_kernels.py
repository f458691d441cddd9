"""Fused Pallas TPU kernel for the power-map hot path.

The XLA tracer (:mod:`differt2d_tpu.tracer`) evaluates the power map as a
fused elementwise program; this kernel pushes further by specializing the
whole trace-validate-accumulate pipeline at kernel-build time:

* candidate wall indices and kinds are **compile-time constants** (they
  are host-side data, enumerated before tracing) -- no gathers, no
  kind-selects in the instruction stream;
* per-candidate TX mirror images depend only on TX and wall scalars, so
  they are computed once in scalar registers (SMEM reads), not per pixel;
* one VMEM tile of pixels (8 x 128 f32) stays resident while every
  candidate's solve / validity / power is accumulated onto it -- a single
  pass over HBM for the whole map.

Supports the image-method solver (the benchmark path), soft and hard
logic, hard_sigmoid and sigmoid activations, wall/RIS/vertex kinds.
Numerics match :func:`differt2d_tpu.tracer._accumulate_pixel` (same
formulas and guards, f32); equivalence is tested in
``tests/test_pallas.py``.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBLANES = 8
LANES = 128
TILE = SUBLANES * LANES

KIND_WALL = 0
KIND_RIS = 1
KIND_VERTEX = 2

# Interval pads for the culling proofs (beam_keep_tables): the interval
# analysis runs in f32 without directed rounding, and the kernel's own
# per-pixel arithmetic differs from the affine-form evaluation by a few
# ULPs per op (~1e-6 relative over ~20-op chains), so every proof
# threshold is backed off by abs + rel margins ~3 orders of magnitude
# above that error scale.  Soundness is enforced empirically by the
# randomized culled-vs-unculled bitwise suites (tests/test_pallas.py)
# and the DIFFERT2D_TPU_CULL_CHECK runtime canary.  (Round 3 used
# 0.05 + 1%, which cost ~2x of provable occlusion culling.)
_CULL_PAD_ABS = 1e-3
_CULL_PAD_REL = 1e-3

# Walls per fori step in the shadow-listed blocked loops: unrolling a
# few folds per step restores the cross-wall ILP the static loop had.
# 8 walls per step measured best across city configs (cfg8 322 -> 293
# ms/map, cfg6/cfg7 ~25% faster than 4; 16 ties or regresses).
# (Round 5 tried replacing these fori-list loops with MID_CHUNK
# occupancy-word lax.cond chunks everywhere: first/last segments
# REGRESSED 25-32% -- the dynamic-trip fori pipelines better than a
# branch per chunk -- so lists stay for first/last; the word scheme
# serves LOS (SMEM) and the previously listless MIDDLE segments.)
_SHADOW_CHUNK = int(os.environ.get("DIFFERT2D_TPU_SHADOW_CHUNK", "8"))

# f32 saturation bands of jax.nn.sigmoid, measured on TPU v5e (inside a
# Mosaic kernel) and XLA:CPU on 2026-08-19: sigmoid(z) == 0.0 exactly
# for z <= -87.4 (exp underflow with flush-to-zero) and == 1.0 exactly
# for z >= 16.7 (1 - sigma rounds to 1); the derivative formula
# alpha*s*(1-s) is then exactly 0 by construction.  The culling proofs
# use wide margins over the measured thresholds.
_SIGMOID_Z0 = 90.0
_SIGMOID_Z1 = 20.0
# hard_sigmoid saturates at |z| >= 3 on both sides.
_HARD_Z = 3.0

_SIGMOID_SATURATES: dict = {}


def _sigmoid_saturates() -> bool:
    """Verify the f32 sigmoid saturation thresholds on THIS backend.

    The Z0/Z1 constants were measured under flush-to-zero exp underflow;
    a strict-IEEE lowering could keep subnormal tails alive down to
    z ~ -104, which would make sigmoid culling non-bit-identical.  One
    tiny device computation per (process, backend) confirms the margins
    actually hold before sigmoid maps are allowed to cull.
    """
    backend = jax.default_backend()
    hit = _SIGMOID_SATURATES.get(backend)
    if hit is None:
        z = jnp.asarray(
            [-(_SIGMOID_Z0 - 1.0), _SIGMOID_Z1 - 1.0], jnp.float32
        )
        lo, hi = np.asarray(jax.jit(jax.nn.sigmoid)(z))
        hit = bool(lo == 0.0 and hi == 1.0)
        _SIGMOID_SATURATES[backend] = hit
    return hit


def _soft(x, alpha, sigmoid: bool):
    """activation(x) = f(alpha * x); reference logic.py:220-255."""
    if sigmoid:
        return jax.nn.sigmoid(alpha * x)
    return jax.nn.hard_sigmoid(alpha * x)


def _seg_intersect(ax, ay, bx, by, cx, cy, dx, dy, soft, alpha, tol=0.005):
    """Graphics-Gems test of segment (a, b) vs (c, d), elementwise.

    Mirrors ops/geometry_ops.py:segments_intersect (reference
    geometry.py:84-173) including the zero-denominator inf guard.
    """
    avx, avy = bx - ax, by - ay          # A = b - a
    bvx, bvy = cx - dx, cy - dy          # B = c - d
    cvx, cvy = ax - cx, ay - cy          # C = a - c
    num_a = bvy * cvx - bvx * cvy
    num_b = avx * cvy - avy * cvx
    den = avy * bvx - avx * bvy
    den_zero = den == 0.0
    safe_den = jnp.where(den_zero, 1.0, den)

    def in_range(num):
        t = jnp.where(den_zero, jnp.inf, num / safe_den)
        if soft:
            ge = _soft(t + tol, alpha, soft == "sigmoid")
            le = _soft(1.0 + tol - t, alpha, soft == "sigmoid")
            return jnp.minimum(ge, le)
        return (t >= -tol) & (t <= 1.0 + tol)

    lhs, rhs = in_range(num_a), in_range(num_b)
    return jnp.minimum(lhs, rhs) if soft else (lhs & rhs)


def _seg_intersect_m6(ax, ay, bx, by, cx, cy, dx, dy, soft, alpha, tol=0.005):
    """Deferred-clamp form of :func:`_seg_intersect` for VALUE kernels.

    Returns the pre-activation margin ``m`` such that

        soft:  hit = relu6(m) / 6      (m in ``alpha``-units)
        hard:  hit = (m >= 0)          (m in ``t``-units)

    Because ``relu6`` (and ``>= 0``) are monotone, the running max over
    walls/segments can accumulate ``m`` directly and convert ONCE per
    candidate: ``blk = relu6(max m)/6``.  That folds the four in-range
    activations, both divisions and the final min into

        m = min(z_a + c1, c2 - z_a, z_b + c1, c2 - z_b),
        z = alpha * num / den  (one division: inv = alpha/den),

    roughly halving the per-wall op count.  Walls with no crossing give
    ``m <= 0`` exactly (hit == 0), so skipping them (shadow lists) or
    masking them to ``-inf`` cannot change ``relu6(max m)``: if the full
    max is positive it comes from a kept wall; if it is <= 0 the clamp
    pins blk to 0 either way -- bit-identical.  Numerics differ from
    :func:`_seg_intersect` by op-reassociation ULPs, so value and
    gradient kernels must not mix forms within one comparison pair (the
    gradient path keeps :func:`_seg_intersect_vag`).
    """
    avx, avy = bx - ax, by - ay
    bvx, bvy = cx - dx, cy - dy
    cvx, cvy = ax - cx, ay - cy
    num_a = bvy * cvx - bvx * cvy
    num_b = avx * cvy - avy * cvx
    den = avy * bvx - avx * bvy
    # Subnormal |den| counts as parallel (TPU flushes it to 0 anyway;
    # keeping it normal-only bounds 1/den away from inf so num * inv
    # can never form 0 * inf = NaN).
    den_zero = jnp.abs(den) < np.float32(1.1754944e-38)
    safe_den = jnp.where(den_zero, 1.0, den)
    inv = 1.0 / safe_den
    if soft:
        shift = 0.0 if soft == "sigmoid" else 3.0
        c1 = alpha * tol + shift
        c2 = alpha * (1.0 + tol) + shift
        z_a = jnp.where(den_zero, jnp.inf, alpha * (num_a * inv))
        z_b = jnp.where(den_zero, jnp.inf, alpha * (num_b * inv))
    else:
        c1 = tol
        c2 = 1.0 + tol
        z_a = jnp.where(den_zero, jnp.inf, num_a * inv)
        z_b = jnp.where(den_zero, jnp.inf, num_b * inv)
    m = jnp.minimum(
        jnp.minimum(z_a + c1, c2 - z_a),
        jnp.minimum(z_b + c1, c2 - z_b),
    )
    return m


def _blk_from_m6(m6, soft_mode):
    """Convert the accumulated pre-activation margin into ``blk``.

    The final clamp to [0, 1] is LOAD-BEARING: compilers may rewrite the
    /6 (XLA:CPU fast-math turns divide-by-constant into multiply by a
    rounded reciprocal), letting blk overshoot 1 by an ulp -- which
    makes ``1 - blk`` negative and breaks both the soft-AND floor at 0
    and the contains==0 hatch the culling proofs rely on (observed:
    -2^-25 map values in interpret mode).
    """
    if soft_mode == "sigmoid":
        return jnp.clip(jax.nn.sigmoid(m6), 0.0, 1.0)
    if soft_mode:
        return jnp.clip(jnp.clip(m6, 0.0, 6.0) / 6.0, 0.0, 1.0)
    return m6 >= 0.0


def _zmargin(x, alpha, sigmoid: bool):
    """Pre-activation margin of ``_soft(x, alpha, sigmoid)``: ``alpha*x``
    (sigmoid) / ``alpha*x + 3`` (hard_sigmoid's relu6 shift), in the
    same op order ``_soft`` applies -- so folded margins stay bit-equal
    to the per-factor activations they replace."""
    z = alpha * x
    return z if sigmoid else z + 3.0


def _folded_valid(z_ol, m6, sigmoid: bool):
    """One activation for the folded VALUE-path validity.

    ``z_ol`` is the running min of on_objects/loss pre-activation
    margins (monotone activations commute with min EXACTLY: min selects
    one argument and the activation is a pure function), ``m6`` the
    blocked test's accumulated pre-clamp margin.  Hard mode also folds
    the blocked complement -- ``1 - relu6(m)/6 == relu6(6-m)/6`` with
    both sides pinned EXACTLY at m <= 0 / m >= 6, preserving the
    culling/shadow exact-zero contracts.  Sigmoid must NOT fold it:
    ``1 - sigmoid(m)`` is exactly 0 from m >= ~16.7 while
    ``sigmoid(-m)`` only saturates at ~87.4, and the cull proofs rely
    on the former -- so it keeps the explicit ``1 - blk`` pair.  The
    final [0, 1] clamp in the hard branch is load-bearing (see
    :func:`_blk_from_m6`)."""
    if sigmoid:
        blk_act = _blk_from_m6(m6, "sigmoid")
        valid_pre = jnp.minimum(jax.nn.sigmoid(z_ol), 1.0 - blk_act)
    else:
        z_valid = jnp.minimum(z_ol, 6.0 - m6)
        valid_pre = jnp.clip(
            jnp.clip(z_valid, 0.0, 6.0) / 6.0, 0.0, 1.0
        )
    return jnp.nan_to_num(valid_pre)


def _soft_grad(x, alpha, sigmoid: bool):
    """d activation(x) / dx (reference logic.py:220-255 derivatives).

    hard_sigmoid(alpha x) = relu6(alpha x + 3)/6: slope alpha/6 inside the
    band |alpha x| < 3, zero outside (ties at the band edge are
    measure-zero for continuous x).
    """
    if sigmoid:
        s = jax.nn.sigmoid(alpha * x)
        return alpha * s * (1.0 - s)
    ax = alpha * x
    return jnp.where((ax > -3.0) & (ax < 3.0), alpha / 6.0, 0.0)


def _min_grad_sel(a, b, da, db):
    """Gradient of ``jnp.minimum(a, b)`` matching XLA's balanced-eq rule:
    the smaller argument's tangent, split 50/50 at EXACT ties (jax
    ``lax.min`` JVP).  Ties are not measure-zero here: saturated
    hard-sigmoid activations produce exactly-equal values at symmetric
    geometry, and a one-sided select visibly diverges from the XLA
    tracer at those pixels (seen at order 2 on ``basic_scene``)."""
    return jnp.where(a < b, da, jnp.where(a > b, db, 0.5 * (da + db)))


def _max_grad_sel(a, b, da, db):
    """Gradient of ``jnp.maximum(a, b)`` with XLA's balanced-eq tie rule."""
    return jnp.where(a > b, da, jnp.where(a < b, db, 0.5 * (da + db)))


def _seg_intersect_vag(ax, ay, bx, by, cx, cy, dx, dy, soft, alpha, tol=0.005):
    """:func:`_seg_intersect` plus closed-form partials w.r.t. (c, d).

    The wall (a, b) is constant; the tested path segment (c, d) moves with
    the pixel.  Returns ``(hit, dhit_dc, dhit_dd)`` with each gradient a
    2-tuple of tiles.  The derivative flows only through the argmin of the
    four in-range activations (exactly the select structure reverse mode
    produces); every partial reuses the forward's ``t``/``den`` values:

        t_a = num_a / den,  dt_a/de = (dnum_a/de - t_a * dden/de) / den

    with ``dnum/de`` and ``dden/de`` simple coordinate differences (the
    numerators are bilinear, the denominator linear, in (c, d)).
    """
    avx, avy = bx - ax, by - ay
    bvx, bvy = cx - dx, cy - dy
    cvx, cvy = ax - cx, ay - cy
    num_a = bvy * cvx - bvx * cvy
    num_b = avx * cvy - avy * cvx
    den = avy * bvx - avx * bvy
    den_zero = den == 0.0
    safe_den = jnp.where(den_zero, 1.0, den)
    inv_den = jnp.where(den_zero, 0.0, 1.0 / safe_den)
    t_a = jnp.where(den_zero, jnp.inf, num_a / safe_den)
    t_b = jnp.where(den_zero, jnp.inf, num_b / safe_den)

    def inr(t):
        if soft:
            ge = _soft(t + tol, alpha, soft == "sigmoid")
            le = _soft(1.0 + tol - t, alpha, soft == "sigmoid")
            return jnp.minimum(ge, le), _min_grad_sel(
                ge,
                le,
                _soft_grad(t + tol, alpha, soft == "sigmoid"),
                -_soft_grad(1.0 + tol - t, alpha, soft == "sigmoid"),
            )
        return (t >= -tol) & (t <= 1.0 + tol), None

    inr_a, dinr_a = inr(t_a)
    inr_b, dinr_b = inr(t_b)
    if not soft:
        return inr_a & inr_b, None, None
    hit = jnp.minimum(inr_a, inr_b)
    # dhit/dt_a and dhit/dt_b (argmin select with XLA's balanced-eq tie
    # rule; inf t is saturated -> 0).
    g_a = _min_grad_sel(inr_a, inr_b, dinr_a, 0.0)
    g_b = _min_grad_sel(inr_a, inr_b, 0.0, dinr_b)
    # num_a = bvy*cvx - bvx*cvy, bv = c - d, cv = a - c:
    #   d num_a/dc = (-bvy - cvy, cvx + bvx),  d num_a/dd = (cvy, -cvx)
    # num_b = avx*cvy - avy*cvx:
    #   d num_b/dc = (avy, -avx),              d num_b/dd = 0
    # den = avy*bvx - avx*bvy:
    #   d den/dc = (avy, -avx),                d den/dd = (-avy, avx)
    # Zero (not inf) t in the partials at den == 0: the gradient there is
    # already killed by inv_den = 0 and saturated activations, but
    # inf * 0 = NaN would poison the select chain.
    ts_a = jnp.where(den_zero, 0.0, t_a)
    ts_b = jnp.where(den_zero, 0.0, t_b)
    dta_cx = (-bvy - cvy - ts_a * avy) * inv_den
    dta_cy = (cvx + bvx + ts_a * avx) * inv_den
    dta_dx = (cvy + ts_a * avy) * inv_den
    dta_dy = (-cvx - ts_a * avx) * inv_den
    dtb_cx = (avy - ts_b * avy) * inv_den
    dtb_cy = (-avx + ts_b * avx) * inv_den
    dtb_dx = (ts_b * avy) * inv_den
    dtb_dy = (-ts_b * avx) * inv_den
    dhit_dc = (g_a * dta_cx + g_b * dtb_cx, g_a * dta_cy + g_b * dtb_cy)
    dhit_dd = (g_a * dta_dx + g_b * dtb_dx, g_a * dta_dy + g_b * dtb_dy)
    return hit, dhit_dc, dhit_dd


def _norm2(x, y):
    return jnp.sqrt(x * x + y * y)


def _normalize(x, y):
    # Guard the *input* of sqrt (double-where), not just its output:
    # reverse mode multiplies the zero cotangent routed around the
    # degenerate branch by sqrt'(0) = inf, and 0 * inf = NaN.  Forward
    # mode never forms that product, which is why the double-jvp path
    # tolerated the single guard.  Values are unchanged: both versions
    # return (0, 0) for the zero vector.
    n2 = x * x + y * y
    zero = n2 == 0.0
    inv = 1.0 / jnp.sqrt(jnp.where(zero, 1.0, n2))
    inv = jnp.where(zero, 1.0, inv)
    return x * inv, y * inv


def build_power_map_kernel(
    walls_np: np.ndarray,
    kinds_np: np.ndarray,
    groups: dict[int, np.ndarray],
    *,
    approx: bool,
    sigmoid: bool = False,
    interpret: bool = False,
    mode: str = "value",
    block_rows: int = SUBLANES,
):
    """Build a fused kernel ``f(pixels[P, 2], tx[2], phi[W], scalars) -> [P]``.

    ``scalars = jnp.array([alpha, tol, patch, r_coef, height])`` are
    runtime-tunable; walls / kinds / candidates are baked into the kernel.

    ``mode="value_and_grad"`` additionally accumulates both pixel
    partials IN the kernel (one reverse sweep per straight-line
    candidate contribution -- numerically equivalent to the two
    ``jax.jvp`` passes the XLA tracer runs, reference
    ``scene.py:1920-1930``, fused into one VMEM-resident pass) and
    returns ``(value[P], grad[P, 2])``.

    The returned function pads ``P`` to a tile multiple internally;
    gradients w.r.t. scene parameters go through the XLA tracer path.
    """
    W = int(walls_np.shape[0])
    walls_c = [
        tuple(float(v) for v in walls_np[i].reshape(4)) for i in range(W)
    ]
    kinds_c = [int(k) for k in kinds_np]
    soft_mode = ("sigmoid" if sigmoid else "hard") if approx else False
    with_grad = mode == "value_and_grad"
    if mode not in ("value", "value_and_grad"):
        msg = f"unknown kernel mode {mode!r}"
        raise ValueError(msg)

    def kernel(scal_ref, phi_ref, px_ref, py_ref, *out_refs):
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

        def wall_scalars(i):
            axw, ayw, bxw, byw = walls_c[i]
            return axw, ayw, bxw, byw

        def wall_normal(i):
            axw, ayw, bxw, byw = wall_scalars(i)
            tx_, ty_ = bxw - axw, byw - ayw
            nx, ny = ty_, -tx_
            n = math.sqrt(nx * nx + ny * ny)
            if n == 0.0:
                return 0.0, 0.0
            return nx / n, ny / n

        def mirror_scalar(x, y, i):
            """Mirror a scalar point across wall i (host-math where possible)."""
            axw, ayw, _, _ = wall_scalars(i)
            nx, ny = wall_normal(i)
            d = (x - axw) * nx + (y - ayw) * ny
            return x - 2.0 * d * nx, y - 2.0 * d * ny



        def make_contrib(order, cand, want_grad=False):
            """Per-candidate contribution; wall indices are compile-time
            constants.  ``contrib(px, py)`` returns ``valid * power``;
            with ``want_grad=True`` it returns
            ``(valid*power, d/dpx, d/dpy)`` with HAND-DERIVED pixel
            partials folded into the same sweep (no ``jax.vjp`` reverse
            program, no residual live-set).  One forward pipeline serves
            both modes, so value maps and value_and_grad maps cannot
            desync.  Analytic structure exploited by the partials:

            * each bounce point moves along its wall LINE, so its pixel
              Jacobian is rank-1: ``b_j = a_j + t_j d_j`` with a single
              gradient 2-vector ``grad t_j`` propagated down the backward
              recursion (~10 flops/bounce);
            * the image-method solution makes the unfolded path length
              stationary along every wall line (reflection law holds as an
              identity in the pixel), so ``d r/dp`` collapses to the unit
              vector of the FINAL segment -- the whole length chain costs
              2 divisions instead of a reverse sweep;
            * the specular residual is identically zero in (px, py) for
              wall bounces (same identity), so only RIS residuals are
              differentiated;  XLA's value is float-noise (~1e-14), far
              inside the equivalence tolerance (tests/test_pallas.py).
              BOTH identities require an UNBROKEN image chain: a vertex
              before a wall/RIS bounce pins the actual upstream point
              away from the chain's virtual source, so such candidates
              (detected statically from ``kinds_c``) take the full
              analytic spec-residual and per-segment length gradients
              instead;
            * min/max soft-logic combines differentiate through their
              arg-extremum only -- running (value, grad) selects with
              XLA's balanced-eq tie rule, exactly the select structure
              XLA's reverse mode emits.
            """

            def contrib(px, py):
                zeros = jnp.zeros_like(px)

                # --- forward scalar mirror images (host math)
                images = []
                ix, iy = txx, txy
                for i in cand:
                    if kinds_c[i] == KIND_VERTEX:
                        # Zero-length segment: mirror is identity.
                        images.append((ix, iy))
                    else:
                        ix, iy = mirror_scalar(ix, iy, i)
                        images.append((ix, iy))

                # --- backward bounce recursion (vertex pinning); with
                # want_grad, rank-1 Jacobians ride along: the downstream
                # point q starts at the pixel (dq/dp = I); after a wall
                # bounce it lives on that wall's line
                # (dq/dp = d_j (x) grad t_j); after a vertex it is constant.
                ptx, pty = px, py
                state = "P"  # "P" pixel | "R" rank-1 on prev wall | "Z" const
                prev_d = None
                prev_gt = None
                bounce = [None] * order
                bstate = [None] * order
                for j in range(order - 1, -1, -1):
                    i = cand[j]
                    axw, ayw, bxw, byw = wall_scalars(i)
                    if kinds_c[i] == KIND_VERTEX:
                        ptx = jnp.full_like(px, axw)
                        pty = jnp.full_like(py, ayw)
                        state, prev_d, prev_gt = "Z", None, None
                        bounce[j] = (ptx, pty)
                        bstate[j] = ("Z", None, None)
                        continue
                    nx, ny = wall_normal(i)
                    imx, imy = images[j]
                    ux, uy = ptx - imx, pty - imy
                    un = ux * nx + uy * ny
                    un_zero = un == 0.0
                    safe_un = jnp.where(un_zero, 1.0, un)
                    vn = (axw - ptx) * nx + (ayw - pty) * ny
                    s = jnp.where(un_zero, 0.0, vn / safe_un)
                    bx_t = ptx + s * ux
                    by_t = pty + s * uy
                    if want_grad:
                        # dt_j/dq: t_j = ((b - a).d)/|d|^2 with
                        # db/dq = (c/un) (I - u n^T / un); at un == 0 the
                        # where-guard selects b = q, i.e. db/dq = I --
                        # match XLA's select gradient exactly.
                        dxw, dyw = bxw - axw, byw - ayw
                        dd2 = dxw * dxw + dyw * dyw
                        dd2 = dd2 if dd2 != 0.0 else 1.0
                        c_im = (axw - imx) * nx + (ayw - imy) * ny  # host
                        f = jnp.where(un_zero, 0.0, c_im / safe_un)
                        g = jnp.where(
                            un_zero, 0.0, (ux * dxw + uy * dyw) / safe_un
                        )
                        vx = jnp.where(
                            un_zero, dxw / dd2, f * (dxw - g * nx) / dd2
                        )
                        vy = jnp.where(
                            un_zero, dyw / dd2, f * (dyw - g * ny) / dd2
                        )
                        if state == "P":
                            gtx, gty = vx, vy
                        elif state == "R":
                            k = vx * prev_d[0] + vy * prev_d[1]
                            gtx, gty = k * prev_gt[0], k * prev_gt[1]
                        else:
                            gtx, gty = zeros, zeros
                        state, prev_d, prev_gt = "R", (dxw, dyw), (gtx, gty)
                        bstate[j] = ("R", (dxw, dyw), (gtx, gty))
                    ptx, pty = bx_t, by_t
                    bounce[j] = (ptx, pty)

                path_x = [jnp.full_like(px, txx)] + [b[0] for b in bounce] + [px]
                path_y = [jnp.full_like(py, txy)] + [b[1] for b in bounce] + [py]
                # dq/dp state per path point: tx const, bounces rank-1/const,
                # pixel identity.
                pstate = [("Z", None, None), *bstate, ("P", None, None)]

                def contract(st, wx, wy):
                    """(w . de/dp) for a path point's Jacobian state."""
                    kind_s, d_s, gt_s = st
                    if kind_s == "Z":
                        return zeros, zeros
                    if kind_s == "P":
                        return wx, wy
                    k = wx * d_s[0] + wy * d_s[1]
                    return k * gt_s[0], k * gt_s[1]

                # --- residual loss: gradient (want_grad) for RIS terms,
                # and for WALL specular terms whose image chain is BROKEN
                # (a vertex precedes the bounce, so the chain's virtual
                # source differs from the actual upstream point and the
                # reflection-law identity "residual == 0 in the pixel"
                # no longer holds). Unbroken wall chains keep the
                # zero-gradient shortcut (XLA's value there is float
                # noise ~1e-14, inside the equivalence tolerance).
                seen_vertex = False
                broken = []
                for i in cand:
                    broken.append(seen_vertex)
                    if kinds_c[i] == KIND_VERTEX:
                        seen_vertex = True
                chain_broken = any(
                    b and kinds_c[i] != KIND_VERTEX
                    for b, i in zip(broken, cand)
                )
                loss = jnp.zeros_like(px)
                gloss_x, gloss_y = zeros, zeros
                has_loss_grad = False
                for j, i in enumerate(cand):
                    axc, ayc = path_x[j], path_y[j]
                    bxc, byc = path_x[j + 1], path_y[j + 1]
                    cxc, cyc = path_x[j + 2], path_y[j + 2]
                    if kinds_c[i] == KIND_VERTEX:
                        continue
                    nx, ny = wall_normal(i)
                    rx_, ry_ = _normalize(cxc - bxc, cyc - byc)
                    if kinds_c[i] == KIND_RIS:
                        sin_a = (-rx_) * ny - (-ry_) * nx
                        cos_a = (-rx_) * nx + (-ry_) * ny
                        sin_p = jnp.sin(phi_ref[i])
                        cos_p = jnp.cos(phi_ref[i])
                        loss = loss + (sin_a - sin_p) ** 2 + (cos_a - cos_p) ** 2
                        if not want_grad:
                            continue
                        has_loss_grad = True
                        # d term / d rhat, then through the normalize
                        # Jacobian (I - rhat rhat^T)/|v|, then d v = d c - d b.
                        wx = 2.0 * (sin_a - sin_p) * (-ny) + 2.0 * (cos_a - cos_p) * (-nx)
                        wy = 2.0 * (sin_a - sin_p) * nx + 2.0 * (cos_a - cos_p) * (-ny)
                        vx_s, vy_s = cxc - bxc, cyc - byc
                        vn2 = vx_s * vx_s + vy_s * vy_s
                        v_zero = vn2 == 0.0
                        inv_vn = jnp.where(
                            v_zero, 0.0, 1.0 / jnp.sqrt(jnp.where(v_zero, 1.0, vn2))
                        )
                        rw = rx_ * wx + ry_ * wy
                        qx = (wx - rx_ * rw) * inv_vn
                        qy = (wy - ry_ * rw) * inv_vn
                        cgx, cgy = contract(pstate[j + 2], qx, qy)
                        bgx, bgy = contract(pstate[j + 1], qx, qy)
                        gloss_x = gloss_x + cgx - bgx
                        gloss_y = gloss_y + cgy - bgy
                    else:
                        ivx, ivy = _normalize(bxc - axc, byc - ayc)
                        d = ivx * nx + ivy * ny
                        refx, refy = ivx - 2.0 * d * nx, ivy - 2.0 * d * ny
                        ex, ey = rx_ - refx, ry_ - refy
                        loss = loss + ex * ex + ey * ey
                        if want_grad and broken[j]:
                            # Full spec gradient (see the looped twin):
                            # d spec = 2e.drv - 2eR.div with both
                            # normalize Jacobians.
                            has_loss_grad = True
                            s_wx, s_wy = 2.0 * ex, 2.0 * ey
                            vx_s, vy_s = cxc - bxc, cyc - byc
                            vn2 = vx_s * vx_s + vy_s * vy_s
                            v_zero = vn2 == 0.0
                            inv_vn = jnp.where(
                                v_zero, 0.0,
                                1.0 / jnp.sqrt(jnp.where(v_zero, 1.0, vn2)),
                            )
                            vi_x, vi_y = bxc - axc, byc - ayc
                            vi2 = vi_x * vi_x + vi_y * vi_y
                            vi_zero = vi2 == 0.0
                            inv_vi = jnp.where(
                                vi_zero, 0.0,
                                1.0 / jnp.sqrt(jnp.where(vi_zero, 1.0, vi2)),
                            )
                            rw = rx_ * s_wx + ry_ * s_wy
                            qcx = (s_wx - rx_ * rw) * inv_vn
                            qcy = (s_wy - ry_ * rw) * inv_vn
                            ndw = nx * s_wx + ny * s_wy
                            mx = s_wx - 2.0 * nx * ndw
                            my = s_wy - 2.0 * ny * ndw
                            imw = ivx * mx + ivy * my
                            qax = (mx - ivx * imw) * inv_vi
                            qay = (my - ivy * imw) * inv_vi
                            cgx, cgy = contract(pstate[j + 2], qcx, qcy)
                            bgx, bgy = contract(
                                pstate[j + 1], qcx + qax, qcy + qay
                            )
                            agx, agy = contract(pstate[j], qax, qay)
                            gloss_x = gloss_x + cgx - bgx + agx
                            gloss_y = gloss_y + cgy - bgy + agy

                # --- on_objects (running-min gradient with want_grad;
                # the soft VALUE path folds pre-activation margins: soft
                # activations are monotone nondecreasing, so
                # min(act(z1), act(z2)) == act(min(z1, z2)) EXACTLY in
                # f32 -- the min selects one argument and act is a pure
                # function -- letting on/loss collapse to ONE activation
                # per candidate (cfg2 spent ~6 transcendentals per
                # candidate here, the dominant non-geometry cost).
                fold = bool(soft_mode) and not want_grad

                def _zm(x):
                    return _zmargin(x, alpha, sigmoid)

                if fold:
                    zon = jnp.full_like(px, jnp.inf)
                elif soft_mode:
                    on = jnp.ones_like(px)
                    gon_x, gon_y = zeros, zeros
                else:
                    on = jnp.ones_like(px, dtype=jnp.bool_)
                for j, i in enumerate(cand):
                    if kinds_c[i] == KIND_VERTEX:
                        continue
                    axw, ayw, bxw, byw = wall_scalars(i)
                    dxw, dyw = bxw - axw, byw - ayw
                    sq = dxw * dxw + dyw * dyw
                    sq = sq if sq != 0.0 else 1.0
                    bxc, byc = path_x[j + 1], path_y[j + 1]
                    t = ((bxc - axw) * dxw + (byc - ayw) * dyw) / sq
                    if fold:
                        zon = jnp.minimum(
                            zon, jnp.minimum(_zm(t), _zm(1.0 - t))
                        )
                    elif soft_mode:
                        c1 = _soft(t, alpha, sigmoid)
                        c2 = _soft(1.0 - t, alpha, sigmoid)
                        contains = jnp.minimum(c1, c2)
                        if want_grad:
                            # dt/dp = grad t_j exactly (this t IS the
                            # bounce's along-wall coordinate).
                            _, _, gt_j = bstate[j]
                            dc = _min_grad_sel(
                                c1,
                                c2,
                                _soft_grad(t, alpha, sigmoid),
                                -_soft_grad(1.0 - t, alpha, sigmoid),
                            )
                            gon_x = _min_grad_sel(
                                on, contains, gon_x, dc * gt_j[0]
                            )
                            gon_y = _min_grad_sel(
                                on, contains, gon_y, dc * gt_j[1]
                            )
                        on = jnp.minimum(on, contains)
                    else:
                        on = on & ((t >= 0.0) & (t <= 1.0))

                # --- blocked (running-max gradient with want_grad;
                # value path folds the deferred-clamp margin
                # (_seg_intersect_m6) and converts once per candidate)
                if soft_mode and want_grad:
                    blk = jnp.zeros_like(px)
                    gblk_x, gblk_y = zeros, zeros
                else:
                    blk = jnp.full_like(px, -jnp.inf)
                idx = [-1, *cand, -1]
                for seg in range(order + 1):
                    skip = {idx[seg], idx[seg + 1]} - {-1}
                    st0 = pstate[seg]
                    st1 = pstate[seg + 1]
                    sax, say = path_x[seg], path_y[seg]
                    sbx, sby = path_x[seg + 1], path_y[seg + 1]
                    for w in range(W):
                        if w in skip or kinds_c[w] == KIND_VERTEX:
                            continue
                        axw, ayw, bxw, byw = wall_scalars(w)
                        tx_, ty_ = bxw - axw, byw - ayw
                        wa_x = axw - patch * tx_
                        wa_y = ayw - patch * ty_
                        wb_x = bxw + patch * tx_
                        wb_y = byw + patch * ty_
                        if soft_mode and want_grad:
                            hit, dhc, dhd = _seg_intersect_vag(
                                wa_x, wa_y, wb_x, wb_y, sax, say, sbx, sby,
                                soft_mode, alpha,
                            )
                            ghx0, ghy0 = contract(st0, dhc[0], dhc[1])
                            ghx1, ghy1 = contract(st1, dhd[0], dhd[1])
                            ghx, ghy = ghx0 + ghx1, ghy0 + ghy1
                            gblk_x = _max_grad_sel(blk, hit, gblk_x, ghx)
                            gblk_y = _max_grad_sel(blk, hit, gblk_y, ghy)
                            blk = jnp.maximum(blk, hit)
                        else:
                            m = _seg_intersect_m6(
                                wa_x, wa_y, wb_x, wb_y, sax, say, sbx, sby,
                                soft_mode, alpha,
                            )
                            blk = jnp.maximum(blk, m)
                if not (soft_mode and want_grad) and not fold:
                    blk = _blk_from_m6(blk, soft_mode)

                # --- validity (arg-min gradient selection with
                # want_grad; the folded VALUE path applies ONE
                # activation to the margin min -- see _folded_valid)
                if fold:
                    valid = _folded_valid(
                        jnp.minimum(zon, _zm(tol - loss)), blk, sigmoid
                    )
                elif soft_mode:
                    loss_ok = _soft(tol - loss, alpha, sigmoid)
                    m1 = jnp.minimum(on, 1.0 - blk)
                    valid_pre = jnp.minimum(m1, loss_ok)
                    valid = jnp.nan_to_num(valid_pre)
                    if want_grad:
                        gm1_x = _min_grad_sel(on, 1.0 - blk, gon_x, -gblk_x)
                        gm1_y = _min_grad_sel(on, 1.0 - blk, gon_y, -gblk_y)
                        if has_loss_grad:
                            slo = -_soft_grad(tol - loss, alpha, sigmoid)
                            glo_x, glo_y = slo * gloss_x, slo * gloss_y
                        else:
                            glo_x, glo_y = zeros, zeros
                        gvalid_x = _min_grad_sel(m1, loss_ok, gm1_x, glo_x)
                        gvalid_y = _min_grad_sel(m1, loss_ok, gm1_y, glo_y)
                        bad = jnp.isnan(valid_pre)
                        gvalid_x = jnp.where(bad, 0.0, gvalid_x)
                        gvalid_y = jnp.where(bad, 0.0, gvalid_y)
                else:
                    valid = on & (~blk) & (loss < tol)

                # --- path length + power; with want_grad,
                # d r/dp = unit(final segment) by image-method
                # stationarity for UNBROKEN chains; a vertex before any
                # wall/RIS bounce breaks the identity, so those
                # candidates take the full per-segment sum.
                r = jnp.zeros_like(px)
                dr_x, dr_y = zeros, zeros
                if want_grad and chain_broken:
                    for seg in range(order + 1):
                        dx_ = path_x[seg + 1] - path_x[seg] + eps
                        dy_ = path_y[seg + 1] - path_y[seg] + eps
                        sl = _norm2(dx_, dy_)
                        r = r + sl
                        safe_sl = jnp.where(sl == 0.0, 1.0, sl)
                        ux_ = jnp.where(sl == 0.0, 0.0, dx_ / safe_sl)
                        uy_ = jnp.where(sl == 0.0, 0.0, dy_ / safe_sl)
                        hgx, hgy = contract(pstate[seg + 1], ux_, uy_)
                        lgx, lgy = contract(pstate[seg], ux_, uy_)
                        dr_x = dr_x + hgx - lgx
                        dr_y = dr_y + hgy - lgy
                else:
                    ldx = ldy = None
                    for seg in range(order + 1):
                        dx_ = path_x[seg + 1] - path_x[seg] + eps
                        dy_ = path_y[seg + 1] - path_y[seg] + eps
                        r = r + _norm2(dx_, dy_)
                        ldx, ldy = dx_, dy_
                    if want_grad:
                        ln = _norm2(ldx, ldy)
                        safe_ln = jnp.where(ln == 0.0, 1.0, ln)
                        dr_x = jnp.where(ln == 0.0, 0.0, ldx / safe_ln)
                        dr_y = jnp.where(ln == 0.0, 0.0, ldy / safe_ln)
                denom = height * height + r * r
                power = (r_coef**order) / denom

                val = valid * power
                if not want_grad:
                    return val
                dp_scale = -power * (2.0 * r / denom)
                dpow_x = dp_scale * dr_x
                dpow_y = dp_scale * dr_y
                if soft_mode:
                    gx = gvalid_x * power + valid * dpow_x
                    gy = gvalid_y * power + valid * dpow_y
                else:
                    vf = valid.astype(px.dtype)
                    gx = vf * dpow_x
                    gy = vf * dpow_y
                return val, gx, gy

            return contrib

        contribs = []
        for order in sorted(groups):
            cands = groups[order]
            for c in range(cands.shape[0]):
                contribs.append(
                    make_contrib(
                        order,
                        [int(v) for v in cands[c]],
                        want_grad=with_grad,
                    )
                )

        def body(px, py):
            acc = jnp.zeros_like(px)
            for f in contribs:
                acc = acc + f(px, py)
            return acc

        if with_grad:
            val_ref, dx_ref, dy_ref = out_refs
            v = jnp.zeros_like(px)
            gx = jnp.zeros_like(px)
            gy = jnp.zeros_like(px)
            for f in contribs:
                val, dx, dy = f(px, py)
                v, gx, gy = v + val, gx + dx, gy + dy
            val_ref[:] = v
            dx_ref[:] = gx
            dy_ref[:] = gy
        else:
            (out_ref,) = out_refs
            out_ref[:] = body(px, py)

    def run(pixels: jax.Array, tx: jax.Array, phi: jax.Array, scalars: jax.Array):
        P = pixels.shape[0]
        block = block_rows * LANES
        padded = -((-P) // block) * block
        px = pixels[:, 0]
        py = pixels[:, 1]
        if padded != P:
            px = jnp.concatenate([px, jnp.zeros(padded - P)], axis=0)
            py = jnp.concatenate([py, jnp.zeros(padded - P)], axis=0)
        rows = padded // LANES
        px = px.reshape(rows, LANES)
        py = py.reshape(rows, LANES)

        packed = jnp.concatenate([tx, scalars])

        tile_spec = pl.BlockSpec(
            (block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            kernel,
            grid=(rows // block_rows,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                tile_spec,
                tile_spec,
            ],
            out_specs=_out_specs(with_grad, block_rows),
            out_shape=_out_shape(rows, with_grad),
            interpret=interpret,
        )(packed, phi, px, py)
        return _slice_outputs(out, padded, P, with_grad)

    return run


def _out_specs(with_grad: bool, block_rows: int = SUBLANES):
    tile = pl.BlockSpec(
        (block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    return (tile, tile, tile) if with_grad else tile


def _out_shape(rows: int, with_grad: bool):
    s = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    return (s, s, s) if with_grad else s


def _slice_outputs(out, padded: int, P: int, with_grad: bool):
    if not with_grad:
        return out.reshape(padded)[:P]
    val, dx, dy = (o.reshape(padded)[:P] for o in out)
    return val, jnp.stack([dx, dy], axis=-1)


def _aa_mul(A, B):
    """Product of two centered affine forms over a tile.

    A form ``(c, gx, gy, r)`` (each ``[T, C]``) means
    ``c + gx*xi + gy*eta + e`` with ``xi, eta in [-1, 1]`` (normalized
    tile-box coordinates) and ``|e| <= r``.  The product keeps the
    linear terms symbolic (``ca*lb + cb*la``) and folds everything
    nonlinear into the residue -- tight to second order in the tile
    half-width, unlike a plain interval product which discards ALL
    correlation (measured: global-interval products proved occlusion on
    0.4% of city (tile, candidate) pairs; the centered forms on ~20x
    more).
    """
    ca, ax, ay, ra = A
    cb, bx, by, rb = B
    la = jnp.abs(ax) + jnp.abs(ay) + ra
    lb = jnp.abs(bx) + jnp.abs(by) + rb
    return (
        ca * cb,
        ca * bx + cb * ax,
        ca * by + cb * ay,
        jnp.abs(ca) * rb + jnp.abs(cb) * ra + la * lb,
    )


def _aa_lincomb(sa, A, sb, B):
    """``sa*A + sb*B`` with per-candidate/scalar weights (residues add
    with absolute weights)."""
    return (
        sa * A[0] + sb * B[0],
        sa * A[1] + sb * B[1],
        sa * A[2] + sb * B[2],
        jnp.abs(sa) * A[3] + jnp.abs(sb) * B[3],
    )


def _aa_ival(A):
    c, gx, gy, r = A
    w = jnp.abs(gx) + jnp.abs(gy) + r
    return c - w, c + w


def _idiv(N, D):
    """Interval quotient; caller must mask lanes where D straddles 0."""
    nlo, nhi = N
    dlo, dhi = D
    sa = jnp.where(dlo == 0.0, 1.0, dlo)
    sb = jnp.where(dhi == 0.0, 1.0, dhi)
    q = jnp.stack([nlo / sa, nlo / sb, nhi / sa, nhi / sb])
    return jnp.min(q, axis=0), jnp.max(q, axis=0)


def _sign_def(I):
    return (I[0] > 0.0) | (I[1] < 0.0)


def beam_keep_tables(
    walls32,
    normals32,
    kind,
    groups: dict[int, np.ndarray],
    cand_orders,
    img_chains: dict,
    x0, x1, y0, y1,
    *,
    approx: bool,
    alpha,
    tx=None,
    patch=None,
    occlusion: bool = True,
    refine: int = 4,
    sigmoid: bool = False,
    tol=None,
):
    """Per-(pixel tile, candidate) conservative keep mask for tile-beam
    candidate culling.

    A candidate's contribution to a pixel is exactly zero whenever ANY
    bounce's wall parameter ``t_j`` sits strictly in the saturation
    region of its ``contains`` factor: under hard logic the factor is
    the boolean ``0 <= t <= 1``; under soft logic with ``hard_sigmoid``
    (``relu6(alpha t + 3)/6``) it is exactly 0 for ``t <= -3/alpha`` and
    the running soft-AND ``min`` then pins ``valid`` (and, because
    ``hard_sigmoid``'s derivative is identically zero strictly inside
    saturation, BOTH analytic pixel partials) to exact zeros -- so
    skipping the candidate is bit-identical to accumulating it.  Plain
    ``sigmoid`` ALSO saturates in f32 -- exactly 0 below z = -87.4 (exp
    underflow) and exactly 1 above z = 16.7 (round-to-one), with the
    derivative formula alpha*s*(1-s) exactly 0 at both -- so sigmoid
    maps cull too, with the wider ``_SIGMOID_Z0/_SIGMOID_Z1`` bands
    (``sigmoid=True``).

    The kernel's backward image recursion makes every bounce point a
    PROJECTIVE-AFFINE function of the pixel ``p``: starting from
    ``q = p`` and stepping toward the TX, each wall bounce maps

        q' = [I u(q) + c (V - w I)] / u(q),   u = V . n - w (I . n)

    where ``q = (V_x, V_y) / w`` with ``V``, ``w`` affine in ``p``,
    ``I`` the mirror-image chain constant and ``c = (A - I) . n`` --
    the denominator ``w`` cancels, so the coefficients stay degree-1
    under composition.  Each bounce's wall parameter is then again a
    ratio of two affines,

        t_j = [k1 u + c a] / (|d|^2 u),   a = V . d - w (I . d),

    bounded conservatively over a pixel box by affine interval
    arithmetic (exact for affine forms; the quotient hull is valid
    whenever the denominator is sign-definite over the box).  Intervals
    are widened by an absolute + relative pad so f32 rounding inside the
    kernel cannot move a pixel across the saturation threshold
    (``_CULL_PAD_ABS/REL``; guarded by the randomized bitwise suites and
    the ``DIFFERT2D_TPU_CULL_CHECK`` canary).  A Vertex bounce pins
    ``q`` to the vertex (its ``contains`` is identically 1, reference
    ``geometry.py:353-431``): no cull on that bounce, but deeper bounces
    remain cullable.  When a bounce's denominator straddles zero over
    the box (the kernel's ``un == 0`` guard could fire), that bounce and
    all deeper ones are left unculled for the box.

    **Occlusion (fully-shadowed) culling** (``occlusion=True`` and ``tx``
    given): a candidate is additionally culled on a box when some
    non-adjacent, non-vertex wall PROVABLY fully blocks one of its path
    segments for every pixel in the box.  Exactness argument: the
    blocked test's ``hit`` saturates at exactly 1 there (hard booleans,
    or hard_sigmoid with both in-range factors strictly inside
    saturation), so ``1 - blk == 0`` exactly and the soft-AND pins
    ``valid`` to 0; the analytic partials are exact zeros too because an
    f32 hard_sigmoid can only EQUAL 0.0/1.0 where its derivative rule
    already selects 0 (the cancellation ``alpha*x + 3`` is quantized to
    multiples of ulp(3), and ``z/6 < 1`` strictly for every
    representable ``z < 6``).  Proof machinery: with segment endpoints
    ``c = C/gamma``, ``d = D/delta`` (affine numerators/denominators
    from the projective recursion) and wall ``(a, b)`` constant, the
    Graphics-Gems parameters reduce to

        t_wall = P_a / (gamma Q),   t_seg = delta P_b / Q,
        Q  = av_y (Cx delta - Dx gamma) - av_x (Cy delta - Dy gamma),
        P_b = av_x (ay gamma - Cy) - av_y (ax gamma - Cx)  (affine),

    with every product bounded by CENTERED AFFINE ARITHMETIC
    (:func:`_aa_mul` -- linear terms stay symbolic, only the nonlinear
    residue is widened), and both parameters must land strictly inside
    the saturated-1 band ``[band - 0.005, 1.005 - band]`` under the same
    pads.  Walls in the kernel's adjacency skip set for that segment are
    excluded, as are vertex and zero-length walls (their ``hit`` is
    identically 0).

    **Sub-box refinement** (``refine=R``): every proof runs on an R x R
    grid of sub-boxes per tile and a candidate is skipped iff EVERY
    sub-box is provably zero -- by the beam proof or the occlusion proof
    independently per sub-box (different occluding walls may cover
    different sub-boxes, which is how building corners get proven).
    Smaller boxes also shrink the affine-arithmetic residues
    quadratically.  The result is still one keep bit per (tile,
    candidate).

    :return: ``{order: keep[T, C_order] bool}`` for each entry of
        ``cand_orders``.
    """
    kind_i32 = kind.astype(jnp.int32)
    if approx:
        # Saturated-0 / saturated-1 activation bands in t-units; plain
        # sigmoid saturates via f32 underflow / round-to-one at the
        # measured _SIGMOID_Z0/_SIGMOID_Z1 (module constants), which
        # makes its maps cullable too -- just with wider beams.
        z0 = _SIGMOID_Z0 if sigmoid else _HARD_Z
        z1 = _SIGMOID_Z1 if sigmoid else _HARD_Z
        alpha_f = jnp.maximum(alpha.astype(jnp.float32), 1e-6)
        band0 = z0 / alpha_f
        band1 = z1 / alpha_f
    else:
        band0 = jnp.float32(0.0)
        band1 = jnp.float32(0.0)
    lo_thr = -band0
    hi_thr = 1.0 + band0

    R = max(1, int(refine))
    T = x0.shape[0]
    # Sub-box corner stacks [R*R, T]: row-major R x R split of each tile.
    fr = jnp.arange(R, dtype=jnp.float32) / R
    gx0 = (x0[None, :] + (x1 - x0)[None, :] * fr[:, None])  # [R, T]
    gx1 = gx0 + (x1 - x0)[None, :] / R
    gy0 = (y0[None, :] + (y1 - y0)[None, :] * fr[:, None])
    gy1 = gy0 + (y1 - y0)[None, :] / R
    sub_x0 = jnp.repeat(gx0, R, axis=0)  # x varies slowly
    sub_x1 = jnp.repeat(gx1, R, axis=0)
    sub_y0 = jnp.tile(gy0, (R, 1))
    sub_y1 = jnp.tile(gy1, (R, 1))

    def _ival(F, bx0, bx1, by0, by1):
        """Interval of the affine form F = (F0, Fx, Fy) over boxes."""
        F0, Fx, Fy = F
        xa = Fx[None, :] * bx0[:, None]
        xb = Fx[None, :] * bx1[:, None]
        ya = Fy[None, :] * by0[:, None]
        yb = Fy[None, :] * by1[:, None]
        flo = F0[None, :] + jnp.minimum(xa, xb) + jnp.minimum(ya, yb)
        fhi = F0[None, :] + jnp.maximum(xa, xb) + jnp.maximum(ya, yb)
        return flo, fhi

    def _pad_inside(iv, lo_cut, hi_cut):
        lo, hi = iv
        pad = _CULL_PAD_ABS + _CULL_PAD_REL * jnp.maximum(
            jnp.abs(lo), jnp.abs(hi)
        )
        return (lo - pad > lo_cut) & (hi + pad < hi_cut)

    def _pad_outside(iv, lo_cut, hi_cut):
        lo, hi = iv
        pad = _CULL_PAD_ABS + _CULL_PAD_REL * jnp.maximum(
            jnp.abs(lo), jnp.abs(hi)
        )
        return (hi + pad < lo_cut) | (lo - pad > hi_cut)

    # Exact first-wall visibility kill (tile-independent; needs tol for
    # its hazard gate and tx/patch for the geometry; always on when
    # available -- it is two [W, W] sweeps, far below table cost).
    first_dead = None
    pair_dead = None
    if tx is not None and tol is not None:
        patch_f = patch if patch is not None else jnp.float32(0.0)
        first_dead = first_wall_visibility_dead(
            walls32, kind, tx, patch_f, alpha, approx, sigmoid, tol,
        )
        if any(o >= 2 for o in cand_orders):
            # Exact pair-level kill for MIDDLE segments (same exactness
            # family; see pair_occlusion_dead).
            pair_dead = pair_occlusion_dead(
                walls32, kind, tx, patch_f, alpha, approx, sigmoid, tol,
            )

    do_occl = occlusion and tx is not None
    if do_occl:
        # Occluder wall constants (patched endpoints, like the kernel's
        # blocked loop); vertex and zero-length walls can never block
        # (their ``hit`` is identically 0 via the den == 0 guard).
        tx32 = jnp.asarray(tx, jnp.float32)
        a_all = walls32[:, 0, :]
        b_all = walls32[:, 1, :]
        tvec = b_all - a_all
        p_f = (
            jnp.asarray(patch, jnp.float32)
            if patch is not None
            else jnp.float32(0.0)
        )
        aw_all = a_all - p_f * tvec
        av_all = (b_all + p_f * tvec) - aw_all
        wall_ok = (kind_i32 != KIND_VERTEX) & (
            jnp.sum(tvec * tvec, axis=-1) > 0.0
        )
        # Saturated-1 band of the blocked hit: both Graphics-Gems
        # parameters within [band - tol, 1 + tol - band], tol = 0.005
        # (the _seg_intersect default baked into the kernels).
        seg_tol = 0.005
        lo_sat = band1 - seg_tol
        hi_sat = 1.0 + seg_tol - band1

    keep_by_order = {}
    for o in cand_orders:
        cand = np.asarray(groups[o])
        C = cand.shape[0]
        # Occlusion cost gates, per order group.  The proof sweeps
        # candidates x walls x segments x sub-boxes, so its cost scales
        # with the sub-box count: small groups afford it on the FINE
        # beam grid (the round-3 scheme); huge groups (city order-2:
        # 18K candidates x 136 walls, where the fine-grid sweep costs
        # more than it saves -- measured 2026-08-19) run it on a
        # separate COARSE grid instead.  Coarse occlusion is where the
        # order-2 win lives: a one-tile ground-truth count found 2050
        # beam-kept candidates of which 2 contribute -- the other 2048
        # are building-shadowed, invisible to the beam proof.
        occl_fine = (
            do_occl and C * (o + 1) * int(walls32.shape[0]) <= 400_000
        )
        Ro = max(1, int(os.environ.get("DIFFERT2D_TPU_CULL_OCCL_REFINE",
                                       "2")))
        occl_coarse = do_occl and not occl_fine
        occl_o = occl_fine or occl_coarse
        zeros_c = jnp.zeros((C,), jnp.float32)
        ones_c = jnp.ones((C,), jnp.float32)
        # ---- Phase 1 (box-independent): affine coefficient triples of
        # every path point plus per-bounce (num, den, u) forms.
        vx = (zeros_c, ones_c, zeros_c)
        vy = (zeros_c, zeros_c, ones_c)
        w = (ones_c, zeros_c, zeros_c)
        forms = [None] * (o + 2)
        forms[o + 1] = (vx, vy, w)
        bounce_tests = []  # (num_aff, den_aff, u_aff, is_vtx[C], dd_ok[C]) per j
        imgs = img_chains[o]  # [C, o, 2]
        for j in range(o - 1, -1, -1):
            li = jnp.asarray(cand[:, j], dtype=jnp.int32)
            a_pt = walls32[li, 0, :]
            b_pt = walls32[li, 1, :]
            d = b_pt - a_pt
            nv = normals32[li]
            dd = jnp.sum(d * d, axis=-1)
            img = imgs[:, j, :]
            c_c = jnp.sum((a_pt - img) * nv, axis=-1)
            k1 = jnp.sum((img - a_pt) * d, axis=-1)
            i_n = jnp.sum(img * nv, axis=-1)
            i_d = jnp.sum(img * d, axis=-1)
            # u = V . n - w (I . n);  a = V . d - w (I . d)  (affine)
            u = tuple(
                vx[t] * nv[:, 0] + vy[t] * nv[:, 1] - w[t] * i_n
                for t in range(3)
            )
            av = tuple(
                vx[t] * d[:, 0] + vy[t] * d[:, 1] - w[t] * i_d
                for t in range(3)
            )
            num = tuple(k1 * u[t] + c_c * av[t] for t in range(3))
            den = tuple(dd * u[t] for t in range(3))
            is_vtx_c = kind_i32[li] == KIND_VERTEX
            bounce_tests.append((num, den, is_vtx_c, dd > 0.0, dd))
            # Next (deeper) bounce's q (path point j+1).  Vertex: pinned
            # to the wall's A point exactly (guard-free).  Wall/RIS: the
            # projective step -- valid per box only where u is
            # sign-definite (checked per sub-box in phase 2).
            new_vx = tuple(
                jnp.where(
                    is_vtx_c,
                    a_pt[:, 0] * w[t],
                    img[:, 0] * u[t] + c_c * (vx[t] - w[t] * img[:, 0]),
                )
                for t in range(3)
            )
            new_vy = tuple(
                jnp.where(
                    is_vtx_c,
                    a_pt[:, 1] * w[t],
                    img[:, 1] * u[t] + c_c * (vy[t] - w[t] * img[:, 1]),
                )
                for t in range(3)
            )
            new_w = tuple(
                jnp.where(is_vtx_c, w[t], u[t]) for t in range(3)
            )
            vx, vy, w = new_vx, new_vy, new_w
            forms[j + 1] = (vx, vy, w)
        if occl_o:
            forms[0] = (
                (jnp.full((C,), tx32[0]), zeros_c, zeros_c),
                (jnp.full((C,), tx32[1]), zeros_c, zeros_c),
                (ones_c, zeros_c, zeros_c),
            )
            cand_j = jnp.asarray(cand, dtype=jnp.int32)  # [C, o]
            minus1 = jnp.full((C,), -1, jnp.int32)
            # Walls in unrolled chunks of WC per scan step (cuts the
            # sequential step count; padded rows carry wall_ok=False).
            WC = 4
            W_all = int(walls32.shape[0])
            W_pad = -(-W_all // WC) * WC

            def _padw(arr, fill):
                return jnp.concatenate(
                    [arr, jnp.full((W_pad - W_all,), fill, arr.dtype)]
                ).reshape(W_pad // WC, WC)

            wall_xs = (
                _padw(aw_all[:, 0], 0.0),
                _padw(aw_all[:, 1], 0.0),
                _padw(av_all[:, 0], 1.0),
                _padw(av_all[:, 1], 0.0),
                _padw(wall_ok, False),
                _padw(
                    jnp.arange(W_all, dtype=jnp.int32), jnp.int32(-2)
                ),
            )

        # Coordinate scale feeding the kernel's un evaluation for this
        # order: wall endpoints, pixel boxes, and the (mirrored, so
        # possibly larger) image chain.
        scale2 = (
            jnp.maximum(
                jnp.max(jnp.abs(walls32)),
                jnp.maximum(
                    jnp.max(jnp.abs(imgs)) if imgs.size else 0.0,
                    jnp.maximum(
                        jnp.max(jnp.abs(x0)), jnp.max(jnp.abs(y1))
                    ),
                ),
            )
            ** 2
        )

        # ---- Phase 2: per sub-box, prove the candidate contributes
        # exact zeros (beam OR occlusion proof); AND-reduce to the tile.
        # gb sub-boxes are processed per scan step, vectorized along the
        # box axis (bounded element budget keeps the [gb*T, C]
        # intermediates HBM-friendly at city-order-2 candidate counts
        # while small tables run in one fused step).
        def _box_stacks(boxes4, n_boxes):
            gb = 1
            for div in range(n_boxes, 0, -1):
                if n_boxes % div == 0 and div * T * C <= 2_000_000:
                    gb = div
                    break
            return gb, n_boxes // gb, tuple(
                s.reshape(n_boxes // gb, gb * T) for s in boxes4
            )

        # One body per (gb, occl) pass, created FRESH each time:
        # lax.scan caches its jitted body by function identity +
        # per-step avals, so a shared body object with a mutable
        # config cell silently reused the beam-only compilation
        # whenever two passes had equal per-step slice shapes
        # (observed: the coarse occlusion pass culling NOTHING at
        # Ro in {8, 16} while culling at {1, 2, 4}).
        def make_subbox_zero(gb, run_occl):
            def subbox_zero(carry, boxes):
                zero_acc = carry
                bx0, bx1, by0, by1 = boxes
                B = gb * T

                def iv(F):
                    return _ival(F, bx0, bx1, by0, by1)

                # Beam (bounce out-of-band) proof, per sub-box.
                culled = jnp.zeros((B, C), bool)
                alive = jnp.ones((B, C), bool)
                point_valid = [None] * (o + 2)
                point_valid[o + 1] = alive
                for jj, (num, den, is_vtx_c, dd_ok, dd) in enumerate(
                    bounce_tests
                ):
                    j = o - 1 - jj
                    nlo, nhi = iv(num)
                    dlo, dhi = iv(den)
                    # Sign-definiteness with a margin: the kernel's f32
                    # arithmetic can land exactly on un == 0 (triggering
                    # the b = q guard) even when the interval excludes 0 by
                    # a hair, so proofs only trust denominators bounded away
                    # from zero by ~100x the f32 evaluation error.  The
                    # kernel evaluates un = (q - image).n with operands of
                    # coordinate scale, so its absolute error is
                    # ~1e-7 * scale^2; the interval here is den = dd * u,
                    # hence the floor is dd-scaled: 1e-5 * scale^2 * dd.
                    # NOT the t-interval pads: intervals here legitimately
                    # span orders of magnitude, and a 1e-3 relative margin
                    # was measured to disqualify enough culls to slow city
                    # order-2 maps 5x.
                    padd = 1e-5 * scale2 * dd[None, :] + 1e-5 * jnp.maximum(
                        jnp.abs(dlo), jnp.abs(dhi)
                    )
                    sign_def = (
                        (dlo > padd) | (dhi < -padd)
                    ) & dd_ok[None, :]
                    t_iv = _idiv((nlo, nhi), (dlo, dhi))
                    out_of_band = _pad_outside(t_iv, lo_thr, hi_thr)
                    is_vtx = is_vtx_c[None, :]
                    culled = culled | (alive & sign_def & out_of_band & ~is_vtx)
                    alive = alive & (sign_def | is_vtx)
                    point_valid[j + 1] = alive

                if run_occl:
                    point_valid[0] = jnp.ones((B, C), bool)
                    cx_t = 0.5 * (bx0 + bx1)
                    cy_t = 0.5 * (by0 + by1)
                    hx_t = 0.5 * (bx1 - bx0)
                    hy_t = 0.5 * (by1 - by0)

                    def to_aa(F):
                        F0, Fx, Fy = F
                        c = (
                            F0[None, :]
                            + Fx[None, :] * cx_t[:, None]
                            + Fy[None, :] * cy_t[:, None]
                        )
                        return (
                            c,
                            jnp.broadcast_to(
                                Fx[None, :] * hx_t[:, None], c.shape
                            ),
                            jnp.broadcast_to(
                                Fy[None, :] * hy_t[:, None], c.shape
                            ),
                            jnp.zeros_like(c),
                        )

                    occl = jnp.zeros((B, C), bool)
                    for s in range(o + 1):
                        vmask = point_valid[s] & point_valid[s + 1]
                        Cx, Cy, Ga = (to_aa(F) for F in forms[s])
                        Dx, Dy, De = (to_aa(F) for F in forms[s + 1])
                        Gx = _aa_lincomb(
                            1.0, _aa_mul(Cx, De), -1.0, _aa_mul(Dx, Ga)
                        )
                        Gy = _aa_lincomb(
                            1.0, _aa_mul(Cy, De), -1.0, _aa_mul(Dy, Ga)
                        )
                        g_ok = _sign_def(_aa_ival(Ga))
                        adj1 = cand_j[:, s - 1] if s >= 1 else minus1
                        adj2 = cand_j[:, s] if s <= o - 1 else minus1

                        def wall_step(blocked, xs, *, _Gx=Gx, _Gy=Gy, _Cx=Cx,
                                      _Cy=Cy, _Ga=Ga, _De=De, _g_ok=g_ok,
                                      _vmask=vmask, _adj1=adj1, _adj2=adj2):
                            for wb in range(WC):
                                ax_, ay_, avx_, avy_, ok_, widx = (
                                    x[wb] for x in xs
                                )
                                A1 = _aa_lincomb(ax_, _Ga, -1.0, _Cx)
                                A2 = _aa_lincomb(ay_, _Ga, -1.0, _Cy)
                                Q = _aa_lincomb(avy_, _Gx, -avx_, _Gy)
                                i_q = _aa_ival(Q)
                                q_ok = _sign_def(i_q)
                                Pb = _aa_lincomb(avx_, A2, -avy_, A1)
                                i_tb = _idiv(_aa_ival(_aa_mul(_De, Pb)), i_q)
                                num_a = _aa_lincomb(
                                    1.0, _aa_mul(_Gy, A1), -1.0, _aa_mul(_Gx, A2)
                                )
                                i_da = _aa_ival(_aa_mul(_Ga, Q))
                                da_ok = _sign_def(i_da)
                                i_ta = _idiv(_aa_ival(num_a), i_da)
                                adj = (_adj1 == widx) | (_adj2 == widx)
                                prove = (
                                    _pad_inside(i_ta, lo_sat, hi_sat)
                                    & _pad_inside(i_tb, lo_sat, hi_sat)
                                    & q_ok
                                    & _g_ok
                                    & da_ok
                                    & _vmask
                                    & ok_
                                    & ~adj[None, :]
                                )
                                blocked = blocked | prove
                            return blocked, None

                        occl, _ = jax.lax.scan(wall_step, occl, wall_xs)
                    culled = culled | occl

                return (
                    zero_acc
                    & culled.reshape(gb, T, C).all(axis=0),
                    None,
                )

            return subbox_zero

        def run_pass(boxes4, n_boxes, occl_flag):
            gb, _n_steps, stacks = _box_stacks(boxes4, n_boxes)
            zero, _ = jax.lax.scan(
                make_subbox_zero(gb, occl_flag),
                jnp.ones((T, C), bool),
                stacks,
            )
            return zero

        zero = run_pass(
            (sub_x0, sub_x1, sub_y0, sub_y1), R * R, occl_fine
        )
        if occl_coarse:
            # Coarse occlusion pass: its own Ro x Ro box grid, OR'd
            # with the fine beam reduction.  Sound because both
            # reductions independently prove every pixel of the tile
            # zero; the (rare) mixed coverage -- beam proving one half,
            # occlusion the other -- is simply not claimed.
            frc = jnp.arange(Ro, dtype=jnp.float32) / Ro
            cgx0 = x0[None, :] + (x1 - x0)[None, :] * frc[:, None]
            cgx1 = cgx0 + (x1 - x0)[None, :] / Ro
            cgy0 = y0[None, :] + (y1 - y0)[None, :] * frc[:, None]
            cgy1 = cgy0 + (y1 - y0)[None, :] / Ro
            cboxes = (
                jnp.repeat(cgx0, Ro, axis=0),
                jnp.repeat(cgx1, Ro, axis=0),
                jnp.tile(cgy0, (Ro, 1)),
                jnp.tile(cgy1, (Ro, 1)),
            )
            zero = zero | run_pass(cboxes, Ro * Ro, True)
        if first_dead is not None and o >= 1:
            zero = zero | first_dead[
                jnp.asarray(cand[:, 0], dtype=jnp.int32)
            ][None, :]
        if pair_dead is not None and o >= 2:
            cand_j32 = jnp.asarray(cand, dtype=jnp.int32)
            for s in range(1, o):
                zero = zero | pair_dead[
                    cand_j32[:, s - 1], cand_j32[:, s]
                ][None, :]
        keep_by_order[o] = ~zero
    return keep_by_order


def first_wall_visibility_dead(
    walls32, kind, tx, patch, alpha, approx, sigmoid, tol
):
    """Exact per-first-wall occlusion kill mask ``dead[W]``.

    ``dead[i]`` proves that EVERY candidate whose first wall is ``i``
    contributes exact zeros at every pixel: the first path segment runs
    TX -> b1 with b1 ON wall i's line (the kernel constructs it as the
    line intersection); wherever b1 lies inside the contains-dilated
    span, the segment is strictly blocked (some wall's ``hit``
    saturates to exactly 1, so ``1 - blk == 0`` and the soft-AND pins
    ``valid`` -- and, hard_sigmoid/f32-sigmoid derivatives being
    exactly zero strictly inside saturation, both analytic partials --
    to exact zeros); wherever b1 leaves the span, ``contains``
    saturates to 0 instead; un == 0 pixels are covered by the loss >= 1
    hazard argument (:func:`_shadow_geometry`).  Unlike the interval
    occlusion proof this is EXACT geometry, and unlike the per-tile
    tables it is tile-independent, so one mask kills candidates
    globally.

    Geometry (all vectorized ``[W_target, W_blocker]``): shrink each
    eligible blocker to the parameter range where a crossing saturates
    (``[band1 - tol_seg + pad, 1 + tol_seg - band1 - pad]``, patched
    endpoints), require it strictly between TX and wall i's line (both
    shrunk endpoints on TX's side, distance-floor margins), and project
    its endpoints along rays from TX onto wall i's line.  Along a
    straight blocker the segment-crossing ratio ``lambda = 1 -
    s_p/s_tx`` (signed line-i distances) is AFFINE in the blocker's
    parameter and the projected wall-i parameter is monotone (its
    denominator ``s_tx - s_p`` is sign-definite there), so endpoint
    checks bound both exactly: the blocker casts the t-interval between
    its endpoint projections, fully saturated when both endpoint
    lambdas sit strictly inside the t_seg saturation band.  ``dead[i]``
    iff the union of (pad-shrunken) shadow intervals covers the
    (pad-grown) dilated span ``[-(band0 + pad_t), 1 + band0 + pad_t]``.

    Soundness is policed by the randomized culled-vs-unculled bitwise
    suites and the ``DIFFERT2D_TPU_CULL_CHECK`` canary like every other
    cull proof.  Vertex / zero-length first walls are never killed
    (their bounce is pinned, not line-bound); under the hazard gate the
    mask falls back to all-False.
    """
    W = int(walls32.shape[0])
    a = walls32[:, 0, :]
    b = walls32[:, 1, :]
    d = b - a
    dd = jnp.sum(d * d, axis=-1)
    tx32 = jnp.asarray(tx, jnp.float32)
    kind_i32 = kind.astype(jnp.int32)
    if approx:
        z0 = _SIGMOID_Z0 if sigmoid else _HARD_Z
        z1 = _SIGMOID_Z1 if sigmoid else _HARD_Z
        alpha_f = jnp.maximum(alpha.astype(jnp.float32), 1e-6)
        band0 = z0 / alpha_f
        band1 = z1 / alpha_f
    else:
        band0 = jnp.float32(0.0)
        band1 = jnp.float32(0.0)
    seg_tol = 0.005
    pad_t = 0.01
    pad = _CULL_PAD_ABS + _CULL_PAD_REL * (1.0 + band0)

    # Target span of b1 on wall i, grown by the pads.
    span_lo = -(band0 + pad_t) - pad
    span_hi = 1.0 + band0 + pad_t + pad

    # Shrunk, patched blocker endpoints (params where a crossing's
    # wall factor saturates, backed off by the pads).
    p_f = jnp.asarray(patch, jnp.float32)
    aw = a - p_f * d
    av = (b + p_f * d) - aw
    blo = band1 - seg_tol + pad
    bhi = 1.0 + seg_tol - band1 - pad
    p1 = aw + blo * av
    p2 = aw + bhi * av
    blocker_ok = (
        (kind_i32 != KIND_VERTEX) & (dd > 0.0) & (bhi > blo)
    )

    # Signed distances to wall i's line (unnormalized normal n_i).
    n_i = jnp.stack([d[:, 1], -d[:, 0]], axis=-1)  # [W, 2]
    scale = jnp.maximum(jnp.max(jnp.abs(walls32)), 1.0)
    scale = jnp.maximum(scale, jnp.max(jnp.abs(tx32)))
    floor = 1e-4 * scale * scale  # sign-definiteness margin (~|n| * len)

    # s(q, i) = (q - a_i) . n_i
    s_p1 = jnp.einsum("bk,ik->ib", p1, n_i) - jnp.sum(a * n_i, -1)[:, None]
    s_p2 = jnp.einsum("bk,ik->ib", p2, n_i) - jnp.sum(a * n_i, -1)[:, None]
    s_tx = jnp.sum((tx32[None, :] - a) * n_i, axis=-1)  # [W_i]
    sg = jnp.sign(s_tx)[:, None]
    tx_ok = jnp.abs(s_tx) > floor  # [W_i]
    side_ok = (s_p1 * sg > floor) & (s_p2 * sg > floor)

    # t_seg ratio at each endpoint's crossing: lambda = 1 - s_p / s_tx,
    # affine along the blocker -> endpoint checks bound it exactly.
    s_tx_safe = jnp.where(tx_ok, s_tx, 1.0)[:, None]
    lam1 = 1.0 - s_p1 / s_tx_safe
    lam2 = 1.0 - s_p2 / s_tx_safe
    # The monotone-projection argument needs lambda STRICTLY inside
    # (0, 1): the ray-projection denominator is lambda * s_tx, so a
    # lambda band reaching 0 (hard logic's tol relaxation) admits a
    # pole and the endpoint interval no longer bounds the shadow
    # (caught by the hard-logic bitwise suite).  Clamp with a margin;
    # crossings within 0.1% of either segment end are simply not
    # claimed.
    lam_margin = 1e-3
    lam_lo = jnp.maximum(band1 - seg_tol + pad, lam_margin)
    lam_hi = jnp.minimum(1.0 + seg_tol - band1 - pad, 1.0 - lam_margin)
    lam_ok = (
        (lam1 > lam_lo) & (lam1 < lam_hi)
        & (lam2 > lam_lo) & (lam2 < lam_hi)
    )

    # Endpoint projections onto wall i's line (param t_i): the ray
    # TX -> p crosses at u = s_tx / (s_tx - s_p) (sign-definite
    # denominator given lam in (0, 1)).
    def t_of(p, s_p):
        den = s_tx[:, None] - s_p
        den = jnp.where(jnp.abs(den) > 0.0, den, 1.0)
        u = s_tx[:, None] / den
        q = tx32[None, None, :] + u[..., None] * (
            p[None, :, :] - tx32[None, None, :]
        )
        return jnp.einsum(
            "ibk,ik->ib", q - a[:, None, :], d
        ) / jnp.where(dd > 0.0, dd, 1.0)[:, None]

    t1 = t_of(p1, s_p1)
    t2 = t_of(p2, s_p2)
    valid_iv = (
        blocker_ok[None, :]
        & side_ok
        & lam_ok
        & tx_ok[:, None]
        & (jnp.arange(W)[None, :] != jnp.arange(W)[:, None])
    )
    t_pad = _CULL_PAD_ABS + _CULL_PAD_REL * jnp.maximum(
        jnp.abs(t1), jnp.abs(t2)
    )
    starts = jnp.where(valid_iv, jnp.minimum(t1, t2) + t_pad, jnp.inf)
    ends = jnp.where(valid_iv, jnp.maximum(t1, t2) - t_pad, -jnp.inf)

    # Union coverage of [span_lo, span_hi] by the shadow intervals
    # (vectorized cummax criterion -- see _span_covered).
    dead = _span_covered(starts, ends, span_lo, span_hi)

    # Never kill vertex / degenerate first walls; hazard gate -> none.
    dead = dead & (kind_i32 != KIND_VERTEX) & (dd > 0.0)
    geo = _shadow_geometry(
        walls32, kind, tx, patch, alpha, approx, sigmoid, tol
    )
    return jnp.where(geo["hz_free"], dead, False)


def pair_occlusion_dead(
    walls32, kind, tx, patch, alpha, approx, sigmoid, tol
):
    """Exact per-(upstream, downstream)-wall occlusion kill
    ``dead[W, W]`` for MIDDLE path segments.

    ``dead[i, j]`` proves every candidate with consecutive walls
    (i, j) contributes exact zeros: the mid segment runs b_up -> b_dn
    with b_up on wall i's contains-dilated span and b_dn on wall j's
    line; wherever both bounces sit inside their spans the segment is
    strictly blocked (saturated hit == 1 for some wall), and outside a
    span ``contains`` saturates instead -- :func:`first_wall_visibility_dead`'s
    argument with the fixed TX replaced by wall i's span.

    Exactness transfers because the span is a SEGMENT (convex hull of
    its two endpoints): for a target point q, the set of sources whose
    segment to q strictly crosses a convex blocker is convex (bounded
    by the blocker and its two away-rays), so checking wall i's two
    (pad-grown) span endpoints covers every source on the span; and
    the crossing ratio ``lambda(s, k) = 1 - s_K(k)/s_src(s)`` (signed
    distances to wall j's line) is affine in each argument with a
    sign-definite denominator, so its extremes over (span x blocker)
    sit at the four endpoint combinations.  Each blocker therefore
    casts the INTERSECTION of its two per-endpoint shadow intervals on
    wall j, fully saturated when all four corner lambdas are strictly
    in-band; ``dead[i, j]`` iff the union covers wall j's span.

    Tile-independent, so one [W, W] mask kills candidate pairs
    globally at every order >= 2.  Pairs involving vertex or
    zero-length walls are never killed; the hazard gate falls back to
    all-False.  Cost: one [W, W, W] sweep (2.5M lanes at city scale).
    """
    W = int(walls32.shape[0])
    a = walls32[:, 0, :]
    b = walls32[:, 1, :]
    d = b - a
    dd = jnp.sum(d * d, axis=-1)
    kind_i32 = kind.astype(jnp.int32)
    if approx:
        z0 = _SIGMOID_Z0 if sigmoid else _HARD_Z
        z1 = _SIGMOID_Z1 if sigmoid else _HARD_Z
        alpha_f = jnp.maximum(alpha.astype(jnp.float32), 1e-6)
        band0 = z0 / alpha_f
        band1 = z1 / alpha_f
    else:
        band0 = jnp.float32(0.0)
        band1 = jnp.float32(0.0)
    seg_tol = 0.005
    pad_t = 0.01
    pad = _CULL_PAD_ABS + _CULL_PAD_REL * (1.0 + band0)
    span_lo = -(band0 + pad_t) - pad
    span_hi = 1.0 + band0 + pad_t + pad

    # Upstream span endpoints (pad-grown), per wall i: [W, 2].
    S1 = a + span_lo * d
    S2 = a + span_hi * d

    # Shrunk patched blockers, per wall k: [W, 2].
    p_f = jnp.asarray(patch, jnp.float32)
    aw = a - p_f * d
    av = (b + p_f * d) - aw
    blo = band1 - seg_tol + pad
    bhi = 1.0 + seg_tol - band1 - pad
    P1 = aw + blo * av
    P2 = aw + bhi * av
    wall_usable = (kind_i32 != KIND_VERTEX) & (dd > 0.0)
    blocker_ok = wall_usable & (bhi > blo)

    # Signed distances to wall j's line: s(q, j) = (q - a_j) . n_j.
    n_j = jnp.stack([d[:, 1], -d[:, 0]], axis=-1)  # [W, 2]
    a_dot_n = jnp.sum(a * n_j, axis=-1)  # [W]
    scale = jnp.maximum(jnp.max(jnp.abs(walls32)), 1.0)
    floor = 1e-4 * scale * scale

    def sd(q):  # q [W_q, 2] -> [W_j, W_q]
        return jnp.einsum("qk,jk->jq", q, n_j) - a_dot_n[:, None]

    s_S1 = sd(S1)  # [W_j, W_i]
    s_S2 = sd(S2)
    s_P1 = sd(P1)  # [W_j, W_k]
    s_P2 = sd(P2)

    # Source side: BOTH span endpoints strictly off wall j's line, same
    # side (else no sound kill for that (i, j)).
    sg = jnp.sign(s_S1)
    src_ok = (
        (jnp.abs(s_S1) > floor)
        & (jnp.abs(s_S2) > floor)
        & (s_S1 * s_S2 > 0.0)
    )  # [W_j, W_i]

    # Blocker side conditions vs each source endpoint, [W_j, W_i, W_k]:
    # blocker strictly between the span and line j (same sign, smaller
    # magnitude enforced via the lambda band below).
    sP1 = s_P1[:, None, :]
    sP2 = s_P2[:, None, :]
    sgi = sg[:, :, None]
    side_ok = (sP1 * sgi > floor) & (sP2 * sgi > floor)

    # lambda = 1 - s_P / s_src, affine in each argument: extremes at
    # the four endpoint combinations.  Clamped strictly inside (0, 1):
    # see first_wall_visibility_dead (pole in the projection otherwise).
    lam_margin = 1e-3
    lam_lo = jnp.maximum(band1 - seg_tol + pad, lam_margin)
    lam_hi = jnp.minimum(1.0 + seg_tol - band1 - pad, 1.0 - lam_margin)

    def lam(s_src, s_p):
        safe = jnp.where(jnp.abs(s_src) > floor, s_src, 1.0)
        return 1.0 - s_p / safe

    lams = [
        lam(s_S1[:, :, None], sP1),
        lam(s_S1[:, :, None], sP2),
        lam(s_S2[:, :, None], sP1),
        lam(s_S2[:, :, None], sP2),
    ]
    lam_ok = jnp.ones_like(side_ok)
    for lv in lams:
        lam_ok = lam_ok & (lv > lam_lo) & (lv < lam_hi)

    # Shadow interval on wall j from source endpoint S: project the
    # blocker endpoints along rays S -> P onto wall j's line; the
    # blocker's interval from S is [min, max] of the two projections;
    # the always-blocked interval is the INTERSECTION over S1, S2.
    # Projections reduce to scalar dot products with wall j's
    # direction ([W, W] matmuls) followed by [W, W, W] elementwise ops
    # -- the naive [W, W, W, 2] point construction with a 2-wide
    # einsum contraction measured 64 ms/eval on TPU (VPU-hostile
    # minor-dim-2 layout); this form is ~1 ms.
    inv_dd = (1.0 / jnp.where(dd > 0.0, dd, 1.0))  # [W_j]
    ad = jnp.sum(a * d, axis=-1)  # [W_j] = a_j . d_j
    Sd1 = S1 @ d.T  # [W_i, W_j] -> transpose to [W_j, W_i]
    Sd2 = S2 @ d.T
    Pd1 = P1 @ d.T  # [W_k, W_j]
    Pd2 = P2 @ d.T

    def t_proj(Sd, s_S, Pd, s_p):
        # Sd [W_j, W_i] = S . d_j; Pd [W_j, W_k] = P . d_j
        den = s_S[:, :, None] - s_p[:, None, :]
        den = jnp.where(jnp.abs(den) > 0.0, den, 1.0)
        u = s_S[:, :, None] / den  # [W_j, W_i, W_k]
        qd = Sd[:, :, None] + u * (Pd[:, None, :] - Sd[:, :, None])
        return (qd - ad[:, None, None]) * inv_dd[:, None, None]

    tA1 = t_proj(Sd1.T, s_S1, Pd1.T, s_P1)
    tA2 = t_proj(Sd1.T, s_S1, Pd2.T, s_P2)
    tB1 = t_proj(Sd2.T, s_S2, Pd1.T, s_P1)
    tB2 = t_proj(Sd2.T, s_S2, Pd2.T, s_P2)
    loA = jnp.minimum(tA1, tA2)
    hiA = jnp.maximum(tA1, tA2)
    loB = jnp.minimum(tB1, tB2)
    hiB = jnp.maximum(tB1, tB2)
    lo = jnp.maximum(loA, loB)
    hi = jnp.minimum(hiA, hiB)
    t_pad = _CULL_PAD_ABS + _CULL_PAD_REL * jnp.maximum(
        jnp.abs(lo), jnp.abs(hi)
    )
    rng = jnp.arange(W)
    valid_iv = (
        side_ok
        & lam_ok
        & src_ok[:, :, None]
        & blocker_ok[None, None, :]
        & wall_usable[None, :, None]  # upstream wall i
        & wall_usable[:, None, None]  # downstream wall j
        # adjacency: the kernel ignores walls i and j on the mid
        # segment, so they may not serve as blockers.
        & (rng[None, None, :] != rng[None, :, None])
        & (rng[None, None, :] != rng[:, None, None])
    )
    starts = jnp.where(valid_iv, lo + t_pad, jnp.inf)
    ends = jnp.where(valid_iv, hi - t_pad, -jnp.inf)

    # Union coverage of wall j's span, per (j, i): sort by start, then
    # the vectorized gap criterion (a 136-step lax.scan sweep here
    # measured 64 ms/eval in situ on TPU -- the cummax form is ~1 ms):
    # with R_k = max(span_lo, cummax(ends)_k), the span is covered iff
    # no k has start_{k+1} > R_k while R_k < span_hi, and the final
    # reach passes span_hi.  Empty intervals (start=inf, end=-inf)
    # sort last and only flag a gap when coverage is genuinely short.
    dead_ji = _span_covered(starts, ends, span_lo, span_hi)
    dead = dead_ji.T  # [W_i(upstream), W_j(downstream)]
    geo = _shadow_geometry(
        walls32, kind, tx, patch, alpha, approx, sigmoid, tol
    )
    return jnp.where(geo["hz_free"], dead, False)


def _shadow_geometry(
    walls32, kind, tx, patch, alpha, approx, sigmoid, tol
):
    """Shared geometry for the occluder-list/mask builders.

    Returns dilated bounce-locus boxes (``llo/lhi``), occluder boxes
    (``olo/ohi``), the occluder eligibility mask, the hull-growth
    factors, and the un == 0 hazard gate ``hz_free``:

    The kernel's bounce guard pins b = q when (q - image) . n == 0
    exactly, detaching the bounce from its wall's locus and voiding the
    hull argument.  BUT a zero denominator collapses that bounce's
    outgoing segment to zero length, so its specular residual is
    |reflect(ihat)|^2 = 1 exactly and loss >= 1 (ihat = 0 would need
    the upstream point to coincide too, which chains back to TX -- only
    a wall through TX breaks this).  Whenever the loss gate saturates
    at loss >= 1, i.e. alpha * (1 - tol) clears the activation's zero
    threshold, every un == 0 pixel has valid == 0 with exactly-zero
    gradients and the lists stay bit-identical.  Otherwise (tiny alpha
    / huge tol) the builders fall back to identity lists / all-ones
    masks -- a traced select, so one compiled kernel serves both.
    """
    a = walls32[:, 0, :]
    b = walls32[:, 1, :]
    d = b - a
    if approx:
        z0 = _SIGMOID_Z0 if sigmoid else _HARD_Z
        band = z0 / jnp.maximum(alpha.astype(jnp.float32), 1e-6)
    else:
        band = jnp.float32(0.0)
    pad_t = 0.01
    abs_pad = 2e-3
    ext = 0.005 + band + pad_t

    # Bounce-locus bboxes (band-dilated candidate walls).
    la = a - (band + pad_t) * d
    lb = b + (band + pad_t) * d
    llo = jnp.minimum(la, lb)
    lhi = jnp.maximum(la, lb)

    # Occluder bboxes (patched + tol/band-dilated walls).
    p_f = jnp.asarray(patch, jnp.float32)
    pa = a - p_f * d
    pb = b + p_f * d
    dp = pb - pa
    oa = pa - ext * dp
    ob = pb + ext * dp
    olo = jnp.minimum(oa, ob) - abs_pad
    ohi = jnp.maximum(oa, ob) + abs_pad
    occ_ok = (kind.astype(jnp.int32) != KIND_VERTEX) & (
        jnp.sum(d * d, axis=-1) > 0.0
    )

    z_need = _SIGMOID_Z0 if (approx and sigmoid) else _HARD_Z
    tol_f = (
        jnp.asarray(tol, jnp.float32)
        if tol is not None
        else jnp.float32(0.01)
    )
    if approx:
        hz_free = alpha.astype(jnp.float32) * (1.0 - tol_f - 0.02) >= (
            z_need + 1.0
        )
    else:
        # Hard logic: valid needs loss < tol, impossible at loss >= 1
        # unless tol >= 1.
        hz_free = tol_f < 0.98
    # The loss >= 1 argument chains back to TX (ihat_1 != 0); a wall
    # LINE passing exactly through TX is the one scene class that
    # breaks it, so such scenes fall back to identity lists too.
    tx32_g = jnp.asarray(tx, jnp.float32)
    nrm = jnp.stack([d[:, 1], -d[:, 0]], axis=-1)
    nlen = jnp.sqrt(jnp.sum(nrm * nrm, axis=-1))
    tx_dist = jnp.abs(jnp.sum((tx32_g[None, :] - a) * nrm, axis=-1))
    scale = jnp.maximum(jnp.max(jnp.abs(walls32)), 1.0)
    wall_thru_tx = (nlen > 0.0) & (
        tx_dist <= 1e-4 * scale * jnp.maximum(nlen, 1e-30)
    )
    hz_free = hz_free & jnp.logical_not(jnp.any(wall_thru_tx & occ_ok))
    return {
        "llo": llo,
        "lhi": lhi,
        "olo": olo,
        "ohi": ohi,
        "occ_ok": occ_ok,
        "ext": ext,
        "abs_pad": abs_pad,
        "hz_free": hz_free,
    }


MID_CHUNK = 8
"""Walls per blocked-loop skip chunk (one occupancy bit per chunk)."""


def _span_covered(starts, ends, span_lo, span_hi):
    """Whether the union of intervals covers ``[span_lo, span_hi]``,
    vectorized over leading axes (intervals on the LAST axis; empty
    intervals encoded as ``(inf, -inf)``).

    Sort by start, take the running reach ``R_k = max(span_lo,
    cummax(ends)_k)``; covered iff no sorted interval STARTS beyond
    the reach while the reach is still short of ``span_hi``, and the
    final reach passes ``span_hi``.  Equivalent to the sequential
    sweep (after a gap the reach can never grow again, since later
    starts are even larger), but with no lax.scan -- a 136-step sweep
    measured 64 ms/eval fused into the kill-mask pipeline on TPU.
    """
    # Key-value sort: argsort + two take_along_axis gathers measured
    # ~30-45 ms EACH at [136^3] on TPU (minor-axis random gather);
    # lax.sort carries the values with the keys for ~free.
    st, en = jax.lax.sort(
        (starts, ends), dimension=starts.ndim - 1, num_keys=1
    )
    reach = jnp.maximum(jax.lax.cummax(en, axis=en.ndim - 1), span_lo)
    prev = jnp.concatenate(
        [
            jnp.full((*st.shape[:-1], 1), span_lo),
            reach[..., :-1],
        ],
        axis=-1,
    )
    gap = jnp.any((st > prev) & (prev < span_hi), axis=-1)
    return ~gap & (reach[..., -1] >= span_hi)


def _pack_chunk_words(mask):
    """Pack ``[..., W]`` boolean occluder masks into chunk-occupancy
    int32 words: bit ``c`` of the output = any occluder among walls
    ``c*MID_CHUNK .. +MID_CHUNK-1``.  Requires ``ceil(W / MID_CHUNK)
    <= 32`` (W <= 256 at chunk 8; the looped kernel's SMEM scaling
    breaks down far earlier anyway)."""
    Wm = mask.shape[-1]
    nchunks = -(-Wm // MID_CHUNK)
    if nchunks > 32:
        msg = f"chunk words support at most {32 * MID_CHUNK} walls"
        raise ValueError(msg)
    pad = nchunks * MID_CHUNK - Wm
    padded = jnp.pad(mask, [(0, 0)] * (mask.ndim - 1) + [(0, pad)])
    occ = jnp.any(
        padded.reshape(*mask.shape[:-1], nchunks, MID_CHUNK), axis=-1
    )
    weights = jnp.left_shift(
        jnp.uint32(1), jnp.arange(nchunks, dtype=jnp.uint32)
    )
    words = jnp.sum(occ.astype(jnp.uint32) * weights, axis=-1,
                    dtype=jnp.uint32)
    return jax.lax.bitcast_convert_type(words, jnp.int32)


def shadow_chunk_words(
    walls32, kind, tx, patch, alpha, approx, x0, x1, y0, y1,
    sigmoid=False, tol=None, geo=None,
):
    """Packed chunk-occupancy words for the first/last/LOS blocked
    loops of kernels that ALSO have middle segments (order >= 2).

    Same hulls and soundness argument as :func:`shadow_wall_lists`,
    compressed to one int32 per hull (bit ``c`` = chunk ``c`` holds a
    possible occluder).  Such kernels must use the lax.cond chunk-skip
    scheme for EVERY segment: mixing a dynamic-trip fori (the index
    lists) and lax.cond chunks in one loop body compiled ~65x slower
    on Mosaic (cfg8 19.1 s vs 275 ms, 2026-08-20), while all-cond
    order-1 kernels ran 25-32% slower than their fori lists -- so the
    list form stays for no-mid kernels and this form serves has-mid
    ones (where it also frees ~350 KB of SMEM for the pair masks).

    Under the un == 0 hazard gate the first/last words fall back to
    all-ones (skip nothing); LOS skips the gate (no bounce).

    :return: ``(l0w[W], lastw[T, 1, W], losw[T, 1, 1])`` int32.
    """
    geo, m0, mlast, mlos = _occluder_masks(
        walls32, kind, tx, patch, alpha, approx, x0, x1, y0, y1,
        sigmoid=sigmoid, tol=tol, geo=geo,
    )
    hz_free = geo["hz_free"]
    all_on = jnp.int32(-1)
    l0w = jnp.where(hz_free, _pack_chunk_words(m0), all_on)
    lastw = jnp.where(hz_free, _pack_chunk_words(mlast), all_on)
    losw = _pack_chunk_words(mlos)
    return l0w, lastw[:, None, :], losw[:, None, None]


def mid_pair_masks(
    walls32, kind, tx, patch, alpha, approx, sigmoid=False, tol=None,
    geo=None,
):
    """Packed per-(wall, wall) occluder bitmasks for MIDDLE segments.

    A middle path segment of an order >= 2 candidate runs b_s -> b_{s+1}
    with each endpoint on its (band-dilated) wall wherever that bounce's
    ``contains`` factor is nonzero, so the segment lies inside
    bbox(dilated w_s, dilated w_{s+1}) (bbox convexity).  A wall whose
    dilated box misses that (growth-padded) hull has ``hit == 0``
    exactly there, and at pixels where a bounce leaves its dilated wall
    ``contains == 0`` saturates with exactly-zero gradients -- the same
    bit-identity argument as :func:`shadow_wall_lists`, keyed by the
    (upstream wall, downstream wall) PAIR, which is tile-independent.

    Full index lists per pair would need W^3 SMEM; per-wall bitmasks
    still cost ~W^3/8 bytes (blew the 1 MB SMEM budget at W=136).  The
    kernel only ever branches at :data:`MID_CHUNK`-wall granularity, so
    each pair stores ONE int32 whose bit ``c`` says "chunk c (walls
    c*MID_CHUNK .. +MID_CHUNK-1) contains at least one occluder"; the
    kernel skips a chunk when its bit is clear (``lax.cond`` on a
    scalar).  Executed chunks run every wall in them unconditionally --
    extra tested walls are sound (their hits are genuine zeros), only
    skipped ones need the proof.  Adjacent walls are cleared before
    chunk-reduction -- the kernel's ignore test masks their hits to
    exact zeros anyway, so skipping them is equivalent.  Requires
    ``ceil(W / MID_CHUNK) <= 32``, i.e. W <= 256 at chunk 8 (the looped
    kernel's SMEM scaling breaks down far earlier anyway).

    Under the un == 0 hazard gate (see :func:`_shadow_geometry`) the
    masks fall back to all-ones (skip nothing).

    :return: int32 ``[W * W]``, bit ``c`` of entry ``i * W + j`` =
        chunk-c occupancy for the ordered pair (i, j).
    """
    W = int(walls32.shape[0])
    if geo is None:
        geo = _shadow_geometry(
            walls32, kind, tx, patch, alpha, approx, sigmoid, tol
        )
    llo, lhi = geo["llo"], geo["lhi"]
    olo, ohi = geo["olo"], geo["ohi"]
    occ_ok, ext, abs_pad = geo["occ_ok"], geo["ext"], geo["abs_pad"]

    hlo = jnp.minimum(llo[:, None, :], llo[None, :, :])  # [W, W, 2]
    hhi = jnp.maximum(lhi[:, None, :], lhi[None, :, :])
    diag = jnp.sqrt(jnp.sum((hhi - hlo) ** 2, axis=-1, keepdims=True))
    grow = ext * diag + abs_pad
    glo = hlo - grow
    ghi = hhi + grow
    overlap = ~(
        (ohi[:, 0] < glo[..., 0][..., None])
        | (olo[:, 0] > ghi[..., 0][..., None])
        | (ohi[:, 1] < glo[..., 1][..., None])
        | (olo[:, 1] > ghi[..., 1][..., None])
    )  # [W, W, W]
    rng = jnp.arange(W)
    mask = (
        overlap
        & occ_ok
        & (rng[None, None, :] != rng[:, None, None])  # upstream wall
        & (rng[None, None, :] != rng[None, :, None])  # downstream wall
    )
    mask = jnp.where(geo["hz_free"], mask, True)
    return _pack_chunk_words(mask).reshape(-1)


def shadow_wall_lists(
    walls32, kind, tx, patch, alpha, approx, x0, x1, y0, y1,
    sigmoid=False, tol=None,
):
    """Per-wall / per-tile occluder index lists for the blocked test.

    For a candidate whose first wall is ``w0``, the first path segment
    runs TX -> b1 with b1 on the (band-dilated) wall ``w0`` wherever the
    candidate's ``contains`` factor is nonzero -- so any wall whose
    (dilated) bounding box misses bbox(TX, dilated w0) has
    ``hit == 0`` exactly there, and at pixels where b1 leaves the
    dilated wall, ``contains == 0`` saturates with exactly-zero
    gradients, making the candidate's (val, gx, gy) independent of
    ``blk`` (min-select ties propagate zeros).  Skipping off-list walls
    is therefore bit-identical.  The same argument covers the LAST
    segment b_last -> pixel against bbox(tile, dilated w_last), and the
    LOS segment TX -> pixel against bbox(TX, tile).

    Dilations: the bounce locus extends ``(3/alpha + pad)`` wall lengths
    past each endpoint (the ``contains`` saturation band); occluders
    extend ``(0.005 + 3/alpha + pad)`` patched lengths (the blocked
    test's tol + band); hulls additionally grow by the same factor times
    their diagonal (the ``t_seg`` in-range band scales with segment
    length) plus an absolute f32 margin.

    :return: ``(l0dat[W*W], l0cnt[W], lastdat[T, W, W],
        lastcnt[T, 1, W], losdat[T, 1, W], loscnt[T, 1, 1])`` int32
        index lists (survivors first) + counts.
    """
    W = int(walls32.shape[0])
    geo, m0, mlast, mlos = _occluder_masks(
        walls32, kind, tx, patch, alpha, approx, x0, x1, y0, y1,
        sigmoid=sigmoid, tol=tol,
    )
    hz_free = geo["hz_free"]

    def to_list(mask):
        prm = jnp.argsort(~mask, axis=-1, stable=True).astype(jnp.int32)
        cnt = jnp.sum(mask, axis=-1).astype(jnp.int32)
        return prm, cnt

    def _gate(dat, cnt):
        ident = jnp.broadcast_to(
            jnp.arange(W, dtype=jnp.int32), dat.shape
        )
        return (
            jnp.where(hz_free, dat, ident),
            jnp.where(hz_free, cnt, jnp.int32(W)),
        )

    l0dat, l0cnt = _gate(*to_list(m0))
    ldat, lcnt = _gate(*to_list(mlast))
    # LOS has no bounce (its segment is TX -> pixel exactly), so the
    # hazard gate does not apply.
    sdat, scnt = to_list(mlos)

    return (
        l0dat.reshape(-1),
        l0cnt,
        ldat,
        lcnt[:, None, :],
        sdat[:, None, :],
        scnt[:, None, None],
    )


def _occluder_masks(
    walls32, kind, tx, patch, alpha, approx, x0, x1, y0, y1,
    sigmoid=False, tol=None, geo=None,
):
    """Boolean occluder masks for the first/last/LOS blocked segments.

    Returns ``(geo, m0[W, W], mlast[T, W, W], mlos[T, W])`` where entry
    ``[..., w]`` says wall ``w`` can intersect the corresponding hull
    (see :func:`shadow_wall_lists` for the hulls and the soundness
    argument).  Consumed by both the index-list builder (tests,
    documentation) and the packed chunk-word builder the kernel reads.
    ``geo`` lets callers share one :func:`_shadow_geometry` evaluation.
    """
    W = int(walls32.shape[0])
    T = int(x0.shape[0])
    if geo is None:
        geo = _shadow_geometry(
            walls32, kind, tx, patch, alpha, approx, sigmoid, tol
        )
    llo, lhi = geo["llo"], geo["lhi"]
    olo, ohi = geo["olo"], geo["ohi"]
    occ_ok, ext, abs_pad = geo["occ_ok"], geo["ext"], geo["abs_pad"]

    def from_hulls(hlo, hhi, self_idx=None):
        diag = jnp.sqrt(jnp.sum((hhi - hlo) ** 2, axis=-1, keepdims=True))
        grow = ext * diag + abs_pad
        glo = hlo - grow
        ghi = hhi + grow
        overlap = ~(
            (ohi[:, 0] < glo[..., 0][..., None])
            | (olo[:, 0] > ghi[..., 0][..., None])
            | (ohi[:, 1] < glo[..., 1][..., None])
            | (olo[:, 1] > ghi[..., 1][..., None])
        )
        mask = overlap & occ_ok
        if self_idx is not None:
            mask = mask & (jnp.arange(W) != self_idx[..., None])
        return mask

    tx32 = jnp.asarray(tx, jnp.float32)
    # Segment 0: hull(TX, dilated w0) per first wall.
    h0lo = jnp.minimum(tx32[None, :], llo)
    h0hi = jnp.maximum(tx32[None, :], lhi)
    m0 = from_hulls(h0lo, h0hi, jnp.arange(W))

    # Last segment: hull(tile, dilated w_last) per (tile, wall).
    tlo = jnp.stack([x0, y0], axis=-1)  # [T, 2]
    thi = jnp.stack([x1, y1], axis=-1)
    hllo = jnp.minimum(tlo[:, None, :], llo[None, :, :])  # [T, W, 2]
    hlhi = jnp.maximum(thi[:, None, :], lhi[None, :, :])
    mlast = from_hulls(
        hllo, hlhi, jnp.broadcast_to(jnp.arange(W)[None, :], (T, W))
    )

    # LOS: hull(TX, tile) per tile.
    hslo = jnp.minimum(tx32[None, :], tlo)
    hshi = jnp.maximum(tx32[None, :], thi)
    mlos = from_hulls(hslo, hshi)
    return geo, m0, mlast, mlos




def build_power_map_kernel_looped(
    num_walls: int,
    groups: dict[int, np.ndarray],
    *,
    approx: bool,
    sigmoid: bool = False,
    interpret: bool = False,
    mode: str = "value",
    block_rows: int = 32,
    tangent_impl: str = "analytic",
    cand_block: int = 1,
    hoist_walls: bool = False,
    cull: bool = False,
    shadow: bool = False,
    debug_skip_mid: bool = False,
):
    """Looped variant of :func:`build_power_map_kernel` for large
    candidate sets.

    Instead of unrolling every candidate into the instruction stream
    (which overwhelms the scheduler beyond ~16 candidates), each order
    group runs a ``fori_loop`` whose body reads the candidate's wall
    indices, wall coordinates, kinds and phases from SMEM at runtime.
    Object-kind handling uses scalar selects (vertex pinning, RIS vs
    specular residual) instead of compile-time specialization; the wall
    array is a runtime input, so one compiled kernel serves every scene
    with the same wall count and candidate structure.

    Returned callable: ``f(pixels[P, 2], tx[2], walls[W, 2, 2], kind[W],
    phi[W], scalars[5]) -> [P]``.
    """
    W = num_walls
    soft_mode = ("sigmoid" if sigmoid else "hard") if approx else False
    with_grad = mode == "value_and_grad"
    if mode not in ("value", "value_and_grad"):
        msg = f"unknown kernel mode {mode!r}"
        raise ValueError(msg)

    group_orders = sorted(groups)
    group_counts = [int(groups[o].shape[0]) for o in group_orders]
    total_cands = sum(group_counts)
    # The legacy vjp/jvp2 tangent A/B paths reverse- or forward-
    # differentiate the VALUE pipeline; reverse mode cannot transpose
    # fori_loops with dynamic trip counts, so those kernels keep the
    # static full-wall loops (they are verification-only -- no culling
    # or shadow lists ride them).
    dyn_lists = not (
        mode == "value_and_grad" and tangent_impl in ("vjp", "jvp2")
    )
    # Candidate index arrays exist only for orders >= 1 (order 0 has one
    # empty candidate and needs no indices).
    cand_orders = [o for o in group_orders if o >= 1 and groups[o].size]
    # Middle segments (order >= 2) take the pair-mask chunk-skip path;
    # the mask input is only plumbed when such segments exist.  The
    # chunk-occupancy words hold one bit per MID_CHUNK-wall chunk in an
    # int32, so past 32 chunks (W > 256 at chunk 8) the word scheme
    # cannot represent the loop -- such kernels fall back to the
    # list-based first/last loops + full-wall mid loop (the round-4
    # structure, valid at any W).
    has_mid = (
        dyn_lists
        and any(o >= 2 for o in cand_orders)
        and -(-W // MID_CHUNK) <= 32
    )

    def kernel(scal_ref, walls_ref, kind_ref, phi_ref, *rest):
        k = len(cand_orders)
        cand_ref_by_order = dict(zip(cand_orders, rest[:k]))
        img_ref_by_order = dict(zip(cand_orders, rest[k : 2 * k]))
        if cull:
            # Per-tile active-candidate lists (kept original indices
            # first) + counts, interleaved per order group; see
            # :func:`beam_keep_tables` for the exactness argument.
            pc = rest[2 * k : 4 * k]
            prm_ref_by_order = {
                o: pc[2 * i] for i, o in enumerate(cand_orders)
            }
            cnt_ref_by_order = {
                o: pc[2 * i + 1] for i, o in enumerate(cand_orders)
            }
            rest = rest[4 * k :]
        else:
            rest = rest[2 * k :]
        # Shadow-wall occluder data.  ALWAYS present: with shadow=False
        # run() feeds identity lists / all-ones words, so the two
        # kernels are the same program and the toggle is pure data --
        # compilers fold/contract loop bodies differently when an index
        # is a constant vs an SMEM read (observed 1-ulp LOS drift at
        # chunk=8), and bit-identity must not depend on that.
        # No-mid kernels (orders <= 1): first/last index lists + counts
        # and a per-tile LOS chunk word (see shadow_wall_lists).
        # Has-mid kernels (order >= 2): chunk-occupancy words for every
        # segment plus the per-pair mid masks (see shadow_chunk_words /
        # mid_pair_masks -- mixing fori lists and lax.cond chunks in
        # one body compiled ~65x slower on Mosaic).
        if has_mid:
            (l0w_ref, lastw_ref, losw_ref, middat_ref) = rest[:4]
            rest = rest[4:]
        else:
            (
                l0dat_ref, l0cnt_ref,
                lastdat_ref, lastcnt_ref,
                losdat_ref, loscnt_ref,
            ) = rest[:6]
            rest = rest[6:]
        aux_ref, px_ref, py_ref = rest[:3]
        out_refs = rest[3:]

        def cand_loop(order, count, carry, step):
            """``carry = step(c, carry)`` over this order group.

            With culling, the trip count is the tile's active-candidate
            count (an SMEM scalar) and ``c`` comes from the tile's
            permutation list; skipped candidates contribute exact
            zeros, so the accumulated carry is bit-identical to the
            full loop.  Without culling, the static blocked loop
            (``cand_block`` candidates per fori step).
            """
            if cull:
                prm = prm_ref_by_order[order]
                n_act = cnt_ref_by_order[order][0, 0, 0]
                B = max(1, cand_block)
                if B == 1:
                    def body(i, a):
                        return step(prm[0, 0, i], a)

                    return jax.lax.fori_loop(0, n_act, body, carry)

                # Blocked culled loop: B candidates per fori step for
                # cross-candidate ILP; past-count lanes compute a
                # (clamped-index) candidate and DISCARD it via where --
                # the old carry is selected bitwise, so the result is
                # exactly the 1-per-step loop's.
                def body_b(i, a):
                    for b_i in range(B):
                        k = i * B + b_i
                        idx_c = prm[
                            0, 0,
                            jnp.minimum(k, jnp.maximum(n_act - 1, 0)),
                        ]
                        a2 = step(idx_c, a)
                        keep_lane = k < n_act
                        a = jax.tree.map(
                            lambda old, new: jnp.where(
                                keep_lane, new, old
                            ),
                            a,
                            a2,
                        )
                    return a

                steps = jax.lax.div(
                    n_act + B - 1, jnp.int32(B)
                )
                return jax.lax.fori_loop(0, steps, body_b, carry)
            B = max(1, min(cand_block, count))
            nb = count // B

            def body(i, a):
                for b in range(B):
                    a = step(i * B + b, a)
                return a

            carry = jax.lax.fori_loop(0, nb, body, carry)
            for c in range(nb * B, count):
                carry = step(c, carry)
            return carry

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

        def read_wall(i):
            """Wall endpoint scalars from SMEM (traced index)."""
            base = i * 4
            return (
                walls_ref[base],
                walls_ref[base + 1],
                walls_ref[base + 2],
                walls_ref[base + 3],
            )

        # aux_ref layout: [unit normals 2W | patched endpoints 4W] --
        # both precomputed by XLA in run() so the kernel's candidate
        # loop carries no dependent scalar chains (normalize/rsqrt and
        # the TX mirror sweep were the scalar-unit bottleneck).
        def read_normal(i):
            return aux_ref[2 * i], aux_ref[2 * i + 1]

        def _read_patched(w):
            base = 2 * W + 4 * w
            return (
                aux_ref[base],
                aux_ref[base + 1],
                aux_ref[base + 2],
                aux_ref[base + 3],
            )

        if hoist_walls:
            # Read every patched wall endpoint ONCE per grid step, before
            # the candidate fori_loop, instead of 4W SMEM reads per
            # candidate iteration (they are loop-invariant; whether this
            # wins depends on Mosaic's own LICM and sreg pressure).
            _patched_all = [_read_patched(w) for w in range(W)]

            def read_patched(w):
                return _patched_all[w]

        else:
            read_patched = _read_patched

        def make_cand_contrib(order, cand_ref, img_ref, want_grad=False):
            """Build the per-candidate contribution for one order group.

            ``contrib(c, px, py)`` returns ``valid * power``; with
            ``want_grad=True`` it returns ``(valid*power, d/dpx, d/dpy)``
            with HAND-DERIVED pixel partials folded into the same sweep
            (rank-1 bounce Jacobians down the image recursion,
            argmin/argmax gradient selects matching XLA's balanced-eq
            min/max rule, FULL analytic spec-residual and per-segment
            length gradients -- kinds are runtime values here, and the
            image-method stationarity shortcuts break whenever a vertex
            precedes a wall/RIS bounce, so the general formulas always
            run; for unbroken chains the extra terms are the ~0
            stationary ones XLA's AD also computes).  One forward
            pipeline serves both modes, so value maps and
            value_and_grad maps cannot desync.  A single candidate's
            contribution is straight-line in ``px, py`` (no internal
            loops), which is also what lets the legacy ``tangent_impl``
            reverse/jvp schemes transpose without residual stacking.
            """

            def contrib(c, px, py):
                idx = [cand_ref[c * order + j] for j in range(order)]
                wall_vals = [read_wall(i) for i in idx]
                kinds = [kind_ref[i] for i in idx]
                normals = [read_normal(i) for i in idx]
                # Mirror-image chain of TX through the candidate's
                # walls: depends only on (TX, candidate), so it is
                # precomputed by XLA in run() and read from SMEM
                # (the dependent scalar sweep stalled the scalar
                # unit once per candidate per tile).
                images = [
                    (
                        img_ref[(c * order + j) * 2],
                        img_ref[(c * order + j) * 2 + 1],
                    )
                    for j in range(order)
                ]
                zeros = jnp.zeros_like(px)

                # Backward bounce recursion (vertex pinning); with
                # want_grad, rank-1 Jacobians ride along: the downstream
                # point q starts at the pixel (dq/dp = I); after a
                # bounce it is d_j (x) grad t_j (zero grad for a vertex:
                # the point is pinned).
                ptx, pty = px, py
                state_pixel = True  # trace-time: j == order-1 sees the pixel
                prev_d = None
                prev_gt = None
                bounce = [None] * order
                bdir = [None] * order
                bgrad = [None] * order
                for j in range(order - 1, -1, -1):
                    axw, ayw, bxw, byw = wall_vals[j]
                    nx, ny = normals[j]
                    imx, imy = images[j]
                    ux, uy = ptx - imx, pty - imy
                    un = ux * nx + uy * ny
                    vn = (axw - ptx) * nx + (ayw - pty) * ny
                    un_zero = un == 0.0
                    safe_un = jnp.where(un_zero, 1.0, un)
                    s = jnp.where(un_zero, 0.0, vn / safe_un)
                    bx_t = ptx + s * ux
                    by_t = pty + s * uy
                    is_vertex = kinds[j] == KIND_VERTEX
                    new_ptx = jnp.where(is_vertex, axw, bx_t)
                    new_pty = jnp.where(is_vertex, ayw, by_t)
                    if want_grad:
                        # dt_j/dq (see the unrolled twin for the
                        # derivation); at un == 0 the where-guard selects
                        # b = q, matching XLA's select gradient.
                        dxw, dyw = bxw - axw, byw - ayw
                        dd2 = dxw * dxw + dyw * dyw
                        dd2 = jnp.where(dd2 == 0.0, 1.0, dd2)
                        c_im = (axw - imx) * nx + (ayw - imy) * ny
                        f = jnp.where(un_zero, 0.0, c_im / safe_un)
                        g = jnp.where(
                            un_zero, 0.0, (ux * dxw + uy * dyw) / safe_un
                        )
                        vx = jnp.where(
                            un_zero, dxw / dd2, f * (dxw - g * nx) / dd2
                        )
                        vy = jnp.where(
                            un_zero, dyw / dd2, f * (dyw - g * ny) / dd2
                        )
                        if state_pixel:
                            gtx, gty = vx, vy
                        else:
                            k = vx * prev_d[0] + vy * prev_d[1]
                            gtx, gty = k * prev_gt[0], k * prev_gt[1]
                        gtx = jnp.where(is_vertex, 0.0, gtx)
                        gty = jnp.where(is_vertex, 0.0, gty)
                        state_pixel = False
                        prev_d = (dxw, dyw)
                        prev_gt = (gtx, gty)
                        bdir[j] = (dxw, dyw)
                        bgrad[j] = (gtx, gty)
                    ptx, pty = new_ptx, new_pty
                    bounce[j] = (ptx, pty)

                path_x = [jnp.full_like(px, txx)] + [b[0] for b in bounce] + [px]
                path_y = [jnp.full_like(py, txy)] + [b[1] for b in bounce] + [py]

                def contract(s, wx, wy):
                    """(w . d path_point[s]/dp); s is a static index."""
                    if s == 0:
                        return zeros, zeros  # TX: constant
                    if s == order + 1:
                        return wx, wy  # the pixel: identity
                    d_s = bdir[s - 1]
                    gt_s = bgrad[s - 1]
                    k = wx * d_s[0] + wy * d_s[1]
                    return k * gt_s[0], k * gt_s[1]

                # Residuals (kind-selected at runtime); with want_grad,
                # FULL analytic gradient per kind.
                loss = jnp.zeros_like(px)
                gloss_x, gloss_y = zeros, zeros
                for j in range(order):
                    nx, ny = normals[j]
                    axc, ayc = path_x[j], path_y[j]
                    bxc, byc = path_x[j + 1], path_y[j + 1]
                    cxc, cyc = path_x[j + 2], path_y[j + 2]
                    rx_, ry_ = _normalize(cxc - bxc, cyc - byc)
                    ivx, ivy = _normalize(bxc - axc, byc - ayc)
                    d = ivx * nx + ivy * ny
                    refx, refy = ivx - 2.0 * d * nx, ivy - 2.0 * d * ny
                    ex, ey = rx_ - refx, ry_ - refy
                    spec = ex * ex + ey * ey
                    sin_a = (-rx_) * ny - (-ry_) * nx
                    cos_a = (-rx_) * nx + (-ry_) * ny
                    sin_p = jnp.sin(phi_ref[idx[j]])
                    cos_p = jnp.cos(phi_ref[idx[j]])
                    ris = (sin_a - sin_p) ** 2 + (cos_a - cos_p) ** 2
                    res = jnp.where(kinds[j] == KIND_RIS, ris, spec)
                    res = jnp.where(kinds[j] == KIND_VERTEX, 0.0, res)
                    loss = loss + res
                    if not want_grad:
                        continue
                    # Normalize Jacobians: J = (I - uhat uhat^T)/|v| for
                    # the outgoing (rv, over vc = c-b) and incoming
                    # (iv, over vi = b-a) unit vectors.
                    vx_s, vy_s = cxc - bxc, cyc - byc
                    vn2 = vx_s * vx_s + vy_s * vy_s
                    v_zero = vn2 == 0.0
                    inv_vn = jnp.where(
                        v_zero, 0.0, 1.0 / jnp.sqrt(jnp.where(v_zero, 1.0, vn2))
                    )
                    vi_x, vi_y = bxc - axc, byc - ayc
                    vi2 = vi_x * vi_x + vi_y * vi_y
                    vi_zero = vi2 == 0.0
                    inv_vi = jnp.where(
                        vi_zero, 0.0, 1.0 / jnp.sqrt(jnp.where(vi_zero, 1.0, vi2))
                    )
                    is_ris = kinds[j] == KIND_RIS
                    # d term / d rhat: RIS angle chain or spec 2e.
                    r_wx = 2.0 * (sin_a - sin_p) * (-ny) + 2.0 * (cos_a - cos_p) * (-nx)
                    r_wy = 2.0 * (sin_a - sin_p) * nx + 2.0 * (cos_a - cos_p) * (-ny)
                    s_wx, s_wy = 2.0 * ex, 2.0 * ey
                    wx = jnp.where(is_ris, r_wx, s_wx)
                    wy = jnp.where(is_ris, r_wy, s_wy)
                    rw = rx_ * wx + ry_ * wy
                    qcx = (wx - rx_ * rw) * inv_vn
                    qcy = (wy - ry_ * rw) * inv_vn
                    # spec only: d term / d ivhat = -2e R (R = I - 2nn^T),
                    # pulled through the incoming normalize Jacobian.
                    ndw = nx * s_wx + ny * s_wy
                    mx = s_wx - 2.0 * nx * ndw
                    my = s_wy - 2.0 * ny * ndw
                    imw = ivx * mx + ivy * my
                    qax = jnp.where(is_ris, 0.0, (mx - ivx * imw) * inv_vi)
                    qay = jnp.where(is_ris, 0.0, (my - ivy * imw) * inv_vi)
                    # d term = qc.dc - (qc + qa).db + qa.da
                    cgx, cgy = contract(j + 2, qcx, qcy)
                    bgx, bgy = contract(j + 1, qcx + qax, qcy + qay)
                    agx, agy = contract(j, qax, qay)
                    tgx = cgx - bgx + agx
                    tgy = cgy - bgy + agy
                    is_vtx = kinds[j] == KIND_VERTEX
                    gloss_x = gloss_x + jnp.where(is_vtx, 0.0, tgx)
                    gloss_y = gloss_y + jnp.where(is_vtx, 0.0, tgy)

                # on_objects (running-min gradient with want_grad; the
                # soft VALUE path folds pre-activation margins into one
                # running min -- see _zmargin/_folded_valid -- so
                # on/loss cost ONE activation per candidate instead of
                # 2*order + 1).
                fold = bool(soft_mode) and not want_grad

                def _zm(x):
                    return _zmargin(x, alpha, sigmoid)

                if fold:
                    zon = jnp.full_like(px, jnp.inf)
                elif soft_mode:
                    on = jnp.ones_like(px)
                    gon_x, gon_y = zeros, zeros
                else:
                    on = jnp.ones_like(px, dtype=jnp.bool_)
                for j in range(order):
                    axw, ayw, bxw, byw = wall_vals[j]
                    dxw, dyw = bxw - axw, byw - ayw
                    sq = dxw * dxw + dyw * dyw
                    sq = jnp.where(sq == 0.0, 1.0, sq)
                    bxc, byc = path_x[j + 1], path_y[j + 1]
                    t = ((bxc - axw) * dxw + (byc - ayw) * dyw) / sq
                    is_vertex = kinds[j] == KIND_VERTEX
                    if fold:
                        zc = jnp.minimum(_zm(t), _zm(1.0 - t))
                        zon = jnp.minimum(
                            zon, jnp.where(is_vertex, jnp.inf, zc)
                        )
                    elif soft_mode:
                        c1 = _soft(t, alpha, sigmoid)
                        c2 = _soft(1.0 - t, alpha, sigmoid)
                        contains = jnp.minimum(c1, c2)
                        contains = jnp.where(is_vertex, 1.0, contains)
                        if want_grad:
                            # dt/dp IS the bounce's along-wall grad t_j.
                            gt_j = bgrad[j]
                            dc = _min_grad_sel(
                                c1,
                                c2,
                                _soft_grad(t, alpha, sigmoid),
                                -_soft_grad(1.0 - t, alpha, sigmoid),
                            )
                            dc = jnp.where(is_vertex, 0.0, dc)
                            gon_x = _min_grad_sel(
                                on, contains, gon_x, dc * gt_j[0]
                            )
                            gon_y = _min_grad_sel(
                                on, contains, gon_y, dc * gt_j[1]
                            )
                        on = jnp.minimum(on, contains)
                    else:
                        contains = (t >= 0.0) & (t <= 1.0)
                        contains = contains | is_vertex
                        on = on & contains

                # Blocked (running-max gradient with want_grad);
                # adjacency masked at runtime (masked hits carry zero
                # gradient, matching the XLA where-select).  With
                # ``shadow``, the first and last segments loop over the
                # precomputed occluder lists (per first-wall and per
                # (tile, last-wall)) instead of all W walls: walls off
                # the list have hit == 0 exactly wherever the bounce is
                # on its (band-dilated) wall, and pixels where it is not
                # have ``contains == 0`` saturated with exactly-zero
                # gradients, so (val, gx, gy) are bit-identical either
                # way (see run() for the geometric argument).
                if soft_mode and want_grad:
                    blk = jnp.zeros_like(px)
                    gblk_x, gblk_y = zeros, zeros
                else:
                    # Value path carries the pre-clamp margin max
                    # (_seg_intersect_m6); converted to blk after the
                    # segment loops.
                    blk = jnp.full_like(px, -jnp.inf)
                minus_one = jnp.int32(-1)
                seg_idx = [minus_one] + [i for i in idx] + [minus_one]

                def blocked_step(w, s, carry, valid=None):
                    """One wall's hit folded into the carry (traced w);
                    ``valid=False`` masks the fold to an exact-zero hit
                    (bitwise-neutral: zero hits with zero grads never
                    move the running max or its tie-split grads)."""
                    return _blocked_fold(
                        _read_patched(w), w, s, carry, valid
                    )

                def blocked_step_hoisted(w, s, carry):
                    """Static-index variant (hoisted wall reads)."""
                    return _blocked_fold(read_patched(w), w, s, carry)

                def _blocked_fold(wall_vals, w, s, carry, valid=None):
                    wa_x, wa_y, wb_x, wb_y = wall_vals
                    ignore = (seg_idx[s] == w) | (seg_idx[s + 1] == w)
                    if valid is not None:
                        ignore = ignore | jnp.logical_not(valid)
                    if soft_mode and want_grad:
                        b, gx_, gy_ = carry
                        hit, dhc, dhd = _seg_intersect_vag(
                            wa_x, wa_y, wb_x, wb_y,
                            path_x[s], path_y[s],
                            path_x[s + 1], path_y[s + 1],
                            soft_mode, alpha,
                        )
                        hit = jnp.where(ignore, 0.0, hit)
                        ghx0, ghy0 = contract(s, dhc[0], dhc[1])
                        ghx1, ghy1 = contract(s + 1, dhd[0], dhd[1])
                        ghx = jnp.where(ignore, 0.0, ghx0 + ghx1)
                        ghy = jnp.where(ignore, 0.0, ghy0 + ghy1)
                        gx_ = _max_grad_sel(b, hit, gx_, ghx)
                        gy_ = _max_grad_sel(b, hit, gy_, ghy)
                        return (jnp.maximum(b, hit), gx_, gy_)
                    b = carry[0]
                    # Value path: fold the pre-clamp margin (see
                    # _seg_intersect_m6); one relu6 per candidate
                    # converts the running max into blk.
                    m = _seg_intersect_m6(
                        wa_x, wa_y, wb_x, wb_y,
                        path_x[s], path_y[s],
                        path_x[s + 1], path_y[s + 1],
                        soft_mode, alpha,
                    )
                    m = jnp.where(ignore, -jnp.inf, m)
                    return (jnp.maximum(b, m),)

                carry = (
                    (blk, gblk_x, gblk_y)
                    if soft_mode and want_grad
                    else (blk,)
                )

                # First/last segments run a chunk-unrolled fori_loop
                # over the shadow occluder list (or 0..W-1 when lists
                # are off) -- the SAME loop structure either way (see
                # the unpack comment).  _SHADOW_CHUNK walls per step
                # keep near-static ILP; past-count lanes fold masked
                # exact zeros (bitwise-neutral).  The dynamic-trip fori
                # measured 25-32% faster than per-chunk lax.cond here.
                def listed_loop(s, n_w, get, carry):
                    CH = _SHADOW_CHUNK

                    def body(kk, a, _s=s, _g=get, _n=n_w):
                        for b_i in range(CH):
                            k2 = kk * CH + b_i
                            a = blocked_step(
                                _g(
                                    jnp.minimum(
                                        k2, jnp.maximum(_n - 1, 0)
                                    )
                                ),
                                _s,
                                a,
                                valid=k2 < _n,
                            )
                        return a

                    steps = (
                        (n_w + CH - 1) // CH
                        if isinstance(n_w, int)
                        else jax.lax.div(
                            n_w + CH - 1, jnp.int32(CH)
                        )
                    )
                    return jax.lax.fori_loop(0, steps, body, carry)

                # Middle segments (order >= 2) had NO occluder lists
                # before round 5 (a per-pair list table would need W^3
                # SMEM): they run MID_CHUNK-wall chunks with STATIC
                # wall indices, skipping chunks whose pair-mask
                # occupancy bit is clear via a scalar lax.cond
                # (bit-identical, see mid_pair_masks).
                def masked_chunks(word, s, carry):
                    for chunk in range(0, W, MID_CHUNK):
                        bit = (
                            jax.lax.shift_right_logical(
                                word, jnp.int32(chunk // MID_CHUNK)
                            )
                            & 1
                        )

                        def chunk_body(c, _c0=chunk, _s=s):
                            for b_i in range(MID_CHUNK):
                                w = _c0 + b_i
                                if w < W:
                                    c = blocked_step_hoisted(w, _s, c)
                            return c

                        carry = jax.lax.cond(
                            bit != 0, chunk_body, lambda c: c, carry
                        )
                    return carry

                for s in range(order + 1):
                    if dyn_lists and has_mid:
                        # All segments via cond chunks (see unpack).
                        if debug_skip_mid and 0 < s < order:
                            # Measurement-only build (WRONG results):
                            # drops the middle-segment blocked loop to
                            # expose its share of the map time.
                            continue
                        if s == 0:
                            word = l0w_ref[idx[0]]
                        elif s == order:
                            word = lastw_ref[0, 0, idx[order - 1]]
                        else:
                            word = middat_ref[idx[s - 1] * W + idx[s]]
                        carry = masked_chunks(word, s, carry)
                    elif dyn_lists and s == 0:
                        i0 = idx[0]
                        n_w = l0cnt_ref[i0]

                        def get0(kk, _i0=i0):
                            return l0dat_ref[_i0 * W + kk]

                        carry = listed_loop(s, n_w, get0, carry)
                    elif dyn_lists and s == order:
                        il = idx[order - 1]
                        n_w = lastcnt_ref[0, 0, il]

                        def getl(kk, _il=il):
                            return lastdat_ref[0, _il, kk]

                        carry = listed_loop(s, n_w, getl, carry)
                    else:
                        for w in range(W):
                            carry = blocked_step_hoisted(w, s, carry)
                if soft_mode and want_grad:
                    blk, gblk_x, gblk_y = carry
                elif fold:
                    (m6,) = carry
                else:
                    (m6,) = carry
                    blk = _blk_from_m6(m6, soft_mode)

                # Validity (arg-min gradient selection with want_grad;
                # folded VALUE path: one activation on the margin min
                # -- see _folded_valid).
                if fold:
                    valid = _folded_valid(
                        jnp.minimum(zon, _zm(tol - loss)), m6, sigmoid
                    )
                elif soft_mode:
                    loss_ok = _soft(tol - loss, alpha, sigmoid)
                    m1 = jnp.minimum(on, 1.0 - blk)
                    valid_pre = jnp.minimum(m1, loss_ok)
                    valid = jnp.nan_to_num(valid_pre)
                    if want_grad:
                        gm1_x = _min_grad_sel(on, 1.0 - blk, gon_x, -gblk_x)
                        gm1_y = _min_grad_sel(on, 1.0 - blk, gon_y, -gblk_y)
                        slo = -_soft_grad(tol - loss, alpha, sigmoid)
                        glo_x, glo_y = slo * gloss_x, slo * gloss_y
                        gvalid_x = _min_grad_sel(m1, loss_ok, gm1_x, glo_x)
                        gvalid_y = _min_grad_sel(m1, loss_ok, gm1_y, glo_y)
                        bad = jnp.isnan(valid_pre)
                        gvalid_x = jnp.where(bad, 0.0, gvalid_x)
                        gvalid_y = jnp.where(bad, 0.0, gvalid_y)
                else:
                    valid = on & (~blk) & (loss < tol)

                # Path length + power; with want_grad, FULL dr/dp (every
                # segment's unit vector contracted against both endpoint
                # Jacobians -- the unit(final segment) shortcut breaks
                # when a vertex precedes a wall/RIS bounce, and kinds are
                # runtime here).
                r = jnp.zeros_like(px)
                dr_x, dr_y = zeros, zeros
                for s in range(order + 1):
                    dx_ = path_x[s + 1] - path_x[s] + eps
                    dy_ = path_y[s + 1] - path_y[s] + eps
                    seg = _norm2(dx_, dy_)
                    r = r + seg
                    if want_grad:
                        safe_seg = jnp.where(seg == 0.0, 1.0, seg)
                        ux_ = jnp.where(seg == 0.0, 0.0, dx_ / safe_seg)
                        uy_ = jnp.where(seg == 0.0, 0.0, dy_ / safe_seg)
                        hgx, hgy = contract(s + 1, ux_, uy_)
                        lgx, lgy = contract(s, ux_, uy_)
                        dr_x = dr_x + hgx - lgx
                        dr_y = dr_y + hgy - lgy
                denom = height * height + r * r
                power = (r_coef**order) / denom

                val = valid * power
                if not want_grad:
                    return val
                dp_scale = -power * (2.0 * r / denom)
                dpow_x = dp_scale * dr_x
                dpow_y = dp_scale * dr_y
                if soft_mode:
                    gx = gvalid_x * power + valid * dpow_x
                    gy = gvalid_y * power + valid * dpow_y
                else:
                    vf = valid.astype(px.dtype)
                    gx = vf * dpow_x
                    gy = vf * dpow_y
                return val, gx, gy

            return contrib

        def los_contrib(px, py, want_grad=False):
            """LOS contribution (no bounce, direct blocked test); with
            ``want_grad``, analytic pixel partials: the blocked test's
            segment runs TX (constant) -> pixel (identity Jacobian), so
            only the d-endpoint partials of :func:`_seg_intersect_vag`
            contribute; the loss gate is a constant."""
            zeros = jnp.zeros_like(px)
            txx_t = jnp.full_like(px, txx)
            txy_t = jnp.full_like(py, txy)
            if soft_mode and want_grad:
                blk = jnp.zeros_like(px)
                gblk_x, gblk_y = zeros, zeros
            else:
                # Value path carries the pre-clamp margin max.
                blk = jnp.full_like(px, -jnp.inf)

            def los_fold(wall_vals, carry, valid=None):
                wa_x, wa_y, wb_x, wb_y = wall_vals
                if soft_mode and want_grad:
                    b, gx_, gy_ = carry
                    hit, _dhc, dhd = _seg_intersect_vag(
                        wa_x, wa_y, wb_x, wb_y,
                        txx_t, txy_t, px, py,
                        soft_mode, alpha,
                    )
                    ghx, ghy = dhd
                    if valid is not None:
                        # Masked chunk lanes fold exact zeros (bitwise-
                        # neutral in the running max and its tie grads).
                        hit = jnp.where(valid, hit, 0.0)
                        ghx = jnp.where(valid, ghx, 0.0)
                        ghy = jnp.where(valid, ghy, 0.0)
                    gx_ = _max_grad_sel(b, hit, gx_, ghx)
                    gy_ = _max_grad_sel(b, hit, gy_, ghy)
                    return (jnp.maximum(b, hit), gx_, gy_)
                b = carry[0]
                m = _seg_intersect_m6(
                    wa_x, wa_y, wb_x, wb_y,
                    txx_t, txy_t, px, py,
                    soft_mode, alpha,
                )
                if valid is not None:
                    m = jnp.where(valid, m, -jnp.inf)
                return (jnp.maximum(b, m),)

            carry = (
                (blk, gblk_x, gblk_y)
                if soft_mode and want_grad
                else (blk,)
            )
            # Per-tile LOS occluders: walls off the list / chunk mask
            # cannot intersect TX->pixel for any pixel in the tile
            # (their hit is exactly 0).  Has-mid kernels use the
            # chunk-occupancy word (lax.cond skips, consistent with
            # their all-cond segment loops); no-mid kernels keep the
            # fori list loop (same compiled structure as their
            # first/last loops, shadow toggle bit-identical).
            if dyn_lists and has_mid:
                word = losw_ref[0, 0, 0]
                for chunk in range(0, W, MID_CHUNK):
                    bit = (
                        jax.lax.shift_right_logical(
                            word, jnp.int32(chunk // MID_CHUNK)
                        )
                        & 1
                    )

                    def chunk_body(c, _c0=chunk):
                        for b_i in range(MID_CHUNK):
                            w = _c0 + b_i
                            if w < W:
                                c = los_fold(read_patched(w), c)
                        return c

                    carry = jax.lax.cond(
                        bit != 0, chunk_body, lambda c: c, carry
                    )
            elif dyn_lists:
                n_w = loscnt_ref[0, 0, 0]

                def los_get(kk):
                    return losdat_ref[0, 0, kk]

                CH = _SHADOW_CHUNK

                def body(kk, a, _n=n_w):
                    for b_i in range(CH):
                        k2 = kk * CH + b_i
                        a = los_fold(
                            _read_patched(
                                los_get(
                                    jnp.minimum(
                                        k2, jnp.maximum(_n - 1, 0)
                                    )
                                )
                            ),
                            a,
                            valid=k2 < _n,
                        )
                    return a

                steps = jax.lax.div(
                    n_w + CH - 1, jnp.int32(CH)
                )
                carry = jax.lax.fori_loop(0, steps, body, carry)
            else:
                for w in range(W):
                    carry = los_fold(read_patched(w), carry)
            fold = bool(soft_mode) and not want_grad
            if soft_mode and want_grad:
                blk, gblk_x, gblk_y = carry
            elif fold:
                (m6,) = carry
            else:
                (m6,) = carry
                blk = _blk_from_m6(m6, soft_mode)
            if fold:
                # Folded VALUE path (see _folded_valid): the loss gate
                # is the constant activation(tol).
                valid = _folded_valid(
                    _zmargin(tol, alpha, sigmoid), m6, sigmoid
                )
            elif soft_mode:
                loss_ok = _soft(tol, alpha, sigmoid)
                valid_pre = jnp.minimum(1.0 - blk, loss_ok)
                valid = jnp.nan_to_num(valid_pre)
                if want_grad:
                    gvalid_x = _min_grad_sel(1.0 - blk, loss_ok, -gblk_x, 0.0)
                    gvalid_y = _min_grad_sel(1.0 - blk, loss_ok, -gblk_y, 0.0)
                    bad = jnp.isnan(valid_pre)
                    gvalid_x = jnp.where(bad, 0.0, gvalid_x)
                    gvalid_y = jnp.where(bad, 0.0, gvalid_y)
            else:
                valid = ~blk
            dx_ = px - txx + eps
            dy_ = py - txy + eps
            r = _norm2(dx_, dy_)
            denom = height * height + r * r
            power = 1.0 / denom
            val = valid * power
            if not want_grad:
                return val
            safe_ln = jnp.where(r == 0.0, 1.0, r)
            dr_x = jnp.where(r == 0.0, 0.0, dx_ / safe_ln)
            dr_y = jnp.where(r == 0.0, 0.0, dy_ / safe_ln)
            dp_scale = -power * (2.0 * r / denom)
            dpow_x = dp_scale * dr_x
            dpow_y = dp_scale * dr_y
            if soft_mode:
                gx = gvalid_x * power + valid * dpow_x
                gy = gvalid_y * power + valid * dpow_y
            else:
                vf = valid.astype(px.dtype)
                gx = vf * dpow_x
                gy = vf * dpow_y
            return val, gx, gy

        contribs = {
            o: make_cand_contrib(o, cand_ref_by_order[o], img_ref_by_order[o])
            for o in cand_orders
        }

        def pixel_body(px, py):
            acc = jnp.zeros_like(px)
            for g, order in enumerate(group_orders):
                count = group_counts[g]
                if count == 0:
                    continue
                if order == 0:
                    acc = acc + los_contrib(px, py)
                else:
                    # Without culling, cand_loop processes ``cand_block``
                    # candidates per fori step: unrolling across
                    # candidates gives the scheduler independent
                    # scalar/vector chains to overlap (one candidate's
                    # SMEM reads hide under another's vector work).
                    # Accumulation order is unchanged either way.
                    acc = cand_loop(
                        order,
                        count,
                        acc,
                        lambda c, a, _f=contribs[order]: a + _f(c, px, py),
                    )
            return acc

        if with_grad and tangent_impl == "analytic":
            contribs_vag = {
                o: make_cand_contrib(
                    o, cand_ref_by_order[o], img_ref_by_order[o],
                    want_grad=True,
                )
                for o in cand_orders
            }

        def pixel_body_vag_analytic(px, py):
            """Value plus both pixel partials, hand-derived (default).

            The analytic sweep (``make_cand_contrib(want_grad=True)``) costs
            ~2x the forward stream with NO residual live-set and no AD
            program at all, so it runs inside the ``fori_loop`` body
            directly.
            """
            v = jnp.zeros_like(px)
            gx = jnp.zeros_like(px)
            gy = jnp.zeros_like(px)
            for g, order in enumerate(group_orders):
                count = group_counts[g]
                if count == 0:
                    continue
                if order == 0:
                    val, dx, dy = los_contrib(px, py, want_grad=True)
                    v, gx, gy = v + val, gx + dx, gy + dy
                else:

                    def step(c, carry, _f=contribs_vag[order]):
                        vv, ax, ay = carry
                        val, dx, dy = _f(c, px, py)
                        return (vv + val, ax + dx, ay + dy)

                    v, gx, gy = cand_loop(order, count, (v, gx, gy), step)
            return v, gx, gy

        def pixel_body_vag(px, py):
            """Value plus both pixel partials via per-candidate reverse.

            One reverse sweep per candidate (round-2 scheme, kept for
            A/B verification): ``jax.vjp`` of the straight-line
            contribution yields d/dx and d/dy together for ~one forward
            + one backward pass, where the double-jvp fallback pays
            (primal + tangent) twice.  Applying vjp *inside* the
            ``fori_loop`` body keeps the transposition loop-free --
            Mosaic cannot lower reverse mode over the loop itself (the
            residual-stacking scan fails to legalize with a foreach
            arity error; measured 2026-08).
            """
            ones = jnp.ones_like(px)
            v = jnp.zeros_like(px)
            gx = jnp.zeros_like(px)
            gy = jnp.zeros_like(px)
            for g, order in enumerate(group_orders):
                count = group_counts[g]
                if count == 0:
                    continue
                if order == 0:
                    val, pull = jax.vjp(los_contrib, px, py)
                    dx, dy = pull(ones)
                    v, gx, gy = v + val, gx + dx, gy + dy
                else:

                    def step(c, carry, _f=contribs[order]):
                        vv, ax, ay = carry
                        val, pull = jax.vjp(
                            lambda a, b: _f(c, a, b), px, py
                        )
                        dx, dy = pull(ones)
                        return (vv + val, ax + dx, ay + dy)

                    v, gx, gy = cand_loop(order, count, (v, gx, gy), step)
            return v, gx, gy

        if with_grad:
            val_ref, dx_ref, dy_ref = out_refs
            if tangent_impl == "analytic":
                val, dx, dy = pixel_body_vag_analytic(px, py)
            elif tangent_impl == "vjp":
                val, dx, dy = pixel_body_vag(px, py)
            else:
                # Double-jvp fallback (A/B verification): forward-mode
                # tangents traced through the fori_loops; pays
                # (primal + tangent) once per direction.
                ones = jnp.ones_like(px)
                zeros = jnp.zeros_like(px)
                val, dx = jax.jvp(pixel_body, (px, py), (ones, zeros))
                _, dy = jax.jvp(pixel_body, (px, py), (zeros, ones))
            val_ref[:] = val
            dx_ref[:] = dx
            dy_ref[:] = dy
        else:
            (out_ref,) = out_refs
            out_ref[:] = pixel_body(px, py)

    def run(
        pixels: jax.Array,
        tx: jax.Array,
        walls: jax.Array,
        kind: jax.Array,
        phi: jax.Array,
        scalars: jax.Array,
    ):
        P = pixels.shape[0]
        # Large blocks (block_rows x 128 pixels per grid step) amortize
        # the per-step scalar preamble (candidate/wall SMEM reads) over
        # more vector work than the minimal 8x128 tile.
        block = block_rows * LANES
        padded = -((-P) // block) * block
        px = pixels[:, 0]
        py = pixels[:, 1]
        if padded != P:
            px = jnp.concatenate([px, jnp.zeros(padded - P)], axis=0)
            py = jnp.concatenate([py, jnp.zeros(padded - P)], axis=0)
        rows = padded // LANES
        px = px.reshape(rows, LANES)
        py = py.reshape(rows, LANES)

        packed = jnp.concatenate([tx, scalars]).astype(jnp.float32)
        walls32 = walls.astype(jnp.float32)
        walls_flat = walls32.reshape(-1)
        cand_arrays = [
            jnp.asarray(groups[o].reshape(-1), dtype=jnp.int32)
            for o in cand_orders
        ]

        # Per-wall quantities hoisted out of the kernel (XLA computes
        # them once per call; the kernel reads SMEM scalars): unit
        # normals and patch-grown endpoints. Formulas match the former
        # in-kernel scalar versions op-for-op.
        a_pt = walls32[:, 0, :]
        b_pt = walls32[:, 1, :]
        t_vec = b_pt - a_pt
        n_raw = jnp.stack([t_vec[:, 1], -t_vec[:, 0]], axis=-1)
        n_len = jnp.sqrt(jnp.sum(n_raw * n_raw, axis=-1, keepdims=True))
        n_safe = jnp.where(n_len == 0.0, 1.0, n_len)
        normals32 = n_raw / n_safe  # [W, 2]
        patch_rt = scalars[2].astype(jnp.float32)
        patched = jnp.concatenate(
            [a_pt - patch_rt * t_vec, b_pt + patch_rt * t_vec], axis=-1
        )  # [W, 4]
        aux = jnp.concatenate([normals32.reshape(-1), patched.reshape(-1)])

        # Mirror-image chains of TX through each candidate's walls
        # (depend only on TX + candidate, not on pixels).
        tx32 = tx.astype(jnp.float32)
        img_arrays = []
        img_chains = {}
        for o in cand_orders:
            cand = jnp.asarray(groups[o], dtype=jnp.int32)  # [C, o]
            cur = jnp.broadcast_to(tx32, (cand.shape[0], 2))
            chain = []
            for j in range(o):
                wn = normals32[cand[:, j]]  # [C, 2]
                wa = walls32[cand[:, j], 0, :]
                d = jnp.sum((cur - wa) * wn, axis=-1, keepdims=True)
                cur = cur - 2.0 * d * wn
                chain.append(cur)
            img_stack = jnp.stack(chain, axis=1)  # [C, o, 2]
            img_arrays.append(img_stack.reshape(-1))
            img_chains[o] = img_stack

        cull_inputs = []
        cull_specs = []
        n_tiles = rows // block_rows
        pxt = px.reshape(n_tiles, -1)
        pyt = py.reshape(n_tiles, -1)
        if cull:
            # Tile-beam culling tables: per (pixel tile, order group), the
            # list of candidate indices whose contribution can be nonzero
            # anywhere in the tile (kept-first permutation + count).  The
            # kernel's candidate loop then trips count times instead of C.
            keep_by_order = beam_keep_tables(
                walls32,
                normals32,
                kind,
                groups,
                cand_orders,
                img_chains,
                pxt.min(axis=1), pxt.max(axis=1),
                pyt.min(axis=1), pyt.max(axis=1),
                approx=approx,
                alpha=scalars[0],
                tx=tx32,
                patch=scalars[2],
                # Occlusion proofs default OFF: measured on TPU v5e
                # (2026-08-19) the affine-arithmetic table sweep costs
                # more per map (~3 ms at city order-1) than the ~26%
                # extra candidate cull saves once shadow-wall lists cut
                # the per-candidate blocked work; opt in for A/B.
                occlusion=os.environ.get(
                    "DIFFERT2D_TPU_CULL_OCCLUSION", "0"
                ) == "1",
                refine=int(
                    os.environ.get(
                        "DIFFERT2D_TPU_CULL_REFINE",
                        # Round 4 measured refine=4 best for >1000
                        # cands; the round-5 mid-segment pair masks
                        # cheapened kept candidates, so finer tables
                        # pay again (cfg8: 261 ms at 16 vs 274 at 4,
                        # 263 at 8, TPU v5e 2026-08-20).
                        "16" if total_cands > 1000 else "8",
                    )
                ),
                sigmoid=sigmoid,
                tol=scalars[1],
            )
            for o in cand_orders:
                keep = keep_by_order[o]
                # 3-D [T, 1, C] so the BLOCKED trailing dims equal the
                # array's (Mosaic requires last-two block dims divisible
                # by (8, 128) or full); the grid axis is blocked by 1.
                prm = (
                    jnp.argsort(jnp.logical_not(keep), axis=1, stable=True)
                    .astype(jnp.int32)[:, None, :]
                )
                cnt = jnp.sum(keep, axis=1).astype(jnp.int32)[:, None, None]
                cull_inputs += [prm, cnt]
                C = int(groups[o].shape[0])
                cull_specs += [
                    pl.BlockSpec(
                        (1, 1, C),
                        lambda i: (i, 0, 0),
                        memory_space=pltpu.SMEM,
                    ),
                    pl.BlockSpec(
                        (1, 1, 1),
                        lambda i: (i, 0, 0),
                        memory_space=pltpu.SMEM,
                    ),
                ]

        # Shadow-wall occluder data (lists for no-mid kernels, chunk
        # words + pair masks for has-mid ones -- see the kernel's
        # unpack comment).  With shadow=False the lists are the
        # identity (count W) and the words all-ones -- the kernel
        # program is identical either way, so the toggle stays
        # bit-identical by construction.
        tile_bounds = (
            pxt.min(axis=1), pxt.max(axis=1),
            pyt.min(axis=1), pyt.max(axis=1),
        )
        if has_mid:
            if shadow:
                geo = _shadow_geometry(
                    walls32, kind, tx, scalars[2], scalars[0],
                    approx, sigmoid, scalars[1],
                )
                l0w, lastw, losw = shadow_chunk_words(
                    walls32, kind, tx, scalars[2], scalars[0], approx,
                    *tile_bounds, sigmoid=sigmoid, tol=scalars[1],
                    geo=geo,
                )
                middat = mid_pair_masks(
                    walls32, kind, tx, scalars[2], scalars[0],
                    approx, sigmoid=sigmoid, tol=scalars[1], geo=geo,
                )
            else:
                l0w = jnp.full((W,), -1, jnp.int32)
                lastw = jnp.full((n_tiles, 1, W), -1, jnp.int32)
                losw = jnp.full((n_tiles, 1, 1), -1, jnp.int32)
                middat = jnp.full((W * W,), -1, dtype=jnp.int32)
            shadow_inputs = [l0w, lastw, losw, middat]
        elif shadow:
            shadow_inputs = list(shadow_wall_lists(
                walls32, kind, tx, scalars[2], scalars[0], approx,
                *tile_bounds, sigmoid=sigmoid, tol=scalars[1],
            ))
        else:
            ident = jnp.broadcast_to(
                jnp.arange(W, dtype=jnp.int32), (W, W)
            )
            full_w = jnp.full((W,), W, jnp.int32)
            shadow_inputs = [
                ident.reshape(-1),
                full_w,
                jnp.broadcast_to(ident, (n_tiles, W, W)),
                jnp.broadcast_to(full_w[None, None, :], (n_tiles, 1, W)),
                jnp.broadcast_to(
                    jnp.arange(W, dtype=jnp.int32)[None, None, :],
                    (n_tiles, 1, W),
                ),
                jnp.full((n_tiles, 1, 1), W, jnp.int32),
            ]
        smem_all = pl.BlockSpec(memory_space=pltpu.SMEM)
        per_tile = lambda shape: pl.BlockSpec(  # noqa: E731
            shape, lambda i: (i, 0, 0), memory_space=pltpu.SMEM
        )
        if has_mid:
            shadow_specs = [
                smem_all,                # l0w [W]
                per_tile((1, 1, W)),     # lastw [T, 1, W]
                per_tile((1, 1, 1)),     # losw [T, 1, 1]
                smem_all,                # middat [W*W]
            ]
        else:
            shadow_specs = [
                smem_all,                # l0dat [W*W]
                smem_all,                # l0cnt [W]
                per_tile((1, W, W)),     # lastdat [T, W, W]
                per_tile((1, 1, W)),     # lastcnt [T, 1, W]
                per_tile((1, 1, W)),     # losdat [T, 1, W]
                per_tile((1, 1, 1)),     # loscnt [T, 1, 1]
            ]

        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        tile_spec = pl.BlockSpec(
            (block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            kernel,
            grid=(rows // block_rows,),
            in_specs=[smem, smem, smem, smem]
            + [smem] * (2 * len(cand_arrays))
            + cull_specs
            + shadow_specs
            + [smem]
            + [tile_spec, tile_spec],
            out_specs=_out_specs(with_grad, block_rows),
            out_shape=_out_shape(rows, with_grad),
            interpret=interpret,
        )(
            packed,
            walls_flat,
            kind.astype(jnp.int32),
            phi.astype(jnp.float32),
            *cand_arrays,
            *img_arrays,
            *cull_inputs,
            *shadow_inputs,
            aux,
            px,
            py,
        )
        return _slice_outputs(out, padded, P, with_grad)

    return run


def _differentiable_run(
    pallas_primal,
    kinds_np: np.ndarray,
    groups: dict[int, np.ndarray],
    *,
    n_tx: int,
    approx: bool,
    sigmoid: bool,
):
    """Make the fused kernel differentiable via :func:`jax.custom_vjp`.

    Forward pass: the Pallas kernel. Backward pass: the VJP of the XLA
    tracer's numerically-identical pipeline, rebuilt from the same runtime
    inputs -- so gradients w.r.t. pixels, TX positions, wall coordinates,
    RIS phases and the runtime scalars flow exactly as on the XLA path.
    ``kind`` is an integer input and is treated as constant (its cotangent
    is symbolically zero).
    """
    from functools import partial as _partial

    from .. import tracer as _tracer_mod
    from ..logic import hard_sigmoid as _hard_sigmoid, sigmoid as _sigmoid_fn

    function = _sigmoid_fn if sigmoid else _hard_sigmoid
    group_keys = {o: None for o in groups}

    def xla_equiv(pixels, txs, walls, phi, scalars):
        arrays = _tracer_mod.SceneArrays(
            walls=walls, kind=jnp.asarray(kinds_np), phi=phi
        )
        power_fun = _partial(
            _tracer_mod._received_power_batched,
            r_coef=scalars[3],
            height=scalars[4],
        )

        def per_pixel(tx, pixel):
            return _tracer_mod._accumulate_pixel(
                tx,
                pixel,
                arrays,
                groups,
                group_keys,
                solver="image",
                approx=approx,
                alpha=scalars[0],
                function=function,
                tol=scalars[1],
                patch=scalars[2],
                steps=100,
                many=1,
                power_fun=power_fun,
            )

        vf = jax.vmap(per_pixel, in_axes=(None, 0))
        out = None
        for t in range(n_tx):
            z = vf(txs[t], pixels)
            out = z if out is None else out + z
        return out

    @jax.custom_vjp
    def fused(pixels, txs, walls, phi, scalars):
        return _primal(pixels, txs, walls, phi, scalars)

    def _primal(pixels, txs, walls, phi, scalars):
        return pallas_primal(
            pixels, txs, walls, jnp.asarray(kinds_np), phi, scalars
        )

    def fwd(pixels, txs, walls, phi, scalars):
        out = _primal(pixels, txs, walls, phi, scalars)
        return out, (pixels, txs, walls, phi, scalars)

    def bwd(residuals, g):
        _, vjp_fn = jax.vjp(xla_equiv, *residuals)
        return vjp_fn(g)

    fused.defvjp(fwd, bwd)

    def run(pixels, txs, walls, kind, phi, scalars):
        del kind  # baked into the closure (integer, non-differentiable)
        return fused(pixels, txs, walls, phi, scalars)

    return run


import collections

_KERNEL_CACHE: "collections.OrderedDict" = collections.OrderedDict()
_KERNEL_CACHE_MAX = 64

_ENTRY_CACHE: "collections.OrderedDict" = collections.OrderedDict()


def _get_entry(run, grad, value_and_grad, scalars_tuple):
    """Cached jitted ``(X, Y, tx_xys, walls, kind, phi) -> map`` entry.

    Wraps a :func:`get_fused_run` callable so that pixel stacking, TX
    stacking, the scalars constant and the output reshapes all happen
    inside ONE jitted dispatch.  Repeat ``power_map`` calls otherwise
    pay ~8 small eager ops of tunnel latency each (~2-3 ms/call on the
    remote-TPU link -- dominant at small grids; measured round 2).

    Keyed by ``id(run)`` with the run object held strongly in the value
    (ids are only unique while the object is alive) plus the scalar
    config baked into the trace.
    """
    key = (id(run), bool(grad), bool(value_and_grad), scalars_tuple)
    hit = _ENTRY_CACHE.get(key)
    if hit is not None and hit[0] is run:
        _ENTRY_CACHE.move_to_end(key)
        return hit[1]
    scal = np.asarray(scalars_tuple, dtype=np.float32)
    want_grad = grad or value_and_grad
    pixel_block = getattr(run, "_pixel_block", None)

    @jax.jit
    def entry(X, Y, tx_xys, walls, kind, phi):
        # Culled kernels: lay pixels out so each kernel tile covers a
        # spatially-square block instead of a full-width row strip (a
        # strip intersects most candidate beams; a square block few).
        # Pure relayout via reshape+transpose (NOT a gather: the gather
        # form cost ~0.7 ms/map at 256x256 on the tunnel-attached v5e,
        # half the map time) -- every pixel's value is bit-identical.
        blocked = (
            pixel_block is not None
            and X.ndim == 2
            and X.shape[0] % pixel_block[0] == 0
            and X.shape[1] % pixel_block[1] == 0
            and X.shape[0] >= pixel_block[0]
            and X.shape[1] >= pixel_block[1]
        )

        def to_blocks(A):
            bh, bw = pixel_block
            m, n = A.shape[:2]
            rest = A.shape[2:]
            return (
                A.reshape(m // bh, bh, n // bw, bw, *rest)
                .transpose(0, 2, 1, 3, *range(4, 4 + len(rest)))
                .reshape(m * n, *rest)
            )

        def from_blocks(flat, rest=()):
            bh, bw = pixel_block
            m, n = X.shape
            return (
                flat.reshape(m // bh, n // bw, bh, bw, *rest)
                .transpose(0, 2, 1, 3, *range(4, 4 + len(rest)))
                .reshape(m, n, *rest)
            )

        if blocked:
            pixels = jnp.stack(
                [to_blocks(X), to_blocks(Y)], axis=-1
            )
        else:
            pixels = jnp.stack([X.ravel(), Y.ravel()], axis=-1)
        txs = jnp.stack(tx_xys)
        out = run(pixels, txs, walls, kind, phi, jnp.asarray(scal))
        if want_grad:
            val, dval = out
            if blocked:
                return (
                    (from_blocks(val), from_blocks(dval, (2,)))
                    if value_and_grad
                    else from_blocks(dval, (2,))
                )
            val = val.reshape(X.shape)
            dval = dval.reshape(*X.shape, 2)
            return (val, dval) if value_and_grad else dval
        if blocked:
            return from_blocks(out)
        return out.reshape(X.shape)

    _ENTRY_CACHE[key] = (run, entry)
    while len(_ENTRY_CACHE) > _KERNEL_CACHE_MAX:
        _ENTRY_CACHE.popitem(last=False)
    return entry


def pallas_power_map(
    scene,
    X: jax.Array,
    Y: jax.Array,
    *,
    min_order: int = 0,
    max_order: int = 1,
    order: Optional[int] = None,
    approx: Optional[bool] = None,
    alpha: float = 100.0,
    sigmoid: bool = False,
    tol: float = 1e-2,
    patch: float = 0.0,
    r_coef: float = 0.5,
    height: float = 0.1,
    filter_objects=None,
    solver: str = "image",
    steps: int = 100,
    key: Optional[jax.Array] = None,
    interpret: bool = False,
    grad: bool = False,
    value_and_grad: bool = False,
) -> jax.Array:
    """Power map through the fused Pallas kernels.

    Drop-in for :func:`differt2d_tpu.tracer.power_map`: ``solver="image"``
    uses the unrolled/looped image kernels (any orders); ``"fermat"`` /
    ``"mpt"`` use the in-kernel adam solver
    (:mod:`differt2d_tpu.ops.pallas_solver`, order-1 candidates only,
    ``key`` required for the init draw).

    ``grad`` / ``value_and_grad`` (image solver only) return the pixel
    gradient ``[m, n, 2]`` (or the ``(value, grad)`` pair) computed by
    fused in-kernel forward-mode tangents.
    """
    from ..logic import ENABLE_APPROX
    from ..rt import path_candidate_matrices
    from ..tracer import scene_arrays

    if approx is None:
        approx = ENABLE_APPROX

    # These five scalars are baked into the trace and hashed as a cache
    # key, so they must be concrete host scalars (a 0-d concrete array is
    # coerced; a tracer gets a clear error instead of an unhashable-type
    # crash -- differentiating w.r.t. them requires backend='xla'/'auto').
    try:
        alpha = float(alpha)
        tol = float(tol)
        patch = float(patch)
        r_coef = float(r_coef)
        height = float(height)
    except (TypeError, ValueError) as exc:
        msg = (
            "backend='pallas' requires concrete scalar alpha/tol/patch/"
            "r_coef/height (they are baked into the kernel); to trace or"
            " differentiate w.r.t. them use backend='xla'"
        )
        raise ValueError(msg) from exc

    if jax.config.jax_enable_x64:
        msg = (
            "the fused Pallas kernels are float32-only (TPU VPU-native);"
            " disable jax_enable_x64 or use backend='xla'"
        )
        raise ValueError(msg)
    arrays = scene_arrays(scene)
    if arrays is None:
        msg = "pallas_power_map requires Wall/RIS/Vertex objects only"
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

    if solver in ("fermat", "mpt"):
        # Vertex-only candidates pin every bounce point and carry zero
        # interaction residual (reference ``geometry.py:353-431``), so
        # Fermat/MPT reduce exactly to the image kernels' KIND_VERTEX
        # path -- no in-kernel optimizer, no key needed.
        kinds_flat = np.asarray(arrays.kind)
        cand_idx = [g.reshape(-1) for g in groups.values() if g.size]
        if not cand_idx or all(
            np.all(kinds_flat[idx] == KIND_VERTEX) for idx in cand_idx
        ):
            solver = "image"

    want_grad = grad or value_and_grad
    if want_grad and solver != "image":
        msg = (
            "in-kernel gradient maps support the image solver only;"
            " use backend='xla' for Fermat/MPT gradients"
        )
        raise ValueError(msg)

    if solver in ("fermat", "mpt"):
        pixels = jnp.stack([X.ravel(), Y.ravel()], axis=-1)
        scalars = jnp.array(
            [alpha, tol, patch, r_coef, height], dtype=jnp.float32
        )
        txs = jnp.stack([tx.xy for tx in scene.transmitters.values()])
        return _opt_solver_map(
            scene, arrays, groups, pixels, txs, scalars,
            solver=solver, steps=steps, key=key,
            approx=approx, sigmoid=sigmoid, interpret=interpret,
        ).reshape(X.shape)
    if solver != "image":
        msg = f"unknown solver {solver!r}"
        raise ValueError(msg)

    run = get_fused_run(
        arrays,
        groups,
        n_tx=len(scene.transmitters),
        approx=approx,
        sigmoid=sigmoid,
        interpret=interpret,
        mode="value_and_grad" if want_grad else "value",
        alpha_hint=alpha,
    )
    entry = _get_entry(
        run, grad, value_and_grad, (alpha, tol, patch, r_coef, height)
    )
    tx_xys = tuple(tx.xy for tx in scene.transmitters.values())
    out = entry(X, Y, tx_xys, arrays.walls, arrays.kind, arrays.phi)
    if run._culled and os.environ.get("DIFFERT2D_TPU_CULL_CHECK") == "1":
        # Runtime canary (debug mode): recompute the map UNCULLED and
        # fail loudly unless every output bit matches -- the empirical
        # guard behind the interval pads (_CULL_PAD_ABS/REL).  Costs a
        # full second map per call; enable in tests / one bench run.
        overrides = {
            "DIFFERT2D_TPU_CULL": "0",
            "DIFFERT2D_TPU_SHADOW": "0",
            # Same kernel FAMILY as the culled run: with CULL=0 the
            # order>=2 crossover would fall back to the unrolled
            # kernel, whose blocked-test numerics differ by design
            # (flip-rate contract) -- the canary must compare
            # looped-vs-looped.
            "DIFFERT2D_TPU_FORCE_LOOPED": "1",
        }
        prev = {k: os.environ.get(k) for k in overrides}
        os.environ.update(overrides)
        try:
            run_ref = get_fused_run(
                arrays,
                groups,
                n_tx=len(scene.transmitters),
                approx=approx,
                sigmoid=sigmoid,
                interpret=interpret,
                mode="value_and_grad" if want_grad else "value",
                alpha_hint=alpha,
            )
        finally:
            for k, v in prev.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        entry_ref = _get_entry(
            run_ref, grad, value_and_grad,
            (alpha, tol, patch, r_coef, height),
        )
        ref = entry_ref(X, Y, tx_xys, arrays.walls, arrays.kind, arrays.phi)
        got_l = out if isinstance(out, tuple) else (out,)
        ref_l = ref if isinstance(ref, tuple) else (ref,)
        for g, r in zip(got_l, ref_l):
            if not np.array_equal(np.asarray(g), np.asarray(r)):
                n_bad = int(np.sum(np.asarray(g) != np.asarray(r)))
                msg = (
                    "DIFFERT2D_TPU_CULL_CHECK: culled map differs from"
                    f" unculled at {n_bad} elements -- the culling pad"
                    " is unsound for this geometry; report with the"
                    " scene and disable via DIFFERT2D_TPU_CULL=0"
                )
                raise RuntimeError(msg)
    return out


def _opt_solver_map(
    scene, arrays, groups, pixels, txs, scalars,
    *, solver, steps, key, approx, sigmoid, interpret,
):
    """Order-1 Fermat/MPT map via the in-kernel adam solver.

    An order-0 (LOS) group, if present, is solver-independent and is
    accumulated through the image kernel; orders >= 2 are not supported
    by the in-kernel solver.
    """
    from .pallas_solver import build_opt_order1_kernel

    if not set(groups) <= {0, 1}:
        msg = (
            "the Pallas opt-solver kernel supports order<=1 candidates,"
            f" got orders {sorted(groups)}; use backend='xla'"
        )
        raise ValueError(msg)
    los = jnp.zeros(pixels.shape[0])
    if 0 in groups and groups[0].shape[0]:
        los_run = get_fused_run(
            arrays,
            {0: groups[0]},
            n_tx=int(txs.shape[0]),
            approx=approx,
            sigmoid=sigmoid,
            interpret=interpret,
        )
        los = los_run(
            pixels, txs, arrays.walls, arrays.kind, arrays.phi, scalars
        )
    if 1 not in groups or groups[1].shape[0] == 0:
        return los
    if key is None:
        msg = f"solver {solver!r} requires a PRNG key"
        raise ValueError(msg)
    cands = groups[1]
    kinds_np = np.asarray(arrays.kind)
    if np.any(kinds_np[cands[:, 0]] == KIND_VERTEX):
        msg = "vertex candidates are handled by the XLA path"
        raise ValueError(msg)

    # PRNG parity with the XLA tracer (reference scene.py:1887-1890):
    # one key per candidate in global (order-major) enumeration order --
    # order-0 candidates consume keys before the order-1 group.
    total = sum(int(g.shape[0]) for g in groups.values())
    offset = int(groups[0].shape[0]) if 0 in groups else 0
    keys = jax.random.split(key, total)[offset : offset + cands.shape[0]]
    x0 = jax.vmap(lambda k: jax.random.uniform(k, shape=(1,))[0])(keys)

    cache_key = (
        "opt1",
        np.asarray(arrays.walls).tobytes(),
        kinds_np.tobytes(),
        cands.tobytes(),
        cands.shape,
        solver,
        steps,
        approx,
        sigmoid,
        interpret,
        int(txs.shape[0]),
    )
    run = _KERNEL_CACHE.get(cache_key)
    if run is not None:
        _KERNEL_CACHE.move_to_end(cache_key)
    if run is None:
        kernel = build_opt_order1_kernel(
            np.asarray(arrays.walls),
            kinds_np,
            cands,
            objective=solver,
            approx=approx,
            sigmoid=sigmoid,
            steps=steps,
            interpret=interpret,
        )
        n_tx = int(txs.shape[0])

        def run(pixels, txs, phi, x0, scalars):
            out = None
            for t in range(n_tx):
                z = kernel(pixels, txs[t], phi, x0, scalars)
                out = z if out is None else out + z
            return out

        run = jax.jit(run)
        _KERNEL_CACHE[cache_key] = run
        while len(_KERNEL_CACHE) > _KERNEL_CACHE_MAX:
            _KERNEL_CACHE.popitem(last=False)
    return los + run(pixels, txs, arrays.phi, x0, scalars)


def get_fused_run(
    arrays, groups, *, n_tx, approx, sigmoid, interpret, mode="value",
    alpha_hint=None,
):
    """Cached differentiable kernel entry.

    Picks the fully-unrolled kernel (walls baked as immediates) below the
    ~16-candidate scheduler crossover and the fori_loop kernel above it,
    wraps the result in the custom_vjp adapter, jits the per-TX loop into
    one dispatch, and caches by kernel structure (bounded LRU).

    ``alpha_hint``: the concrete runtime ``alpha`` when the caller knows
    it (:func:`pallas_power_map` always does) -- used only to gate the
    cull/shadow STRUCTURE on sigmoid maps, where the saturation band
    ``z0/alpha`` can dwarf the scene and turn the whole machinery into
    pure overhead (measured: basic_scene 256x256 order<=2 sigmoid at
    alpha=100 runs 131.9M pts/s with cull+shadow off vs 88-105M with
    them on across every tile size, 2026-08-20).  The kernels themselves
    stay alpha-generic.

    Signature of the returned callable:
    ``run(pixels[P, 2], txs[n_tx, 2], walls[W, 2, 2], kind[W], phi[W],
    scalars[5]) -> [P]``.
    """
    walls_np = np.asarray(arrays.walls)
    kinds_np = np.asarray(arrays.kind)
    with_grad = mode == "value_and_grad"
    total_candidates = sum(int(g.shape[0]) for g in groups.values())
    # Small/medium candidate sets: fully-unrolled kernel with walls baked
    # in as immediates (fastest: measured 27% over looped at 51 candidates
    # and 22% at 302, bit-identical outputs).  The cost is Mosaic compile
    # time, which scales with the instruction stream ~= sum over candidate
    # groups of count x walls x segments (the blocked test dominates):
    # ~1000 units -> ~15 s, ~8500 -> ~3 min (measured, TPU v5e remote
    # compile).  Dispatch by that proxy so basic scenes stay unrolled
    # through order 2 while city-scale scenes (122 cands x 120 walls)
    # take the fori_loop kernel, whose program size is O(walls), not
    # O(candidates).  Compiled kernels are LRU-cached per scene geometry.
    # value_and_grad unrolled folds HAND-DERIVED analytic pixel partials
    # into the forward sweep (make_contrib(want_grad=True)): no jax.vjp reverse
    # program, no residual live-set. (History: whole-body jvp tripled
    # the stream and blew Mosaic compiles past 9 min at 8 candidates;
    # per-candidate jax.vjp reverse was the round-2 scheme at ~3x the
    # stream. The analytic sweep is ~2x the forward stream, but the 400
    # threshold below is the conservative round-2 value pending TPU
    # re-measurement.)
    n_walls = int(walls_np.shape[0])
    stream_proxy = sum(
        int(g.shape[0]) * n_walls * (o + 1) for o, g in groups.items()
    )
    # Sigmoid band gate: sigmoid only saturates to exact zeros at
    # |z| >= ~90 (vs 3 for hard_sigmoid), so its cull/shadow dilations
    # span z0/alpha scene units.  When that band rivals the scene
    # diameter the beams cover everything, nothing is pruned, and the
    # per-tile machinery is pure overhead; worse, the order>=2
    # crossover would route a small scene to the looped kernel for
    # culling that cannot prune.  Measured (basic_scene 256x256
    # order<=2 sigmoid, alpha=100, 2026-08-20): unrolled 131.9M pts/s
    # vs looped 81-105M across every tile size / cull setting.  Gated
    # on a CONCRETE alpha only (pallas_power_map always passes one);
    # with no hint the machinery is kept (tables adapt at runtime).
    band_wide = False
    if alpha_hint is not None and approx and sigmoid:
        w_lo = walls_np.reshape(-1, 2).min(axis=0)
        w_hi = walls_np.reshape(-1, 2).max(axis=0)
        scene_diag = float(np.sqrt(np.sum((w_hi - w_lo) ** 2))) or 1.0
        band = _SIGMOID_Z0 / max(float(alpha_hint), 1e-6)
        band_wide = band >= 0.25 * scene_diag
    if interpret:
        # Interpreter mode (CPU): under jit, the interpreted kernel
        # becomes one giant XLA:CPU program, whose compile time is
        # pathological for the unrolled stream past ~16 candidates and
        # for ANY unrolled reverse sweep (>16 min at 8 candidates,
        # measured) -- keep the small-program looped kernel there (it
        # matched the unrolled one bit-for-bit on TPU).
        use_looped = total_candidates > 16 or with_grad
    else:
        # Proxy decides: a few-candidate set over MANY walls (e.g. a
        # filtered city scene) still unrolls a huge blocked-test stream,
        # so candidate count must not override the compile-time bound.
        # (History: round 4 routed small order>=2 scenes to the
        # culled+shadow looped kernel -- it beat the then-unrolled one
        # 1.34-1.53x.  The round-5 activation fold made the unrolled
        # kernel transcendental-light and it now wins every small-scene
        # mode: basic_scene order<=2 at 256x256, measured 2026-08-20,
        # unrolled 131-135M pts/s vs looped 81-116M across hard /
        # sigmoid a=100 / sigmoid a=1000, so the crossover is gone and
        # the compile-time stream bound is again the only router.)
        use_looped = stream_proxy > (400 if with_grad else 1200)
        if os.environ.get("DIFFERT2D_TPU_FORCE_LOOPED") == "1":
            # Pin the kernel FAMILY while toggling cull/shadow: both
            # families use the m6 blocked form now, but compilers
            # contract floats differently in fori bodies than in the
            # unrolled kernel's straight-line code, so cross-family
            # comparisons are still not bit-identical (the canary and
            # A/B harnesses need same-family references).
            use_looped = True
    # Tile-beam candidate culling (bit-identical skipping of candidates
    # whose contribution is exactly zero everywhere in a pixel tile) is
    # sound exactly when zero contributions ARE exact: hard logic, or
    # soft logic with the saturating hard_sigmoid (the default).  Plain
    # sigmoid saturates via f32 underflow/round-to-one at the measured
    # _SIGMOID_Z0/_SIGMOID_Z1 thresholds, so sigmoid maps cull too --
    # with ~30x wider beams (band z0/alpha).
    # All-Vertex candidate sets (e.g. vertex-diffraction maps) have no
    # cullable bounce at all -- the machinery (8-row tiles, dynamic trip
    # counts, pixel permutation) would be pure overhead (measured ~25%
    # on the cfg4 street scene), so they stay on the static loop.
    # DIFFERT2D_TPU_CULL=0 opts out (A/B and debugging).
    any_cullable = any(
        o >= 1
        and g.size
        and bool(np.any(kinds_np[np.asarray(g)] != KIND_VERTEX))
        for o, g in groups.items()
    )
    sig_ok = not (approx and sigmoid) or _sigmoid_saturates()
    cull = (
        use_looped
        and any_cullable
        and sig_ok
        and os.environ.get("DIFFERT2D_TPU_CULL", "1") != "0"
    )
    # Shadow-wall occluder lists share culling's exactness premise
    # (saturated zeros) and its gates; DIFFERT2D_TPU_SHADOW=0 opts out
    # for A/B.  Unlike candidate culling they also pay off for LOS-heavy
    # maps, but they ride the looped kernel's SMEM plumbing, so the
    # unrolled kernel stays list-free.
    shadow = (
        use_looped
        and sig_ok
        and os.environ.get("DIFFERT2D_TPU_SHADOW", "1") != "0"
    )
    if band_wide:
        # (see the band_wide derivation above the crossover)
        cull = False
        shadow = False
    group_key = tuple(
        (o, g.tobytes(), g.shape) for o, g in sorted(groups.items())
    )
    if use_looped:
        cache_key = (
            "looped",
            int(walls_np.shape[0]),
            group_key,
            approx,
            sigmoid,
            interpret,
            cull,
            shadow,
            # Build-time env knobs: baked into the trace, so they must
            # key the cache or an in-process A/B toggle would silently
            # reuse the stale kernel.
            os.environ.get("DIFFERT2D_TPU_CULL_OCCLUSION", "0"),
            os.environ.get("DIFFERT2D_TPU_CULL_REFINE", ""),
            os.environ.get("DIFFERT2D_TPU_CULL_OCCL_REFINE", ""),
            os.environ.get("DIFFERT2D_TPU_CAND_BLOCK", ""),
            os.environ.get("DIFFERT2D_TPU_BLOCK_ROWS", ""),
            os.environ.get("DIFFERT2D_TPU_SHADOW_CHUNK", ""),
            os.environ.get("DIFFERT2D_TPU_DEBUG_SKIP_MID", ""),
        )
    else:
        cache_key = (
            "unrolled",
            walls_np.tobytes(),
            kinds_np.tobytes(),
            group_key,
            approx,
            sigmoid,
            interpret,
        )
    cache_key = (*cache_key, n_tx, mode)
    run = _KERNEL_CACHE.get(cache_key)
    if run is not None:
        _KERNEL_CACHE.move_to_end(cache_key)
        return run

    if use_looped:
        looped_rows = int(
            os.environ.get(
                "DIFFERT2D_TPU_BLOCK_ROWS",
                ("8" if total_candidates > 1000 else "16")
                if (cull or shadow)
                else "32",
            )
        )
        looped = build_power_map_kernel_looped(
            int(walls_np.shape[0]),
            groups,
            approx=approx,
            sigmoid=sigmoid,
            interpret=interpret,
            mode=mode,
            # Wide scenes: read the patched wall endpoints once per grid
            # step instead of per candidate iteration (bit-identical,
            # +3.6% at 120 walls; at small W Mosaic's own LICM covers it).
            hoist_walls=int(walls_np.shape[0]) >= 32,
            cull=cull,
            shadow=shadow,
            # Culled runs want SMALL tiles: the per-tile active-candidate
            # count shrinks with tile area (city extract: 46% of
            # candidates kept at 64x64-pixel tiles vs 27% at 32x32), and
            # the measured optimum is the minimal 8-row tile (6.5 vs
            # 9.5 ms/map at 256x256, 2026-08-19).  Unculled runs keep the
            # 32-row tile that amortizes the scalar preamble.
            # Tile-size / refine optimum flips with candidate count
            # (measured TPU v5e, city extract 256x256, 2026-08-19):
            # order-1 (137 cands) runs fastest at 16-row tiles with
            # refine=8 tables (3.64 vs 4.52 ms/map); order-2 (18K cands)
            # at 8-row tiles with refine=4 (323 vs 397 ms/map) -- small
            # tiles buy tighter per-tile candidate culling exactly when
            # there are many candidates to cull.
            block_rows=looped_rows,
            # Candidates per culled-loop fori step (cross-candidate
            # ILP; bit-identical masked tail).
            cand_block=int(
                os.environ.get("DIFFERT2D_TPU_CAND_BLOCK", "1")
            ),
            # Measurement-only knob (WRONG results when set): exposes
            # the middle-segment blocked loop's share of the map time.
            debug_skip_mid=os.environ.get(
                "DIFFERT2D_TPU_DEBUG_SKIP_MID"
            ) == "1",
        )

        def run(pixels, txs, walls, kind, phi, scalars):
            out = None
            for t in range(n_tx):
                z = looped(pixels, txs[t], walls, kind, phi, scalars)
                out = z if out is None else jax.tree.map(jnp.add, out, z)
            return out

    else:
        kernel = build_power_map_kernel(
            walls_np,
            kinds_np,
            groups,
            approx=approx,
            sigmoid=sigmoid,
            interpret=interpret,
            mode=mode,
            # Small candidate sets leave VMEM headroom for bigger pixel
            # blocks (measured: 32 rows is +20% at 9 candidates, -12% at
            # 51 where per-candidate live tiles crowd VMEM). Interpreter
            # mode keeps the minimal tile: the VMEM rationale does not
            # apply and bigger blocks only pad small CPU maps 4x.
            block_rows=(
                SUBLANES
                if interpret or total_candidates > 16
                else 32
            ),
        )

        def run(pixels, txs, walls, kind, phi, scalars):
            out = None
            for t in range(n_tx):
                z = kernel(pixels, txs[t], phi, scalars)
                out = z if out is None else jax.tree.map(jnp.add, out, z)
            return out

    # One jitted entry per (kernel, n_tx): the whole per-TX loop is a
    # single device dispatch (remote-TPU tunnels pay per-op latency).
    # The custom_vjp wrapper makes the kernel differentiable: the primal
    # runs the fused Pallas kernel, while cotangents w.r.t. pixels / TX /
    # walls / phi / scalars come from the XLA tracer's VJP (identical
    # numerics), so jax.grad over scene parameters works through the
    # default backend.
    if with_grad:
        # The grad-map outputs are terminal (no further autodiff through
        # them on the Pallas path; traced scenes fall back to XLA
        # upstream), so no custom_vjp wrapper -- just one jitted dispatch
        # (re-wrapped in a plain function so entry hints attach below).
        jitted = jax.jit(run)

        def run(pixels, txs, walls, kind, phi, scalars, _j=jitted):
            return _j(pixels, txs, walls, kind, phi, scalars)

    else:
        run = _differentiable_run(
            jax.jit(run),
            kinds_np,
            groups,
            n_tx=n_tx,
            approx=approx,
            sigmoid=sigmoid,
        )
    # Introspection + entry hints: culled runs want spatially-square
    # pixel tiles (a full-width row strip intersects most beams; a
    # square block intersects few) -- _get_entry applies a block
    # permutation when the grid shape allows it.
    run._culled = cull
    run._shadowed = shadow
    run._looped = use_looped
    # One spatial block = ONE kernel tile (block_rows x 128 pixels laid
    # out as a 32 x (4 * block_rows) rectangle): every tile's bounding
    # box is a compact rectangle, never a wrap-around strip, so the
    # per-tile cull tables and shadow lists stay tight at any tile size.
    run._pixel_block = (
        (32, 4 * looped_rows) if use_looped and (cull or shadow) else None
    )
    _KERNEL_CACHE[cache_key] = run
    while len(_KERNEL_CACHE) > _KERNEL_CACHE_MAX:
        _KERNEL_CACHE.popitem(last=False)
    return run
