"""One-shot TPU tuning sweep for the analytic value+grad kernels (round 3).

Batches every measurement into a single process (the remote-compile
tunnel stalls a few times per hour, so each item is individually
guarded) and appends JSON lines to ``tune_vag_results.jsonl`` as results
land. Run: ``timeout 3600 python tools/tune_vag.py``.

Measures, in order of importance:
1. 1024x1024 order<=1 value+grad map through ``power_map`` (auto
   dispatch = unrolled analytic) -- the BASELINE grad metric
   (round-2 vjp scheme: 198M pts/s; target >= 400M).
2. Unrolled analytic vag block_rows sweep (8 vs 32).
3. Looped analytic vag vs the round-2 per-candidate vjp scheme, plus a
   cand_block sweep (vjp residuals capped cand_block at 1; the analytic
   sweep holds no residuals).
4. Order-2 (51-candidate) vag: unrolled-analytic vs looped-analytic to
   re-tune the with_grad stream-proxy crossover (round-2 value: 400).
5. MPT/image flip rates vs XLA (PARITY.md contract numbers).
6. cfg3/cfg5 forward-mode optimizer steps vs reverse mode.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from bench import chained_grid_map_time, chained_map_time, chained_step_time  # noqa: E402
from differt2d_tpu import tracer  # noqa: E402
from differt2d_tpu.rt import path_candidate_matrices  # noqa: E402
from differt2d_tpu.scene import Scene  # noqa: E402
from differt2d_tpu.tracer import scene_arrays  # noqa: E402

OUT = open(os.path.join(os.path.dirname(__file__), "..",
                        "tune_vag_results.jsonl"), "a")


def rec(**kw):
    kw["t"] = round(time.time(), 1)
    line = json.dumps(kw)
    print(line, flush=True)
    OUT.write(line + "\n")
    OUT.flush()


def guard(name, fn):
    t0 = time.time()
    try:
        val = fn()
        rec(item=name, ok=True, wall_s=round(time.time() - t0, 1), **val)
    except Exception as e:  # noqa: BLE001
        rec(item=name, ok=False, error=f"{type(e).__name__}: {e}",
            wall_s=round(time.time() - t0, 1))
        traceback.print_exc()


def main():
    smoke = "--smoke" in sys.argv  # CPU dry-run: tiny shapes, same code
    rec(item="start", device=str(jax.devices()[0]), smoke=smoke)
    scene = Scene.basic_scene()
    arrays = scene_arrays(scene)
    key = jax.random.PRNGKey(1234)

    n = 64 if smoke else 1024
    X, Y = jnp.meshgrid(jnp.linspace(0.01, 0.99, n), jnp.linspace(0.01, 0.99, n))
    pixels = jnp.stack([X.ravel(), Y.ravel()], axis=-1)
    scalars = jnp.array([100.0, 1e-2, 0.0, 0.5, 0.1], dtype=jnp.float32)
    tx = scene.transmitters["tx"].xy
    W = int(arrays.walls.shape[0])
    walls_np = np.asarray(arrays.walls)
    kinds_np = np.asarray(arrays.kind)
    g01 = path_candidate_matrices(arrays.num_objects, 0, 1)
    g02 = path_candidate_matrices(arrays.num_objects, 0, 2)

    interp = jax.default_backend() == "cpu"

    # 1. Headline: power_map vag via auto dispatch (unrolled analytic).
    def item1():
        f = lambda Xg, Yg: tracer.power_map(  # noqa: E731
            scene, Xg, Yg, max_order=1, approx=True, value_and_grad=True
        )
        t = chained_grid_map_time(f, X, Y, k=10, reps=3)
        return dict(s_per_map=round(t, 5),
                    grad_points_per_s=round(n * n / t, 1))

    guard("vag_1024_order1_auto", item1)

    # 2. Unrolled analytic block_rows sweep.
    from differt2d_tpu.ops.pallas_kernels import (
        build_power_map_kernel,
        build_power_map_kernel_looped,
    )

    for br in (() if smoke else (8, 32)):  # unrolled jit-interpret is
        # XLA:CPU-pathological; smoke covers the looped builders only.
        def item2(br=br):
            kern = build_power_map_kernel(
                walls_np, kinds_np, g01, approx=True,
                mode="value_and_grad", block_rows=br, interpret=interp,
            )
            f = jax.jit(lambda p: kern(p, tx, arrays.phi, scalars))
            t = chained_map_time(f, pixels, k=10, reps=3)
            return dict(s_per_map=round(t, 5),
                        grad_points_per_s=round(n * n / t, 1))

        guard(f"unrolled_analytic_vag_br{br}", item2)

    # 3. Looped: analytic vs vjp; cand_block sweep for analytic.
    for impl, cb in (("vjp", 1), ("analytic", 1), ("analytic", 2),
                     ("analytic", 4), ("analytic", 8)):
        def item3(impl=impl, cb=cb):
            kern = build_power_map_kernel_looped(
                W, g01, approx=True, mode="value_and_grad",
                tangent_impl=impl, cand_block=cb, interpret=interp,
            )
            f = jax.jit(
                lambda p: kern(p, tx, arrays.walls, arrays.kind,
                               arrays.phi, scalars)
            )
            t = chained_map_time(f, pixels, k=10, reps=3)
            return dict(s_per_map=round(t, 5),
                        grad_points_per_s=round(n * n / t, 1))

        guard(f"looped_{impl}_vag_cb{cb}", item3)

    # 4. Order-2 vag: unrolled-analytic vs looped-analytic (crossover).
    def item4a():
        if smoke:
            return dict(skipped=True)
        kern = build_power_map_kernel(
            walls_np, kinds_np, g02, approx=True,
            mode="value_and_grad", block_rows=8,
        )
        f = jax.jit(lambda p: kern(p, tx, arrays.phi, scalars))
        t = chained_map_time(f, pixels, k=6, reps=3)
        return dict(s_per_map=round(t, 5),
                    grad_points_per_s=round(n * n / t, 1))

    guard("unrolled_analytic_vag_order2", item4a)

    def item4b():
        kern = build_power_map_kernel_looped(
            W, g02, approx=True, mode="value_and_grad",
            tangent_impl="analytic", interpret=interp,
        )
        f = jax.jit(
            lambda p: kern(p, tx, arrays.walls, arrays.kind,
                           arrays.phi, scalars)
        )
        t = chained_map_time(f, pixels, k=6, reps=3)
        return dict(s_per_map=round(t, 5),
                    grad_points_per_s=round(n * n / t, 1))

    guard("looped_analytic_vag_order2", item4b)

    # 5. Flip rates vs XLA (contract numbers for PARITY.md).
    def item5():
        ns = 16 if smoke else 64
        Xs, Ys = jnp.meshgrid(
            jnp.linspace(0.05, 0.95, ns), jnp.linspace(0.04, 0.96, ns)
        )
        sq = Scene.square_scene()
        kw = dict(order=1, solver="mpt", steps=30 if smoke else 100,
                  approx=True, key=key)
        ref = tracer.power_map(sq, Xs, Ys, backend="xla", **kw)
        pal = tracer.power_map(sq, Xs, Ys, backend="pallas", **kw)
        err = np.abs(np.asarray(pal) - np.asarray(ref))
        scale = 1.0 + np.abs(np.asarray(ref))
        mpt_rate = float((err > 0.05 * scale).mean())
        ref2 = tracer.power_map(scene, Xs, Ys, max_order=2, approx=True,
                                backend="xla")
        pal2 = tracer.power_map(scene, Xs, Ys, max_order=2, approx=True,
                                backend="pallas")
        err2 = np.abs(np.asarray(pal2) - np.asarray(ref2))
        scale2 = 1.0 + np.abs(np.asarray(ref2))
        img_rate = float((err2 > 0.05 * scale2).mean())
        # vag vs XLA kinks at 1024^2 order<=1
        vv, gv = tracer.power_map(scene, X, Y, max_order=1, approx=True,
                                  value_and_grad=True)
        rv, rg = tracer.power_map(scene, X, Y, max_order=1, approx=True,
                                  value_and_grad=True, backend="xla")
        bad = np.abs(np.asarray(gv) - np.asarray(rg)) > (
            1e-5 + 1e-3 * np.abs(np.asarray(rg)))
        return dict(mpt_flip_rate=mpt_rate, image_o2_flip_rate=img_rate,
                    vag_kink_rate=float(bad.mean()),
                    val_allclose=bool(np.allclose(vv, rv, rtol=1e-4,
                                                  atol=1e-5)))

    guard("flip_rates", item5)

    # 6. Forward- vs reverse-mode optimizer steps (cfg3/cfg5 shapes).
    import optax

    from differt2d_tpu.geometry import RIS, MinPath, Point
    from differt2d_tpu.optimize import value_and_grad_fwd
    from differt2d_tpu.utils import received_power

    def item6():
        base = Scene.square_scene()
        Xr, Yr = jnp.meshgrid(
            jnp.linspace(0.05, 0.45, 16), jnp.linspace(0.05, 0.95, 16)
        )

        def ris_loss(phi):
            s = base.add_objects(
                RIS(xys=jnp.array([[0.5, 0.3], [0.5, 0.7]]), phi=phi)
            )
            Z = tracer.power_map(
                s, Xr, Yr, order=1, solver="mpt",
                steps=20 if smoke else 100, approx=True,
                key=key, filter_objects=lambda o: isinstance(o, RIS),
            )
            return -jnp.sum(Z)

        opt = optax.chain(optax.adam(0.05), optax.zero_nans())
        res = {}
        for label, vag in (("fwd", value_and_grad_fwd(ris_loss)),
                           ("rev", jax.value_and_grad(ris_loss))):
            @jax.jit
            def step(phi, st, vag=vag):
                v, g = vag(phi)
                up, st = opt.update(g, st)
                return phi + up, st, v

            phi = jnp.array(0.5)
            st = opt.init(phi)
            state = {"phi": phi, "st": st}

            def step_once(state=state, step=step):
                state["phi"], state["st"], v = step(state["phi"], state["st"])
                return v

            res[f"cfg5_{label}_s_per_step"] = round(
                chained_step_time(step_once, k=5), 5)
        return res

    guard("cfg5_fwd_vs_rev", item6)

    def item7():
        opt_scene = Scene.square_scene_with_wall()

        def loss(tx_coords, alpha):
            s = opt_scene.with_transmitters(tx=Point(xy=tx_coords))
            return -s.accumulate_over_paths(
                received_power, reduce_all=True, max_order=1, approx=True,
                alpha=alpha, path_cls=MinPath,
                path_cls_kwargs={"steps": 100}, key=key,
            )

        import optax
        opt = optax.chain(optax.adam(0.01), optax.zero_nans())
        res = {}
        for label, vag in (("fwd", value_and_grad_fwd(loss)),
                           ("rev", jax.value_and_grad(loss))):
            @jax.jit
            def step(txp, st, vag=vag):
                v, g = vag(txp, 50.0)
                up, st = opt.update(g, st)
                return txp + up, st, v

            state = {"tx": jnp.array([0.3, 0.6]), "st": opt.init(jnp.array([0.3, 0.6]))}

            def step_once(state=state, step=step):
                state["tx"], state["st"], v = step(state["tx"], state["st"])
                return v

            res[f"cfg3_{label}_s_per_step"] = round(
                chained_step_time(step_once, k=5), 5)
        return res

    guard("cfg3_fwd_vs_rev", item7)
    rec(item="done")


if __name__ == "__main__":
    main()
