"""Benchmark: receiver-grid points/s/chip on the BASELINE north-star config.

Config (BASELINE.json): basic scene, order-1 reflections (min_order=0,
max_order=1), 1024x1024 receiver grid, soft logic, image-method solver.

* value   = steady-state grid points/s on one chip via the batched tracer
* baseline = the reference *algorithm* (per-pixel scalar accumulation with
  a Python-unrolled candidate loop, double-vmapped -- the exact structure
  of reference ``differt2d/scene.py:1892-1930``) timed on the same device
* grad_check = tracer value+grad allclose vs the reference-structured path

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Resilience: ``python bench.py`` runs a thin WRAPPER process that (1) probes
the device backend with a tiny jitted op in a subprocess under a timeout,
retrying with backoff while the remote tunnel heals, (2) runs the actual
measurements in an inner subprocess (``--inner``) that streams each metric
as a ``#PART#`` line so a mid-run hang still leaves partial results, and
(3) on persistent device failure re-runs the inner bench on forced CPU and
reports ``"device": "cpu-fallback"`` plus an ``"error"`` field.  The
wrapper ALWAYS prints one parseable JSON line and exits 0 -- a down tunnel
must never cost the round its bench artifact again (it did in round 2).
"""

import json
import os
import subprocess
import sys
import tempfile
import time

_CACHE_DIR = os.environ.get(
    "BENCH_JAX_CACHE", os.path.join(os.path.dirname(__file__), ".jax_cache")
)


import jax  # noqa: E402  (importing jax does NOT initialize any backend)
import jax.numpy as jnp  # noqa: E402


def _setup_jax():
    """JAX config for the INNER measurement process only.

    Persistent compilation cache: repeated bench runs (driver rounds) skip
    most of the remote-compile cost (~5x faster warm start measured).
    """
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def _part(fragment: dict) -> None:
    """Stream a finished metric so the wrapper can salvage it on a hang."""
    print("#PART# " + json.dumps(fragment), flush=True)


def _paired_slope(run, k, reps):
    """Median of per-rep slopes ``(t(k) - t(1)) / (k - 1)``.

    Pairing t(1) and t(k) within each rep (measured back to back) cancels
    shared tunnel drift; the median rejects the occasional RTT outlier.
    Taking independent minima of t(1) and t(k) instead (the previous
    estimator) inverts under noise -- a lucky-fast t(k) against an
    ordinary t(1) produced negative slopes on small per-map times.
    """
    slopes = sorted((run(k) - run(1)) / (k - 1) for _ in range(reps))
    m = len(slopes)
    median = (
        slopes[m // 2] if m % 2 else 0.5 * (slopes[m // 2 - 1] + slopes[m // 2])
    )
    return max(median, 1e-9)


def _scan_slope(make_runner, arg, k, reps):
    """Slope timing over single-dispatch scan runners.

    ``make_runner(kk)`` returns a jitted callable whose ONE dispatch
    executes ``kk`` data-chained map evaluations on device (via
    ``lax.scan``) and returns a scalar. Both lengths are compiled before
    any timed window.
    """
    r1, rk = make_runner(1), make_runner(k)
    float(r1(arg))
    float(rk(arg))

    def run(kk):
        r = r1 if kk == 1 else rk
        t0 = time.perf_counter()
        float(r(arg))
        return time.perf_counter() - t0

    return _paired_slope(run, k, reps)


def chained_map_time(map_fn, pixels, k=10, reps=2, scan=True):
    """Per-map seconds for ``map_fn(pixels[P, 2]) -> values``.

    Runs ``k`` maps chained by a data dependency (each map's output
    perturbs the next map's input by 1e-20, forcing true sequential
    device execution) with ONE host materialization at the end, then
    removes the fixed round-trip cost via the per-rep slope
    ``(t(k) - t(1)) / (k - 1)`` (median over reps).

    With ``scan=True`` (default) the ``k`` maps run inside ONE jitted
    ``lax.scan`` dispatch. The host-loop variant enqueues each map
    separately; through this tunnel, host dispatch costs ~1 ms per
    enqueue, so for sub-ms maps the loop measures DISPATCH throughput,
    not device compute (measured 2026-08-20: the north-star kernel
    timed 2.0 ms/map via the host loop vs a stable 0.78-0.94 ms/map
    via scan in the same session). Falls back to the host loop when
    ``map_fn`` cannot trace under scan (and for slow maps where two
    extra scan-body compiles cost more than they remove, pass
    ``scan=False``).
    """
    P = pixels.shape[0]

    @jax.jit
    def chain(px, out):
        flat = jnp.asarray(out).reshape(-1)[:P]
        return px + 1e-20 * flat[:, None]

    # Eager warmup: compiles the un-scanned path AND populates the
    # library's per-scene caches with concrete arrays (scene_arrays
    # computed for the first time under a scan trace would be traced,
    # breaking the kernel builders' np.asarray baking).
    out = map_fn(pixels)
    first = out[0] if isinstance(out, tuple) else out
    float(jnp.sum(first))  # compile + warm, real materialization
    float(jnp.sum(chain(pixels, first)[0]))

    if scan:
        def make_runner(kk):
            @jax.jit
            def run(px):
                def body(p, _):
                    o = map_fn(p)
                    o = o[0] if isinstance(o, tuple) else o
                    return chain(px, o), None
                p, _ = jax.lax.scan(body, px, None, length=kk)
                return jnp.sum(p)
            return run

        try:
            return _scan_slope(make_runner, pixels, k, reps)
        except Exception as e:  # pragma: no cover - backend-specific
            _log(f"scan timing unavailable ({type(e).__name__}); host loop")

    def run(kk):
        t0 = time.perf_counter()
        p = pixels
        o = None
        for _ in range(kk):
            o = map_fn(p)
            o = o[0] if isinstance(o, tuple) else o
            p = chain(pixels, o)
        float(jnp.sum(o))
        return time.perf_counter() - t0

    return _paired_slope(run, k, reps)


def chained_grid_map_time(map_fn, X, Y, k=10, reps=2, scan=True):
    """Per-map seconds for ``map_fn(X, Y) -> Z`` on 2-D receiver grids.

    Grid-level variant of :func:`chained_map_time`: the chain perturbs
    ``X`` by ``1e-20 * Z`` directly (same shape), so the harness adds no
    per-iteration eager slice/reshape ops -- at small grids those
    dominate (~0.3 ms of tunnel latency each) and would be billed to
    the library.  A real caller holds ready-made grids, so this is the
    honest end-to-end cost of ``power_map(scene, X, Y)``.

    ``scan=True`` chains the ``k`` maps inside one jitted ``lax.scan``
    dispatch (see :func:`chained_map_time` for why the host loop
    under-measures sub-ms maps through this tunnel).
    """

    @jax.jit
    def chain(Xg, Z):
        return Xg + 1e-20 * Z

    Z = map_fn(X, Y)
    Z = Z[0] if isinstance(Z, tuple) else Z
    float(jnp.sum(Z))  # compile + warm, populate concrete scene caches
    float(jnp.sum(chain(X, Z)[0]))

    if scan:
        def make_runner(kk):
            @jax.jit
            def run(X0):
                def body(Xc, _):
                    Zc = map_fn(Xc, Y)
                    Zc = Zc[0] if isinstance(Zc, tuple) else Zc
                    return chain(X0, Zc), None
                Xc, _ = jax.lax.scan(body, X0, None, length=kk)
                return jnp.sum(Xc)
            return run

        try:
            return _scan_slope(make_runner, X, k, reps)
        except Exception as e:  # pragma: no cover - backend-specific
            _log(f"scan timing unavailable ({type(e).__name__}); host loop")

    def run(kk):
        t0 = time.perf_counter()
        Xc = X
        Z = None
        for _ in range(kk):
            Z = map_fn(Xc, Y)
            Z = Z[0] if isinstance(Z, tuple) else Z
            Xc = chain(Xc, Z)
        float(jnp.sum(Z))
        return time.perf_counter() - t0

    return _paired_slope(run, k, reps)


def scan_step_time(step_fn, carry, k=20, reps=2):
    """Per-step seconds for a PURE ``step_fn(carry) -> (carry, scalar)``.

    Chains ``k`` optimizer steps inside ONE jitted ``lax.scan`` dispatch
    (the carry is the optimizer state, so the chain is the optimization
    itself). Eliminates the per-step host enqueue that dominates sub-ms
    steps through this tunnel (:func:`chained_map_time` docstring).
    Warms twice eagerly first so any weak->strong dtype promotion in the
    carried parameters settles before the scan traces (a type-unstable
    carry fails scan; the settled carry is what gets timed).
    """
    carry, _ = step_fn(carry)
    carry, v = step_fn(carry)
    float(v)

    def make_runner(kk):
        @jax.jit
        def run(c0):
            def body(c, _):
                c2, val = step_fn(c)
                return c2, val
            _, vals = jax.lax.scan(body, c0, None, length=kk)
            return vals[-1]
        return run

    try:
        return _scan_slope(make_runner, carry, k, reps)
    except Exception as e:  # pragma: no cover - backend-specific
        _log(f"scan step timing unavailable ({type(e).__name__}); host loop")
        state = {"c": carry}

        def step_once():
            state["c"], val = step_fn(state["c"])
            return val

        return chained_step_time(step_once, k, reps)


def chained_step_time(step_once, k=10, reps=2):
    """Per-step seconds for an optimizer step that advances persistent
    state and returns a device scalar (steps are already chained by the
    parameter carry; one host read per timing block)."""

    def run(kk):
        t0 = time.perf_counter()
        v = None
        for _ in range(kk):
            v = step_once()
        float(v)
        return time.perf_counter() - t0

    # Warm TWICE: the first step can retrace the jitted step function
    # when the carried parameters change weak-typedness after one update
    # (e.g. a weakly-typed ``jnp.array(0.5)`` initial value becomes a
    # strongly-typed f32 after ``x + updates``), so the recompile must
    # land before the timed windows, not inside the first one (measured:
    # a 2.6-4 s recompile inside run(1) flipped cfg5's recorded
    # per-step time by 1000x in round 3).
    float(step_once())
    float(step_once())
    return _paired_slope(run, k, reps)


def _inner_main():
    _setup_jax()
    from differt2d_tpu.scene import Scene
    from differt2d_tpu.tracer import make_pixels_fn
    from differt2d_tpu.utils import received_power

    n = int(os.environ.get("BENCH_SIZE", "1024"))
    scene = Scene.basic_scene()

    # --- fast path: fused Pallas kernel, 1024x1024 -------------------------
    from differt2d_tpu.rt import path_candidate_matrices
    from differt2d_tpu.ops.pallas_kernels import build_power_map_kernel
    from differt2d_tpu.tracer import scene_arrays
    import numpy as _np

    X, Y = jnp.meshgrid(jnp.linspace(0.01, 0.99, n), jnp.linspace(0.012, 0.988, n))
    pixels = jnp.stack([X.ravel(), Y.ravel()], axis=-1)
    arrays = scene_arrays(scene)
    # CPU (CI smoke): Pallas kernels only run in interpreter mode there.
    interp = jax.default_backend() == "cpu"
    kernel = jax.jit(
        build_power_map_kernel(
            _np.asarray(arrays.walls),
            _np.asarray(arrays.kind),
            path_candidate_matrices(arrays.num_objects, 0, 1),
            approx=True,
            interpret=interp,
            # matches get_fused_run's small-set choice on real TPU
            block_rows=8 if interp else 32,
        )
    )
    scalars = jnp.array([100.0, 1e-2, 0.0, 0.5, 0.1], dtype=jnp.float32)
    tx = scene.transmitters["tx"].xy
    # reps=4 on the headline metric only: the tunnel's run-to-run spread
    # is ~2x (0.8-1.6 ms/map measured across rounds), and the driver
    # records a single bench invocation -- the median of 4 paired slopes
    # keeps the recorded number close to the chip's actual steady state.
    fast_t = chained_map_time(
        lambda p: kernel(p, tx, arrays.phi, scalars), pixels, k=32, reps=4
    )
    points_per_s = pixels.shape[0] / fast_t
    _part(
        {
            "metric": "rx_grid_points_per_s_per_chip",
            "value": round(points_per_s, 1),
            "unit": f"points/s/chip ({n}x{n}, order<=1, soft)",
            "fast_s_per_map": round(fast_t, 4),
            "device": str(jax.devices()[0]),
        }
    )

    # --- fused value+grad kernel (in-kernel forward-mode tangents) --------
    from differt2d_tpu.ops.pallas_kernels import get_fused_run

    vag_run = get_fused_run(
        arrays,
        path_candidate_matrices(arrays.num_objects, 0, 1),
        n_tx=1,
        approx=True,
        sigmoid=False,
        interpret=interp,
        mode="value_and_grad",
    )
    txs = tx[None, :]
    vag_t = chained_map_time(
        lambda p: vag_run(
            p, txs, arrays.walls, arrays.kind, arrays.phi, scalars
        ),
        pixels,
        k=16,
    )
    grad_points_per_s = pixels.shape[0] / vag_t
    _part(
        {
            "grad_points_per_s": round(grad_points_per_s, 1),
            "grad_s_per_map": round(vag_t, 4),
        }
    )

    # --- XLA tracer (the differentiable path) ------------------------------
    xla = jax.jit(make_pixels_fn(scene, max_order=1, approx=True))
    # The XLA rows are 10-60 ms/map: host dispatch is <5% there, and
    # scan-wrapping the big traced graphs would double their compiles.
    xla_t = chained_map_time(xla, pixels, scan=False)
    xla_points_per_s = pixels.shape[0] / xla_t

    # --- XLA tracer value+grad (what the Pallas vag kernel replaces) ------
    xla_vag = jax.jit(
        make_pixels_fn(scene, max_order=1, approx=True, value_and_grad=True)
    )
    xla_vag_t = chained_map_time(xla_vag, pixels, scan=False)
    xla_grad_points_per_s = pixels.shape[0] / xla_vag_t
    _part(
        {
            "xla_points_per_s": round(xla_points_per_s, 1),
            "xla_grad_points_per_s": round(xla_grad_points_per_s, 1),
        }
    )

    # --- baseline: reference-structured per-pixel path --------------------
    nb = int(os.environ.get("BENCH_BASELINE_SIZE", "256"))
    Xb, Yb = jnp.meshgrid(
        jnp.linspace(0.01, 0.99, nb), jnp.linspace(0.012, 0.988, nb)
    )

    def general_power(*args, **kwargs):  # distinct object: forces slow path
        return received_power(*args, **kwargs)

    baseline_jit = jax.jit(
        lambda Xg_, Yg_: scene.accumulate_on_receivers_grid_over_paths(
            Xg_, Yg_, fun=general_power, reduce_all=True, max_order=1,
            approx=True,
        )
    )
    pixels_b = jnp.stack([Xb.ravel(), Yb.ravel()], axis=-1)
    base_t = chained_map_time(
        lambda p: baseline_jit(
            p[:, 0].reshape(nb, nb), p[:, 1].reshape(nb, nb)
        ),
        pixels_b,
        k=5,
        scan=False,
    )
    base_points_per_s = (nb * nb) / base_t
    _part(
        {
            "baseline_points_per_s": round(base_points_per_s, 1),
            "vs_baseline": round(points_per_s / base_points_per_s, 3),
        }
    )

    # --- grad check: tracer vs reference-structured path ------------------
    ng = 24
    Xg, Yg = jnp.meshgrid(
        jnp.linspace(0.03, 0.97, ng), jnp.linspace(0.02, 0.96, ng)
    )
    Zf, dZf = scene.accumulate_on_receivers_grid_over_paths(
        Xg, Yg, fun=received_power, reduce_all=True, value_and_grad=True,
        max_order=1, approx=True,
    )
    Zs, dZs = scene.accumulate_on_receivers_grid_over_paths(
        Xg, Yg, fun=general_power, reduce_all=True, value_and_grad=True,
        max_order=1, approx=True,
    )
    import numpy as np

    # Pallas forward vs the reference-structured values on the same grid.
    Zp = kernel(
        jnp.stack([Xg.ravel(), Yg.ravel()], axis=-1), tx, arrays.phi, scalars
    ).reshape(Xg.shape)

    # Pallas in-kernel value+grad vs the reference-structured pair.
    Zpg, dZpg = vag_run(
        jnp.stack([Xg.ravel(), Yg.ravel()], axis=-1),
        txs, arrays.walls, arrays.kind, arrays.phi, scalars,
    )
    Zpg = Zpg.reshape(Xg.shape)
    dZpg = dZpg.reshape(*Xg.shape, 2)

    def _close_except_kinks(a, b, rtol, atol):
        # Gradient maps kink where a pixel sits within one f32 ulp of a
        # soft-min/max crossover: the analytic kernel tangent and XLA AD
        # pick different (equally valid) subgradients there (PARITY.md).
        from differt2d_tpu.utils import kink_excess

        n_bad, allowed = kink_excess(a, b, rtol=rtol, atol=atol)
        return n_bad <= allowed

    grad_ok = bool(
        np.allclose(Zf, Zs, rtol=1e-4, atol=1e-6)
        and _close_except_kinks(dZf, dZs, rtol=1e-3, atol=1e-5)
        and np.allclose(Zp, Zs, rtol=1e-4, atol=1e-5)
        and np.allclose(Zpg, Zs, rtol=1e-4, atol=1e-5)
        and _close_except_kinks(dZpg, dZs, rtol=1e-3, atol=1e-5)
    )
    _part({"grad_check_pass": grad_ok})

    # --- roofline: FLOPs from XLA's own cost model of the identical
    # computation (the XLA tracer's map), bytes from the kernel's actual
    # HBM traffic (pixels in, map out -- all intermediates stay in VMEM).
    roofline = {}
    try:
        ca = jax.jit(make_pixels_fn(scene, max_order=1, approx=True)).lower(
            pixels
        ).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        map_flops = float(ca.get("flops", 0.0))
    except Exception:
        map_flops = 0.0
    if map_flops > 0:
        flops_per_point = map_flops / pixels.shape[0]
        eff_tflops = map_flops / fast_t / 1e12
        vpu_peak_tflops = VPU_PEAK_TFLOPS
        hbm_bytes = pixels.shape[0] * (2 + 1) * 4  # px,py in + map out, f32
        roofline = {
            "flops_model": round(flops_per_point, 1),
            "effective_tflops": round(eff_tflops, 3),
            "pct_vpu_peak": round(100.0 * eff_tflops / vpu_peak_tflops, 1),
            "hbm_gb_per_s": round(hbm_bytes / fast_t / 1e9, 2),
            "grad_effective_tflops": round(
                3.0 * map_flops / vag_t / 1e12, 3
            ),  # value + 2 tangent passes
        }

    result = {
        "metric": "rx_grid_points_per_s_per_chip",
        "value": round(points_per_s, 1),
        "unit": f"points/s/chip ({n}x{n}, order<=1, soft)",
        "vs_baseline": round(points_per_s / base_points_per_s, 3),
        "grad_check_pass": grad_ok,
        "fast_s_per_map": round(fast_t, 4),
        "grad_points_per_s": round(grad_points_per_s, 1),
        "grad_s_per_map": round(vag_t, 4),
        "xla_points_per_s": round(xla_points_per_s, 1),
        "xla_grad_points_per_s": round(xla_grad_points_per_s, 1),
        "baseline_points_per_s": round(base_points_per_s, 1),
        "device": str(jax.devices()[0]),
        **roofline,
    }

    # Default-ON config sweep: the driver's plain ``python bench.py`` must
    # certify every BASELINE config (cfg2..cfg8), not just the north-star
    # (round 3 left six of eight rows builder-self-reported behind
    # BENCH_FULL=1).  Each cfg streams a #PART# line, so a tunnel hang
    # mid-sweep still leaves all earlier configs in the salvaged artifact.
    # BENCH_FULL=0 opts out (CI smoke / CPU fallback).
    if os.environ.get("BENCH_FULL", "1") != "0":
        result.update(full_config_sweep())

    print(json.dumps(result))


STREET_GEOJSON = json.dumps(
    {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [
                        [[0.1, 0.1], [0.4, 0.1], [0.4, 0.4], [0.1, 0.4], [0.1, 0.1]]
                    ],
                },
            },
            {
                "type": "Feature",
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [
                        [[0.6, 0.2], [0.9, 0.2], [0.9, 0.5], [0.6, 0.5], [0.6, 0.2]]
                    ],
                },
            },
            {
                "type": "Feature",
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [
                        [[0.3, 0.6], [0.7, 0.6], [0.7, 0.9], [0.3, 0.9], [0.3, 0.6]]
                    ],
                },
            },
        ],
    }
)


VPU_PEAK_TFLOPS = 8 * 128 * 4 * 2 * 0.94e9 / 1e12
"""v5e VPU peak model: 8x128 lanes x 4 ALUs x 2 (FMA) x 940 MHz."""


def _pct_vpu_peak(scene, n_points: int, t_per_map: float, **fn_kwargs):
    """Per-config roofline: % of VPU peak at the measured per-map time,
    with FLOPs from XLA's cost model of the identical XLA-tracer map."""
    import jax.numpy as jnp

    from differt2d_tpu.tracer import make_pixels_fn

    try:
        xs = jnp.linspace(0.011, 0.989, n_points)
        probe = jnp.stack([xs, xs], axis=-1)
        ca = (
            jax.jit(make_pixels_fn(scene, **fn_kwargs))
            .lower(probe)
            .compile()
            .cost_analysis()
        )
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
    except Exception:
        return None
    if flops <= 0:
        return None
    eff_tflops = flops / t_per_map / 1e12
    return round(100.0 * eff_tflops / VPU_PEAK_TFLOPS, 1)


def full_config_sweep() -> dict:
    """Timings for the remaining BASELINE.json configs (default-on;
    BENCH_FULL=0 skips)."""
    import jax.numpy as jnp
    import optax

    from differt2d_tpu.geometry import MinPath, Point, RIS, Vertex
    from differt2d_tpu.optimize import value_and_grad_fwd
    from differt2d_tpu.scene import Scene
    from differt2d_tpu.tracer import power_map
    from differt2d_tpu.logic import sigmoid
    from differt2d_tpu.utils import received_power

    key = jax.random.PRNGKey(1234)
    out = {}

    # BENCH_SWEEP_SIZE scales every sweep grid (default 256, the
    # BASELINE configs). The CPU fallback sets 32 so a full-round TPU
    # outage still certifies a correctness row for every config; tiny
    # mode also collapses k/reps (timing precision is meaningless there).
    ns = int(os.environ.get("BENCH_SWEEP_SIZE", "256"))
    tiny = ns < 128

    def _kr(k, reps):
        return {"k": 2, "reps": 1} if tiny else {"k": k, "reps": reps}

    def _set(name, value):
        out[name] = value
        _part({name: value})

    # Config 2: 256x256 receiver grid, order-2 reflections, sigmoid.
    scene = Scene.basic_scene()
    X, Y = jnp.meshgrid(jnp.linspace(0.01, 0.99, ns), jnp.linspace(0.01, 0.99, ns))
    t = chained_grid_map_time(
        lambda Xg, Yg: power_map(
            scene, Xg, Yg, max_order=2, approx=True, function=sigmoid,
        ),
        # small grids: per-map time (~1 ms) must dominate the ~30 ms
        # tunnel RTT noise, so chain many maps per timing block --
        # k=8 produced negative slopes (noise floor) on occasion;
        # reps=5 because this config's run-to-run spread (64-97M
        # points/s) straddles its 90M goal.
        X, Y, **_kr(64, 5),
    )
    _set("cfg2_256x256_order2_sigmoid_pts_per_s", round(ns * ns / t, 1))
    pct = _pct_vpu_peak(
        scene, ns * ns, t, max_order=2, approx=True, function=sigmoid
    )
    if pct is not None:
        _set("cfg2_pct_vpu_peak", pct)

    # Config 3: TX-placement optimization step with the MPT solver.
    opt_scene = Scene.square_scene_with_wall()

    def loss(tx_coords, alpha):
        s = opt_scene.with_transmitters(tx=Point(xy=tx_coords))
        return -s.accumulate_over_paths(
            received_power,
            reduce_all=True,
            max_order=1,
            approx=True,
            alpha=alpha,
            path_cls=MinPath,
            path_cls_kwargs={"steps": 100},
            key=key,
        )

    # One FUSED jitted step (value+grad+adam update in a single
    # dispatch): running optax on the host costs dozens of tiny op
    # dispatches per step, which dominates on remote-dispatch devices.
    optimizer = optax.chain(optax.adam(0.01), optax.zero_nans())

    @jax.jit
    def mpt_step(tx, state, alpha):
        v, g = jax.value_and_grad(loss)(tx, alpha)
        updates, state = optimizer.update(g, state)
        return tx + updates, state, v

    def _as_carry_step(step3):
        """Adapt ``step3(x, opt_state, alpha) -> (x, opt_state, v)`` to the
        pure ``carry -> (carry, scalar)`` shape :func:`scan_step_time`
        chains on device."""

        def step(c):
            x, st = c
            x, st, v = step3(x, st, 50.0)
            return (x, st), v

        return step

    tx = jnp.array([0.3, 0.6])
    t = scan_step_time(
        _as_carry_step(mpt_step), (tx, optimizer.init(tx)), **_kr(20, 2)
    )
    _set("cfg3_mpt_tx_opt_s_per_step", round(t, 4))

    # Same step with implicit-function-theorem solver gradients
    # (identical forward solve; no transposed 100-step scan in the
    # backward -- see optimize._minimize_implicit).
    def loss_implicit(tx_coords, alpha):
        s = opt_scene.with_transmitters(tx=Point(xy=tx_coords))
        return -s.accumulate_over_paths(
            received_power,
            reduce_all=True,
            max_order=1,
            approx=True,
            alpha=alpha,
            path_cls=MinPath,
            path_cls_kwargs={"steps": 100, "implicit": True},
            key=key,
        )

    @jax.jit
    def mpt_step_implicit(tx, state, alpha):
        v, g = jax.value_and_grad(loss_implicit)(tx, alpha)
        updates, state = optimizer.update(g, state)
        return tx + updates, state, v

    tx_i = jnp.array([0.3, 0.6])
    t = scan_step_time(
        _as_carry_step(mpt_step_implicit), (tx_i, optimizer.init(tx_i)),
        **_kr(20, 2),
    )
    _set("cfg3_mpt_tx_opt_implicit_s_per_step", round(t, 4))

    # Same step with FORWARD-mode gradients (2 TX scalars -> 2 vmapped
    # JVPs; exact unrolled-argmin semantics, no transposed scan).
    loss_vag_fwd = value_and_grad_fwd(loss)

    @jax.jit
    def mpt_step_fwd(tx, state, alpha):
        v, g = loss_vag_fwd(tx, alpha)
        updates, state = optimizer.update(g, state)
        return tx + updates, state, v

    tx_f = jnp.array([0.3, 0.6])
    t = scan_step_time(
        _as_carry_step(mpt_step_fwd), (tx_f, optimizer.init(tx_f)),
        **_kr(20, 2),
    )
    _set("cfg3_mpt_tx_opt_fwd_s_per_step", round(t, 4))

    # Config 4: vertex diffraction on a GeoJSON street scene.  The
    # vertex-only Fermat candidates pin every bounce (zero unknowns), so
    # auto-dispatch routes this to the fused image kernel.
    street = Scene.from_geojson(STREET_GEOJSON)
    for obj in list(street.objects):
        street = street.add_objects(*obj.get_vertices())
    n4 = min(ns, 128)
    Xv, Yv = jnp.meshgrid(
        jnp.linspace(0.01, 0.99, n4), jnp.linspace(0.01, 0.99, n4)
    )

    def is_vertex(o):
        # Stable callable identity so the per-scene run cache hits.
        return isinstance(o, Vertex)

    t = chained_grid_map_time(
        lambda Xg, Yg: power_map(
            street,
            Xg,
            Yg,
            order=1,
            solver="fermat",
            approx=True,
            key=key,
            filter_objects=is_vertex,
        ),
        Xv, Yv, **_kr(64, 3),
    )
    _set("cfg4_geojson_vertex_diffraction_pts_per_s", round(n4 * n4 / t, 1))
    pct = _pct_vpu_peak(
        street, n4 * n4, t,
        order=1, solver="fermat", approx=True, key=key,
        filter_objects=is_vertex,
    )
    if pct is not None:
        _set("cfg4_pct_vpu_peak", pct)

    # Config 6: city-scale scene (120 walls, the Helsinki-notebook regime):
    # order-1 map through the looped kernel (121 candidates x 120-wall
    # visibility per pixel).
    city = Scene.city_scene()
    Xc, Yc = jnp.meshgrid(
        jnp.linspace(0.01, 0.99, ns), jnp.linspace(0.01, 0.99, ns)
    )
    t = chained_grid_map_time(
        lambda Xg, Yg: power_map(city, Xg, Yg, max_order=1, approx=True),
        # culled maps are ~1-2 ms: k=24 in one scan dispatch puts the
        # chained signal well above the round-trip jitter.
        Xc, Yc, **_kr(24, 3),
    )
    _set("cfg6_city_120walls_order1_pts_per_s", round(ns * ns / t, 1))
    # %VPU-peak only makes sense against the unculled FLOP model, so the
    # A/B row below carries it (culled runs skip most of those FLOPs --
    # the model read 147% otherwise).
    os.environ["DIFFERT2D_TPU_CULL"] = "0"
    os.environ["DIFFERT2D_TPU_SHADOW"] = "0"
    try:
        t = chained_grid_map_time(
            lambda Xg, Yg: power_map(city, Xg, Yg, max_order=1, approx=True),
            Xc, Yc, **_kr(5, 3),
        )
        _set("cfg6_city_unculled_pts_per_s", round(ns * ns / t, 1))
        pct = _pct_vpu_peak(city, ns * ns, t, max_order=1, approx=True)
        if pct is not None:
            _set("cfg6_unculled_pct_vpu_peak", pct)
    finally:
        del os.environ["DIFFERT2D_TPU_CULL"]
        del os.environ["DIFFERT2D_TPU_SHADOW"]

    # City value+grad map (the TX-placement workload's inner op): the
    # looped Pallas kernel's analytic in-kernel tangents with beam
    # culling and shadow-wall occluder lists riding it (reference
    # semantics ``scene.py:1920-1930``).
    t = chained_grid_map_time(
        lambda Xg, Yg: power_map(
            city, Xg, Yg, max_order=1, approx=True, value_and_grad=True
        ),
        Xc, Yc, **_kr(16, 3),
    )
    _set("cfg6_vag_pts_per_s", round(ns * ns / t, 1))

    # Config 7: vendored OSM-style city extract (136 oblique walls, concave
    # L/U/T footprints) -- realism upgrade over config 6's Manhattan grid.
    extract = Scene.city_extract_scene()
    Xe, Ye = jnp.meshgrid(
        jnp.linspace(0.01, 0.99, ns), jnp.linspace(0.01, 0.99, ns)
    )
    t = chained_grid_map_time(
        lambda Xg, Yg: power_map(extract, Xg, Yg, max_order=1, approx=True),
        Xe, Ye, **_kr(24, 3),
    )
    _set("cfg7_city_extract_136walls_order1_pts_per_s", round(ns * ns / t, 1))


    # A/B row: the same map with tile-beam culling AND shadow-wall
    # occluder lists disabled (candidates
    # whose contribution is exactly zero in a pixel tile are skipped by
    # default -- bit-identical, see ops/pallas_kernels.beam_keep_tables).
    os.environ["DIFFERT2D_TPU_CULL"] = "0"
    os.environ["DIFFERT2D_TPU_SHADOW"] = "0"
    try:
        t = chained_grid_map_time(
            lambda Xg, Yg: power_map(extract, Xg, Yg, max_order=1, approx=True),
            Xe, Ye, **_kr(5, 3),
        )
        _set(
            "cfg7_city_extract_unculled_pts_per_s", round(ns * ns / t, 1)
        )
    finally:
        del os.environ["DIFFERT2D_TPU_CULL"]
        del os.environ["DIFFERT2D_TPU_SHADOW"]

    # City-extract value+grad map (same vag machinery on the oblique
    # 136-wall extract).
    t = chained_grid_map_time(
        lambda Xg, Yg: power_map(
            extract, Xg, Yg, max_order=1, approx=True, value_and_grad=True
        ),
        Xe, Ye, **_kr(16, 3),
    )
    _set("cfg7_vag_pts_per_s", round(ns * ns / t, 1))

    # City TX-placement optimization step: adam on the TX position
    # against the summed 64x64 coverage map of the extract scene (the
    # workload the gradient machinery exists for). The TX is traced, so
    # dispatch resolves to the XLA tracer (kernel tables bake host-side
    # wall/TX data); order 1, image solver.
    nopt = min(ns, 64)
    Xo, Yo = jnp.meshgrid(
        jnp.linspace(0.01, 0.99, nopt), jnp.linspace(0.01, 0.99, nopt)
    )

    def city_loss(tx_xy):
        s = extract.with_transmitters(tx=Point(xy=tx_xy))
        return -jnp.sum(
            power_map(s, Xo, Yo, max_order=1, approx=True, jit=False)
        )

    city_opt = optax.chain(optax.adam(0.01), optax.zero_nans())

    @jax.jit
    def city_step(tx_c, state):
        v, g = jax.value_and_grad(city_loss)(tx_c)
        updates, state = city_opt.update(g, state)
        return tx_c + updates, state, v

    def _city_carry_step(c):
        x, st = c
        x, st, v = city_step(x, st)
        return (x, st), v

    tx_c = jnp.array([0.5, 0.5], dtype=jnp.float32)
    t = scan_step_time(
        _city_carry_step, (tx_c, city_opt.init(tx_c)), **_kr(10, 3)
    )
    _set("cfg7_txopt_s_per_step", round(t, 4))

    # Config 8: second-order city map (18,497 candidates x 136 walls) --
    # the scale multi-bounce tile-beam culling unlocks (measured 7.1x
    # over unculled, bit-identical).
    t = chained_grid_map_time(
        lambda Xg, Yg: power_map(extract, Xg, Yg, max_order=2, approx=True),
        # ~300 ms/map: dispatch cost is negligible and the order-2
        # kernel's compile is the most expensive in the sweep, so skip
        # the two extra scan-body compiles.
        Xe, Ye, scan=False, **_kr(3, 2),
    )
    _set("cfg8_city_extract_order2_pts_per_s", round(ns * ns / t, 1))

    # Config 5: RIS phase-gradient optimization step (MPT).  No backend
    # pin: the scene carries the traced phi, so auto dispatch resolves
    # to the XLA tracer (the Pallas solver kernel bakes concrete
    # scalars); MPT itself is Pallas-auto-eligible for inference maps
    # under the PARITY.md tolerance contract.
    base = Scene.square_scene()
    nr = 8 if tiny else 16
    Xr, Yr = jnp.meshgrid(
        jnp.linspace(0.05, 0.45, nr), jnp.linspace(0.05, 0.95, nr)
    )

    def ris_loss(phi):
        s = base.add_objects(
            RIS(xys=jnp.array([[0.5, 0.3], [0.5, 0.7]]), phi=phi)
        )
        Z = power_map(
            s,
            Xr,
            Yr,
            order=1,
            solver="mpt",
            steps=100,
            approx=True,
            key=key,
            filter_objects=lambda o: isinstance(o, RIS),
        )
        return -jnp.sum(Z)

    ris_opt = optax.chain(optax.adam(0.05), optax.zero_nans())
    ris_vag_fwd = value_and_grad_fwd(ris_loss)

    # Headline step: FORWARD-mode phi gradient (1 scalar parameter ->
    # one JVP streams the 100-step solver scan once, no stored
    # trajectory, no transposed scan). Same unrolled-argmin derivative
    # as reverse mode (optimize.value_and_grad_fwd docstring).
    @jax.jit
    def ris_step(phi, state):
        v, g = ris_vag_fwd(phi)
        updates, state = ris_opt.update(g, state)
        return phi + updates, state, v

    def _phi_carry_step(step2):
        def step(c):
            p, st = c
            p, st, v = step2(p, st)
            return (p, st), v

        return step

    # Strongly-typed init: a weak jnp.array(0.5) would retrace the
    # jitted step after the first update (weak -> strong promotion).
    phi = jnp.array(0.5, dtype=jnp.float32)
    # Sub-ms steps chained in one scan dispatch: k=100 puts the chained
    # signal (~30 ms) above the round-trip jitter with zero per-step
    # host enqueues.
    t = scan_step_time(
        _phi_carry_step(ris_step), (phi, ris_opt.init(phi)), **_kr(100, 3)
    )
    _set("cfg5_ris_phase_opt_s_per_step", round(t, 5))

    # Reverse-mode comparison row (the round-2 methodology).
    @jax.jit
    def ris_step_rev(phi, state):
        v, g = jax.value_and_grad(ris_loss)(phi)
        updates, state = ris_opt.update(g, state)
        return phi + updates, state, v

    phi_r = jnp.array(0.5, dtype=jnp.float32)
    t = scan_step_time(
        _phi_carry_step(ris_step_rev), (phi_r, ris_opt.init(phi_r)),
        **_kr(100, 3),
    )
    _set("cfg5_ris_phase_opt_rev_s_per_step", round(t, 5))

    return out


# --------------------------------------------------------------------------
# Resilience wrapper (the default entry).  The round-2 bench artifact was
# lost to a down tunnel (rc=1, no JSON); everything below exists so that
# can never happen again: probe -> inner subprocess -> retry -> CPU
# fallback -> minimal error JSON, always exit 0.
# --------------------------------------------------------------------------

_PROBE_SRC = (
    "import jax, jax.numpy as jnp;"
    "print(float(jax.jit(lambda x: x.sum())(jnp.arange(8.0))))"
)


def _log(msg: str) -> None:
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _probe_once(timeout_s: float) -> bool:
    """One tiny jitted op in a subprocess: exercises tunnel AND the
    remote-compile service.  A test hook (BENCH_PROBE_CMD) can replace
    the probe command to simulate a down/up backend."""
    cmd = os.environ.get("BENCH_PROBE_CMD")
    argv = ["/bin/sh", "-c", cmd] if cmd else [sys.executable, "-c", _PROBE_SRC]
    try:
        proc = subprocess.run(
            argv, timeout=timeout_s, capture_output=True, text=True
        )
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False
    except OSError:
        return False


def _probe_with_retry(attempts: int, timeout_s: float) -> bool:
    backoff = float(os.environ.get("BENCH_PROBE_BACKOFF", "60"))
    for i in range(attempts):
        t0 = time.time()
        if _probe_once(timeout_s):
            _log(f"device probe ok (attempt {i + 1}, {time.time() - t0:.0f}s)")
            return True
        _log(f"device probe failed (attempt {i + 1}/{attempts})")
        if i < attempts - 1:
            _log(f"retrying in {backoff:.0f}s (tunnel may be healing)")
            time.sleep(backoff)
            backoff = min(2 * backoff, 600.0)
    return False


def _run_inner(extra_env: dict, timeout_s: float):
    """Run ``bench.py --inner`` as a subprocess; return
    ``(result_dict_or_None, partials_dict, error_str_or_None)``.

    stdout goes to a temp file so a killed/hung child still leaves its
    ``#PART#`` stream readable; the child is killed by exact PID.
    """
    env = dict(os.environ)
    for k, v in extra_env.items():
        if v is None:
            env.pop(k, None)  # None = unset (e.g. the axon plugin trigger)
        else:
            env[k] = v
    error = None
    with tempfile.TemporaryFile(mode="w+") as out:
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--inner"],
            stdout=out,
            stderr=sys.stderr,
            env=env,
        )
        try:
            rc = proc.wait(timeout=timeout_s)
            if rc != 0:
                error = f"inner bench exited rc={rc}"
        except subprocess.TimeoutExpired:
            proc.kill()
            proc.wait()
            error = f"inner bench hung (> {timeout_s:.0f}s), killed"
        out.seek(0)
        lines = out.read().splitlines()
    partials = {}
    result = None
    for line in lines:
        line = line.strip()
        if line.startswith("#PART# "):
            try:
                partials.update(json.loads(line[len("#PART# "):]))
            except ValueError:
                pass
        elif line.startswith("{"):
            try:
                result = json.loads(line)
            except ValueError:
                pass
    if result is None and error is None:
        error = "inner bench produced no final JSON line"
    return result, partials, error


def _assemble_partial(partials: dict, error: str) -> dict:
    """Build a best-effort result from streamed partials after a hang."""
    result = {
        "metric": "rx_grid_points_per_s_per_chip",
        "value": 0.0,
        "unit": "points/s/chip",
        "vs_baseline": 0.0,
        "partial": True,
        "error": error,
    }
    result.update(partials)
    return result


def main() -> int:
    """Wrapper entry: ALWAYS prints one JSON line and returns 0.

    Round-4 post-mortem hardening: BENCH_r04.json shipped as a CPU
    fallback because the probe's 4-attempt/~7.5-minute window was
    shorter than a tunnel outage.  The defaults now give each probe
    ~45 minutes (8 attempts, 60 s doubling backoff capped at 600 s),
    every inner relaunch gets a FULL probe window (not one attempt),
    partials are merged across relaunches so a mid-sweep death still
    yields a TPU-attributed artifact carrying every finished config,
    and the CPU fallback keeps the config sweep on tiny grids so even
    a full-round outage certifies correctness rows for cfg2..cfg8.
    """
    attempts = int(os.environ.get("BENCH_PROBE_ATTEMPTS", "8"))
    probe_timeout = float(os.environ.get("BENCH_PROBE_TIMEOUT", "180"))
    # The full sweep measures ~35 min with a warm compile cache; leave
    # headroom for a cold cache / slow tunnel before declaring the run
    # hung (a kill mid-sweep still salvages the streamed partials).
    device_timeout = float(os.environ.get("BENCH_DEVICE_TIMEOUT", "5400"))
    cpu_timeout = float(os.environ.get("BENCH_CPU_TIMEOUT", "1800"))
    inner_tries = int(os.environ.get("BENCH_INNER_RETRIES", "2")) + 1
    force_cpu = os.environ.get("BENCH_FORCE_CPU") == "1"

    device_error = None
    if not force_cpu:
        partials, error = {}, None
        for attempt in range(inner_tries):
            if not _probe_with_retry(attempts, probe_timeout):
                device_error = (
                    f"device probe failed after {attempts} attempts"
                    + (f" (run {attempt + 1})" if attempt else "")
                )
                break
            result, run_partials, run_error = _run_inner({}, device_timeout)
            # Merge across relaunches: earlier runs' finished configs
            # survive even if a later relaunch dies sooner.
            partials.update(run_partials)
            error = run_error
            if result is not None:
                print(json.dumps(result))
                return 0
            _log(
                f"device bench failed (run {attempt + 1}/{inner_tries}):"
                f" {run_error}"
            )
        if device_error is None:
            device_error = f"device bench failed after retries: {error}"
        if partials.get("value", 0):
            # The headline metric (and possibly sweep configs) were
            # measured before the failure: report the TPU-attributed
            # partial rather than discarding device data.
            print(json.dumps(_assemble_partial(partials, device_error)))
            return 0

    # ---- CPU fallback: interpreter-mode sanity numbers ----------------
    _log(f"falling back to CPU ({device_error or 'BENCH_FORCE_CPU=1'})")
    # Unsetting PALLAS_AXON_POOL_IPS keeps the axon plugin from
    # registering at all in the child, so JAX_PLATFORMS=cpu holds.
    cpu_env = {"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": None}
    if "BENCH_SIZE" not in os.environ:
        cpu_env["BENCH_SIZE"] = "128"  # CI-validated size/time envelope
    if "BENCH_BASELINE_SIZE" not in os.environ:
        cpu_env["BENCH_BASELINE_SIZE"] = "64"
    if "BENCH_SWEEP_SIZE" not in os.environ:
        # Keep the sweep ON (correctness rows for every config), but on
        # grids small enough for the CPU-interpreter envelope.
        cpu_env["BENCH_SWEEP_SIZE"] = "32"
    result, partials, error = _run_inner(cpu_env, cpu_timeout)
    if result is None:
        result = _assemble_partial(
            partials, f"cpu fallback also failed: {error}"
        )
    result["device"] = "cpu-fallback"
    result["error"] = device_error or "forced CPU (BENCH_FORCE_CPU=1)"
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    if "--inner" in sys.argv[1:]:
        _inner_main()
    else:
        sys.exit(main())
