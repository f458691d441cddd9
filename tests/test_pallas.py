"""Fused Pallas kernel tests (interpreter mode on CPU): numerics must
match the XLA tracer across approx modes, orders, activations, kinds, and
runtime scalar overrides."""

import chex
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from differt2d_tpu import tracer
from differt2d_tpu.geometry import RIS, Vertex
from differt2d_tpu.logic import sigmoid
from differt2d_tpu.ops.pallas_kernels import pallas_power_map
from differt2d_tpu.scene import Scene

TOL = dict(rtol=1e-4, atol=1e-5)


def assert_close_except_kinks(actual, desired, frac=0.005, **tol):
    """allclose, tolerating a tiny fraction of KINK pixels (see
    :func:`differt2d_tpu.utils.kink_excess` for the contract)."""
    from differt2d_tpu.utils import kink_excess

    tol = {**TOL, **tol}
    n_bad, allowed = kink_excess(
        actual, desired, rtol=tol["rtol"], atol=tol["atol"], frac=frac
    )
    assert n_bad <= allowed, (
        f"{n_bad} pixels beyond kink allowance {allowed:.0f}"
    )


@pytest.fixture
def grids():
    return jnp.meshgrid(jnp.linspace(0.05, 0.95, 16), jnp.linspace(0.04, 0.96, 9))


@pytest.mark.parametrize("approx", [True, False])
@pytest.mark.parametrize("max_order", [0, 1, 2])
def test_matches_xla(grids, approx, max_order):
    scene = Scene.basic_scene()
    X, Y = grids
    ref = tracer.power_map(
        scene, X, Y, max_order=max_order, approx=approx, backend="xla"
    )
    pal = pallas_power_map(
        scene, X, Y, max_order=max_order, approx=approx, interpret=True
    )
    chex.assert_trees_all_close(ref, pal, **TOL)


def test_sigmoid_activation(grids):
    scene = Scene.basic_scene()
    X, Y = grids
    ref = tracer.power_map(
        scene, X, Y, max_order=1, approx=True, function=sigmoid, backend="xla"
    )
    pal = pallas_power_map(
        scene, X, Y, max_order=1, approx=True, sigmoid=True, interpret=True
    )
    chex.assert_trees_all_close(ref, pal, **TOL)


def test_runtime_scalars(grids):
    scene = Scene.basic_scene()
    X, Y = grids
    kw = dict(max_order=1, approx=True, alpha=7.0, tol=0.05, patch=0.1,
              r_coef=0.8, height=0.25)
    ref = tracer.power_map(scene, X, Y, backend="xla", **kw)
    pal = pallas_power_map(scene, X, Y, interpret=True, **kw)
    chex.assert_trees_all_close(ref, pal, **TOL)


def test_ris_and_vertex_kinds(grids):
    scene = Scene.square_scene().add_objects(
        RIS(xys=jnp.array([[0.5, 0.3], [0.5, 0.7]])),
        Vertex(xy=jnp.array([0.25, 0.75])),
    )
    X, Y = grids
    ref = tracer.power_map(scene, X, Y, max_order=1, approx=True, backend="xla")
    pal = pallas_power_map(scene, X, Y, max_order=1, approx=True, interpret=True)
    chex.assert_trees_all_close(ref, pal, **TOL)


def test_filter_objects(grids):
    scene = Scene.square_scene().add_objects(
        RIS(xys=jnp.array([[0.5, 0.3], [0.5, 0.7]]))
    )
    X, Y = grids
    flt = lambda o: isinstance(o, RIS)  # noqa: E731
    ref = tracer.power_map(
        scene, X, Y, order=1, approx=True, filter_objects=flt, backend="xla"
    )
    pal = pallas_power_map(
        scene, X, Y, order=1, approx=True, filter_objects=flt, interpret=True
    )
    chex.assert_trees_all_close(ref, pal, **TOL)


def test_auto_backend_dispatch(grids):
    """power_map(backend='auto') must route image-solver forward maps to
    the Pallas kernel on every platform (interpret on CPU)."""
    scene = Scene.basic_scene()
    X, Y = grids
    auto = tracer.power_map(scene, X, Y, max_order=1, approx=True)
    pal = pallas_power_map(scene, X, Y, max_order=1, approx=True, interpret=True)
    chex.assert_trees_all_equal(auto, pal)


def test_auto_backend_tx_grid(grids):
    """TX-grid mode uses path-reversal symmetry (wall-only scenes)."""
    scene = Scene.basic_scene()
    X, Y = grids
    auto = tracer.power_map(
        scene, X, Y, max_order=1, approx=True, on_transmitters=True
    )
    ref = tracer.power_map(
        scene, X, Y, max_order=1, approx=True, on_transmitters=True,
        backend="xla",
    )
    chex.assert_trees_all_close(auto, ref, **TOL)


@pytest.mark.parametrize("approx", [True, False])
def test_grad_map_matches_xla(grids, approx):
    """In-kernel forward-mode pixel gradients vs the XLA tracer's jvp path."""
    scene = Scene.basic_scene()
    X, Y = grids
    ref = tracer.power_map(
        scene, X, Y, max_order=1, approx=approx, grad=True, backend="xla"
    )
    pal = pallas_power_map(
        scene, X, Y, max_order=1, approx=approx, grad=True, interpret=True
    )
    assert pal.shape == (*X.shape, 2)
    assert_close_except_kinks(pal, ref)


def test_value_and_grad_map_matches_xla(grids):
    scene = Scene.basic_scene()
    X, Y = grids
    rv, rg = tracer.power_map(
        scene, X, Y, max_order=1, approx=True, value_and_grad=True,
        backend="xla",
    )
    pv, pg = pallas_power_map(
        scene, X, Y, max_order=1, approx=True, value_and_grad=True,
        interpret=True,
    )
    chex.assert_trees_all_close(rv, pv, **TOL)
    assert_close_except_kinks(pg, rg)


def test_grad_map_looped_matches_xla(grids):
    """Gradient maps through the fori_loop kernel (large candidate set)."""
    scene = Scene.basic_scene()
    X, Y = grids
    ref = tracer.power_map(
        scene, X, Y, max_order=2, approx=True, grad=True, backend="xla"
    )
    pal = pallas_power_map(
        scene, X, Y, max_order=2, approx=True, grad=True, interpret=True
    )
    assert_close_except_kinks(pal, ref)


def test_grad_auto_dispatches_to_pallas(grids):
    """grad=True with an image-solver request now rides the Pallas kernel
    under backend='auto' and must equal the XLA tracer."""
    scene = Scene.basic_scene()
    X, Y = grids
    auto = tracer.power_map(scene, X, Y, max_order=1, approx=True, grad=True)
    ref = tracer.power_map(
        scene, X, Y, max_order=1, approx=True, grad=True, backend="xla"
    )
    assert auto.shape == (*X.shape, 2)
    assert_close_except_kinks(auto, ref)


def test_solver_grad_requests_stay_on_xla(grids, key):
    """Fermat/MPT gradient maps still run on the XLA tracer."""
    scene = Scene.square_scene()
    X, Y = grids
    out = tracer.power_map(
        scene, X, Y, max_order=1, approx=True, grad=True, solver="mpt",
        key=key, steps=5,
    )
    assert out.shape == (*X.shape, 2)
    with pytest.raises(ValueError):
        tracer.power_map(
            scene, X, Y, max_order=1, approx=True, grad=True, solver="mpt",
            key=key, steps=5, backend="pallas",
        )


def test_looped_kernel_matches_xla(grids):
    """The fori_loop kernel (large candidate sets) vs the XLA tracer."""
    import numpy as np

    from differt2d_tpu.ops.pallas_kernels import build_power_map_kernel_looped
    from differt2d_tpu.rt import path_candidate_matrices

    scene = Scene.basic_scene()
    arrays = tracer.scene_arrays(scene)
    groups = path_candidate_matrices(arrays.num_objects, 0, 2)  # 50 cands
    run = build_power_map_kernel_looped(
        arrays.num_objects, groups, approx=True, interpret=True
    )
    X, Y = grids
    pix = jnp.stack([X.ravel(), Y.ravel()], axis=-1)
    scal = jnp.array([100.0, 1e-2, 0.0, 0.5, 0.1], dtype=jnp.float32)
    out = run(
        pix, scene.transmitters["tx"].xy, arrays.walls, arrays.kind,
        arrays.phi, scal,
    ).reshape(X.shape)
    ref = tracer.power_map(scene, X, Y, max_order=2, approx=True, backend="xla")
    chex.assert_trees_all_close(out, ref, **TOL)


def test_looped_kernel_runtime_walls(grids):
    """One compiled looped kernel serves different wall coordinates."""
    from differt2d_tpu.ops.pallas_kernels import build_power_map_kernel_looped
    from differt2d_tpu.rt import path_candidate_matrices

    X, Y = grids
    pix = jnp.stack([X.ravel(), Y.ravel()], axis=-1)
    scal = jnp.array([100.0, 1e-2, 0.0, 0.5, 0.1], dtype=jnp.float32)
    groups = path_candidate_matrices(4, 0, 2)
    run = build_power_map_kernel_looped(4, groups, approx=True, interpret=True)
    for factory in (Scene.square_scene, Scene.square_scene_with_obstacle):
        scene = factory()
        if len(scene.objects) != 4:
            scene = Scene.square_scene(tx_coords=(0.3, 0.3))
        arrays = tracer.scene_arrays(scene)
        out = run(
            pix, scene.transmitters["tx"].xy, arrays.walls, arrays.kind,
            arrays.phi, scal,
        ).reshape(X.shape)
        ref = tracer.power_map(
            scene, X, Y, max_order=2, approx=True, backend="xla"
        )
        chex.assert_trees_all_close(out, ref, **TOL)


def test_auto_backend_order2(grids):
    """Auto dispatch covers order-2 candidate sets (unrolled kernel below
    the instruction-stream crossover, looped above; both allclose)."""
    scene = Scene.basic_scene()
    X, Y = grids
    auto = tracer.power_map(scene, X, Y, max_order=2, approx=True)
    ref = tracer.power_map(scene, X, Y, max_order=2, approx=True, backend="xla")
    chex.assert_trees_all_close(auto, ref, **TOL)


class TestOptSolverKernel:
    """Opt-in in-kernel adam solver (backend='pallas', order-1 fermat/mpt).

    In interpreter mode (CPU) it matches the XLA tracer; on real TPU the
    two 100-step adam trajectories may diverge at validity boundaries
    (documented), which is why it is not auto-dispatched.
    """

    def test_mpt_ris_matches_xla(self, grids, key):
        scene = Scene.square_scene().add_objects(
            RIS(xys=jnp.array([[0.5, 0.3], [0.5, 0.7]]))
        )
        flt = lambda o: isinstance(o, RIS)  # noqa: E731
        X, Y = grids
        pal = tracer.power_map(
            scene, X, Y, order=1, solver="mpt", steps=50, approx=True,
            key=key, filter_objects=flt, backend="pallas",
        )
        ref = tracer.power_map(
            scene, X, Y, order=1, solver="mpt", steps=50, approx=True,
            key=key, filter_objects=flt, backend="xla",
        )
        chex.assert_trees_all_close(pal, ref, rtol=1e-3, atol=1e-5)

    def test_fermat_walls_matches_xla(self, grids, key):
        scene = Scene.square_scene()
        X, Y = grids
        pal = tracer.power_map(
            scene, X, Y, order=1, solver="fermat", steps=50, approx=True,
            key=key, backend="pallas",
        )
        ref = tracer.power_map(
            scene, X, Y, order=1, solver="fermat", steps=50, approx=True,
            key=key, backend="xla",
        )
        chex.assert_trees_all_close(pal, ref, rtol=1e-3, atol=1e-4)

    def test_rejects_multi_order(self, grids, key):
        scene = Scene.square_scene()
        X, Y = grids
        with pytest.raises(ValueError):
            tracer.power_map(
                scene, X, Y, max_order=2, solver="mpt", approx=True,
                key=key, backend="pallas",
            )

    def test_requires_key(self, grids):
        scene = Scene.square_scene()
        X, Y = grids
        with pytest.raises(ValueError):
            tracer.power_map(
                scene, X, Y, order=1, solver="mpt", approx=True,
                backend="pallas",
            )

    def test_auto_keeps_solvers_on_xla_off_tpu(self, grids, key):
        """Off real TPU, auto dispatch must not route fermat/mpt to the
        kernel (the interpreted 100-step adam loop is pathological; on
        TPU both auto-dispatch under the tolerance contract pinned by
        :class:`TestFlipRateContract`)."""
        if jax.default_backend() == "tpu":
            pytest.skip("on TPU, fermat/mpt DO auto-dispatch (by design)")
        scene = Scene.square_scene()
        X, Y = grids
        auto = tracer.power_map(
            scene, X, Y, order=1, solver="mpt", steps=30, approx=True, key=key
        )
        ref = tracer.power_map(
            scene, X, Y, order=1, solver="mpt", steps=30, approx=True,
            key=key, backend="xla",
        )
        chex.assert_trees_all_equal(auto, ref)


class TestFlipRateContract:
    """Pin the documented Pallas-vs-XLA disagreement bounds (PARITY.md).

    On real TPU, Mosaic-vs-XLA transcendental rounding flips a small
    fraction of validity-boundary pixels: measured ~0.02% for the
    order-2 image kernels and 0.12% for the 100-step in-kernel adam
    solver (round 2). These tests bound the flip rate so a regression
    to percent-scale disagreement fails loudly; in interpreter mode
    (CPU) the backends agree to ~1e-7 and the bounds hold trivially.
    """

    # Contract bounds (PARITY.md "Known numerical tolerances").
    IMAGE_FLIP_BOUND = 0.002  # order-2 image kernel, measured ~2e-4
    SOLVER_FLIP_BOUND = 0.005  # in-kernel adam solver, measured 1.2e-3

    @staticmethod
    def _flip_stats(pal, ref, flip_atol=0.05):
        pal = np.asarray(pal)
        ref = np.asarray(ref)
        err = np.abs(pal - ref)
        scale = 1.0 + np.abs(ref)
        flipped = err > flip_atol * scale
        rate = float(flipped.mean())
        rest = float((err[~flipped] / scale[~flipped]).max()) if (~flipped).any() else 0.0
        return rate, rest

    def test_image_order2_flip_rate(self, grids):
        scene = Scene.basic_scene()
        X, Y = grids
        ref = tracer.power_map(scene, X, Y, max_order=2, approx=True,
                               backend="xla")
        pal = pallas_power_map(
            scene, X, Y, max_order=2, approx=True,
            interpret=jax.default_backend() != "tpu",
        )
        rate, rest = self._flip_stats(pal, ref)
        assert rate <= self.IMAGE_FLIP_BOUND, (rate, self.IMAGE_FLIP_BOUND)
        assert rest <= 1e-3, rest

    def test_crossover_kernel_vs_kernel_flip_rate(self, grids):
        """The order>=2 dispatch crossover (unrolled -> culled looped,
        measured 1.3-1.5x on TPU) swaps kernels whose outputs differ on
        validity-boundary pixels only; pin the kernel-vs-kernel flip
        rate like the MPT auto-dispatch contract."""
        from differt2d_tpu.ops.pallas_kernels import (
            build_power_map_kernel, build_power_map_kernel_looped)
        from differt2d_tpu.rt import path_candidate_matrices
        from differt2d_tpu.tracer import scene_arrays

        scene = Scene.basic_scene()
        arrays = scene_arrays(scene)
        groups = path_candidate_matrices(arrays.num_objects, 0, 2)
        X, Y = grids
        pix = jnp.stack([X.ravel(), Y.ravel()], axis=-1)
        scal = jnp.array([100.0, 1e-2, 0.0, 0.5, 0.1], dtype=jnp.float32)
        tx = scene.transmitters["tx"].xy
        interp = jax.default_backend() != "tpu"
        un = build_power_map_kernel(
            np.asarray(arrays.walls), np.asarray(arrays.kind), groups,
            approx=True, interpret=interp, block_rows=8,
        )
        lp = build_power_map_kernel_looped(
            arrays.num_objects, groups, approx=True, interpret=interp,
            block_rows=8, cull=True, shadow=True,
        )
        a = un(pix, tx, arrays.phi, scal)
        b = lp(pix, tx, arrays.walls, arrays.kind, arrays.phi, scal)
        rate, rest = self._flip_stats(a, b)
        assert rate <= self.IMAGE_FLIP_BOUND, (rate, self.IMAGE_FLIP_BOUND)
        assert rest <= 1e-3, rest

    def test_mpt_flip_rate_contract(self, grids, key):
        scene = Scene.square_scene()
        X, Y = grids
        kw = dict(order=1, solver="mpt", steps=50, approx=True, key=key)
        ref = tracer.power_map(scene, X, Y, backend="xla", **kw)
        pal = tracer.power_map(scene, X, Y, backend="pallas", **kw)
        rate, rest = self._flip_stats(pal, ref)
        assert rate <= self.SOLVER_FLIP_BOUND, (rate, self.SOLVER_FLIP_BOUND)
        assert rest <= 1e-3, rest


def test_multiple_transmitters(grids):
    from differt2d_tpu.geometry import Point

    scene = Scene.basic_scene().update_transmitters(
        tx2=Point(xy=jnp.array([0.8, 0.8]))
    )
    X, Y = grids
    ref = tracer.power_map(scene, X, Y, max_order=1, approx=True, backend="xla")
    pal = pallas_power_map(scene, X, Y, max_order=1, approx=True, interpret=True)
    chex.assert_trees_all_close(ref, pal, **TOL)


def test_vag_reverse_equals_forward_tangents():
    """All three looped tangent implementations must agree: the
    hand-derived analytic sweep (``tangent_impl='analytic'``, default),
    the per-candidate reverse sweep (``'vjp'``), and the double-jvp
    fallback -- including on grids where order-2 candidates hit the
    parallel-ray (``un == 0``) degeneracy: reverse mode once formed
    ``0 * inf = NaN`` through the single-where sqrt guard in
    ``_normalize`` (fixed by guarding the sqrt input)."""
    from differt2d_tpu.ops.pallas_kernels import build_power_map_kernel_looped
    from differt2d_tpu.rt import path_candidate_matrices
    from differt2d_tpu.tracer import scene_arrays

    scene = Scene.basic_scene()
    arrays = scene_arrays(scene)
    groups = path_candidate_matrices(arrays.num_objects, 0, 2)
    X, Y = jnp.meshgrid(
        jnp.linspace(0.05, 0.95, 16), jnp.linspace(0.07, 0.93, 12)
    )
    pixels = jnp.stack([X.ravel(), Y.ravel()], axis=-1)
    scalars = jnp.array([100.0, 1e-2, 0.0, 0.5, 0.1], dtype=jnp.float32)
    tx = scene.transmitters["tx"].xy
    W = int(arrays.walls.shape[0])
    outs = {}
    for impl in ("analytic", "vjp", "jvp2"):
        run = build_power_map_kernel_looped(
            W, groups, approx=True, sigmoid=True, interpret=True,
            mode="value_and_grad", tangent_impl=impl,
        )
        outs[impl] = run(
            pixels, tx, arrays.walls, arrays.kind, arrays.phi, scalars
        )
    for part in outs["analytic"]:
        assert np.isfinite(np.asarray(part)).all()
    chex.assert_trees_all_close(outs["vjp"], outs["jvp2"], rtol=1e-4, atol=1e-4)
    chex.assert_trees_all_close(
        outs["analytic"], outs["vjp"], rtol=1e-4, atol=1e-4
    )


def test_unrolled_vag_eager_matches_looped():
    """The unrolled per-candidate reverse vag (the real-TPU grad path,
    dispatched below the instruction-stream crossover) agrees with the
    looped vag.  Run EAGERLY in interpreter mode: under jit the
    interpreted unrolled reverse program becomes one giant XLA:CPU
    compile (>16 min at 8 candidates), which is also why auto-dispatch
    keeps grad maps on the looped kernel when ``interpret=True``."""
    import numpy as np

    from differt2d_tpu.ops.pallas_kernels import (
        build_power_map_kernel,
        build_power_map_kernel_looped,
    )
    from differt2d_tpu.rt import path_candidate_matrices
    from differt2d_tpu.tracer import scene_arrays

    scene = Scene.basic_scene()
    arrays = scene_arrays(scene)
    groups = path_candidate_matrices(arrays.num_objects, 0, 1)
    X, Y = jnp.meshgrid(
        jnp.linspace(0.05, 0.95, 16), jnp.linspace(0.07, 0.93, 12)
    )
    pixels = jnp.stack([X.ravel(), Y.ravel()], axis=-1)
    scalars = jnp.array([100.0, 1e-2, 0.0, 0.5, 0.1], dtype=jnp.float32)
    tx = scene.transmitters["tx"].xy

    unrolled = build_power_map_kernel(
        np.asarray(arrays.walls), np.asarray(arrays.kind), groups,
        approx=True, interpret=True, mode="value_and_grad",
    )
    looped = build_power_map_kernel_looped(
        int(arrays.walls.shape[0]), groups,
        approx=True, interpret=True, mode="value_and_grad",
    )
    vu, du = unrolled(pixels, tx, arrays.phi, scalars)
    vl, dl = looped(pixels, tx, arrays.walls, arrays.kind, arrays.phi, scalars)
    chex.assert_trees_all_close((vu, du), (vl, dl), rtol=1e-4, atol=1e-4)


def test_all_vertex_solver_maps_dispatch_to_pallas(grids):
    """Vertex-only Fermat/MPT candidate sets pin every bounce and carry
    zero residual (reference ``geometry.py:353-431``), so they dispatch to
    the fused image kernels under backend='auto' and must match the XLA
    tracer's solver path."""
    scene = Scene.square_scene().add_objects(
        Vertex(xy=jnp.array([0.3, 0.6])), Vertex(xy=jnp.array([0.7, 0.2]))
    )
    X, Y = grids
    flt = lambda o: isinstance(o, Vertex)  # noqa: E731
    key = jax.random.PRNGKey(7)
    for solver in ("fermat", "mpt"):
        ref = tracer.power_map(
            scene, X, Y, order=1, solver=solver, approx=True, key=key,
            steps=10, filter_objects=flt, backend="xla",
        )
        auto = tracer.power_map(
            scene, X, Y, order=1, solver=solver, approx=True, key=key,
            steps=10, filter_objects=flt,
        )
        pal = pallas_power_map(
            scene, X, Y, order=1, solver=solver, approx=True, key=key,
            filter_objects=flt, interpret=True,
        )
        chex.assert_trees_all_close(ref, auto, **TOL)
        chex.assert_trees_all_close(ref, pal, **TOL)


def test_unrolled_order2_mixed_kinds_eager_matches_xla():
    """Order-2 candidate sets with RIS + Vertex kinds through the UNROLLED
    kernel (the real-TPU dispatch below the instruction-stream crossover).
    Run eagerly in interpreter mode: under jit the big interpreted stream
    is XLA:CPU-compile-pathological, which is why interpret-mode
    auto-dispatch keeps >16-candidate sets on the looped kernel."""
    import numpy as np

    from differt2d_tpu.ops.pallas_kernels import build_power_map_kernel
    from differt2d_tpu.rt import path_candidate_matrices
    from differt2d_tpu.tracer import scene_arrays

    scene = Scene.square_scene().add_objects(
        RIS(xys=jnp.array([[0.5, 0.3], [0.5, 0.7]])),
        Vertex(xy=jnp.array([0.25, 0.75])),
    )
    arrays = scene_arrays(scene)
    groups = path_candidate_matrices(arrays.num_objects, 0, 2)  # 37 cands
    X, Y = jnp.meshgrid(
        jnp.linspace(0.05, 0.95, 16), jnp.linspace(0.07, 0.93, 9)
    )
    pixels = jnp.stack([X.ravel(), Y.ravel()], axis=-1)
    scalars = jnp.array([100.0, 1e-2, 0.0, 0.5, 0.1], dtype=jnp.float32)
    run = build_power_map_kernel(
        np.asarray(arrays.walls), np.asarray(arrays.kind), groups,
        approx=True, interpret=True,
    )
    out = run(
        pixels, scene.transmitters["tx"].xy, arrays.phi, scalars
    ).reshape(X.shape)
    ref = tracer.power_map(scene, X, Y, max_order=2, approx=True, backend="xla")
    chex.assert_trees_all_close(out, ref, **TOL)


def test_all_vertex_solver_grad_maps(grids):
    """grad/value_and_grad on vertex-only Fermat requests work through
    every backend (they reduce to the image kernels' KIND_VERTEX path) and
    agree with the XLA tracer."""
    scene = Scene.square_scene().add_objects(
        Vertex(xy=jnp.array([0.3, 0.6])), Vertex(xy=jnp.array([0.7, 0.2]))
    )
    X, Y = grids
    flt = lambda o: isinstance(o, Vertex)  # noqa: E731
    key = jax.random.PRNGKey(7)
    kw = dict(order=1, solver="fermat", approx=True, key=key, steps=10,
              filter_objects=flt, grad=True)
    ref = tracer.power_map(scene, X, Y, backend="xla", **kw)
    auto = tracer.power_map(scene, X, Y, **kw)
    forced = tracer.power_map(scene, X, Y, backend="pallas", **kw)
    assert auto.shape == (*X.shape, 2)
    chex.assert_trees_all_close(ref, auto, **TOL)
    chex.assert_trees_all_close(ref, forced, **TOL)


def test_x64_mode_declines_pallas(grids):
    """Under jax_enable_x64 the f32-only kernels must decline auto
    dispatch (XLA tracer serves the request in f64) and a forced pallas
    backend must raise a clear error instead of a Mosaic dtype crash."""
    scene = Scene.basic_scene()
    X, Y = grids
    jax.config.update("jax_enable_x64", True)
    try:
        X64, Y64 = X.astype(jnp.float64), Y.astype(jnp.float64)
        out = tracer.power_map(scene, X64, Y64, max_order=1, approx=True)
        assert out.dtype == jnp.float64
        with pytest.raises(ValueError, match="float32-only"):
            pallas_power_map(scene, X64, Y64, max_order=1, approx=True,
                             interpret=True)
    finally:
        jax.config.update("jax_enable_x64", False)


def test_vag_value_halves_match_value_mode():
    """Value maps and value_and_grad maps must not silently desync.

    The looped VALUE kernel now runs the deferred-clamp blocked form
    (_seg_intersect_m6: one division per wall, one activation per
    candidate) while the vag kernel keeps the per-wall activation
    structure its gradient selects need -- so the looped pair agrees to
    reassociation-ULP tolerance, not bitwise.  The unrolled pair still
    shares one pipeline and stays exactly equal."""
    from differt2d_tpu.ops.pallas_kernels import (
        build_power_map_kernel,
        build_power_map_kernel_looped,
    )
    from differt2d_tpu.rt import path_candidate_matrices
    from differt2d_tpu.tracer import scene_arrays

    scene = Scene.basic_scene()
    arrays = scene_arrays(scene)
    groups = path_candidate_matrices(arrays.num_objects, 0, 2)
    X, Y = jnp.meshgrid(
        jnp.linspace(0.05, 0.95, 16), jnp.linspace(0.07, 0.93, 8)
    )
    pixels = jnp.stack([X.ravel(), Y.ravel()], axis=-1)
    scalars = jnp.array([100.0, 1e-2, 0.0, 0.5, 0.1], dtype=jnp.float32)
    tx = scene.transmitters["tx"].xy
    W = int(arrays.walls.shape[0])

    val = build_power_map_kernel_looped(W, groups, approx=True, sigmoid=True,
                                        interpret=True, mode="value")
    vag = build_power_map_kernel_looped(W, groups, approx=True, sigmoid=True,
                                        interpret=True, mode="value_and_grad")
    v0 = val(pixels, tx, arrays.walls, arrays.kind, arrays.phi, scalars)
    v1, _ = vag(pixels, tx, arrays.walls, arrays.kind, arrays.phi, scalars)
    chex.assert_trees_all_close(v0, v1, rtol=1e-4, atol=1e-5)

    g01 = path_candidate_matrices(arrays.num_objects, 0, 1)
    walls_np = np.asarray(arrays.walls)
    kinds_np = np.asarray(arrays.kind)
    uval = build_power_map_kernel(walls_np, kinds_np, g01, approx=True,
                                  interpret=True, mode="value")
    uvag = build_power_map_kernel(walls_np, kinds_np, g01, approx=True,
                                  interpret=True, mode="value_and_grad")
    u0 = uval(pixels, tx, arrays.phi, scalars)
    u1, _ = uvag(pixels, tx, arrays.phi, scalars)
    # Unrolled value path also runs the deferred-clamp blocked form now,
    # so the pair agrees to reassociation-ULP tolerance like the looped
    # one.
    chex.assert_trees_all_close(u0, u1, rtol=1e-4, atol=1e-5)


def test_looped_analytic_vag_mixed_kinds_matches_vjp():
    """RIS loss-gradient chain and vertex (zero grad-t rank-1 state)
    paths of the looped ANALYTIC vag vs the AD-based per-candidate vjp
    scheme, at order 2 where bounce Jacobians chain."""
    from differt2d_tpu.ops.pallas_kernels import build_power_map_kernel_looped
    from differt2d_tpu.rt import path_candidate_matrices
    from differt2d_tpu.tracer import scene_arrays

    scene = Scene.square_scene().add_objects(
        RIS(xys=jnp.array([[0.5, 0.3], [0.5, 0.7]])),
        Vertex(xy=jnp.array([0.25, 0.75])),
    )
    arrays = scene_arrays(scene)
    groups = path_candidate_matrices(arrays.num_objects, 0, 2)  # 37 cands
    X, Y = jnp.meshgrid(
        jnp.linspace(0.05, 0.95, 16), jnp.linspace(0.07, 0.93, 8)
    )
    pixels = jnp.stack([X.ravel(), Y.ravel()], axis=-1)
    scalars = jnp.array([100.0, 1e-2, 0.0, 0.5, 0.1], dtype=jnp.float32)
    tx = scene.transmitters["tx"].xy
    W = int(arrays.walls.shape[0])
    outs = {}
    for impl in ("analytic", "vjp"):
        run = build_power_map_kernel_looped(
            W, groups, approx=True, sigmoid=True, interpret=True,
            mode="value_and_grad", tangent_impl=impl,
        )
        outs[impl] = run(
            pixels, tx, arrays.walls, arrays.kind, arrays.phi, scalars
        )
    for part in outs["analytic"]:
        assert np.isfinite(np.asarray(part)).all()
    # Value halves: ulp-scale only (separately-jitted programs may
    # FMA-contract differently); gradients: kink contract.
    chex.assert_trees_all_close(
        outs["analytic"][0], outs["vjp"][0], rtol=1e-6, atol=2e-6
    )
    assert_close_except_kinks(outs["analytic"][1], outs["vjp"][1], atol=1e-4)


def test_unrolled_vag_vertex_broken_chain_matches_looped():
    """A vertex BEFORE a wall/RIS bounce breaks the image-method
    stationarity identities; the unrolled vag must take the full
    analytic spec-residual / length gradients there (static detection).
    Run eagerly (interpret + jit of the unrolled stream is XLA:CPU-
    pathological); the looped analytic (vjp-verified above) is the
    reference."""
    from differt2d_tpu.ops.pallas_kernels import (
        build_power_map_kernel,
        build_power_map_kernel_looped,
    )
    from differt2d_tpu.rt import path_candidate_matrices
    from differt2d_tpu.tracer import scene_arrays

    scene = Scene.square_scene().add_objects(
        RIS(xys=jnp.array([[0.5, 0.3], [0.5, 0.7]])),
        Vertex(xy=jnp.array([0.25, 0.75])),
    )
    arrays = scene_arrays(scene)
    full = path_candidate_matrices(arrays.num_objects, 2, 2)
    # Only the chain-broken candidates: vertex (index 5) first.
    sel = np.asarray(full[2])
    sel = sel[sel[:, 0] == 5]
    assert sel.shape[0] >= 3
    groups = {2: sel}
    X, Y = jnp.meshgrid(
        jnp.linspace(0.05, 0.95, 16), jnp.linspace(0.07, 0.93, 8)
    )
    pixels = jnp.stack([X.ravel(), Y.ravel()], axis=-1)
    scalars = jnp.array([100.0, 1e-2, 0.0, 0.5, 0.1], dtype=jnp.float32)
    tx = scene.transmitters["tx"].xy
    W = int(arrays.walls.shape[0])
    unrolled = build_power_map_kernel(
        np.asarray(arrays.walls), np.asarray(arrays.kind), groups,
        approx=True, sigmoid=True, interpret=True, mode="value_and_grad",
    )
    vu, du = unrolled(pixels, tx, arrays.phi, scalars)
    looped = build_power_map_kernel_looped(
        W, groups, approx=True, sigmoid=True, interpret=True,
        mode="value_and_grad", tangent_impl="vjp",
    )
    vl, dl = looped(pixels, tx, arrays.walls, arrays.kind, arrays.phi, scalars)
    chex.assert_trees_all_close(vu, vl, rtol=1e-6, atol=2e-6)
    assert_close_except_kinks(du, dl, atol=1e-4)


def test_multi_tx_vag_matches_xla(grids):
    """Multiple transmitters: per-TX (value, grad) tuples sum inside the
    jitted dispatch; must match the XLA tracer (kink contract)."""
    from differt2d_tpu.geometry import Point

    scene = Scene.basic_scene().update_transmitters(
        tx2=Point(xy=jnp.array([0.8, 0.8]))
    )
    X, Y = grids
    rv, rg = tracer.power_map(
        scene, X, Y, max_order=1, approx=True, value_and_grad=True,
        backend="xla",
    )
    pv, pg = pallas_power_map(
        scene, X, Y, max_order=1, approx=True, value_and_grad=True,
        interpret=True,
    )
    chex.assert_trees_all_close(rv, pv, **TOL)
    assert_close_except_kinks(pg, rg)


def test_tx_grid_vag_matches_xla(grids):
    """TX-grid gradient maps through path-reversal symmetry (wall-only
    scenes): the pixel IS the TX end after the swap, so the analytic
    pixel partials are the TX-coordinate gradients."""
    scene = Scene.basic_scene()
    X, Y = grids
    rv, rg = tracer.power_map(
        scene, X, Y, max_order=1, approx=True, value_and_grad=True,
        on_transmitters=True, backend="xla",
    )
    pv, pg = tracer.power_map(
        scene, X, Y, max_order=1, approx=True, value_and_grad=True,
        on_transmitters=True, backend="pallas",
    )
    chex.assert_trees_all_close(rv, pv, **TOL)
    assert_close_except_kinks(pg, rg)


# ---------------------------------------------------------------------------
# Tile-beam candidate culling (bit-identical zero-contribution skipping)


def _looped_args(scene, n=32):
    from differt2d_tpu.tracer import scene_arrays

    arrays = scene_arrays(scene)
    X, Y = jnp.meshgrid(
        jnp.linspace(0.01, 0.99, n), jnp.linspace(0.01, 0.99, n)
    )
    pix = jnp.stack([X.ravel(), Y.ravel()], axis=-1)
    scal = jnp.array([100.0, 1e-2, 0.0, 0.5, 0.1], dtype=jnp.float32)
    return arrays, pix, scal


@pytest.mark.parametrize("approx", [True, False])
def test_cull_bitwise_identical(approx):
    """Culled vs unculled looped kernel is bit-identical (order <= 2,
    multiple 8-row tiles): skipped candidates contribute exact zeros
    under hard logic / saturated hard_sigmoid."""
    from differt2d_tpu.ops.pallas_kernels import build_power_map_kernel_looped
    from differt2d_tpu.rt import path_candidate_matrices

    scene = Scene.basic_scene()
    arrays, pix, scal = _looped_args(scene)
    groups = path_candidate_matrices(arrays.num_objects, 0, 2)
    tx = scene.transmitters["tx"].xy
    outs = []
    for cull in (False, True):
        run = build_power_map_kernel_looped(
            arrays.num_objects, groups, approx=approx, interpret=True,
            block_rows=8, cull=cull,
        )
        outs.append(
            np.asarray(
                run(pix, tx, arrays.walls, arrays.kind, arrays.phi, scal)
            )
        )
    assert np.array_equal(outs[0], outs[1])


def test_cull_vag_bitwise_identical():
    """Culling is bit-identical for the analytic value+grad sweep too:
    strictly inside hard_sigmoid saturation the derivative is exactly
    zero, so skipped candidates contribute (0, 0, 0)."""
    from differt2d_tpu.ops.pallas_kernels import build_power_map_kernel_looped
    from differt2d_tpu.rt import path_candidate_matrices

    scene = Scene.basic_scene()
    arrays, pix, scal = _looped_args(scene)
    groups = path_candidate_matrices(arrays.num_objects, 0, 2)
    tx = scene.transmitters["tx"].xy
    outs = []
    for cull in (False, True):
        run = build_power_map_kernel_looped(
            arrays.num_objects, groups, approx=True, interpret=True,
            block_rows=8, cull=cull, mode="value_and_grad",
        )
        outs.append(
            jax.tree.map(
                np.asarray,
                run(pix, tx, arrays.walls, arrays.kind, arrays.phi, scal),
            )
        )
    assert np.array_equal(outs[0][0], outs[1][0])
    assert np.array_equal(outs[0][1], outs[1][1])


def test_cull_city_extract_bitwise():
    """City-scale realism case (136 oblique/concave walls): the workload
    culling exists for stays bit-identical."""
    from differt2d_tpu.ops.pallas_kernels import build_power_map_kernel_looped
    from differt2d_tpu.rt import path_candidate_matrices

    scene = Scene.city_extract_scene()
    arrays, pix, scal = _looped_args(scene)
    groups = path_candidate_matrices(arrays.num_objects, 0, 1)
    tx = scene.transmitters["tx"].xy
    outs = []
    for cull in (False, True):
        run = build_power_map_kernel_looped(
            arrays.num_objects, groups, approx=True, interpret=True,
            block_rows=8, cull=cull, hoist_walls=True,
        )
        outs.append(
            np.asarray(
                run(pix, tx, arrays.walls, arrays.kind, arrays.phi, scal)
            )
        )
    assert np.array_equal(outs[0], outs[1])


def test_cull_shadow_vag_city_extract_bitwise():
    """The city value+grad maps the bench drives (cfg6_vag/cfg7_vag)
    keep culling AND shadow lists bit-identical on the 136-wall
    extract -- the round-4 blocked-test wins ride the vag path, so the
    exact-zero skip contract must hold for (val, gx, gy) there too."""
    from differt2d_tpu.ops.pallas_kernels import build_power_map_kernel_looped
    from differt2d_tpu.rt import path_candidate_matrices

    scene = Scene.city_extract_scene()
    arrays, pix, scal = _looped_args(scene)
    groups = path_candidate_matrices(arrays.num_objects, 0, 1)
    tx = scene.transmitters["tx"].xy
    outs = []
    for on in (False, True):
        run = build_power_map_kernel_looped(
            arrays.num_objects, groups, approx=True, interpret=True,
            block_rows=8, cull=on, shadow=on, hoist_walls=True,
            mode="value_and_grad",
        )
        outs.append(
            jax.tree.map(
                np.asarray,
                run(pix, tx, arrays.walls, arrays.kind, arrays.phi, scal),
            )
        )
    for a, b in zip(jax.tree.leaves(outs[0]), jax.tree.leaves(outs[1])):
        assert np.array_equal(a, b)


@pytest.mark.parametrize("seed", [0, 1])
def test_cull_shadow_vag_random_city_bitwise(seed):
    """Randomized vag culled+shadowed vs plain bitwise suite on wall
    soups at city-like density (order <= 2, mid pair masks riding the
    vag path)."""
    from differt2d_tpu.ops.pallas_kernels import build_power_map_kernel_looped
    from differt2d_tpu.rt import path_candidate_matrices

    scene = Scene.random_uniform_scene(
        n_walls=12, key=jax.random.PRNGKey(100 + seed)
    )
    arrays, pix, scal = _looped_args(scene)
    groups = path_candidate_matrices(arrays.num_objects, 0, 2)
    tx = next(iter(scene.transmitters.values())).xy
    outs = []
    for on in (False, True):
        run = build_power_map_kernel_looped(
            arrays.num_objects, groups, approx=True, interpret=True,
            block_rows=8, cull=on, shadow=on, mode="value_and_grad",
        )
        outs.append(
            jax.tree.map(
                np.asarray,
                run(pix, tx, arrays.walls, arrays.kind, arrays.phi, scal),
            )
        )
    for a, b in zip(jax.tree.leaves(outs[0]), jax.tree.leaves(outs[1])):
        assert np.array_equal(a, b), f"seed={seed}"


def test_cull_dispatch_flags(monkeypatch):
    """Auto dispatch enables culling exactly where it is sound: looped
    kernels under hard logic or hard_sigmoid; sigmoid maps and the env
    opt-out stay unculled."""
    from differt2d_tpu.ops.pallas_kernels import get_fused_run
    from differt2d_tpu.rt import path_candidate_matrices
    from differt2d_tpu.tracer import scene_arrays

    scene = Scene.city_scene()
    arrays = scene_arrays(scene)
    groups = path_candidate_matrices(arrays.num_objects, 0, 1)
    kw = dict(n_tx=1, interpret=True, mode="value")
    run = get_fused_run(arrays, groups, approx=True, sigmoid=False, **kw)
    assert run._culled and run._pixel_block == (32, 64)
    run = get_fused_run(arrays, groups, approx=True, sigmoid=True, **kw)
    assert run._culled  # sigmoid culls via the f32 saturation bands
    run = get_fused_run(arrays, groups, approx=False, sigmoid=False, **kw)
    assert run._culled
    monkeypatch.setenv("DIFFERT2D_TPU_CULL", "0")
    run = get_fused_run(arrays, groups, approx=True, sigmoid=False, **kw)
    assert not run._culled

    monkeypatch.delenv("DIFFERT2D_TPU_CULL")

    # All-vertex candidate sets (vertex-diffraction maps) have no
    # cullable bounce: the machinery would be pure overhead.
    vtx_scene = Scene.square_scene()
    for obj in list(vtx_scene.objects):
        vtx_scene = vtx_scene.add_objects(*obj.get_vertices())
    arrays_v = scene_arrays(vtx_scene)
    filter_nodes = tuple(
        i for i, o in enumerate(vtx_scene.objects)
        if not isinstance(o, Vertex)
    )
    run = get_fused_run(
        arrays_v,
        path_candidate_matrices(
            arrays_v.num_objects, 0, 1, filter_nodes=filter_nodes
        ),
        approx=True,
        sigmoid=False,
        **kw,
    )
    assert not run._culled

    # Small scenes take the unrolled kernel: no culling machinery.
    small = Scene.basic_scene()
    arrays_s = scene_arrays(small)
    run = get_fused_run(
        arrays_s,
        path_candidate_matrices(arrays_s.num_objects, 0, 1),
        approx=True,
        sigmoid=False,
        n_tx=1,
        interpret=False,  # interpret forces looped; probe the TPU choice
        mode="value",
    )
    assert not run._culled


def test_sigmoid_band_gate():
    """Wide-band sigmoid maps (z0/alpha rivaling the scene diameter)
    must skip the cull/shadow machinery -- the saturation beams cover
    everything and prune nothing (measured pure overhead); narrow bands
    (large alpha) keep it.  Gated only when a concrete alpha hint is
    available (pallas_power_map always passes one)."""
    from differt2d_tpu.ops.pallas_kernels import get_fused_run
    from differt2d_tpu.rt import path_candidate_matrices
    from differt2d_tpu.tracer import scene_arrays

    scene = Scene.city_scene()
    arrays = scene_arrays(scene)
    groups = path_candidate_matrices(arrays.num_objects, 0, 1)
    kw = dict(n_tx=1, interpret=True, mode="value", approx=True, sigmoid=True)
    wide = get_fused_run(arrays, groups, alpha_hint=100.0, **kw)
    assert not wide._culled and not wide._shadowed
    narrow = get_fused_run(arrays, groups, alpha_hint=3000.0, **kw)
    assert narrow._culled and narrow._shadowed
    nohint = get_fused_run(arrays, groups, **kw)
    assert nohint._culled  # no hint -> conservative: keep the machinery
    # hard_sigmoid's band is 3/alpha -- never wide at practical alphas.
    hard = get_fused_run(
        arrays, groups, alpha_hint=100.0,
        n_tx=1, interpret=True, mode="value", approx=True, sigmoid=False,
    )
    assert hard._culled


def test_small_scene_order2_routes_unrolled():
    """Post-fold, the unrolled kernel wins every small-scene mode
    (131-135M vs 81-116M pts/s measured on TPU v5e 2026-08-20), so the
    round-4 order>=2 crossover to the looped kernel is gone: only the
    compile-time stream bound routes."""
    from differt2d_tpu.ops.pallas_kernels import get_fused_run
    from differt2d_tpu.rt import path_candidate_matrices
    from differt2d_tpu.tracer import scene_arrays

    arrays = scene_arrays(Scene.basic_scene())
    groups = path_candidate_matrices(arrays.num_objects, 0, 2)
    run = get_fused_run(
        arrays, groups, n_tx=1, interpret=False, mode="value",
        approx=True, sigmoid=True, alpha_hint=100.0,
    )
    assert not run._looped
    # City-scale streams still go looped (program size O(walls)).
    arrays_c = scene_arrays(Scene.city_scene())
    run_c = get_fused_run(
        arrays_c, path_candidate_matrices(arrays_c.num_objects, 0, 1),
        n_tx=1, interpret=False, mode="value", approx=True, sigmoid=False,
    )
    assert run_c._looped


@pytest.mark.parametrize("mode", ["value", "value_and_grad"])
def test_cull_sigmoid_bitwise(mode):
    """Sigmoid maps cull bit-identically too: f32 sigmoid saturates to
    exactly 0 below z = -87.4 (exp underflow) and exactly 1 above
    z = 16.7 (round-to-one), with alpha*s*(1-s) exactly 0 at both, so
    the same skip argument holds with the wider _SIGMOID_Z0/Z1 bands.
    alpha is raised so the wide band still culls on a 32x32 grid."""
    from differt2d_tpu.ops.pallas_kernels import build_power_map_kernel_looped
    from differt2d_tpu.rt import path_candidate_matrices

    scene = Scene.random_uniform_scene(n_walls=7, key=jax.random.PRNGKey(5))
    arrays, pix, _ = _looped_args(scene)
    scal = jnp.array([1000.0, 1e-2, 0.0, 0.5, 0.1], dtype=jnp.float32)
    groups = path_candidate_matrices(arrays.num_objects, 0, 2)
    tx = next(iter(scene.transmitters.values())).xy
    outs = []
    for cull in (False, True):
        run = build_power_map_kernel_looped(
            arrays.num_objects, groups, approx=True, sigmoid=True,
            interpret=True, block_rows=8, cull=cull, shadow=cull,
            mode=mode,
        )
        outs.append(
            jax.tree.map(
                np.asarray,
                run(pix, tx, arrays.walls, arrays.kind, arrays.phi, scal),
            )
        )
    for a, b in zip(jax.tree.leaves(outs[0]), jax.tree.leaves(outs[1])):
        assert np.array_equal(a, b)


def test_beam_keep_tables_prune_and_protect():
    """The keep tables actually prune on a city tile grid, and
    vertex-last candidates are always kept (their contains factor is
    identically 1, so culling them would be unsound)."""
    from differt2d_tpu.ops.pallas_kernels import beam_keep_tables
    from differt2d_tpu.rt import path_candidate_matrices
    from differt2d_tpu.tracer import scene_arrays

    scene = Scene.city_extract_scene()
    arrays = scene_arrays(scene)
    groups = path_candidate_matrices(arrays.num_objects, 0, 1)
    walls32 = jnp.asarray(arrays.walls, jnp.float32)
    a, b = walls32[:, 0, :], walls32[:, 1, :]
    t = b - a
    nr = jnp.stack([t[:, 1], -t[:, 0]], -1)
    nl = jnp.sqrt((nr * nr).sum(-1, keepdims=True))
    normals32 = nr / jnp.where(nl == 0, 1, nl)
    tx = scene.transmitters["tx"].xy
    cand = jnp.asarray(groups[1], jnp.int32)
    wn = normals32[cand[:, 0]]
    wa = walls32[cand[:, 0], 0, :]
    cur = jnp.broadcast_to(tx, (cand.shape[0], 2))
    d = ((cur - wa) * wn).sum(-1, keepdims=True)
    last = {1: (cur - 2 * d * wn)[:, None, :]}  # [C, 1, 2] image chain
    # 8x8 grid of 32x32-pixel tile boxes over the unit square.
    edges = np.linspace(0.01, 0.99, 9)
    x0, x1 = np.repeat(edges[:-1], 8), np.repeat(edges[1:], 8)
    y0, y1 = np.tile(edges[:-1], 8), np.tile(edges[1:], 8)
    keep = beam_keep_tables(
        walls32, normals32, arrays.kind, groups, [1], last,
        jnp.asarray(x0, jnp.float32), jnp.asarray(x1, jnp.float32),
        jnp.asarray(y0, jnp.float32), jnp.asarray(y1, jnp.float32),
        approx=True, alpha=jnp.float32(100.0),
    )[1]
    frac = float(jnp.mean(keep))
    assert frac < 0.75, f"culling prunes nothing (keep fraction {frac})"

    # Vertex-last protection: rebuild with every candidate's wall kind
    # forced to Vertex -- all rows must be kept.
    kind_vtx = jnp.full_like(arrays.kind, 2)
    keep_vtx = beam_keep_tables(
        walls32, normals32, kind_vtx, groups, [1], last,
        jnp.asarray(x0, jnp.float32), jnp.asarray(x1, jnp.float32),
        jnp.asarray(y0, jnp.float32), jnp.asarray(y1, jnp.float32),
        approx=True, alpha=jnp.float32(100.0),
    )[1]
    assert bool(jnp.all(keep_vtx))


def test_cull_end_to_end_power_map(monkeypatch):
    """power_map auto dispatch with culling (incl. the 32x32 block pixel
    permutation) is bit-identical to the unculled run and allclose to
    the XLA tracer."""
    scene = Scene.random_uniform_scene(
        n_walls=17, key=jax.random.PRNGKey(7)
    )
    X, Y = jnp.meshgrid(
        jnp.linspace(0.02, 0.98, 64), jnp.linspace(0.02, 0.98, 64)
    )
    kw = dict(max_order=1, approx=True)
    culled = tracer.power_map(scene, X, Y, backend="pallas", **kw)
    monkeypatch.setenv("DIFFERT2D_TPU_CULL", "0")
    unculled = tracer.power_map(scene, X, Y, backend="pallas", **kw)
    assert np.array_equal(np.asarray(culled), np.asarray(unculled))
    ref = tracer.power_map(scene, X, Y, backend="xla", **kw)
    chex.assert_trees_all_close(culled, ref, **TOL)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_cull_random_scene_bitwise(seed):
    """Randomized soundness check: culled vs unculled looped kernel on a
    random wall soup (order <= 2, random TX) stays bit-identical for
    value and value+grad maps."""
    from differt2d_tpu.ops.pallas_kernels import build_power_map_kernel_looped
    from differt2d_tpu.rt import path_candidate_matrices
    from differt2d_tpu.tracer import scene_arrays

    key = jax.random.PRNGKey(seed)
    kw, kt, kg = jax.random.split(key, 3)
    scene = Scene.random_uniform_scene(n_walls=6, key=kw)
    arrays = scene_arrays(scene)
    groups = path_candidate_matrices(arrays.num_objects, 0, 2)
    tx = jax.random.uniform(kt, (2,))
    gx, gy = jax.random.uniform(kg, (2,), minval=-0.2, maxval=1.2)
    X, Y = jnp.meshgrid(
        jnp.linspace(gx, gx + 1.0, 32), jnp.linspace(gy, gy + 1.0, 32)
    )
    pix = jnp.stack([X.ravel(), Y.ravel()], axis=-1)
    scal = jnp.array([100.0, 1e-2, 0.0, 0.5, 0.1], dtype=jnp.float32)
    for mode in ("value", "value_and_grad"):
        outs = []
        for cull in (False, True):
            run = build_power_map_kernel_looped(
                arrays.num_objects, groups, approx=True, interpret=True,
                block_rows=8, cull=cull, mode=mode,
            )
            outs.append(
                jax.tree.map(
                    np.asarray,
                    run(
                        pix, tx, arrays.walls, arrays.kind, arrays.phi,
                        scal,
                    ),
                )
            )
        for a, b in zip(jax.tree.leaves(outs[0]), jax.tree.leaves(outs[1])):
            assert np.array_equal(a, b), f"mode={mode} seed={seed}"


# ---------------------------------------------------------------------------
# Occlusion (fully-shadowed) candidate culling + the runtime canary


def _occl_scene_args():
    """TX left, a floor wall (the reflection candidate), and a tall
    blocker between TX and the right half of the map: every path via
    the floor into a far-right tile is provably fully blocked."""
    from differt2d_tpu.scene import Scene
    from differt2d_tpu.geometry import Wall

    scene = Scene.from_walls_array(
        jnp.asarray(
            [
                [[0.0, 0.0], [1.0, 0.0]],   # floor (candidate bounce)
                [[0.3, -0.2], [0.3, 1.2]],  # blocker
            ],
            jnp.float32,
        )
    )
    from differt2d_tpu.geometry import Point

    return scene.with_transmitters(tx=Point(xy=jnp.array([0.1, 0.5])))


def test_occlusion_tables_prove_shadow():
    """beam_keep_tables culls a candidate whose every path segment is
    provably blocked by one wall over the tile (the occlusion proof),
    and keeps it when occlusion is disabled."""
    from differt2d_tpu.ops.pallas_kernels import beam_keep_tables
    from differt2d_tpu.rt import path_candidate_matrices
    from differt2d_tpu.tracer import scene_arrays

    scene = _occl_scene_args()
    arrays = scene_arrays(scene)
    groups = {1: np.asarray([[0]], np.int32)}  # floor reflection only
    walls32 = jnp.asarray(arrays.walls, jnp.float32)
    a, b = walls32[:, 0, :], walls32[:, 1, :]
    t = b - a
    nr = jnp.stack([t[:, 1], -t[:, 0]], -1)
    nl = jnp.sqrt((nr * nr).sum(-1, keepdims=True))
    normals32 = nr / jnp.where(nl == 0, 1, nl)
    tx = scene.transmitters["tx"].xy
    wn, wa = normals32[0], walls32[0, 0]
    img = tx - 2 * jnp.dot(tx - wa, wn) * wn
    chains = {1: img[None, None, :]}
    kw = dict(approx=True, alpha=jnp.float32(100.0))
    box = (
        jnp.asarray([0.8], jnp.float32), jnp.asarray([0.9], jnp.float32),
        jnp.asarray([0.4], jnp.float32), jnp.asarray([0.5], jnp.float32),
    )
    keep = beam_keep_tables(
        walls32, normals32, arrays.kind, groups, [1], chains, *box,
        tx=tx, patch=jnp.float32(0.0), **kw,
    )[1]
    assert not bool(keep[0, 0]), "occlusion proof must cull"
    keep_no = beam_keep_tables(
        walls32, normals32, arrays.kind, groups, [1], chains, *box,
        tx=tx, patch=jnp.float32(0.0), occlusion=False, **kw,
    )[1]
    assert bool(keep_no[0, 0]), "beam proof alone must keep (lit beam)"


@pytest.mark.parametrize("mode", ["value", "value_and_grad"])
def test_occlusion_cull_bitwise(mode, monkeypatch):
    """Culled vs unculled looped kernel stays bit-identical on a scene
    where the OCCLUSION proof fires (not just the beam proof)."""
    from differt2d_tpu.ops.pallas_kernels import build_power_map_kernel_looped
    from differt2d_tpu.rt import path_candidate_matrices

    # The builder reads this at trace time; without it the occlusion
    # proof never runs and the test only re-covers the beam proof.
    monkeypatch.setenv("DIFFERT2D_TPU_CULL_OCCLUSION", "1")
    scene = _occl_scene_args()
    arrays, pix, scal = _looped_args(scene, n=64)
    groups = path_candidate_matrices(arrays.num_objects, 0, 2)
    tx = scene.transmitters["tx"].xy
    outs = []
    for cull in (False, True):
        run = build_power_map_kernel_looped(
            arrays.num_objects, groups, approx=True, interpret=True,
            block_rows=8, cull=cull, mode=mode,
        )
        outs.append(
            jax.tree.map(
                np.asarray,
                run(pix, tx, arrays.walls, arrays.kind, arrays.phi, scal),
            )
        )
    for a, b in zip(jax.tree.leaves(outs[0]), jax.tree.leaves(outs[1])):
        assert np.array_equal(a, b)


def test_cull_check_canary_passes_and_detects(monkeypatch):
    """DIFFERT2D_TPU_CULL_CHECK=1 re-runs the map unculled and compares
    bitwise: passes on sound tables, raises on poisoned tables."""
    import differt2d_tpu.ops.pallas_kernels as K

    scene = Scene.random_uniform_scene(n_walls=17, key=jax.random.PRNGKey(7))
    X, Y = jnp.meshgrid(
        jnp.linspace(0.02, 0.98, 64), jnp.linspace(0.02, 0.98, 64)
    )
    monkeypatch.setenv("DIFFERT2D_TPU_CULL_CHECK", "1")
    kw = dict(max_order=1, approx=True, interpret=True)
    Z = pallas_power_map(scene, X, Y, **kw)
    assert np.all(np.isfinite(np.asarray(Z)))

    # Poison the tables: drop one candidate that the beam proof keeps.
    real = K.beam_keep_tables

    def poisoned(*args, **kwargs):
        # Maximally unsound: cull every candidate everywhere.
        keep = real(*args, **kwargs)
        return {o: jnp.zeros_like(k) for o, k in keep.items()}

    monkeypatch.setattr(K, "beam_keep_tables", poisoned)
    K._KERNEL_CACHE.clear()
    K._ENTRY_CACHE.clear()
    with pytest.raises(RuntimeError, match="CULL_CHECK"):
        pallas_power_map(scene, X, Y, **kw)
    monkeypatch.setattr(K, "beam_keep_tables", real)
    K._KERNEL_CACHE.clear()
    K._ENTRY_CACHE.clear()


# ---------------------------------------------------------------------------
# Shadow-wall occluder lists (listed blocked loops)


@pytest.mark.parametrize("mode", ["value", "value_and_grad"])
def test_shadow_lists_bitwise(mode):
    """Shadow-listed blocked loops vs full loops are bit-identical on a
    random wall soup (both kernels share the fori loop structure; the
    lists only drop walls whose hit is exactly zero)."""
    from differt2d_tpu.ops.pallas_kernels import build_power_map_kernel_looped
    from differt2d_tpu.rt import path_candidate_matrices

    scene = Scene.random_uniform_scene(n_walls=8, key=jax.random.PRNGKey(3))
    arrays, pix, scal = _looped_args(scene)
    groups = path_candidate_matrices(arrays.num_objects, 0, 2)
    tx = next(iter(scene.transmitters.values())).xy
    outs = []
    for shadow in (False, True):
        run = build_power_map_kernel_looped(
            arrays.num_objects, groups, approx=True, interpret=True,
            block_rows=8, cull=True, shadow=shadow, mode=mode,
        )
        outs.append(
            jax.tree.map(
                np.asarray,
                run(pix, tx, arrays.walls, arrays.kind, arrays.phi, scal),
            )
        )
    for a, b in zip(jax.tree.leaves(outs[0]), jax.tree.leaves(outs[1])):
        assert np.array_equal(a, b)


def test_shadow_lists_hard_logic_bitwise():
    """Same bitwise contract under hard (non-approx) logic."""
    from differt2d_tpu.ops.pallas_kernels import build_power_map_kernel_looped
    from differt2d_tpu.rt import path_candidate_matrices

    scene = Scene.random_uniform_scene(n_walls=9, key=jax.random.PRNGKey(11))
    arrays, pix, scal = _looped_args(scene)
    groups = path_candidate_matrices(arrays.num_objects, 0, 1)
    tx = next(iter(scene.transmitters.values())).xy
    outs = []
    for shadow in (False, True):
        run = build_power_map_kernel_looped(
            arrays.num_objects, groups, approx=False, interpret=True,
            block_rows=8, cull=True, shadow=shadow,
        )
        outs.append(
            np.asarray(
                run(pix, tx, arrays.walls, arrays.kind, arrays.phi, scal)
            )
        )
    assert np.array_equal(outs[0], outs[1])


def test_shadow_dispatch_flags():
    """Auto dispatch enables shadow lists on looped kernels -- including
    sigmoid maps, which list via the wider f32 saturation bands."""
    from differt2d_tpu.ops.pallas_kernels import get_fused_run
    from differt2d_tpu.rt import path_candidate_matrices
    from differt2d_tpu.tracer import scene_arrays

    scene = Scene.city_scene()
    arrays = scene_arrays(scene)
    groups = path_candidate_matrices(arrays.num_objects, 0, 1)
    kw = dict(n_tx=1, interpret=True, mode="value")
    run = get_fused_run(arrays, groups, approx=True, sigmoid=False, **kw)
    assert run._shadowed
    run = get_fused_run(arrays, groups, approx=True, sigmoid=True, **kw)
    assert run._shadowed  # sigmoid lists use the wider saturation band


def test_shadow_wall_lists_shapes_and_soundness():
    """List shapes/counts, and a direct necessary-condition check: every
    wall with a nonzero LOS hit at a sampled pixel is in the tile's LOS
    list."""
    from differt2d_tpu.ops.pallas_kernels import (
        _seg_intersect, shadow_wall_lists)
    from differt2d_tpu.tracer import scene_arrays

    scene = Scene.city_extract_scene()
    arrays = scene_arrays(scene)
    walls32 = jnp.asarray(arrays.walls, jnp.float32)
    W = int(walls32.shape[0])
    tx = scene.transmitters["tx"].xy
    edges = np.linspace(0.01, 0.99, 5)
    x0 = jnp.asarray(np.repeat(edges[:-1], 4), jnp.float32)
    x1 = jnp.asarray(np.repeat(edges[1:], 4), jnp.float32)
    y0 = jnp.asarray(np.tile(edges[:-1], 4), jnp.float32)
    y1 = jnp.asarray(np.tile(edges[1:], 4), jnp.float32)
    l0dat, l0cnt, ldat, lcnt, sdat, scnt = shadow_wall_lists(
        walls32, arrays.kind, tx, jnp.float32(0.0), jnp.float32(100.0),
        True, x0, x1, y0, y1,
    )
    T = 16
    assert l0dat.shape == (W * W,) and l0cnt.shape == (W,)
    assert ldat.shape == (T, W, W) and lcnt.shape == (T, 1, W)
    assert sdat.shape == (T, 1, W) and scnt.shape == (T, 1, 1)
    # lists prune something on the city extract
    assert float(jnp.mean(scnt)) < W
    rng = np.random.default_rng(0)
    for t in rng.choice(T, size=4, replace=False):
        n = int(scnt[t, 0, 0])
        lst = set(int(v) for v in np.asarray(sdat[t, 0, :n]))
        for _ in range(8):
            px = rng.uniform(float(x0[t]), float(x1[t]))
            py = rng.uniform(float(y0[t]), float(y1[t]))
            for w in range(W):
                hit = float(
                    _seg_intersect(
                        walls32[w, 0, 0], walls32[w, 0, 1],
                        walls32[w, 1, 0], walls32[w, 1, 1],
                        tx[0], tx[1],
                        jnp.float32(px), jnp.float32(py),
                        "hard", jnp.float32(100.0),
                    )
                )
                if hit > 0.0:
                    assert w in lst, (t, w, hit)


def test_shadow_hazard_gate_falls_back_at_small_alpha():
    """The un == 0 hazard gate: shadow lists fall back to identity
    (count == W) when alpha*(1 - tol) cannot saturate the loss gate --
    at such settings an exactly-on-the-image-plane pixel could carry a
    nonzero contribution whose blocked test needs ALL walls."""
    from differt2d_tpu.ops.pallas_kernels import shadow_wall_lists
    from differt2d_tpu.tracer import scene_arrays

    scene = Scene.city_extract_scene()
    arrays = scene_arrays(scene)
    walls32 = jnp.asarray(arrays.walls, jnp.float32)
    W = int(walls32.shape[0])
    tx = scene.transmitters["tx"].xy
    x0 = jnp.asarray([0.0], jnp.float32)
    x1 = jnp.asarray([0.5], jnp.float32)
    y0 = jnp.asarray([0.0], jnp.float32)
    y1 = jnp.asarray([0.5], jnp.float32)
    kw = dict(sigmoid=False, tol=jnp.float32(1e-2))
    # Normal alpha: the gate is open and lists prune.
    _, l0cnt, _, lcnt, _, _ = shadow_wall_lists(
        walls32, arrays.kind, tx, jnp.float32(0.0), jnp.float32(100.0),
        True, x0, x1, y0, y1, **kw,
    )
    assert float(jnp.mean(l0cnt)) < W
    # Tiny alpha (loss gate cannot saturate): identity fallback.
    _, l0cnt2, _, lcnt2, _, _ = shadow_wall_lists(
        walls32, arrays.kind, tx, jnp.float32(0.0), jnp.float32(2.0),
        True, x0, x1, y0, y1, **kw,
    )
    assert bool(jnp.all(l0cnt2 == W)) and bool(jnp.all(lcnt2 == W))
    # Huge tol under hard logic: same fallback.
    _, l0cnt3, _, _, _, _ = shadow_wall_lists(
        walls32, arrays.kind, tx, jnp.float32(0.0), jnp.float32(100.0),
        False, x0, x1, y0, y1, sigmoid=False, tol=jnp.float32(2.0),
    )
    assert bool(jnp.all(l0cnt3 == W))


@pytest.mark.parametrize("alpha", [2.0, 100.0])
def test_shadow_bitwise_on_image_plane_grid(alpha):
    """Bitwise shadow on/off on a grid that contains a candidate's
    image plane EXACTLY (pixels at y = 0 with the wall's TX image at
    y = 0 trigger the kernel's un == 0 bounce guard), at both a
    saturating and a non-saturating alpha."""
    from differt2d_tpu.ops.pallas_kernels import build_power_map_kernel_looped

    walls = jnp.asarray([
        [[0.2, 0.25], [0.8, 0.25]],   # candidate: image of TX at y = 0
        [[0.05, -0.4], [0.05, 1.4]],  # far-left occluder
    ], jnp.float32)
    kind = jnp.zeros(2, jnp.int32)
    phi = jnp.zeros(2, jnp.float32)
    tx = jnp.asarray([0.5, 0.5], jnp.float32)
    n = 32
    xs = jnp.linspace(0.0, 1.0, n)  # includes the exact y = 0 row
    X, Y = jnp.meshgrid(xs, xs)
    pix = jnp.stack([X.ravel(), Y.ravel()], axis=-1)
    scal = jnp.array([alpha, 1e-2, 0.0, 0.5, 0.1], dtype=jnp.float32)
    groups = {1: np.asarray([[0]], np.int32)}
    outs = []
    for shadow in (False, True):
        for sig in (False, True):
            for mode in ("value", "value_and_grad"):
                run = build_power_map_kernel_looped(
                    2, groups, approx=True, sigmoid=sig, interpret=True,
                    block_rows=8, cull=False, shadow=shadow, mode=mode,
                )
                outs.append(
                    (sig, mode, shadow,
                     jax.tree.map(
                         np.asarray,
                         run(pix, tx, walls, kind, phi, scal),
                     ))
                )
    by = {(sg, md, sh): o for sg, md, sh, o in outs}
    for sig in (False, True):
        for mode in ("value", "value_and_grad"):
            a = jax.tree.leaves(by[(sig, mode, False)])
            b = jax.tree.leaves(by[(sig, mode, True)])
            for xa, xb in zip(a, b):
                assert np.array_equal(xa, xb), (
                    f"sigmoid={sig} mode={mode} alpha={alpha}"
                )


def test_many_walls_order2_falls_back_to_lists():
    """Past 32 chunks (W > 256 at MID_CHUNK=8) the int32 occupancy
    words cannot represent the blocked loops, so order>=2 kernels must
    fall back to the round-4 list scheme (shift-by->=32 would silently
    skip chunks otherwise).  Shadow on/off stays bitwise there."""
    from differt2d_tpu.ops.pallas_kernels import (
        MID_CHUNK, build_power_map_kernel_looped)
    from differt2d_tpu.tracer import scene_arrays

    scene = Scene.random_uniform_scene(
        n_walls=33 * MID_CHUNK + 4, key=jax.random.PRNGKey(11)
    )
    arrays = scene_arrays(scene)
    W = int(arrays.walls.shape[0])
    assert -(-W // MID_CHUNK) > 32
    groups = {
        1: np.asarray([[0], [7], [150], [W - 1]], np.int32),
        2: np.asarray([[0, 9], [200, 3], [W - 1, 128]], np.int32),
    }
    X, Y = jnp.meshgrid(jnp.linspace(0.1, 0.9, 16), jnp.linspace(0.1, 0.9, 8))
    pix = jnp.stack([X.ravel(), Y.ravel()], axis=-1)
    scal = jnp.array([100.0, 1e-2, 0.0, 0.5, 0.1], dtype=jnp.float32)
    tx = next(iter(scene.transmitters.values())).xy
    outs = []
    for sh in (False, True):
        run = build_power_map_kernel_looped(
            W, groups, approx=True, interpret=True, block_rows=8,
            cull=False, shadow=sh,
        )
        outs.append(np.asarray(
            run(pix, tx, arrays.walls, arrays.kind, arrays.phi, scal)
        ))
    assert np.array_equal(outs[0], outs[1])
    assert np.all(np.isfinite(outs[0]))


def test_culled_cand_block_bitwise():
    """B candidates per culled fori step must be bit-identical to the
    1-per-step loop (the masked tail discards computed lanes via
    bitwise where)."""
    from differt2d_tpu.ops.pallas_kernels import build_power_map_kernel_looped
    from differt2d_tpu.rt import path_candidate_matrices

    scene = Scene.random_uniform_scene(n_walls=9, key=jax.random.PRNGKey(21))
    arrays, pix, scal = _looped_args(scene)
    groups = path_candidate_matrices(arrays.num_objects, 0, 2)
    tx = next(iter(scene.transmitters.values())).xy
    outs = {}
    for B in (1, 3):
        run = build_power_map_kernel_looped(
            arrays.num_objects, groups, approx=True, interpret=True,
            block_rows=8, cull=True, shadow=True, cand_block=B,
        )
        outs[B] = np.asarray(
            run(pix, tx, arrays.walls, arrays.kind, arrays.phi, scal)
        )
    assert np.array_equal(outs[1], outs[3])


def test_first_wall_visibility_dead_sound():
    """Ground-truth soundness of the exact first-wall visibility kill:
    no pixel may have a valid order-1 path whose (first) wall the mask
    declares dead.  Checked against brute-force per-candidate validity
    (trace_paths) on dense sample grids for random scenes and the city
    extract; effectiveness asserted on the extract (the mask is the
    round-5 candidate-count lever: 73/136 walls provably dead)."""
    from differt2d_tpu.ops.pallas_kernels import first_wall_visibility_dead
    from differt2d_tpu.tracer import scene_arrays, trace_paths

    def check(scene, nx, min_dead=0):
        arr = scene_arrays(scene)
        tx = next(iter(scene.transmitters.values())).xy
        dead = np.asarray(first_wall_visibility_dead(
            jnp.asarray(arr.walls, jnp.float32), arr.kind, tx,
            jnp.float32(0.0), jnp.float32(100.0), True, False,
            jnp.float32(1e-2),
        ))
        assert dead.sum() >= min_dead
        xs = np.linspace(0.015, 0.985, nx)
        for px in xs:
            for py in xs:
                out = trace_paths(
                    scene, tx, jnp.asarray([px, py]),
                    min_order=1, max_order=1, approx=True,
                )
                v = np.asarray(out[1]["valid"]) > 0
                cands = np.asarray(out[1]["candidates"]).ravel()
                assert not np.any(v & dead[cands]), (px, py)

    for seed in (2, 31):
        check(
            Scene.random_uniform_scene(
                n_walls=14, key=jax.random.PRNGKey(seed)
            ),
            nx=7,
        )
    check(Scene.city_extract_scene(), nx=6, min_dead=40)


def test_pair_occlusion_dead_sound():
    """Ground-truth soundness of the exact pair-level mid-segment kill:
    no pixel may have a valid order-2 path whose (upstream, downstream)
    wall pair the mask declares dead.  The hard-logic lambda-pole
    regression (tol relaxation pushing the crossing-ratio band through
    0, where the projection monotonicity breaks) is covered both here
    (approx False would admit it) and by the bitwise cull suites."""
    from differt2d_tpu.ops.pallas_kernels import pair_occlusion_dead
    from differt2d_tpu.tracer import scene_arrays, trace_paths

    def check(scene, nx, approx, min_dead=0):
        arr = scene_arrays(scene)
        tx = next(iter(scene.transmitters.values())).xy
        dead = np.array(pair_occlusion_dead(
            jnp.asarray(arr.walls, jnp.float32), arr.kind, tx,
            jnp.float32(0.0), jnp.float32(100.0), approx, False,
            jnp.float32(1e-2),
        ))
        assert int(dead.sum()) >= min_dead
        xs = np.linspace(0.02, 0.98, nx)
        for px in xs:
            for py in xs:
                out = trace_paths(
                    scene, tx, jnp.asarray([px, py]),
                    min_order=2, max_order=2, approx=approx,
                )
                v = np.asarray(out[2]["valid"]) > 0
                c = np.asarray(out[2]["candidates"])
                assert not np.any(v & dead[c[:, 0], c[:, 1]]), (px, py)

    check(
        Scene.random_uniform_scene(n_walls=9, key=jax.random.PRNGKey(17)),
        nx=5, approx=True,
    )
    check(
        Scene.random_uniform_scene(n_walls=9, key=jax.random.PRNGKey(18)),
        nx=4, approx=False,
    )
    check(Scene.city_extract_scene(), nx=4, approx=True, min_dead=3000)
