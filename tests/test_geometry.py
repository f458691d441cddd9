"""Geometry tests mirroring the reference strategy (``tests/test_geometry.py``):

golden values for intersection / normals / parametric round-trips / mirror
images; solver acceptance on the analytic specular bounce; validity
semantics under both approx modes.
"""

import chex
import jax
import jax.numpy as jnp
import pytest

from differt2d_tpu.geometry import (
    FermatPath,
    ImagePath,
    MinPath,
    Path,
    Point,
    RIS,
    Ray,
    Vertex,
    Wall,
    closest_point,
    normalize,
    path_length,
    segments_intersect,
    stack_leaves,
    unstack_leaves,
)


@pytest.fixture
def wall():
    return Wall(xys=jnp.array([[0.0, 0.0], [1.0, 0.0]]))


class TestSegmentsIntersect:
    def test_crossing(self):
        p1 = jnp.array([0.0, 0.0])
        p2 = jnp.array([1.0, 0.0])
        p3 = jnp.array([0.5, -1.0])
        p4 = jnp.array([0.5, +1.0])
        assert segments_intersect(p1, p2, p3, p4, approx=False)
        chex.assert_trees_all_close(
            segments_intersect(p1, p2, p3, p4, approx=True), 1.0
        )

    def test_disjoint(self):
        p1 = jnp.array([0.0, 0.0])
        p2 = jnp.array([1.0, 0.0])
        p3 = jnp.array([2.0, -1.0])
        p4 = jnp.array([2.0, +1.0])
        assert not segments_intersect(p1, p2, p3, p4, approx=False)
        chex.assert_trees_all_close(
            segments_intersect(p1, p2, p3, p4, approx=True), 0.0, atol=1e-6
        )

    def test_parallel_no_nan(self):
        p1 = jnp.array([0.0, 0.0])
        p2 = jnp.array([1.0, 0.0])
        p3 = jnp.array([0.0, 1.0])
        p4 = jnp.array([1.0, 1.0])
        out = segments_intersect(p1, p2, p3, p4, approx=True)
        assert jnp.isfinite(out)
        assert not segments_intersect(p1, p2, p3, p4, approx=False)

    def test_batched_broadcasting(self):
        # 3 segments x 4 walls in one call.
        seg_a = jnp.zeros((3, 1, 2))
        seg_b = jnp.ones((3, 1, 2))
        w_a = jnp.zeros((1, 4, 2))
        w_b = jnp.ones((1, 4, 2)) * 2.0
        out = segments_intersect(seg_a, seg_b, w_a, w_b, approx=True)
        assert out.shape == (3, 4)

    def test_gradient_finite(self):
        def f(x):
            return segments_intersect(
                jnp.array([0.0, 0.0]),
                jnp.array([1.0, 0.0]),
                jnp.array([x, -1.0]),
                jnp.array([x, +1.0]),
                approx=True,
            )

        g = jax.grad(f)(0.5)
        assert jnp.isfinite(g)


def test_path_length():
    points = jnp.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]])
    chex.assert_trees_all_close(path_length(points), 1 + 1 + jnp.sqrt(2.0), rtol=1e-5)


def test_path_length_grad_no_nan():
    points = jnp.array([[0.5, 0.5], [0.5, 0.5]])  # zero-length segment
    g = jax.grad(path_length)(points)
    assert jnp.all(jnp.isfinite(g))


def test_normalize():
    v, l = normalize(jnp.array([1.0, 1.0]))
    chex.assert_trees_all_close(l, jnp.sqrt(2.0))
    chex.assert_trees_all_close(v, jnp.array([1.0, 1.0]) / jnp.sqrt(2.0))
    v0, l0 = normalize(jnp.array([0.0, 0.0]))
    chex.assert_trees_all_close(v0, jnp.zeros(2))
    chex.assert_trees_all_close(l0, 1.0)


def test_closest_point():
    points = jnp.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    i, d = closest_point(points, jnp.array([0.6, 0.3]))
    assert i == 1
    chex.assert_trees_all_close(d, 0.5, rtol=1e-5)


class TestPoint:
    def test_bounding_box(self):
        p = Point(xy=jnp.array([1.0, 2.0]))
        chex.assert_trees_all_close(
            p.bounding_box(), jnp.array([[1.0, 2.0], [1.0, 2.0]])
        )

    def test_default(self):
        chex.assert_trees_all_close(Point().xy, jnp.zeros(2))

    def test_plot(self, ax):
        Point(xy=jnp.array([0.0, 0.0])).plot(ax, annotate="p")


class TestRay:
    def test_origin_dest_t(self):
        ray = Ray(xys=jnp.array([[0.0, 1.0], [2.0, 3.0]]))
        chex.assert_trees_all_close(ray.origin(), jnp.array([0.0, 1.0]))
        chex.assert_trees_all_close(ray.dest(), jnp.array([2.0, 3.0]))
        chex.assert_trees_all_close(ray.t(), jnp.array([2.0, 2.0]))

    def test_rotate(self):
        ray = Ray(xys=jnp.array([[0.0, 0.0], [1.0, 0.0]]))
        rotated = ray.rotate(angle=jnp.pi)
        chex.assert_trees_all_close(
            rotated.xys, jnp.array([[0.0, 0.0], [-1.0, 0.0]]), atol=1e-6
        )

    def test_bounding_box(self):
        ray = Ray(xys=jnp.array([[2.0, 1.0], [0.0, 3.0]]))
        chex.assert_trees_all_close(
            ray.bounding_box(), jnp.array([[0.0, 1.0], [2.0, 3.0]])
        )


class TestWall:
    def test_normal(self, wall):
        chex.assert_trees_all_close(wall.normal(), jnp.array([0.0, -1.0]))

    def test_parameters_count(self, wall):
        assert wall.parameters_count() == 1

    def test_parametric_roundtrip(self, wall):
        t = jnp.array([0.3])
        xy = wall.parametric_to_cartesian(t)
        chex.assert_trees_all_close(xy, jnp.array([0.3, 0.0]))
        chex.assert_trees_all_close(wall.cartesian_to_parametric(xy), t, rtol=1e-6)

    def test_contains(self, wall):
        assert wall.contains_parametric(jnp.array([0.5]), approx=False)
        assert not wall.contains_parametric(jnp.array([1.5]), approx=False)
        chex.assert_trees_all_close(
            wall.contains_parametric(jnp.array([0.5]), approx=True), 1.0
        )

    def test_image_of(self, wall):
        chex.assert_trees_all_close(
            wall.image_of(jnp.array([0.0, 1.0])), jnp.array([0.0, -1.0])
        )

    def test_evaluate_cartesian_specular(self, wall):
        # Perfect specular bounce: 45-degree in, 45-degree out.
        good = jnp.array([[0.0, 1.0], [1.0, 0.0], [2.0, 1.0]])
        chex.assert_trees_all_close(wall.evaluate_cartesian(good), 0.0, atol=1e-10)
        bad = jnp.array([[0.0, 1.0], [1.0, 0.0], [1.0, 1.0]])
        assert wall.evaluate_cartesian(bad) > 0.1

    def test_intersects_cartesian(self, wall):
        ray = jnp.array([[0.5, -1.0], [0.5, 1.0]])
        assert wall.intersects_cartesian(ray, approx=False)
        miss = jnp.array([[2.0, -1.0], [2.0, 1.0]])
        assert not wall.intersects_cartesian(miss, approx=False)

    def test_patch_grows_wall(self, wall):
        # Ray passes just beyond the wall end; patch=0.5 extends reach.
        ray = jnp.array([[1.2, -1.0], [1.2, 1.0]])
        assert not wall.intersects_cartesian(ray, approx=False)
        assert wall.intersects_cartesian(ray, patch=0.5, approx=False)

    def test_get_vertices(self, wall):
        v1, v2 = wall.get_vertices()
        chex.assert_trees_all_close(v1.xy, jnp.array([0.0, 0.0]))
        chex.assert_trees_all_close(v2.xy, jnp.array([1.0, 0.0]))


class TestVertex:
    def test_interface(self):
        v = Vertex(xy=jnp.array([0.5, 0.5]))
        assert v.parameters_count() == 0
        chex.assert_trees_all_close(
            v.parametric_to_cartesian(jnp.empty(0)), jnp.array([0.5, 0.5])
        )
        assert v.cartesian_to_parametric(jnp.array([1.0, 1.0])).shape == (0,)
        assert v.contains_parametric(jnp.empty(0), approx=False)
        ray = jnp.array([[0.0, 0.0], [1.0, 1.0]])
        assert not v.intersects_cartesian(ray, approx=False)
        chex.assert_trees_all_close(
            v.evaluate_cartesian(jnp.zeros((3, 2))), 0.0
        )


class TestRIS:
    def test_default_phi(self):
        ris = RIS(xys=jnp.array([[0.0, 0.0], [1.0, 0.0]]))
        chex.assert_trees_all_close(ris.phi, jnp.pi / 4)

    def test_residual_zero_at_phi(self):
        ris = RIS(xys=jnp.array([[0.0, 0.0], [0.0, 1.0]]), phi=jnp.array(0.0))
        # Normal is [1, 0]. The residual scores the angle of -r against the
        # normal (reference geometry.py:704-711), so phi = 0 is satisfied
        # when the outgoing ray r points along -n.
        path = jnp.array([[1.0, 0.5], [0.0, 0.5], [-1.0, 0.5]])
        chex.assert_trees_all_close(ris.evaluate_cartesian(path), 0.0, atol=1e-12)

    def test_residual_positive_off_phi(self):
        ris = RIS(xys=jnp.array([[0.0, 0.0], [0.0, 1.0]]), phi=jnp.array(0.0))
        path = jnp.array([[1.0, 0.5], [0.0, 0.5], [1.0, 1.5]])
        assert ris.evaluate_cartesian(path) > 0.01

    def test_phi_gradient(self):
        def f(phi):
            ris = RIS(xys=jnp.array([[0.0, 0.0], [0.0, 1.0]]), phi=phi)
            path = jnp.array([[1.0, 0.5], [0.0, 0.5], [1.0, 1.5]])
            return ris.evaluate_cartesian(path)

        g = jax.grad(f)(jnp.array(0.3))
        assert jnp.isfinite(g) and g != 0.0


def test_stack_unstack_leaves():
    walls = [
        Wall(xys=jnp.array([[0.0, 0.0], [1.0, 0.0]])),
        Wall(xys=jnp.array([[1.0, 0.0], [1.0, 1.0]])),
    ]
    stacked = stack_leaves(walls)
    assert stacked.xys.shape == (2, 2, 2)
    unstacked = unstack_leaves(stacked)
    assert len(unstacked) == 2
    chex.assert_trees_all_close(unstacked[0].xys, walls[0].xys)
    chex.assert_trees_all_close(unstacked[1].xys, walls[1].xys)


class TestPathValidity:
    def test_midpoint_path(self, wall):
        p = Path.from_tx_objects_rx(
            jnp.array([0.0, 1.0]), [wall], jnp.array([2.0, 1.0])
        )
        chex.assert_trees_all_close(
            p.xys, jnp.array([[0.0, 1.0], [0.5, 0.0], [2.0, 1.0]])
        )

    def test_on_objects(self, wall):
        on = Path(xys=jnp.array([[0.0, 1.0], [0.5, 0.0], [1.0, 1.0]]))
        off = Path(xys=jnp.array([[0.0, 1.0], [5.0, 0.0], [1.0, 1.0]]))
        assert on.on_objects([wall], approx=False)
        assert not off.on_objects([wall], approx=False)

    def test_is_valid_modes(self, wall):
        # Valid specular bounce strictly inside the wall (t = 0.5).
        path = Path(xys=jnp.array([[0.0, 1.0], [0.5, 0.0], [1.0, 1.0]]), loss=jnp.array(0.0))
        candidate = jnp.array([0])
        from differt2d_tpu.logic import is_true

        for approx in (True, False):
            valid = path.is_valid([wall], candidate, [wall], approx=approx)
            assert is_true(valid, approx=approx)
        # Soft validity is capped by less(loss=0, tol=1e-2) = 2/3 with the
        # default alpha=100 hard_sigmoid (matches reference numerics).
        chex.assert_trees_all_close(
            path.is_valid([wall], candidate, [wall], approx=True), 2.0 / 3.0
        )

    def test_invalid_when_loss_high(self, wall):
        path = Path(
            xys=jnp.array([[0.0, 1.0], [1.0, 0.0], [2.0, 1.0]]), loss=jnp.array(10.0)
        )
        assert not path.is_valid([wall], jnp.array([0]), [wall], approx=False)

    def test_blocked_path_invalid(self):
        walls = [
            Wall(xys=jnp.array([[0.0, 0.0], [1.0, 0.0]])),
            # A wall crossing the TX->bounce segment.
            Wall(xys=jnp.array([[0.25, -1.0], [0.25, 2.0]])),
        ]
        path = Path(xys=jnp.array([[0.0, 1.0], [0.5, 0.0], [1.0, 1.0]]))
        assert path.intersects_with_objects(walls, jnp.array([0]), approx=False)
        assert not path.is_valid(walls, jnp.array([0]), [walls[0]], approx=False)


ANALYTIC_TX = jnp.array([0.0, 1.0])
ANALYTIC_RX = jnp.array([2.0, 1.0])
ANALYTIC_BOUNCE = jnp.array([[0.0, 1.0], [1.0, 0.0], [2.0, 1.0]])


class TestSolvers:
    """Solver acceptance mirroring reference ``tests/test_geometry.py:493-525``."""

    def test_image_path_analytic(self, wall):
        path = ImagePath.from_tx_objects_rx(ANALYTIC_TX, [wall], ANALYTIC_RX)
        chex.assert_trees_all_close(path.xys, ANALYTIC_BOUNCE, rtol=1e-5)
        chex.assert_trees_all_close(path.loss, 0.0, atol=1e-12)

    def test_image_path_square_scene_loss_zero(self):
        from differt2d_tpu.scene import Scene

        scene = Scene.square_scene()
        for w in scene.objects:
            path = ImagePath.from_tx_objects_rx(
                scene.transmitters["tx"], [w], scene.receivers["rx"]
            )
            chex.assert_trees_all_close(path.loss, 0.0, atol=1e-10)

    def test_fermat_path_analytic(self, wall, key):
        path = FermatPath.from_tx_objects_rx(ANALYTIC_TX, [wall], ANALYTIC_RX, key=key)
        chex.assert_trees_all_close(path.xys, ANALYTIC_BOUNCE, rtol=1e-2)
        chex.assert_trees_all_close(path.loss, 0.0, atol=1e-4)

    def test_min_path_analytic(self, wall, key):
        path = MinPath.from_tx_objects_rx(ANALYTIC_TX, [wall], ANALYTIC_RX, key=key)
        chex.assert_trees_all_close(path.xys, ANALYTIC_BOUNCE, rtol=1e-2)
        chex.assert_trees_all_close(path.loss, 0.0, atol=1e-4)

    def test_min_path_two_walls(self, key):
        walls = [
            Wall(xys=jnp.array([[0.0, 0.0], [1.0, 0.0]])),
            Wall(xys=jnp.array([[0.0, 1.0], [1.0, 1.0]])),
        ]
        tx = jnp.array([0.1, 0.5])
        rx = jnp.array([0.9, 0.5])
        mp = MinPath.from_tx_objects_rx(tx, walls, rx, key=key, steps=200)
        ip = ImagePath.from_tx_objects_rx(tx, walls, rx)
        chex.assert_trees_all_close(mp.xys, ip.xys, rtol=5e-2, atol=5e-2)

    def test_empty_objects(self, key):
        for cls, kw in [
            (Path, {}),
            (ImagePath, {}),
            (FermatPath, {"key": key}),
            (MinPath, {"key": key}),
        ]:
            path = cls.from_tx_objects_rx(ANALYTIC_TX, [], ANALYTIC_RX, **kw)
            chex.assert_trees_all_close(
                path.xys, jnp.vstack([ANALYTIC_TX, ANALYTIC_RX])
            )
            chex.assert_trees_all_close(path.loss, 0.0)

    def test_solvers_differentiable(self, wall, key):
        """Gradients flow through the unrolled argmin (the core feature)."""

        def f(rx_x):
            path = MinPath.from_tx_objects_rx(
                ANALYTIC_TX, [wall], jnp.array([rx_x, 1.0]), key=key
            )
            return path.length()

        g = jax.grad(f)(2.0)
        assert jnp.isfinite(g)

    def test_jittable(self, wall, key):
        @jax.jit
        def f(tx, rx):
            return ImagePath.from_tx_objects_rx(tx, [wall], rx).xys

        chex.assert_trees_all_close(f(ANALYTIC_TX, ANALYTIC_RX), ANALYTIC_BOUNCE, rtol=1e-5)
