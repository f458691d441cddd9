"""Runtime type-checking parity tests.

Mirrors the reference's jaxtyping/beartype behavior: hard-mode ``is_true``
with a float input raises ``TypeCheckError`` matching "Expected type: Bool"
(reference ``tests/test_logic.py:88-94,104-125,154-205``), and an invalid
``Loc`` literal raises too (reference ``tests/test_abc.py:85-86``).
"""

import jax
import jax.numpy as jnp
import pytest

from differt2d_tpu import TypeCheckError, no_typecheck, set_typecheck
from differt2d_tpu.geometry import Wall
from differt2d_tpu.logic import (
    disable_approx,
    enable_approx,
    greater,
    is_false,
    is_true,
    logical_and,
)


@pytest.fixture(autouse=True)
def _fresh_cache():
    # ``approx=None`` resolves the global at trace time; clear the jit cache
    # so each test observes the mode it sets (reference test_logic.py:104-125
    # exercises the same staleness trap with clear_cache()).
    is_true.clear_cache()
    is_false.clear_cache()
    yield
    is_true.clear_cache()
    is_false.clear_cache()


def test_is_true_hard_float_raises():
    for value in [0.0, 0.5, 1.0]:
        is_true.clear_cache()
        with (
            enable_approx(False),
            pytest.raises(TypeCheckError, match="Expected type: Bool"),
        ):
            is_true(value)
    for value in [True, False]:
        is_true.clear_cache()
        with enable_approx(False):
            assert bool(is_true(value)) is value


def test_is_true_explicit_keyword():
    assert bool(is_true(1.0, approx=True))
    with pytest.raises(TypeCheckError, match="Expected type: Bool"):
        is_true(1.0, approx=False)
    assert bool(is_true(True, approx=False))


def test_disable_approx_context():
    is_true.clear_cache()
    with (
        disable_approx(True),
        pytest.raises(TypeCheckError, match="Expected type: Bool"),
    ):
        is_true(0.5)


def test_soft_mode_accepts_floats():
    with enable_approx(True):
        is_true.clear_cache()
        out = is_true(1.0)
        assert out.dtype == jnp.bool_
        assert bool(out)
        assert not bool(is_false(1.0, approx=True))


def test_approx_param_must_be_bool():
    with pytest.raises(TypeCheckError, match="Expected type: Optional"):
        greater(1.0, 0.0, approx="yes")


def test_float_params_reject_int_arrays():
    with pytest.raises(TypeCheckError, match="Expected type: Union"):
        greater(jnp.array([1, 2]), 0.0, approx=True)


def test_truthy_params_reject_garbage():
    with pytest.raises(TypeCheckError):
        logical_and(object(), 1.0, approx=True)


def test_checks_run_at_trace_time_inside_jit():
    @jax.jit
    def collapse(x):
        return is_true(x, approx=False)

    with pytest.raises(TypeCheckError, match="Expected type: Bool"):
        collapse(jnp.array(0.5))
    assert bool(collapse(jnp.array(True)))


def test_vmap_over_batched_args_is_allowed():
    xs = jnp.linspace(0.0, 1.0, 8)
    out = jax.vmap(lambda x: greater(x, 0.5, approx=True))(xs)
    assert out.shape == (8,)


def test_loc_literal():
    wall = Wall(xys=jnp.array([[0.0, 0.0], [1.0, 1.0]]))
    assert wall.get_location("NW").shape == (2,)
    with pytest.raises(TypeCheckError, match="Expected type: Literal"):
        wall.get_location("L")


def test_no_typecheck_scope():
    with no_typecheck():
        out = is_true(1.0, approx=False)
    assert float(out) == 1.0
    # And set_typecheck restores per-thread state.
    set_typecheck(False)
    try:
        is_true(0.5, approx=False)
    finally:
        set_typecheck(True)
    with pytest.raises(TypeCheckError):
        is_true(0.5, approx=False)


def test_extension_float_dtypes_accepted():
    # jaxtyping's Float (the parity target) accepts ml_dtypes floats;
    # np.dtype(bfloat16).kind is 'V', so the checker must classify
    # through JAX's dtype lattice, not the raw numpy kind.
    out = greater(jnp.array([0.1, 0.9], dtype=jnp.bfloat16), 0.5, approx=True)
    assert out.shape == (2,)


def test_unknown_spec_name_raises_at_decoration():
    from differt2d_tpu._runtime_typing import SCALAR_FLOAT, typecheck

    with pytest.raises(TypeError, match="match no parameter"):

        @typecheck(aplha=SCALAR_FLOAT)  # typo'd on purpose
        def f(alpha):
            return alpha


# -- every public module raises TypeCheckError on >=1 misuse ---------------
# (reference posture: @jaxtyped(typechecker=beartype) on every public
# function -- reference geometry.py:83-90, scene.py:121-123)


class TestFullAPISurface:
    def test_geometry_segments_intersect_bad_point(self):
        import differt2d_tpu.geometry as geometry

        p = jnp.zeros(2)
        with pytest.raises(TypeCheckError, match="Expected type"):
            geometry.segments_intersect(p, p, p, jnp.zeros(3))  # not (..,2)
        with pytest.raises(TypeCheckError, match="Expected type"):
            geometry.segments_intersect(p, p, p, "not-an-array")

    def test_geometry_path_length_int_array(self):
        import differt2d_tpu.geometry as geometry

        with pytest.raises(TypeCheckError, match="Expected type"):
            geometry.path_length(jnp.zeros((3, 2), dtype=jnp.int32))

    def test_geometry_solver_classmethods_bad_tx(self):
        from differt2d_tpu.geometry import (
            FermatPath,
            ImagePath,
            MinPath,
            Wall,
        )

        wall = Wall(xys=jnp.array([[0.0, 1.0], [1.0, 1.0]]))
        rx = jnp.array([2.0, 0.0])
        key = jax.random.PRNGKey(0)
        with pytest.raises(TypeCheckError, match="Expected type"):
            ImagePath.from_tx_objects_rx((0.0, 0.0), [wall], rx)
        for cls in (FermatPath, MinPath):
            with pytest.raises(TypeCheckError, match="Expected type"):
                cls.from_tx_objects_rx(jnp.zeros(2), [wall], rx, key=1234)

    def test_optimize_minimize_bad_fun(self):
        from differt2d_tpu.optimize import minimize

        with pytest.raises(TypeCheckError, match="Expected type: Callable"):
            minimize("not-callable", jnp.zeros(2))
        with pytest.raises(TypeCheckError, match="Expected type"):
            minimize(lambda x: jnp.sum(x**2), jnp.zeros(2), steps=10.5)

    def test_optimize_random_uniform_bad_key(self):
        from differt2d_tpu.optimize import minimize_random_uniform

        with pytest.raises(TypeCheckError, match="Expected type: PRNGKey"):
            minimize_random_uniform(lambda x: jnp.sum(x**2), 1234, 2)

    def test_scene_factory_bad_key(self):
        from differt2d_tpu.scene import Scene

        with pytest.raises(TypeCheckError, match="Expected type: PRNGKey"):
            Scene.random_uniform_scene(key=42)
        with pytest.raises(TypeCheckError, match="Expected type: int"):
            Scene.random_uniform_scene(
                n_walls=2.5, key=jax.random.PRNGKey(0)
            )

    def test_scene_accumulators_bad_args(self):
        from differt2d_tpu.scene import Scene
        from differt2d_tpu.utils import received_power

        scene = Scene.square_scene()
        X, Y = jnp.meshgrid(jnp.linspace(0.2, 0.8, 3), jnp.linspace(0.2, 0.8, 3))
        with pytest.raises(TypeCheckError, match="Expected type: Callable"):
            scene.accumulate_on_receivers_grid_over_paths(
                X, Y, fun="not-callable"
            )
        with pytest.raises(TypeCheckError, match="Expected type"):
            scene.accumulate_on_transmitters_grid_over_paths(
                X.astype(jnp.int32), Y.astype(jnp.int32), fun=received_power
            )
        with pytest.raises(TypeCheckError, match="Expected type"):
            scene.accumulate_over_paths(received_power, approx="yes")

    def test_scene_all_path_candidates_bad_order(self):
        from differt2d_tpu.scene import Scene

        with pytest.raises(TypeCheckError, match="Expected type: int"):
            Scene.square_scene().all_path_candidates(max_order=1.5)

    def test_tracer_power_map_bad_solver_and_backend(self):
        from differt2d_tpu.scene import Scene
        from differt2d_tpu.tracer import power_map

        scene = Scene.square_scene()
        X, Y = jnp.meshgrid(jnp.linspace(0.2, 0.8, 3), jnp.linspace(0.2, 0.8, 3))
        with pytest.raises(TypeCheckError, match="Expected type: Literal"):
            power_map(scene, X, Y, solver="newton")
        with pytest.raises(TypeCheckError, match="Expected type: Literal"):
            power_map(scene, X, Y, backend="cuda")
        with pytest.raises(TypeCheckError, match="same shape"):
            power_map(scene, X, Y[:2, :])

    def test_tracer_trace_paths_bad_rx(self):
        from differt2d_tpu.scene import Scene
        from differt2d_tpu.tracer import trace_paths

        with pytest.raises(TypeCheckError, match="Expected type"):
            trace_paths(
                Scene.square_scene(), jnp.zeros(2), jnp.zeros(3), max_order=1
            )

    def test_utils_received_power_bad_scalars(self):
        from differt2d_tpu.geometry import Path
        from differt2d_tpu.utils import received_power

        path = Path(xys=jnp.array([[0.0, 0.0], [1.0, 0.0]]))
        with pytest.raises(TypeCheckError, match="Expected type"):
            received_power(None, None, path, [], r_coef="0.5")
        with pytest.raises(TypeCheckError, match="Expected type"):
            received_power(None, None, path, [], height=jnp.zeros(3))

    def test_rt_bad_num_nodes(self):
        from differt2d_tpu.rt import all_path_candidates, path_candidate_matrices

        with pytest.raises(TypeCheckError, match="Expected type: int"):
            all_path_candidates(3.0, max_order=1)
        with pytest.raises(TypeCheckError, match="Expected type: int"):
            path_candidate_matrices(4, min_order=0, max_order=True)

    def test_no_typecheck_scope_covers_new_surface(self):
        from differt2d_tpu.optimize import minimize

        with no_typecheck():
            x, loss = minimize(lambda x: jnp.sum((x - 1.0) ** 2), jnp.zeros(2))
        assert jnp.allclose(x, 1.0, rtol=1e-2)
