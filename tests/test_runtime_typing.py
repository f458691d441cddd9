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
