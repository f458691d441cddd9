"""Doctest runner, mirroring the reference's ``--doctest-modules``
strategy (reference ``pyproject.toml:174-200``): docstring examples in
the core modules are executable and correct."""

import doctest

import pytest

import differt2d_tpu._runtime_typing
import differt2d_tpu.geometry
import differt2d_tpu.logic
import differt2d_tpu.optimize
import differt2d_tpu.parallel.sharding
import differt2d_tpu.rt.graph
import differt2d_tpu.scene
import differt2d_tpu.tracer
import differt2d_tpu.utils


@pytest.mark.parametrize(
    "module",
    [
        differt2d_tpu._runtime_typing,
        differt2d_tpu.geometry,
        differt2d_tpu.logic,
        differt2d_tpu.optimize,
        differt2d_tpu.parallel.sharding,
        differt2d_tpu.rt.graph,
        differt2d_tpu.scene,
        differt2d_tpu.tracer,
        differt2d_tpu.utils,
    ],
    ids=lambda m: m.__name__,
)
def test_module_doctests(module):
    results = doctest.testmod(module, verbose=False)
    assert results.failed == 0, f"{results.failed} doctest failures"
