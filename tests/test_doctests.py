"""Doctest runner, mirroring the reference's ``--doctest-modules``
strategy (reference ``pyproject.toml:174-200``): docstring examples in
EVERY library module are executable and correct (modules without
examples pass trivially, matching pytest's collect-everything posture)."""

import doctest

import pytest

import differt2d_tpu._module
import differt2d_tpu._runtime_typing
import differt2d_tpu._typing
import differt2d_tpu.abc
import differt2d_tpu.checkpoint
import differt2d_tpu.defaults
import differt2d_tpu.geometry
import differt2d_tpu.logic
import differt2d_tpu.models.gflownet
import differt2d_tpu.ops.geometry_ops
import differt2d_tpu.optimize
import differt2d_tpu.parallel.launcher
import differt2d_tpu.parallel.sharding
import differt2d_tpu.parallel.wall_sharded
import differt2d_tpu.profiling
import differt2d_tpu.rt.graph
import differt2d_tpu.scene
import differt2d_tpu.tracer
import differt2d_tpu.utils

MODULES = [
    differt2d_tpu._module,
    differt2d_tpu._runtime_typing,
    differt2d_tpu._typing,
    differt2d_tpu.abc,
    differt2d_tpu.checkpoint,
    differt2d_tpu.defaults,
    differt2d_tpu.geometry,
    differt2d_tpu.logic,
    differt2d_tpu.models.gflownet,
    differt2d_tpu.ops.geometry_ops,
    differt2d_tpu.optimize,
    differt2d_tpu.parallel.launcher,
    differt2d_tpu.parallel.sharding,
    differt2d_tpu.parallel.wall_sharded,
    differt2d_tpu.profiling,
    differt2d_tpu.rt.graph,
    differt2d_tpu.scene,
    differt2d_tpu.tracer,
    differt2d_tpu.utils,
]


@pytest.mark.parametrize("module", MODULES, ids=lambda m: m.__name__)
def test_module_doctests(module):
    results = doctest.testmod(module, verbose=False)
    assert results.failed == 0, f"{results.failed} doctest failures"
