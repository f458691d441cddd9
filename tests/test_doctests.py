"""Doctest runner, mirroring the reference's ``--doctest-modules``
strategy (reference ``pyproject.toml:174-200``): docstring examples in
EVERY library module are executable and correct.  Modules are enumerated
with ``pkgutil.walk_packages`` so new modules are enrolled automatically
(modules without examples pass trivially, matching pytest's
collect-everything posture)."""

import doctest
import importlib
import pkgutil

import pytest

import differt2d_tpu


def _walk_error(name):  # pragma: no cover - only fires on breakage
    raise RuntimeError(f"failed to import package {name!r} during doctest walk")


def _all_modules():
    names = ["differt2d_tpu"]
    # onerror keeps the loud-failure property of an explicit import list:
    # a broken package __init__ must fail the suite, not silently drop
    # its whole subtree from doctest coverage.
    for info in pkgutil.walk_packages(
        differt2d_tpu.__path__, prefix="differt2d_tpu.", onerror=_walk_error
    ):
        spec = importlib.util.find_spec(info.name)
        origin = getattr(spec, "origin", None) or ""
        if origin.endswith(".py"):  # skip the ctypes-loaded .so
            names.append(info.name)
    return sorted(names)


@pytest.mark.parametrize("name", _all_modules())
def test_module_doctests(name):
    module = importlib.import_module(name)
    results = doctest.testmod(module, verbose=False)
    assert results.failed == 0, f"{results.failed} doctest failures"
