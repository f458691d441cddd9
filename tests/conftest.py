"""Test harness configuration.

Mirrors the reference's test pinning (reference ``pyproject.toml:192-196``):
CPU platform, NaN debugging on (any NaN fails the test), Agg matplotlib
backend, shared session seed 1234. Additionally forces 8 virtual CPU
devices so multi-chip sharding tests run without TPU hardware.

Note: this environment pre-registers a TPU platform via sitecustomize, so
the CPU override must go through ``jax.config`` rather than env vars.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["MPLBACKEND"] = "Agg"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_debug_nans", True)

import matplotlib  # noqa: E402

matplotlib.use("Agg")

import matplotlib.pyplot as plt  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def ax():
    fig = plt.figure()
    yield fig.add_subplot()
    plt.close(fig)


@pytest.fixture(scope="session")
def seed() -> int:
    return 1234


@pytest.fixture(scope="session")
def key(seed: int):
    return jax.random.PRNGKey(seed)
