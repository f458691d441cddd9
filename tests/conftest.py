"""Test harness configuration.

Mirrors the reference's test pinning (reference ``pyproject.toml:192-196``):
CPU platform, NaN debugging on (any NaN fails the test), Agg matplotlib
backend, shared session seed 1234. Additionally forces 8 virtual CPU
devices so multi-chip sharding tests run without TPU hardware.

Note: this environment pre-registers a TPU platform via sitecustomize, so
the CPU override must go through ``jax.config`` rather than env vars.
"""

import os
import shutil
import subprocess

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["MPLBACKEND"] = "Agg"

# Build the native C++ enumerator before collection imports rt._native
# (whose load attempt is cached), so a fresh checkout exercises the C++
# path wherever a compiler exists; compiler-less boxes still skip. An
# exclusive lock serializes the xdist workers (pyproject runs -n 4);
# each re-checks after acquiring, so exactly one builds.
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SO = os.path.join(_REPO, "differt2d_tpu", "rt", "libenumerate.so")
if not os.path.exists(_SO) and shutil.which("g++") and shutil.which("make"):
    import fcntl

    try:
        _lock_path = os.path.join(_REPO, "native", ".build.lock")
        with open(_lock_path, "w") as _lock:
            fcntl.flock(_lock, fcntl.LOCK_EX)
            if not os.path.exists(_SO):
                subprocess.run(
                    ["make", "-C", os.path.join(_REPO, "native")],
                    check=False,
                    capture_output=True,
                    timeout=120,
                )
            fcntl.flock(_lock, fcntl.LOCK_UN)
    except Exception:
        # Best-effort: a slow/failed build must not abort collection --
        # the suite then exercises the NumPy fallback and test_rt skips
        # the native rows, exactly as on compiler-less boxes.
        pass

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
