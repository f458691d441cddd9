"""Stand-in for the reference's Rust ``differt_core`` extension,
delegating to this repo's candidate-enumeration backends
(``differt2d_tpu.rt``: C++ odometer via ctypes, NumPy fallback)."""

from . import rt  # noqa: F401

__version__ = "0.0.0-refshim"
