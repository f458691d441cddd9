"""Path-candidate enumeration.

TPU-native replacement for the reference's Rust ``differt_core.rt`` crate
(consumed at reference ``differt2d/scene.py:28,154-174``). Candidates are
sequences of object indices with no two consecutive repeats (complete-graph
semantics, ``n * (n - 1)**(order - 1)`` candidates per order), generated in
lexicographic order.

Backends:

* a native C++ enumerator (``differt2d_tpu/rt/_native``) loaded via ctypes;
* a vectorized NumPy mixed-radix decoder (always available, bit-identical).

Enumeration happens host-side before tracing -- exactly where the reference
crosses into Rust -- so the choice of backend never affects the compiled
XLA program.
"""

from .graph import (
    CompleteGraph,
    DiGraph,
    all_path_candidates,
    candidates_for_order,
    path_candidate_matrices,
)

__all__ = (
    "CompleteGraph",
    "DiGraph",
    "all_path_candidates",
    "candidates_for_order",
    "path_candidate_matrices",
)
