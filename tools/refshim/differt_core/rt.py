"""``differt_core.rt`` stand-in: re-export this repo's API-parity
``CompleteGraph`` / ``DiGraph`` (``differt2d_tpu/rt/graph.py``), whose
path enumeration is tested against the documented differt-core semantics
in ``tests/test_rt.py``."""

from differt2d_tpu.rt.graph import CompleteGraph, DiGraph

__all__ = ["CompleteGraph", "DiGraph"]
