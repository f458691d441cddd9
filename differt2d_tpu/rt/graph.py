"""Combinatorial path-candidate enumeration.

Semantics (inferred and property-tested against the reference's documented
behavior at ``differt2d/scene.py:122-175``):

* Objects are graph nodes ``0 .. n-1``; virtual from/to nodes are appended
  at indices ``n`` and ``n + 1`` (reference ``scene.py:155-156``).
* A path candidate of ``order`` interactions is a sequence of ``order``
  node indices with **no two consecutive repeats** (a complete graph has no
  self-loops), yielding ``m * (m - 1)**(order - 1)`` candidates over ``m``
  allowed nodes.
* ``filter_nodes`` removes nodes entirely (reference ``scene.py:158-160``
  via ``DiGraph.disconnect_nodes``).
* Output ordering is lexicographic in node index (depth-first traversal
  visiting neighbors in increasing index order).

The default backend is a vectorized NumPy mixed-radix decode; when the
native C++ backend (see ``native/enumerate.cc``) has been built it is used
for large candidate sets.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Sequence

from .._runtime_typing import SCALAR_INT_STRICT, typecheck

import jax.numpy as jnp
import numpy as np

from . import _native


def _decode_candidates(allowed: np.ndarray, order: int) -> np.ndarray:
    """Enumerate all no-consecutive-repeat sequences over ``allowed``.

    Mixed-radix decode: the first digit has ``m`` choices, each later digit
    ``m - 1`` choices (all allowed nodes except the previous one, in
    increasing order). Digit significance decreases left-to-right, so the
    rows come out in lexicographic order.

    :param allowed: Sorted unique node indices, shape ``[m]``.
    :param order: Number of interactions (sequence length), ``>= 1``.
    :return: ``int32[m * (m - 1)**(order - 1), order]``.
    """
    m = int(allowed.shape[0])
    if m == 0 or (order >= 2 and m == 1):
        return np.empty((0, order), dtype=np.int32)

    total = m * (m - 1) ** (order - 1)

    native_result = _native.enumerate_paths(allowed.astype(np.int32), order, total)
    if native_result is not None:
        return native_result

    idx = np.arange(total, dtype=np.int64)
    # Positions into `allowed`, not node values, until the final gather.
    positions = np.empty((total, order), dtype=np.int64)
    for j in range(order - 1, 0, -1):
        idx, digit = np.divmod(idx, m - 1)
        positions[:, j] = digit
    positions[:, 0] = idx
    # Skip-the-previous map: digit d at position j refers to the d-th
    # allowed node once the previous node is removed from the ordering.
    for j in range(1, order):
        prev = positions[:, j - 1]
        d = positions[:, j]
        positions[:, j] = d + (d >= prev)
    return allowed[positions].astype(np.int32)


@lru_cache(maxsize=None)
def candidates_for_order(
    num_nodes: int,
    order: int,
    filter_nodes: Optional[tuple[int, ...]] = None,
) -> np.ndarray:
    """All candidates of exactly ``order`` interactions, as one matrix.

    :return: ``int32[num_candidates, order]`` (cached; do not mutate).
    """
    if order == 0:
        return np.empty((1, 0), dtype=np.int32)
    allowed = np.arange(num_nodes, dtype=np.int64)
    if filter_nodes:
        allowed = np.setdiff1d(allowed, np.asarray(filter_nodes, dtype=np.int64))
    return _decode_candidates(allowed, order)


@typecheck(
    num_nodes=SCALAR_INT_STRICT,
    min_order=SCALAR_INT_STRICT,
    max_order=SCALAR_INT_STRICT,
)
def path_candidate_matrices(
    num_nodes: int,
    min_order: int = 0,
    max_order: int = 1,
    *,
    order: Optional[int] = None,
    filter_nodes: Optional[Sequence[int]] = None,
) -> dict[int, np.ndarray]:
    """Candidates grouped per order: ``{order: int32[C_o, order]}``.

    This is the array-core's preferred form -- each group has a static shape
    so the tracer vmaps over the candidate axis without padding.
    """
    if order is not None:
        min_order = max_order = order
    key = tuple(sorted(filter_nodes)) if filter_nodes is not None else None
    return {
        o: candidates_for_order(num_nodes, o, key)
        for o in range(min_order, max_order + 1)
    }


@typecheck(
    num_nodes=SCALAR_INT_STRICT,
    min_order=SCALAR_INT_STRICT,
    max_order=SCALAR_INT_STRICT,
)
def all_path_candidates(
    num_nodes: int,
    min_order: int = 0,
    max_order: int = 1,
    *,
    order: Optional[int] = None,
    filter_nodes: Optional[Sequence[int]] = None,
) -> list[jnp.ndarray]:
    """All candidates as a flat list of per-candidate index arrays.

    API-parity form of reference ``differt2d/scene.py:122-175``: one list
    entry per candidate, iterated order-major then lexicographic.
    """
    groups = path_candidate_matrices(
        num_nodes,
        min_order=min_order,
        max_order=max_order,
        order=order,
        filter_nodes=filter_nodes,
    )
    return [
        jnp.asarray(row, dtype=jnp.int32)
        for o in sorted(groups)
        for row in groups[o]
    ]


class CompleteGraph:
    """Complete graph over ``num_nodes`` object nodes.

    API-parity shim for ``differt_core.rt.CompleteGraph``: virtual from/to
    nodes live at indices ``num_nodes`` and ``num_nodes + 1``.
    """

    def __init__(self, num_nodes: int):
        self.num_nodes = num_nodes

    def all_paths(
        self,
        from_: int,
        to: int,
        depth: int,
        include_from_and_to: bool = False,
    ):
        """Iterate paths of ``depth`` nodes from ``from_`` to ``to``.

        ``depth`` counts the from/to endpoints, so the number of
        intermediate interactions is ``depth - 2``.
        """
        order = depth - 2
        matrix = candidates_for_order(self.num_nodes, order)
        for row in matrix:
            if include_from_and_to:
                yield np.concatenate(
                    ([from_], row, [to])
                ).astype(np.int32)
            else:
                yield row


class DiGraph:
    """Filtered directed graph, API-parity shim for ``differt_core.rt.DiGraph``."""

    def __init__(self, num_nodes: int):
        self.num_nodes = num_nodes
        self._disconnected: set[int] = set()
        self._from_to: Optional[tuple[int, int]] = None

    @classmethod
    def from_complete_graph(cls, graph: CompleteGraph) -> "DiGraph":
        return cls(graph.num_nodes)

    def insert_from_and_to_nodes(self) -> tuple[int, int]:
        self._from_to = (self.num_nodes, self.num_nodes + 1)
        return self._from_to

    def disconnect_nodes(self, *nodes: int) -> None:
        self._disconnected.update(int(n) for n in nodes)

    def all_paths(
        self,
        from_: int,
        to: int,
        depth: int,
        include_from_and_to: bool = False,
    ):
        order = depth - 2
        matrix = candidates_for_order(
            self.num_nodes, order, tuple(sorted(self._disconnected))
        )
        for row in matrix:
            if include_from_and_to:
                yield np.concatenate(([from_], row, [to])).astype(np.int32)
            else:
                yield row
