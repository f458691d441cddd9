"""Candidate-enumeration tests: counts, ordering, filtering, and
native/NumPy backend agreement (reference semantics at
``differt2d/scene.py:122-175``)."""

import numpy as np
import pytest

import differt2d_tpu.rt._native as native
from differt2d_tpu.rt import (
    CompleteGraph,
    DiGraph,
    all_path_candidates,
    candidates_for_order,
    path_candidate_matrices,
)


@pytest.mark.parametrize("n", [1, 2, 4, 7])
@pytest.mark.parametrize("order", [0, 1, 2, 3])
def test_counts(n, order):
    mat = candidates_for_order(n, order)
    if order == 0:
        expected = 1
    elif order == 1:
        expected = n
    else:
        expected = n * (n - 1) ** (order - 1) if n > 1 else 0
    assert mat.shape == (expected, order)


def test_no_consecutive_repeats():
    mat = candidates_for_order(5, 3)
    assert not np.any(mat[:, 1:] == mat[:, :-1])


def test_lexicographic_order():
    mat = candidates_for_order(5, 3).astype(np.int64)
    codes = mat @ (5 ** np.arange(2, -1, -1))
    assert np.all(np.diff(codes) > 0)


def test_filter_nodes():
    mat = candidates_for_order(6, 2, filter_nodes=(1, 4))
    allowed = {0, 2, 3, 5}
    assert mat.shape == (4 * 3, 2)
    assert set(mat.flatten().tolist()) <= allowed


def test_path_candidate_matrices_orders():
    groups = path_candidate_matrices(7, 0, 2)
    assert sorted(groups) == [0, 1, 2]
    assert groups[0].shape == (1, 0)
    assert groups[1].shape == (7, 1)
    assert groups[2].shape == (42, 2)


def test_all_path_candidates_list_form():
    lst = all_path_candidates(3, 0, 2)
    assert len(lst) == 1 + 3 + 6
    assert lst[0].shape == (0,)
    assert lst[1].shape == (1,)
    assert lst[-1].shape == (2,)
    # Order-major then lexicographic.
    assert [int(a[0]) for a in lst[1:4]] == [0, 1, 2]


def test_native_matches_numpy():
    if not native.available():
        pytest.skip("native backend not built")
    allowed = np.arange(8, dtype=np.int32)
    order = 4
    total = 8 * 7**3
    old = native._NATIVE_THRESHOLD
    try:
        native._NATIVE_THRESHOLD = 0  # force native path
        nat = native.enumerate_paths(allowed, order, total)
        assert nat is not None
        native._NATIVE_THRESHOLD = 10**18  # force NumPy path
        from differt2d_tpu.rt.graph import _decode_candidates

        ref = _decode_candidates(np.arange(8), order)
    finally:
        native._NATIVE_THRESHOLD = old
    assert np.array_equal(nat, ref)


def test_graph_shims():
    g = CompleteGraph(4)
    paths = list(g.all_paths(4, 5, 3, include_from_and_to=False))
    assert len(paths) == 4
    paths_full = list(g.all_paths(4, 5, 3, include_from_and_to=True))
    assert paths_full[0].tolist() == [4, 0, 5]

    dg = DiGraph.from_complete_graph(g)
    from_, to = dg.insert_from_and_to_nodes()
    assert (from_, to) == (4, 5)
    dg.disconnect_nodes(0, 2)
    paths = list(dg.all_paths(from_, to, 4))
    # Two allowed nodes {1, 3}: 2 * 1 = 2 paths of order 2.
    assert [p.tolist() for p in paths] == [[1, 3], [3, 1]]
