"""Container semantics: add/remove/replace, fixed flags, freeze column
assignment, elimination ordering (reference tests/vertex.cu, factor.cu)."""

import numpy as np
import pytest

import graphite_tpu as gt
from common import BINARY, CIRCLE_AUTO, POINT2


def make_vs():
    g = gt.Graph(precision=gt.FP64_FP64)
    vs = g.add_vertex_set(POINT2)
    for i in range(5):
        vs.add(100 + i, [float(i), float(-i)])
    return g, vs


def test_add_get_replace():
    g, vs = make_vs()
    np.testing.assert_array_equal(vs.get(102), [2.0, -2.0])
    vs.replace(102, [9.0, 9.0])
    np.testing.assert_array_equal(vs.get(102), [9.0, 9.0])
    with pytest.raises(KeyError):
        vs.add(102, [0.0, 0.0])


@pytest.mark.parametrize("victim", [100, 102, 104])  # start / middle / end
def test_remove_swap_with_last(victim):
    """Swap-remove from every position (tests/vertex.cu:228-297)."""
    g, vs = make_vs()
    vs.remove(victim)
    assert vs.count == 4
    remaining = sorted(vs.id_to_local.keys())
    assert victim not in remaining
    for gid in remaining:
        i = gid - 100
        np.testing.assert_array_equal(vs.get(gid), [float(i), float(-i)])


def test_factor_remove_swap():
    g, vs = make_vs()
    fs = g.add_factor_set(CIRCLE_AUTO)
    handles = [fs.add([100 + i], obs=float(i)) for i in range(5)]
    fs.remove(handles[1])
    assert fs.count == 4
    obs = sorted(float(o) for o in fs.obs)
    assert obs == [0.0, 2.0, 3.0, 4.0]
    # Handles are recycled (utils.hpp:79-103).
    h_new = fs.add([100], obs=7.0)
    assert h_new == handles[1]


def test_freeze_column_assignment_sorted_by_global_id():
    g, vs = make_vs()
    fs = g.add_factor_set(CIRCLE_AUTO)
    for i in range(5):
        fs.add([100 + i], obs=1.0)
    problem = g.freeze()
    assert problem.dim_h == 10
    # columns in global-id order
    off = problem.host.vertex_col_offset["point2"]
    np.testing.assert_array_equal(off, [0, 2, 4, 6, 8])
    assert problem.get_num_block_columns() == 5
    assert problem.get_variable_dimension(0) == 2


def test_freeze_eliminated_sorted_last():
    g = gt.Graph(precision=gt.FP64_FP64)
    a = g.add_vertex_set(gt.vertex_type("a", 2))
    bset = g.add_vertex_set(gt.vertex_type("bv", 3))
    a.add(0, [0.0, 0.0])
    a.add(2, [0.0, 0.0])
    bset.add(1, [0.0, 0.0, 0.0])
    bset.add(3, [0.0, 0.0, 0.0])
    bset.set_eliminate(True)

    ft = gt.factor_type(
        "ab", 2, [gt.vertex_type("a", 2), gt.vertex_type("bv", 3)],
        lambda x, y: x - y[:2],
    )
    fs = g.add_factor_set(ft)
    fs.add([0, 1])
    fs.add([2, 3])
    fs.add([0, 3])
    problem = g.freeze()
    # a vertices first (cols 0,2), then eliminated b vertices
    assert problem.dim_h == 10
    np.testing.assert_array_equal(problem.host.vertex_col_offset["a"], [0, 2])
    np.testing.assert_array_equal(problem.host.vertex_col_offset["bv"], [4, 7])
    assert problem.elimination_block == 2
    assert problem.elimination_col == 4
    assert problem.get_elimination_block_column() == 2


def test_unreferenced_vertex_inactive():
    g, vs = make_vs()
    fs = g.add_factor_set(CIRCLE_AUTO)
    for i in range(4):  # vertex 104 unreferenced
        fs.add([100 + i], obs=1.0)
    problem = g.freeze()
    assert problem.dim_h == 8
    assert not problem.host.vertex_active["point2"][4]
    # trash column
    assert problem.host.vertex_col_offset["point2"][4] == problem.dim_h


def test_unknown_vertex_id_raises():
    g, vs = make_vs()
    fs = g.add_factor_set(CIRCLE_AUTO)
    fs.add([999], obs=1.0)
    with pytest.raises(KeyError):
        g.freeze()


def test_arity_mismatch_raises():
    g, vs = make_vs()
    fs = g.add_factor_set(BINARY)
    with pytest.raises(ValueError):
        fs.add([100], obs=[0.0, 0.0])


def test_empty_factor_set_skipped(capsys):
    g, vs = make_vs()
    fs_used = g.add_factor_set(CIRCLE_AUTO)
    for i in range(5):
        fs_used.add([100 + i], obs=1.0)
    fs_empty = g.add_factor_set(BINARY)  # never populated
    problem = g.freeze()
    err = capsys.readouterr().err
    assert "has no entries" in err
    assert "binary2" not in problem.factor_meta
    from graphite_tpu.linearize import linearize

    lin = linearize(problem, problem.params0)
    assert float(lin.chi2) >= 0.0


def test_empty_vertex_set_warns(capsys):
    g = gt.Graph(precision=gt.FP64_FP64)
    vs = g.add_vertex_set(POINT2)  # empty
    fs = g.add_factor_set(CIRCLE_AUTO)
    problem = g.freeze()
    err = capsys.readouterr().err
    assert "has no entries" in err
    assert problem.dim_h == 0
