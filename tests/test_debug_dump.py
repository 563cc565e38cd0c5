"""Full-lattice debug dump (sina_tpu/debug_dump.py): the lattice
returned by the DP core must be consistent with the scored optimum,
and the graphviz dump must cover the requested column range with
well-formed backpointer edges (mesh_debug.h:103-193 semantics)."""

import numpy as np

from sina_tpu import testing
from sina_tpu.debug_dump import (
    _bp_target, compute_lattice, lattice_to_dot,
)
from sina_tpu.ops.graph import build_graph
from sina_tpu.testing import unaligned_copy


def _fixture():
    db = testing.make_reference(
        n_seqs=12, n_core=80, width=140, seed=5
    )
    graph = build_graph(db.sequences[:6])
    q = unaligned_copy(
        testing.make_queries(db, n=1, seed=9, branch_len=0.4)[0]
    )
    q.upper_case_all()
    return graph, q


def test_lattice_consistent_with_score():
    graph, q = _fixture()
    bp, bj, bi, raw, V, D = compute_lattice(graph, q)
    assert V.shape == (graph.n_nodes, len(q.masks))
    # the scored optimum is the best cell's value
    np.testing.assert_allclose(V[bj, bi], raw, rtol=1e-5)
    # walking backpointers from the best cell reaches an edge cell
    j, i = bj, bi
    steps = 0
    while True:
        tgt = _bp_target(int(bp[j, i]), graph.preds, j, i)
        if tgt is None:
            break
        j, i = tgt
        assert j >= 0 and i >= 0
        steps += 1
        assert steps <= graph.n_nodes + len(q.masks)
    # terminal: an edge cell, or the insertion track tying with the
    # edge seed at i=0 (same value, no predecessor)
    code = int(bp[j, i]) & 0x3
    assert code == 0 or (code == 3 and i == 0)
    # edge cells start at the reference's init_edge value of 1
    # (mesh.h:294-302)
    np.testing.assert_allclose(V[j, i], 1.0, atol=1e-5)


def test_dot_covers_column_range():
    graph, q = _fixture()
    lo, hi = 20, 45
    dot = lattice_to_dot(graph, q, col_from=lo, col_to=hi)
    nodes = [
        j
        for j in range(graph.n_nodes)
        if lo <= int(graph.pos[j]) < hi
    ]
    m = len(q.masks)
    # one table cell per (node-in-range, base)
    assert dot.count("<TABLE") == len(nodes) * m
    assert dot.strip().startswith("digraph")
    assert dot.strip().endswith("}")
    # edges only reference cells that exist in the dump
    import re

    declared = set(re.findall(r"^(f_\d+_\d+) \[", dot, re.M))
    for src, tgt in re.findall(r"(f_\d+_\d+) -> (f_\d+_\d+);", dot):
        assert src in declared
