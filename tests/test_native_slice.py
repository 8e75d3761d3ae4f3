"""Differential test: the native C++ banded slice engine (the giant-band
path, ga_compute_slice) against the Python oracle specification."""

import numpy as np
import pytest

import graphaligner_tpu.core.oracle as oracle
from graphaligner_tpu.core.oracle import (
    compute_slice,
    make_initial_slice_one_node,
)
from graphaligner_tpu.core.band import project_forward_from_min_score
from graphaligner_tpu.graph.bigraph import graph_from_vg
from graphaligner_tpu.io import native, vg


def _random_graph(rng, n_nodes=120, extra_edges=60, cyclic=True):
    nodes = []
    for i in range(n_nodes):
        L = int(rng.integers(4, 14))
        seq = "".join(rng.choice(list("ACGT"), L))
        nodes.append(vg.Node(id=i + 1, sequence=seq))
    edges = [vg.Edge(from_=i + 1, to=i + 2) for i in range(n_nodes - 1)]
    for _ in range(extra_edges):
        a = int(rng.integers(1, n_nodes + 1))
        b = int(rng.integers(1, n_nodes + 1))
        if a == b:
            continue
        if not cyclic and a > b:
            a, b = b, a
        edges.append(vg.Edge(from_=a, to=b))
    return graph_from_vg([vg.Graph(node=nodes, edge=edges)])


@pytest.mark.skipif(native.get_lib() is None, reason="native lib unavailable")
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_native_slice_matches_python(seed):
    rng = np.random.default_rng(seed)
    graph = _random_graph(rng, cyclic=(seed != 1))
    read = "".join(rng.choice(list("ACGT"), 192))
    start = graph.node_lookup[2 * 5]  # node id 5 forward

    def run(min_cells):
        old = oracle.NATIVE_MIN_CELLS
        oracle.NATIVE_MIN_CELLS = min_cells
        try:
            prev = make_initial_slice_one_node(graph, start)
            slices = []
            for si in range(3):
                band = project_forward_from_min_score(graph, prev, 20)
                s = compute_slice(
                    graph, read, si * 64, band, prev, si, 20
                )
                slices.append(s)
                prev = s
            return slices
        finally:
            oracle.NATIVE_MIN_CELLS = old

    py = run(10**9)
    nat = run(0)
    for a, b in zip(py, nat):
        assert a.nodes == b.nodes
        assert a.min_score == b.min_score
        assert a.min_score_index == b.min_score_index
        for n in a.rows:
            assert np.array_equal(a.rows[n], b.rows[n]), n
            assert np.array_equal(a.sbs[n], b.sbs[n]), n
            assert np.array_equal(a.sbs_exists[n], b.sbs_exists[n]), n
