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


def _ladder_graph(n_nodes, node_len=8):
    """A linear chain graph n1 -> n2 -> ... with fixed node lengths."""
    nodes = [
        vg.Node(id=i + 1, sequence="ACGTACGT"[:node_len] * (node_len // 8 or 1))
        for i in range(n_nodes)
    ]
    nodes = [
        vg.Node(id=i + 1, sequence=("ACGTACGT" * 4)[:node_len])
        for i in range(n_nodes)
    ]
    edges = [vg.Edge(from_=i + 1, to=i + 2) for i in range(n_nodes - 1)]
    return graph_from_vg([vg.Graph(node=nodes, edge=edges)])


@pytest.mark.skipif(native.get_lib() is None, reason="native lib unavailable")
@pytest.mark.parametrize("force_heap", [False, True])
def test_native_slice_dial_and_heap_fallbacks(force_heap, capfd, monkeypatch):
    """Drive ga_compute_slice's Dial bucket queue (>80-sweep cyclic-style
    relaxation) and its heap-Dijkstra fallback (value spread > 2^22),
    differential against the Python heap closure (the oracle spec).

    The band lists the 200-node chain in REVERSE, so every cross edge
    points backward in cell order and the forward-sweep fast path
    (native/ga_native.cpp SliceClosure::run, 80 iterations) cannot
    converge — the closure must take run_dial. With a multi-Mbp
    sequence the band-source seed (seq_len+1) blows the value spread
    past the 2^22 bucket cap, forcing run_heap."""
    import os

    monkeypatch.setenv("GA_SLICE_STATS", "1")
    n = 200
    graph = _ladder_graph(n, node_len=8)  # 200 x 8 = 1600 cells >= 512
    # prev slice covers only node id 3 (digraph fw) near the chain head:
    # scores propagate ~197 backward cross edges in band order
    start = graph.node_lookup[2 * 3]
    prev = make_initial_slice_one_node(graph, start)
    # reversed band order: successors before predecessors
    band = [graph.node_lookup[2 * i] for i in range(n, 0, -1)]
    seq_len = 5_000_000 if force_heap else 192
    read = "ACGT" * (seq_len // 4)

    def run(min_cells):
        old = oracle.NATIVE_MIN_CELLS
        oracle.NATIVE_MIN_CELLS = min_cells
        try:
            return compute_slice(graph, read, 0, list(band), prev, 0, 20)
        finally:
            oracle.NATIVE_MIN_CELLS = old

    nat = run(0)
    err = capfd.readouterr().err
    assert "ga_compute_slice" in err, err
    stats = dict(
        kv.split("=") for kv in err.strip().split("\n")[-1].split()[1:]
    )
    # the closure runs once for row j-1 and once per horizontal row;
    # dial/heap counters accumulate across them
    assert int(stats["sweeps"]) >= 80, stats  # fast path exhausted
    assert int(stats["dial"]) >= 1, stats
    if force_heap:
        assert int(stats["heap"]) >= 1, stats
    else:
        assert int(stats["heap"]) == 0, stats
    py = run(10**9)
    assert nat.nodes == py.nodes
    assert nat.min_score == py.min_score
    for nd in py.rows:
        assert np.array_equal(nat.rows[nd], py.rows[nd]), nd
        assert np.array_equal(nat.sbs[nd], py.sbs[nd]), nd
        assert np.array_equal(nat.sbs_exists[nd], py.sbs_exists[nd]), nd
