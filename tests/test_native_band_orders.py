"""Differential test: native band-order replay == oracle insertion orders.

The batched pipeline's min_score_index tie-break replays the reference's
projectForwardFromMinScore insertion-order chain in C++
(native/ga_native.cpp ga_band_orders). The pipeline falls back silently
to the Python replay when the native path errors, so this test pins the
native path itself against the oracle's recorded per-slice node orders
(SliceScores.nodes IS the insertion order)."""

import numpy as np
import pytest

from graphaligner_tpu.core.align import _pad_to_word, get_table
from graphaligner_tpu.core.engine_banded import build_graph_tables
from graphaligner_tpu.core.oracle import make_initial_slice_one_node
from graphaligner_tpu.core.params import ALTERNATE_METHOD_CUTOFF, WORD_SIZE
from graphaligner_tpu.graph import load_alignment_graph
from graphaligner_tpu.io import load_fastq, native
from graphaligner_tpu.runtime.aligner import load_seed_hits

from pathlib import Path

FIX = Path(__file__).parent / "fixtures"


@pytest.mark.parametrize(
    "graph_file,reads_file,seeds_file,idx",
    [
        ("sim/bubbles.vg", "sim/sim.fastq", "sim/seeds.gam", 0),
        ("sim/bubbles.vg", "sim/sim.fastq", "sim/seeds.gam", 7),
        ("longsim/graph.vg", "longsim/reads.fastq", "longsim/seeds.gam", 3),
    ],
)
def test_native_band_orders_match_oracle(graph_file, reads_file, seeds_file, idx):
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    graph = load_alignment_graph(str(FIX / graph_file))
    reads = load_fastq(str(FIX / reads_file))
    seeds = load_seed_hits(str(FIX / seeds_file), [r.seq_id for r in reads])
    tables = build_graph_tables(graph)
    topo = tables.topo_rank
    r = reads[idx]
    nid, pos, rev = seeds[r.seq_id][0]
    fw_node = graph.node_lookup[nid * 2 + (1 if rev else 0)]
    seq = _pad_to_word(r.sequence[pos:])
    init = make_initial_slice_one_node(graph, fw_node)
    table = get_table(graph, seq, init, len(seq) // WORD_SIZE, 35, 0)
    slices = table.slices[1:]
    K, Nm = len(slices), 32
    assert K >= 1
    from graphaligner_tpu.core.engine_banded import band_hash_np

    tie = np.zeros((K, 3, Nm), np.int32)
    for k, sl in enumerate(slices):
        oa = np.asarray(list(sl.nodes))
        n = len(oa)
        assert n <= Nm
        perm = np.argsort(topo[oa], kind="stable")
        srt = oa[perm]
        row = np.full(Nm, 2**31 - 1, np.int64)
        row[:n] = srt
        tie[k, 0, 0] = band_hash_np(row)  # band-row hash (checked slices)
        tie[k, 1, :n] = [sl.node_min[int(x)] for x in srt]
        tie[k, 2, :n] = [sl.node_end_score(int(x)) for x in srt]
    orders = native.band_orders(
        tie,
        [sl.min_score for sl in slices],
        table.bandwidth_per_slice[:K],
        fw_node,
        graph,
        topo,
        ALTERNATE_METHOD_CUTOFF,
        int(2**31 - 1),
    )
    assert orders is not None
    for k in range(K):
        assert list(orders[k]) == list(slices[k].nodes), f"slice {k}"


def test_native_tie_start_matches_python_scan():
    """ga_tie_start (native banded-Tarjan + last-min scan) must equal the
    Python reversed-components scan on fuzzed band orders + score rows —
    it replaces that scan on the multi-node tie hot path."""
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    from graphaligner_tpu.core.batch_align import _cell_layout
    from graphaligner_tpu.core.oracle import _banded_tarjan

    graph = load_alignment_graph(str(FIX / "sim" / "bubbles.vg"))
    tables = build_graph_tables(graph)
    topo = np.asarray(tables.topo_rank)
    rng = np.random.default_rng(7)
    n_nodes = graph.node_count
    for trial in range(200):
        # random connected-ish band: start node + forward closure walk
        start = int(rng.integers(0, n_nodes))
        order = [start]
        seen = {start}
        while len(order) < int(rng.integers(2, 14)):
            src = order[int(rng.integers(0, len(order)))]
            nbrs = [int(x) for x in graph.out_neighbors(src)]
            if not nbrs:
                break
            w = nbrs[int(rng.integers(0, len(nbrs)))]
            if w not in seen:
                seen.add(w)
                order.append(w)
        order_arr = np.array(order, dtype=np.int64)
        order2, lens2, offs2 = _cell_layout(tables, order_arr)
        c_used = int(lens2.sum())
        # random scores with deliberate multi-node ties
        sends = rng.integers(5, 9, c_used).astype(np.int32)
        best = int(sends.min())
        # python reference scan
        cell_of = {
            int(n): (int(f), int(L))
            for n, f, L in zip(order2, offs2, lens2)
        }
        last = None
        comps = _banded_tarjan(graph, list(order), {n: True for n in order})
        for comp in reversed(comps):
            for n in reversed(comp):
                f, L = cell_of[n]
                seg = sends[f : f + L]
                if seg.min() == best:
                    startp = int(graph.node_start[n])
                    for k in range(L):
                        if seg[k] == best:
                            last = startp + k
        got = native.tie_start(order_arr, sends, best, graph, topo)
        assert got == last, (trial, order, got, last)
        # divergence case: no cell holds best
        assert native.tie_start(order_arr, sends, best - 1, graph, topo) == -1


def test_native_tie_batch_matches_per_lane_calls():
    """ga_tie_batch (one threaded call for W lanes) must equal the
    per-lane ga_band_orders + ga_tie_start composition it replaces on
    the multi-node tie path."""
    if native.get_lib() is None:
        pytest.skip("native library unavailable")
    from graphaligner_tpu.core.batch_align import _cell_layout
    from graphaligner_tpu.core.engine_banded import band_hash_np

    graph = load_alignment_graph(str(FIX / "sim" / "bubbles.vg"))
    reads = load_fastq(str(FIX / "sim" / "sim.fastq"))
    seeds = load_seed_hits(str(FIX / "sim" / "seeds.gam"), [r.seq_id for r in reads])
    tables = build_graph_tables(graph)
    topo = np.asarray(tables.topo_rank)
    Nm = 32
    lanes = []
    for idx in (0, 3, 7, 11):
        r = reads[idx]
        nid, pos, rev = seeds[r.seq_id][0]
        fw_node = graph.node_lookup[nid * 2 + (1 if rev else 0)]
        seq = _pad_to_word(r.sequence[pos:])
        init = make_initial_slice_one_node(graph, fw_node)
        table = get_table(graph, seq, init, len(seq) // WORD_SIZE, 35, 0)
        slices = table.slices[1:]
        K = len(slices)
        tie = np.zeros((K, 3, Nm), np.int32)
        for k, sl in enumerate(slices):
            oa = np.asarray(list(sl.nodes))
            n = len(oa)
            perm = np.argsort(topo[oa], kind="stable")
            srt = oa[perm]
            row = np.full(Nm, 2**31 - 1, np.int64)
            row[:n] = srt
            tie[k, 0, 0] = band_hash_np(row)
            tie[k, 1, :n] = [sl.node_min[int(x)] for x in srt]
            tie[k, 2, :n] = [sl.node_end_score(int(x)) for x in srt]
        # final-slice per-cell last-row scores in device slot layout
        order2, lens2, offs2 = _cell_layout(tables, np.asarray(list(slices[-1].nodes)))
        sends = np.concatenate(
            [np.asarray(slices[-1].rows[int(n)][WORD_SIZE - 1]) for n in order2]
        ).astype(np.int32)
        lanes.append(
            (
                tie,
                np.asarray([sl.min_score for sl in slices], np.int32),
                np.asarray(table.bandwidth_per_slice[:K], np.int32),
                fw_node,
                sends,
                int(sends.min()),
            )
        )
    W = len(lanes)
    Kmax = max(len(l[1]) for l in lanes)
    Cmax = max(len(l[4]) for l in lanes)
    tie_b = np.zeros((W, Kmax, 3, Nm), np.int32)
    ms_b = np.zeros((W, Kmax), np.int32)
    bw_b = np.zeros((W, Kmax), np.int32)
    chk_b = np.zeros((W, Kmax), np.uint8)
    Ks = np.zeros(W, np.int32)
    sn = np.zeros(W, np.int32)
    sends_b = np.zeros((W, Cmax), np.int32)
    bests = np.zeros(W, np.int32)
    expected = []
    for t, (tie, ms, bw, fw_node, sends, best) in enumerate(lanes):
        K = len(ms)
        tie_b[t, :K] = tie
        ms_b[t, :K] = ms
        bw_b[t, :K] = bw
        chk_b[t, :K] = 1
        Ks[t] = K
        sn[t] = fw_node
        sends_b[t, : len(sends)] = sends
        bests[t] = best
        # per-lane composition (the path tie_batch replaces)
        orders = native.band_orders(
            tie, ms, list(bw), fw_node, graph, topo,
            ALTERNATE_METHOD_CUTOFF, int(2**31 - 1),
        )
        expected.append(
            native.tie_start(orders[-1], sends, best, graph, topo)
        )
    for nthreads in (1, 4):
        pos, rc = native.tie_batch(
            tie_b, ms_b, bw_b, Ks, sn, chk_b, sends_b, bests, graph, topo,
            ALTERNATE_METHOD_CUTOFF, int(2**31 - 1), nthreads,
        )
        assert list(rc) == [0] * W
        assert list(pos) == expected, nthreads
