"""Graph layer tests: doubling, index arrays, SCC, helpers."""

import numpy as np
import pytest

from graphaligner_tpu.graph import (
    AlignmentGraph,
    graph_from_gfa_file,
    graph_from_vg_file,
)
from graphaligner_tpu.graph.scc import condensation, tarjan_scc


def test_smallexample_stats(smallexample_dir):
    g = graph_from_vg_file(str(smallexample_dir / "sub_test.vg"))
    # Must match the reference's load log exactly:
    # "38 nodes / 332bp / 50 edges / 15 nodes with in-degree >= 2"
    assert g.stats.nodes == 38
    assert g.stats.bp == 332
    assert g.stats.edges == 50
    assert g.stats.high_in_degree_nodes == 15


def test_doubling_and_reverse(smallexample_dir):
    g = graph_from_vg_file(str(smallexample_dir / "sub_test.vg"))
    # forward/rc pairing: id*2 and id*2+1, same length, RC sequence
    fw = g.node_lookup[6738 * 2]
    rc = g.node_lookup[6738 * 2 + 1]
    assert g.node_len[fw] == g.node_len[rc]
    assert g.get_reverse_node(fw) == rc
    assert g.get_reverse_node(rc) == fw
    assert not g.reverse[fw] and g.reverse[rc]
    # reverse position round-trips
    pos = int(g.node_start[fw]) + 3
    rpos = g.get_reverse_position(pos)
    assert g.get_reverse_position(rpos) == pos


def test_pos_to_node_matches_binary_search(smallexample_dir):
    g = graph_from_vg_file(str(smallexample_dir / "sub_test.vg"))
    # pos→node array equivalent to upper_bound over node_start
    for pos in range(g.size_in_bp):
        expected = np.searchsorted(g.node_start, pos, side="right") - 1
        assert g.pos_to_node[pos] == expected


def test_dummy_nodes(smallexample_dir):
    g = graph_from_vg_file(str(smallexample_dir / "sub_test.vg"))
    assert g.dummy_node_start == 0
    assert g.dummy_node_end == g.node_count - 1
    assert g.node_sequence_char(0) == "-"
    assert g.node_sequence_char(g.size_in_bp - 1) == "-"
    assert len(g.in_neighbors(0)) == 0 and len(g.out_neighbors(0)) == 0


def test_gfa_loading(tmp_path):
    p = tmp_path / "g.gfa"
    p.write_text(
        "S\t1\tACGTT\nS\t2\tTTGGA\nL\t1\t+\t2\t+\t2M\nL\t2\t+\t1\t+\t2M\n"
    )
    g = graph_from_gfa_file(str(p))
    assert g.dbg_overlap == 2
    fw1 = g.node_lookup[2]
    assert g.node_len[fw1] == 3  # 5bp - 2 overlap
    # edges: 1+ → 2+ means fw1→fw2 and rc2→rc1
    fw2, rc1, rc2 = g.node_lookup[4], g.node_lookup[3], g.node_lookup[5]
    assert fw2 in g.out_neighbors(fw1)
    assert rc1 in g.out_neighbors(rc2)
    # the 1→2→1 cycle must be detected
    assert g.comp_id[fw1] == g.comp_id[fw2]
    assert g.comp_cyclic[g.comp_id[fw1]]


def test_edge_orientation_vg():
    from graphaligner_tpu.io import vg as vgm
    from graphaligner_tpu.graph.bigraph import graph_from_vg

    graph = vgm.Graph(
        node=[vgm.Node(id=1, sequence="AC"), vgm.Node(id=2, sequence="GT")],
        edge=[vgm.Edge(from_=1, to=2, from_start=False, to_end=False)],
    )
    g = graph_from_vg([graph])
    fw1, fw2 = g.node_lookup[2], g.node_lookup[4]
    rc1, rc2 = g.node_lookup[3], g.node_lookup[5]
    assert list(g.out_neighbors(fw1)) == [fw2]
    assert list(g.out_neighbors(rc2)) == [rc1]
    assert list(g.out_neighbors(fw2)) == []


def test_scc_topo_order():
    # 0→1→2→0 cycle plus 2→3, 3→4: comps {0,1,2} then {3} then {4}
    out_ptr = np.array([0, 1, 2, 4, 5, 5])
    out_idx = np.array([1, 2, 0, 3, 4])
    comp_id, n = tarjan_scc(out_ptr, out_idx)
    assert comp_id[0] == comp_id[1] == comp_id[2]
    assert comp_id[0] < comp_id[3] < comp_id[4]
    _, _, cyclic, order = condensation(out_ptr, out_idx)
    assert cyclic[comp_id[0]] and not cyclic[comp_id[3]]
    # topo order puts the cycle first
    assert set(order[:3]) == {0, 1, 2}


def test_scc_self_loop():
    out_ptr = np.array([0, 1, 1])
    out_idx = np.array([0])
    comp_id, _, cyclic, _ = condensation(out_ptr, out_idx)
    assert cyclic[comp_id[0]]
    assert not cyclic[comp_id[1]]


def test_project_forward(smallexample_dir):
    g = graph_from_vg_file(str(smallexample_dir / "sub_test.vg"))
    node = g.node_lookup[6738 * 2]
    start = int(g.node_start[node])
    res = g.project_forward({start}, 3)
    assert res == {start + 3}


def test_min_distance(smallexample_dir):
    g = graph_from_vg_file(str(smallexample_dir / "sub_test.vg"))
    node = g.node_lookup[6738 * 2]
    start = int(g.node_start[node])
    assert g.min_distance(start, [start + 5]) == 5
    assert g.min_distance(start + 5, [start]) == 5
