"""Ecosystem tool tests, differential against reference binary goldens
where captured (compare_alignments / visualize_alignment / bluntify)."""

import pathlib

import pytest

from graphaligner_tpu.io import stream, vg
from graphaligner_tpu.io.fastq import load_fastq
from graphaligner_tpu.tools import (
    alignment_overlap,
    alignment_sequence_inserter,
    bluntify,
    compare_alignments,
    extract_path_sequence,
    extract_path_subgraph_neighbourhood,
    maf_to_alignment,
    merge_gfas,
    merge_graphs,
    pick_seed_hits,
    reverse_reads,
    simulate_reads,
    visualize_alignment,
)

SIM = pathlib.Path(__file__).parent / "fixtures" / "sim"
GOLDEN = pathlib.Path(__file__).parent / "fixtures" / "golden"


def test_compare_alignments_matches_reference(capsys):
    """Stdout must match the reference CompareAlignments byte-for-byte
    (it iterates a sorted map, so ordering is deterministic)."""
    compare_alignments.main(
        [str(SIM / "truth.gam"), str(SIM / "golden_b35" / "out.gam"), str(SIM / "bubbles.vg")]
    )
    out = capsys.readouterr().out
    golden = (SIM / "compare_golden.txt").read_text()
    assert out == golden


def test_visualize_alignment_matches_reference(capsys):
    visualize_alignment.main([str(GOLDEN / "trace_0_read1.trace")])
    out = capsys.readouterr().out
    golden = (GOLDEN / "visualize_golden.txt").read_text()
    assert out.rstrip("\n").split("\n") == golden.rstrip("\n").split("\n")


def test_bluntify_matches_reference(tmp_path):
    out = tmp_path / "blunt.gfa"
    bluntify.main(["4", str(SIM / "overlap.gfa"), str(out)])
    golden = (SIM / "bluntify_golden.gfa").read_text().strip().split("\n")
    mine = out.read_text().strip().split("\n")
    assert sorted(mine) == sorted(golden)


def test_bluntify_unitig_chain_matches_reference(tmp_path):
    """Assembly-unitig shape (120bp nodes, 63bp = k-1 overlaps, the
    bench_configs.py config-3 generator): golden from the reference
    Bluntify binary (which node-splits this shape; KEEP_LEFT-heavy)."""
    out = tmp_path / "blunt.gfa"
    bluntify.main(["64", str(SIM / "overlap_unitigs.gfa"), str(out)])
    golden = (
        (SIM / "bluntify_unitigs_golden.gfa").read_text().strip().split("\n")
    )
    mine = out.read_text().strip().split("\n")
    assert sorted(mine) == sorted(golden)


def test_pick_seed_hits(tmp_path):
    seeds = [
        vg.Alignment(name="r1", query_position=5,
                     path=vg.Path(mapping=[vg.Mapping(position=vg.Position(node_id=10))])),
        vg.Alignment(name="r1", query_position=5,  # duplicate
                     path=vg.Path(mapping=[vg.Mapping(position=vg.Position(node_id=10))])),
        vg.Alignment(name="r1", query_position=9,
                     path=vg.Path(mapping=[vg.Mapping(position=vg.Position(node_id=11))])),
        vg.Alignment(name="r1", query_position=3,
                     path=vg.Path(mapping=[vg.Mapping(position=vg.Position(node_id=12))])),
        vg.Alignment(name="r2", query_position=0,  # node_id <= 1 dropped
                     path=vg.Path(mapping=[vg.Mapping(position=vg.Position(node_id=1))])),
    ]
    src = tmp_path / "in.gam"
    out = tmp_path / "out.gam"
    stream.write_messages(str(src), seeds)
    pick_seed_hits.main([str(out), "2", str(src)])
    result = stream.read_messages(str(out), vg.Alignment)
    assert len(result) == 2  # capped at 2, dup and node 1 dropped
    assert all(a.name == "r1" for a in result)


def test_pick_seed_hits_matches_reference_binary(tmp_path):
    """Byte-identical to /tmp/refbuild/bin/PickSeedHits on the sim seed
    corpus (goldens checked in): cap=2 single input, and cap=1 over two
    input files (dedup across files + node_id<=1 drop exercised).
    Reference: PickSeedHits.cpp (whole file, ~50 lines)."""
    out = tmp_path / "o.gam"
    pick_seed_hits.main([str(out), "2", str(SIM / "seeds.gam")])
    assert out.read_bytes() == (SIM / "pick_seeds_golden_cap2.gam").read_bytes()
    pick_seed_hits.main(
        [str(out), "1", str(SIM / "seeds.gam"), str(SIM / "seeds_rc.gam")]
    )
    assert out.read_bytes() == (
        SIM / "pick_seeds_golden_cap1_multi.gam"
    ).read_bytes()


def test_reverse_reads(tmp_path):
    src = tmp_path / "in.fastq"
    src.write_text("@r1\nACGTT\n+\n!!!#!\n")
    out = tmp_path / "out.fastq"
    reverse_reads.main([str(src), str(out)])
    reads = load_fastq(str(out))
    assert reads[0].sequence == "AACGT"
    assert reads[0].quality == "!#!!!"


def test_alignment_sequence_inserter(tmp_path):
    src = tmp_path / "in.fastq"
    src.write_text("@r1\nACGTT\n+\n!!!!!\n")
    gam = tmp_path / "in.gam"
    stream.write_messages(str(gam), [vg.Alignment(name="r1")])
    out = tmp_path / "out.gam"
    alignment_sequence_inserter.main([str(src), str(gam), str(out)])
    result = stream.read_messages(str(out), vg.Alignment)
    assert result[0].sequence == "ACGTT"


def test_merge_graphs(tmp_path):
    g1 = tmp_path / "a.vg"
    g2 = tmp_path / "b.vg"
    stream.write_messages(str(g1), [vg.Graph(node=[vg.Node(id=1, sequence="AC")])])
    stream.write_messages(str(g2), [vg.Graph(node=[vg.Node(id=2, sequence="GT")],
                                             edge=[vg.Edge(from_=1, to=2)])])
    out = tmp_path / "merged.vg"
    merge_graphs.main([str(g1), str(g2), "-o", str(out)])
    merged = stream.read_messages(str(out), vg.Graph)[0]
    assert {n.id for n in merged.node} == {1, 2}
    assert len(merged.edge) == 1


def test_merge_gfas(tmp_path):
    a = tmp_path / "a.gfa"
    b = tmp_path / "b.gfa"
    a.write_text("S\t1\tAC\nS\t2\tGT\nL\t1\t+\t2\t+\t0M\n")
    b.write_text("S\t3\tTT\nL\t2\t+\t3\t+\t0M\n")
    out = tmp_path / "m.gfa"
    merge_gfas.main([str(out), str(a), str(b)])
    from graphaligner_tpu.io.gfa import GfaGraph

    merged = GfaGraph.load(str(out))
    assert set(merged.nodes) == {1, 2, 3}


def test_extract_path_sequence(capsys):
    extract_path_sequence.main(
        [str(SIM / "bubbles.vg"), str(SIM / "truth.gam")]
    )
    out = capsys.readouterr().out
    lines = out.split("\n")
    assert lines[0].startswith(">read_")
    truth = stream.read_messages(str(SIM / "truth.gam"), vg.Alignment)
    names = {l[1:] for l in lines if l.startswith(">")}
    # every truth read gets a record (truth mappings carry no edits →
    # from_length 0 → empty extracted sequences, as in the reference)
    for t in truth:
        assert t.name in names


def test_simulate_reads_and_compare_pipeline(tmp_path):
    """Full pipeline with our own tools: simulate → align → compare."""
    truth = tmp_path / "truth.gam"
    reads = tmp_path / "reads.fastq"
    seeds = tmp_path / "seeds.gam"
    simulate_reads.main(
        [str(SIM / "bubbles.vg"), str(truth), str(reads), "3", "300",
         "0.02", "0.02", str(seeds), "0.02", "7"]
    )
    fastqs = load_fastq(str(reads))
    assert len(fastqs) == 3
    truths = stream.read_messages(str(truth), vg.Alignment)
    assert all(len(t.path.mapping) >= 1 for t in truths)
    assert all(len(t.sequence) == 300 for t in truths)
    # align with the oracle pipeline and score with compare_alignments
    from graphaligner_tpu.core.align import align_one_way_seeded
    from graphaligner_tpu.graph import load_alignment_graph
    from graphaligner_tpu.runtime.aligner import replace_digraph_node_ids

    graph = load_alignment_graph(str(SIM / "bubbles.vg"))
    seed_list = stream.read_messages(str(seeds), vg.Alignment)
    out = []
    for read, seed in zip(fastqs, seed_list):
        res = align_one_way_seeded(
            graph, read.seq_id, read.sequence, 35, 0,
            [(seed.path.mapping[0].position.node_id, seed.query_position,
              seed.path.mapping[0].position.is_reverse)],
        )
        if not res.alignment_failed:
            replace_digraph_node_ids(res.alignment)
            out.append(res.alignment)
    pred = tmp_path / "pred.gam"
    stream.write_messages(str(pred), out)
    sizes = compare_alignments.node_sizes(
        compare_alignments.load_vg_graph(str(SIM / "bubbles.vg"))
    )
    # SimulateReads emits forward-orientation seeds only (reference
    # SimulateReads.cpp:112-118), so reverse-strand truths legitimately
    # misalign in this pipeline; require the forward ones to be good.
    ident = [
        compare_alignments.identity_percent(
            compare_alignments.alignment_identity(t, p, sizes)
        )
        for t, p in zip(truths, out)
        if t.name == p.name and not t.path.mapping[0].position.is_reverse
    ]
    assert ident and all(i >= 0.7 for i in ident)


def test_extract_path_subgraph_neighbourhood(tmp_path):
    gfa = tmp_path / "g.gfa"
    gfa.write_text(
        "S\t1\tACGTACGT\nS\t2\tGGGG\nS\t3\tTTTT\n"
        "L\t1\t+\t2\t+\t0M\nL\t2\t+\t3\t+\t0M\n"
    )
    gam = tmp_path / "a.gam"
    # NodePos uses is_reverse as the side key (reference quirk:
    # ExtractPathSubgraphNeighbourhood.cpp:33), so expansion follows the
    # '+'-keyed edges only when is_reverse=True here.
    stream.write_messages(
        str(gam),
        [vg.Alignment(name="x", path=vg.Path(
            mapping=[vg.Mapping(position=vg.Position(node_id=1, is_reverse=True))]))],
    )
    out = tmp_path / "sub.gfa"
    extract_path_subgraph_neighbourhood.main([str(gfa), str(out), str(gam), "10"])
    from graphaligner_tpu.io.gfa import GfaGraph

    sub = GfaGraph.load(str(out))
    assert 1 in sub.nodes and 2 in sub.nodes


def test_alignment_overlap(tmp_path):
    # two alignments sharing a suffix/prefix of nodes → one overlap edge
    graph = tmp_path / "g.vg"
    stream.write_messages(str(graph), [vg.Graph(node=[
        vg.Node(id=i, sequence="A" * 10) for i in range(1, 6)])])
    def aln(name, nodes):
        return vg.Alignment(name=name, path=vg.Path(mapping=[
            vg.Mapping(position=vg.Position(node_id=n),
                       edit=[vg.Edit(from_length=10)]) for n in nodes]))
    gam = tmp_path / "a.gam"
    stream.write_messages(str(gam), [aln("r1", [1, 2, 3]), aln("r2", [2, 3, 4])])
    reads = tmp_path / "r.fastq"
    reads.write_text("@r1\nACGT\n+\n!!!!\n@r2\nACGT\n+\n!!!!\n")
    out = tmp_path / "o.gfa"
    alignment_overlap.main([str(graph), str(gam), "0.5", "0.3", str(reads), str(out)])
    text = out.read_text()
    assert "S\tr1\t" in text and "S\tr2\t" in text
    assert any(l.startswith("L\t") for l in text.split("\n"))


def test_maf_to_alignment(tmp_path):
    graph = tmp_path / "g.vg"
    stream.write_messages(str(graph), [vg.Graph(node=[
        vg.Node(id=1, sequence="ACGTA"), vg.Node(id=2, sequence="GGTTC")])])
    ref = tmp_path / "ref.gam"
    stream.write_messages(str(ref), [vg.Alignment(name="ref", path=vg.Path(mapping=[
        vg.Mapping(position=vg.Position(node_id=1), edit=[vg.Edit(to_length=5)]),
        vg.Mapping(position=vg.Position(node_id=2), edit=[vg.Edit(to_length=5)]),
    ]))])
    maf = tmp_path / "x.maf"
    maf.write_text(
        "a score=1\ns ref 2 6 + 10 GTAGGT\ns read_1 0 6 + 6 GTAGGT\n\n"
    )
    out_gam = tmp_path / "out.gam"
    out_fa = tmp_path / "out.fa"
    maf_to_alignment.main([str(graph), str(ref), str(maf), str(out_gam), str(out_fa)])
    alns = stream.read_messages(str(out_gam), vg.Alignment)
    assert len(alns) == 1
    assert [m.position.node_id for m in alns[0].path.mapping] == [1, 2]
    assert ">read_1" in out_fa.read_text()


def test_read_index_to_id(tmp_path):
    """CSV minimizer hits -> seed GAM (reference ReadIndexToId.cpp:26-71),
    including the reverse-coordinate flip and (node, read) dedup."""
    from graphaligner_tpu.tools import read_index_to_id

    fastq = tmp_path / "r.fastq"
    fastq.write_text("@readA\nACGTACGTAC\n+\n!!!!!!!!!!\n@readB\nTTTTGGGG\n+\n!!!!!!!!\n")
    csv = tmp_path / "hits.csv"
    csv.write_text("5,0,3\n5,0,7\n9,1,2\n")
    out = tmp_path / "seeds.gam"
    read_index_to_id.main([str(fastq), str(csv), str(out)])
    alns = stream.read_messages(str(out), vg.Alignment)
    assert [(a.name, a.query_position, a.path.mapping[0].position.node_id) for a in alns] == [
        ("readA", 3, 5),  # the duplicate (5, 0) hit is dropped
        ("readB", 2, 9),
    ]
    out2 = tmp_path / "seeds_rev.gam"
    read_index_to_id.main([str(fastq), str(csv), str(out2), "1"])
    alns2 = stream.read_messages(str(out2), vg.Alignment)
    assert alns2[0].query_position == 10 - 3 - 1
    assert alns2[1].query_position == 8 - 2 - 1


def test_supported_subgraph(tmp_path):
    """Edges kept iff some alignment path traverses them (reference
    SupportedSubgraph.cpp:27-68)."""
    from graphaligner_tpu.tools import supported_subgraph

    g = vg.Graph(
        node=[vg.Node(id=i, sequence="ACGT") for i in (1, 2, 3)],
        edge=[vg.Edge(from_=1, to=2), vg.Edge(from_=2, to=3)],
    )
    gpath = tmp_path / "g.vg"
    stream.write_messages(str(gpath), [g])
    aln = vg.Alignment(
        name="r",
        path=vg.Path(
            mapping=[
                vg.Mapping(position=vg.Position(node_id=1)),
                vg.Mapping(position=vg.Position(node_id=2)),
            ]
        ),
    )
    apath = tmp_path / "a.gam"
    stream.write_messages(str(apath), [aln])
    out = tmp_path / "out.vg"
    supported_subgraph.main([str(gpath), str(apath), str(out)])
    sub = stream.read_messages(str(out), vg.Graph)[0]
    assert len(sub.node) == 3
    assert [(e.from_, e.to) for e in sub.edge] == [(1, 2)]
