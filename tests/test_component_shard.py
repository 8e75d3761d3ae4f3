"""Component-sharded pangenome distribution (parallel.components;
SURVEY §5 distributed bullet, BASELINE config 5): on a 2-component
graph, two hosts each load ONLY their components, reads route by seed
component, and the ordinal-merged output is byte-identical to a
single-process run over the full graph."""

import os
import pathlib

import pytest

from graphaligner_tpu.core.params import AlignerParams
from graphaligner_tpu.graph.bigraph import load_alignment_graph
from graphaligner_tpu.io import load_fastq, stream, vg
from graphaligner_tpu.parallel import components as comp
from graphaligner_tpu.parallel import distributed as dist
from graphaligner_tpu.runtime.aligner import align_reads, load_seed_hits

FIX = pathlib.Path(__file__).parent / "fixtures"
OFFSET = 10_000


def _two_component_fixture(tmp_path):
    """Two disjoint copies of the sim bubbles graph in one .vg, reads +
    seeds targeting both copies (copy-2 read names suffixed _c2)."""
    graphs = stream.read_messages(str(FIX / "sim" / "bubbles.vg"), vg.Graph)
    nodes, edges = [], []
    for g in graphs:
        for n in g.node:
            nodes.append(n)
            nodes.append(vg.Node(id=n.id + OFFSET, sequence=n.sequence))
        for e in g.edge:
            edges.append(e)
            edges.append(
                vg.Edge(
                    from_=e.from_ + OFFSET,
                    to=e.to + OFFSET,
                    from_start=e.from_start,
                    to_end=e.to_end,
                )
            )
    gpath = tmp_path / "two_comp.vg"
    stream.write_messages(str(gpath), [vg.Graph(node=nodes, edge=edges)])

    reads = load_fastq(str(FIX / "sim" / "sim.fastq"))
    seeds = load_seed_hits(
        str(FIX / "sim" / "seeds.gam"), [r.seq_id for r in reads]
    )
    fastq_lines = []
    seed_msgs = []
    for r in reads[:8]:
        for suffix, off in (("", 0), ("_c2", OFFSET)):
            name = r.seq_id + suffix
            fastq_lines += [f"@{name}", r.sequence, "+", "!" * len(r.sequence)]
            for node_id, pos, rev in seeds[r.seq_id]:
                seed_msgs.append(
                    vg.Alignment(
                        name=name,
                        query_position=pos,
                        path=vg.Path(
                            mapping=[
                                vg.Mapping(
                                    position=vg.Position(
                                        node_id=node_id + off,
                                        is_reverse=rev,
                                    )
                                )
                            ]
                        ),
                    )
                )
    fpath = tmp_path / "reads.fastq"
    fpath.write_text("\n".join(fastq_lines) + "\n")
    spath = tmp_path / "seeds.gam"
    stream.write_messages(str(spath), seed_msgs)
    return str(gpath), str(fpath), str(spath)


def test_shard_plan_splits_and_cogroups(tmp_path):
    gpath, fpath, spath = _two_component_fixture(tmp_path)
    reads = load_fastq(fpath)
    seed_map = load_seed_hits(spath, [r.seq_id for r in reads])
    node_bp, edges = comp.graph_topology(gpath)
    uf, host_of_root = comp.shard_plan(node_bp, edges, seed_map, 2)
    # exactly two groups, one per host (equal bp -> balanced 1/1)
    roots = {uf.find(n) for n in node_bp}
    assert len(roots) == 2
    assert sorted(host_of_root[r] for r in roots) == [0, 1]
    # every read's seeds resolve to ONE host
    for name, seeds in seed_map.items():
        hosts = {host_of_root[uf.find(nid)] for nid, _, _ in seeds}
        assert len(hosts) == 1, name
    # subgraphs: each host holds exactly one copy's nodes
    g0, rh0 = comp.load_component_shard(gpath, seed_map, 0, 2)
    g1, rh1 = comp.load_component_shard(gpath, seed_map, 1, 2)
    full = load_alignment_graph(gpath)
    # each subgraph carries its own dummy start/end pair
    assert g0.node_count + g1.node_count == full.node_count + 2
    # routing sends the _c2 twin of a read to the other host
    some = next(n for n in seed_map if not n.endswith("_c2"))
    assert rh0(some) != rh0(some + "_c2")


def test_component_sharded_two_hosts_byte_identical(tmp_path):
    gpath, fpath, spath = _two_component_fixture(tmp_path)
    outdir = tmp_path / "work"
    os.makedirs(outdir, exist_ok=True)
    merged = str(tmp_path / "merged.gam")

    def run(pidx):
        params = AlignerParams(
            graph_file=gpath,
            fastq_file=fpath,
            alignment_file=merged,
            seed_file=spath,
            initial_bandwidth=35,
        )
        align_reads(
            params,
            log=lambda *a: None,
            output_dir=str(outdir / f"h{pidx}"),
            backend="jax",
            process_index=pidx,
            process_count=2,
            shard_mode="components",
        )

    # host 1 first so host 0's post-barrier merge (barrier is a no-op
    # single-process) finds both shards
    run(1)
    run(0)

    solo = str(tmp_path / "solo.gam")
    params = AlignerParams(
        graph_file=gpath,
        fastq_file=fpath,
        alignment_file=solo,
        seed_file=spath,
        initial_bandwidth=35,
    )
    align_reads(
        params, log=lambda *a: None, output_dir=str(outdir / "solo"),
        backend="jax",
    )
    assert open(merged, "rb").read() == open(solo, "rb").read()
