"""Pangenome-scale bench: load + seeded alignment on a >=10^6-node
variation graph (VERDICT r1 item 5; BASELINE.json config 4 class).

Generates a synthetic chr20-class variation graph (~1.3M bigraph nodes
= ~2.6M digraph nodes, ~8.4 Mbp), builds the device tables, and aligns
100 x 10kb seeded reads end-to-end through the batched device pipeline.
Prints one JSON line with load/align timings.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))


def main():
    import jax

    from biggraph_util import make_big_graph, make_reads
    from graphaligner_tpu.core.batch_align import (
        BandedBatchAligner,
        align_reads_seeded_batch,
    )
    from graphaligner_tpu.core.engine_banded import build_graph_tables
    from graphaligner_tpu.io.fastq import FastQ

    n_segments = int(os.environ.get("GA_BIG_SEGMENTS", 1_050_000))
    t0 = time.time()
    graph, backbone, seq = make_big_graph(n_segments)
    t_load = time.time() - t0
    t0 = time.time()
    tables = build_graph_tables(graph)
    t_tables = time.time() - t0

    reads = make_reads(seq, 100, 10_048, graph, backbone)
    fastqs = [FastQ(seq_id=n, sequence=s) for n, s, _ in reads]
    seed_map = {n: [(node, 0, False)] for n, _, node in reads}
    aligner = BandedBatchAligner(graph, 35, 0, _tables=tables)
    # warm (compiles)
    align_reads_seeded_batch(graph, aligner, fastqs, seed_map)
    t0 = time.time()
    results = align_reads_seeded_batch(graph, aligner, fastqs, seed_map)
    dt = time.time() - t0
    ok = sum(
        1
        for r in results.values()
        if not r.alignment_failed and r.alignment.score < 10_048 * 0.25
    )
    print(json.dumps({
        "nodes_bigraph": graph.node_count // 2,
        "nodes_digraph": graph.node_count,
        "bp": int(graph.node_end[-1]),
        "load_s": round(t_load, 1),
        "tables_s": round(t_tables, 1),
        "reads": len(reads),
        "aligned_ok": ok,
        "align_s": round(dt, 2),
        "reads_per_s": round(len(reads) / dt, 1),
        "device": str(jax.devices()[0]),
    }))


def main_sharded(n_hosts: int):
    """--sharded N: the component-sharded pangenome mode
    (parallel.components; BASELINE config 5 class). Builds an N-
    component pangenome (N disjoint chromosome-class replicas), plans
    the deterministic component->host assignment, then measures HOST 0
    only: subgraph build + tables + aligning its routed reads — the
    quantities that must scale ~1/N for pod-size graphs to fit."""
    import jax

    from biggraph_util import make_big_vg_multi, make_reads
    from graphaligner_tpu.core.batch_align import (
        BandedBatchAligner,
        align_reads_seeded_batch,
    )
    from graphaligner_tpu.core.engine_banded import build_graph_tables
    from graphaligner_tpu.graph.bigraph import graph_from_vg
    from graphaligner_tpu.io.fastq import FastQ
    from graphaligner_tpu.parallel import components as comp

    n_segments = int(os.environ.get("GA_BIG_SEGMENTS", 1_050_000))
    t0 = time.time()
    chunks, node_bp, edges, per_comp = make_big_vg_multi(n_segments, n_hosts)
    t_gen = time.time() - t0

    # reads: 100 per component, seeded on that component's backbone
    reads_all = []
    seed_map = {}
    for k, (backbone, seq) in enumerate(per_comp):
        g_stub = None
        for name, s, node in make_reads(
            seq, 100 // n_hosts + 1, 10_048, g_stub, backbone, seed=5 + k
        ):
            name = f"c{k}_{name}"
            reads_all.append(FastQ(seq_id=name, sequence=s))
            seed_map[name] = [(node, 0, False)]

    t0 = time.time()
    uf, host_of_root = comp.shard_plan(node_bp, edges, seed_map, n_hosts)
    t_plan = time.time() - t0
    keep0 = {n for n in node_bp if host_of_root[uf.find(n)] == 0}
    t0 = time.time()
    g0 = graph_from_vg(chunks, keep=keep0)
    t_sub = time.time() - t0
    t0 = time.time()
    tables0 = build_graph_tables(g0)
    t_tables = time.time() - t0
    mine = [
        r for r in reads_all
        if host_of_root[uf.find(seed_map[r.seq_id][0][0])] == 0
    ]
    aligner = BandedBatchAligner(g0, 35, 0, _tables=tables0)
    sm = {r.seq_id: seed_map[r.seq_id] for r in mine}
    align_reads_seeded_batch(g0, aligner, mine, sm)  # warm
    t0 = time.time()
    results = align_reads_seeded_batch(g0, aligner, mine, sm)
    dt = time.time() - t0
    ok = sum(1 for r in results.values() if not r.alignment_failed)
    print(json.dumps({
        "mode": "component-sharded",
        "hosts": n_hosts,
        "total_bigraph_nodes": len(node_bp),
        "host0_bigraph_nodes": len(keep0),
        "gen_s": round(t_gen, 1),
        "plan_s": round(t_plan, 1),
        "host0_subgraph_s": round(t_sub, 1),
        "host0_tables_s": round(t_tables, 1),
        "host0_reads": len(mine),
        "host0_aligned_ok": ok,
        "host0_align_s": round(dt, 2),
        "host0_reads_per_s": round(len(mine) / dt, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--sharded":
        main_sharded(int(sys.argv[2]))
    else:
        main()
