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


if __name__ == "__main__":
    main()
