import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def setup():
    from graphaligner_tpu.core.batch_align import BandedBatchAligner
    from graphaligner_tpu.core.align import _pad_to_word
    from graphaligner_tpu.graph import load_alignment_graph
    from graphaligner_tpu.io import load_fastq
    from graphaligner_tpu.runtime.aligner import load_seed_hits

    LS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "tests/fixtures/longsim")
    graph = load_alignment_graph(f"{LS}/graph.vg")
    reads = load_fastq(f"{LS}/reads.fastq")
    seeds = load_seed_hits(f"{LS}/seeds.gam", [r.seq_id for r in reads])
    aligner = BandedBatchAligner(graph, 35, 0)
    base_problems = []
    for r in reads:
        node_id, pos, reverse = seeds[r.seq_id][0]
        fw_node = graph.node_lookup[node_id * 2 + (1 if reverse else 0)]
        if pos < len(r.sequence) - 1:
            base_problems.append((_pad_to_word(r.sequence[pos:]), fw_node))
    return aligner, base_problems
