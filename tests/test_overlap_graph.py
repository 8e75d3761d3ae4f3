"""Differential test: DBG-overlap GFA graphs through the batched device
pipeline.

overlap.gfa has uniform 3M edge overlaps: node sequences are trimmed by
the overlap at load (reference BigraphToDigraph.cpp:58-68) and the
backward extension compensates with dbg_overlap extra bases
(GraphAligner.h:2991-2992, replicated in align_reads_seeded_batch's
problem construction and trim). Pins the batched path against the
oracle on reads spanning several overlapped nodes."""

import random

from graphaligner_tpu.core.align import align_one_way_seeded
from graphaligner_tpu.core.batch_align import (
    BandedBatchAligner,
    align_reads_seeded_batch,
)
from graphaligner_tpu.graph.bigraph import graph_from_gfa_file
from graphaligner_tpu.io import vg
from graphaligner_tpu.io.fastq import FastQ

from pathlib import Path

SIM = Path(__file__).parent / "fixtures" / "sim"


def test_overlap_graph_batched_matches_oracle():
    graph = graph_from_gfa_file(str(SIM / "overlap.gfa"))
    assert graph.dbg_overlap == 3
    seqs = {}
    links = []
    for line in open(SIM / "overlap.gfa"):
        parts = line.split()
        if parts and parts[0] == "S":
            seqs[int(parts[1])] = parts[2]
        elif parts and parts[0] == "L":
            links.append((int(parts[1]), int(parts[3])))
    # walk a chain of linked nodes; the truth sequence overlaps by 3
    chain = [links[0][0]]
    nxt = dict(links)
    while chain[-1] in nxt and len(chain) < 6:
        chain.append(nxt[chain[-1]])
    truth = seqs[chain[0]]
    for n in chain[1:]:
        truth += seqs[n][3:]
    rng = random.Random(11)
    reads, seed_map = [], {}
    for i in range(4):
        read = "".join(
            c for c in truth if rng.random() > 0.04
        )  # light deletions
        fq = FastQ(seq_id=f"ov{i}", sequence=read, quality="!" * len(read))
        reads.append(fq)
        # seed mid-read at the second chain node, as PickSeedHits would
        seed_map[fq.seq_id] = [
            (chain[0], 0, False),
            (chain[2], min(len(read) - 2, len(seqs[chain[0]]) + 5), False),
        ]

    aligner = BandedBatchAligner(graph, 35, 0)
    batch = align_reads_seeded_batch(graph, aligner, reads, seed_map)
    for fq in reads:
        oracle = align_one_way_seeded(
            graph, fq.seq_id, fq.sequence, 35, 0, seed_map[fq.seq_id]
        )
        dev = batch[fq.seq_id]
        assert dev.alignment_failed == oracle.alignment_failed, fq.seq_id
        if oracle.alignment_failed:
            continue
        mine = vg.Alignment.decode(dev.alignment.encode())
        ref = vg.Alignment.decode(oracle.alignment.encode())
        assert repr(mine) == repr(ref), fq.seq_id
