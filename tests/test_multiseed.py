"""Differential test: multi-seed reads through the batched wave loop.

The reference tries seeds sequentially per read, skipping seeds whose
(node, readpos) fall inside an already-aligned region, and keeps the
best extension by EstimatedCorrectlyAligned (GraphAligner.h:420-449).
The batched pipeline preserves that sequential rule across device waves;
this pins it against the host oracle path with deliberately mixed
good/bad/duplicate seeds."""

import random

from graphaligner_tpu.core.align import align_one_way_seeded
from graphaligner_tpu.core.batch_align import (
    BandedBatchAligner,
    align_reads_seeded_batch,
)
from graphaligner_tpu.graph import load_alignment_graph
from graphaligner_tpu.io import load_fastq, vg
from graphaligner_tpu.runtime.aligner import load_seed_hits

from pathlib import Path

SIM = Path(__file__).parent / "fixtures" / "sim"


def test_multiseed_matches_oracle():
    graph = load_alignment_graph(str(SIM / "bubbles.vg"))
    reads = load_fastq(str(SIM / "sim.fastq"))[:8]
    base = load_seed_hits(str(SIM / "seeds.gam"), [r.seq_id for r in reads])
    rng = random.Random(3)
    seeds = {}
    for r in reads:
        nid, pos, rev = base[r.seq_id][0]
        lst = [
            # a wrong seed first (random node, far position): the true
            # seed must still win via EstimatedCorrectlyAligned
            (rng.randrange(2, 90), min(len(r.sequence) - 2, pos + 37), False),
            (nid, pos, rev),
            # duplicate of the true seed: must be skipped as covered
            (nid, pos, rev),
        ]
        seeds[r.seq_id] = lst

    aligner = BandedBatchAligner(graph, 35, 0)
    batch = align_reads_seeded_batch(graph, aligner, reads, seeds)
    for r in reads:
        oracle = align_one_way_seeded(
            graph, r.seq_id, r.sequence, 35, 0, seeds[r.seq_id]
        )
        dev = batch[r.seq_id]
        assert dev.alignment_failed == oracle.alignment_failed, r.seq_id
        if oracle.alignment_failed:
            continue
        mine = vg.Alignment.decode(dev.alignment.encode())
        ref = vg.Alignment.decode(oracle.alignment.encode())
        assert repr(mine) == repr(ref), r.seq_id
