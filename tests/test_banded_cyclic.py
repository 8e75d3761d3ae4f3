"""Differential test: the banded device engine's cyclic-band fixpoint.

cyclic.gfa contains a repeat cycle (nodes 8..12) and a whole-graph back
edge; reads walking the cycle twice force band components whose cells
depend on later topo slots, exercising the bounded in-scan fixpoint
(engine_banded back-edge re-pass) against the oracle's literal worklist
(reference UniqueQueue/confirmedRows loop, GraphAligner.h:2360-2427)."""

import random

import pytest

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


def _gfa_seqs():
    seqs = {}
    for line in open(SIM / "cyclic.gfa"):
        if line.startswith("S\t"):
            _, nid, seq = line.split()
            seqs[int(nid)] = seq
    return seqs


def _mutate(rng, seq, rate=0.05):
    bases = "ACGT"
    out = []
    for c in seq:
        r = rng.random()
        if r < rate / 3:
            continue  # deletion
        if r < 2 * rate / 3:
            out.append(rng.choice(bases))  # substitution
            continue
        out.append(c)
        if rng.random() < rate / 3:
            out.append(rng.choice(bases))  # insertion
    return "".join(out)


def test_banded_cyclic_matches_oracle():
    graph = graph_from_gfa_file(str(SIM / "cyclic.gfa"))
    seqs = _gfa_seqs()
    rng = random.Random(7)
    # walks around the repeat: enter at 6, loop 8..12 twice, exit to 14
    path = [6, 7, 8, 9, 10, 11, 12, 8, 9, 10, 11, 12, 13, 14]
    reads, seeds = [], {}
    for i in range(6):
        truth = "".join(seqs[n] for n in path)
        read = _mutate(rng, truth)
        fq = FastQ(seq_id=f"cyc{i}", sequence=read, quality="!" * len(read))
        reads.append(fq)
        seeds[fq.seq_id] = [(path[0], 0, False)]

    aligner = BandedBatchAligner(graph, 35, 0)
    # the device walk must handle every lane itself — a silent host
    # fallback would make this test vacuous
    import graphaligner_tpu.core.align as align_mod

    orig = align_mod.get_split_alignment

    def _no_fallback(*a, **kw):
        raise AssertionError("device lane fell back to the host oracle")

    align_mod.get_split_alignment = _no_fallback
    try:
        batch = align_reads_seeded_batch(graph, aligner, reads, seeds)
    finally:
        align_mod.get_split_alignment = orig
    for fq in reads:
        oracle = align_one_way_seeded(
            graph, fq.seq_id, fq.sequence, 35, 0, seeds[fq.seq_id]
        )
        dev = batch[fq.seq_id]
        assert dev.alignment_failed == oracle.alignment_failed
        if oracle.alignment_failed:
            continue
        assert dev.alignment.score == oracle.alignment.score
        mine = vg.Alignment.decode(dev.alignment.encode())
        ref = vg.Alignment.decode(oracle.alignment.encode())
        assert repr(mine) == repr(ref), fq.seq_id
