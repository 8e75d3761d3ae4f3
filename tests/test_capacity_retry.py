"""The capacity ladder: lanes that overflow a small band capacity retry
on the 2x tier; lanes that overflow every tier fall back to the host
oracle — and every path returns the same alignments."""

from graphaligner_tpu.core.batch_align import (
    BandedBatchAligner,
    align_reads_seeded_batch,
)
from graphaligner_tpu.graph import load_alignment_graph
from graphaligner_tpu.io import load_fastq, vg
from graphaligner_tpu.runtime.aligner import load_seed_hits

from pathlib import Path

SIM = Path(__file__).parent / "fixtures" / "sim"


def _golden(graph, reads, seeds):
    ref = BandedBatchAligner(graph, 35, 0)
    return align_reads_seeded_batch(graph, ref, reads, seeds)


def _check(results, golden, reads):
    for r in reads:
        a, b = results[r.seq_id], golden[r.seq_id]
        assert a.alignment_failed == b.alignment_failed, r.seq_id
        if a.alignment_failed:
            continue
        assert (
            vg.Alignment.decode(a.alignment.encode())
            == vg.Alignment.decode(b.alignment.encode())
        ), r.seq_id


def test_overflow_retries_on_bigger_tier():
    graph = load_alignment_graph(str(SIM / "bubbles.vg"))
    reads = load_fastq(str(SIM / "sim.fastq"))[:6]
    seeds = load_seed_hits(str(SIM / "seeds.gam"), [r.seq_id for r in reads])
    golden = _golden(graph, reads, seeds)
    # deliberately undersized first tier: bands at b=35 need far more
    # than 4 slots / 24 cells, so every lane overflows and retries
    tiny = BandedBatchAligner(graph, 35, 0, Nm=4, Cm=24)
    assert tiny._next_tier() is not None
    results = align_reads_seeded_batch(graph, tiny, reads, seeds)
    _check(results, golden, reads)


def test_overflow_exhausts_tiers_to_oracle():
    graph = load_alignment_graph(str(SIM / "bubbles.vg"))
    reads = load_fastq(str(SIM / "sim.fastq"))[:3]
    seeds = load_seed_hits(str(SIM / "seeds.gam"), [r.seq_id for r in reads])
    golden = _golden(graph, reads, seeds)
    tiny = BandedBatchAligner(graph, 35, 0, Nm=4, Cm=24)
    tiny._bigger = BandedBatchAligner(
        graph, 35, 0, Nm=4, Cm=24, _tables=tiny.tables, _rev_pos=tiny.rev_pos
    )
    tiny._bigger._bigger = False  # sentinel: block further tiers
    tiny._bigger._next_tier = lambda: None
    results = align_reads_seeded_batch(graph, tiny, reads, seeds)
    _check(results, golden, reads)
