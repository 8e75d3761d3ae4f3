"""Randomized differential test: batched device pipeline vs the host
oracle on random graphs/reads with deliberate edge cases (seeds at read
ends, reverse seeds, IUPAC Ns, read lengths on the 64 boundary)."""

import random

import pytest

from graphaligner_tpu.core.align import align_one_way_seeded
from graphaligner_tpu.core.batch_align import (
    BandedBatchAligner,
    align_reads_seeded_batch,
)
from graphaligner_tpu.graph.bigraph import graph_from_vg
from graphaligner_tpu.io import vg
from graphaligner_tpu.io.fastq import FastQ


def _random_graph(rng, n_nodes=40):
    nodes = [
        vg.Node(
            id=i,
            sequence="".join(
                rng.choice("ACGT") for _ in range(rng.randint(4, 18))
            ),
        )
        for i in range(1, n_nodes + 1)
    ]
    edges = []
    for i in range(1, n_nodes):
        edges.append(vg.Edge(from_=i, to=i + 1))
        if rng.random() < 0.3 and i + 2 <= n_nodes:
            edges.append(vg.Edge(from_=i, to=i + 2))  # bubbles
    return graph_from_vg([vg.Graph(node=nodes, edge=edges)]), nodes


def _walk_sequence(rng, nodes, start, length):
    seq = []
    i = start
    while len("".join(seq)) < length and i <= len(nodes):
        seq.append(nodes[i - 1].sequence)
        i += 1 if rng.random() < 0.7 else 2
    return "".join(seq)[:length]


def _mutate(rng, seq, rate):
    out = []
    for c in seq:
        r = rng.random()
        if r < rate / 3:
            continue
        if r < 2 * rate / 3:
            out.append(rng.choice("ACGTN"))
            continue
        out.append(c)
        if rng.random() < rate / 3:
            out.append(rng.choice("ACGT"))
    return "".join(out)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fuzz_batched_matches_oracle(seed):
    rng = random.Random(seed)
    graph, nodes = _random_graph(rng)
    reads, seed_map = [], {}
    for i in range(6):
        start = rng.randint(1, 10)
        truth = _walk_sequence(rng, nodes, start, rng.choice([64, 128, 97, 200]))
        read = _mutate(rng, truth, 0.06)
        if not read:
            continue
        fq = FastQ(seq_id=f"f{seed}_{i}", sequence=read, quality="!" * len(read))
        reads.append(fq)
        pos = rng.choice([0, len(read) - 1, rng.randint(0, len(read) - 1)])
        seed_map[fq.seq_id] = [(start, pos, rng.random() < 0.2)]

    aligner = BandedBatchAligner(graph, 12, 0)
    batch = align_reads_seeded_batch(graph, aligner, reads, seed_map)
    for fq in reads:
        oracle = align_one_way_seeded(
            graph, fq.seq_id, fq.sequence, 12, 0, seed_map[fq.seq_id]
        )
        dev = batch[fq.seq_id]
        assert dev.alignment_failed == oracle.alignment_failed, fq.seq_id
        if oracle.alignment_failed:
            continue
        mine = vg.Alignment.decode(dev.alignment.encode())
        ref = vg.Alignment.decode(oracle.alignment.encode())
        assert repr(mine) == repr(ref), fq.seq_id


def test_fuzz_ramping_multiseed_matches_oracle():
    """Ramping rewinds + multi-seed waves on a random graph (the
    heaviest control-flow combination; a 20-graph sweep of this config
    ran clean during development)."""
    rng = random.Random(7)
    graph, nodes = _random_graph(rng)
    reads, seed_map = [], {}
    for i in range(4):
        start = rng.randint(1, 10)
        truth = _walk_sequence(rng, nodes, start, rng.choice([97, 200]))
        read = _mutate(rng, truth, 0.08)
        fq = FastQ(seq_id=f"rm{i}", sequence=read, quality="!" * len(read))
        reads.append(fq)
        p1 = rng.randint(0, len(read) - 1)
        seed_map[fq.seq_id] = [
            (rng.randint(1, len(nodes)), rng.randint(0, len(read) - 1), False),
            (start, p1, False),
        ]
    aligner = BandedBatchAligner(graph, 12, 20)
    batch = align_reads_seeded_batch(graph, aligner, reads, seed_map)
    for fq in reads:
        oracle = align_one_way_seeded(
            graph, fq.seq_id, fq.sequence, 12, 20, seed_map[fq.seq_id]
        )
        dev = batch[fq.seq_id]
        assert dev.alignment_failed == oracle.alignment_failed, fq.seq_id
        if oracle.alignment_failed:
            continue
        assert vg.Alignment.decode(dev.alignment.encode()) == vg.Alignment.decode(
            oracle.alignment.encode()
        ), fq.seq_id
