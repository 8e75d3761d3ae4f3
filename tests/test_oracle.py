"""Oracle DP tests: brute-force equivalence and golden parity."""

import random

import numpy as np
import pytest

from graphaligner_tpu.core.align import (
    align_one_way_full_band,
    align_one_way_seeded,
    get_table,
)
from graphaligner_tpu.core.backtrace import ref_character_match
from graphaligner_tpu.core.oracle import make_initial_slice_full_band
from graphaligner_tpu.core.params import WORD_SIZE
from graphaligner_tpu.graph import AlignmentGraph, graph_from_vg_file
from graphaligner_tpu.graph.bigraph import graph_from_vg
from graphaligner_tpu.io import load_fastq, stream, vg


def brute_force_semiglobal(graph: AlignmentGraph, sequence: str) -> int:
    """Independent unbanded graph edit distance: start free anywhere in the
    graph, consume the whole read, end anywhere. Row-by-row Bellman-Ford
    (handles cycles)."""
    n = graph.size_in_bp
    preds = [[] for _ in range(n)]
    for node in range(graph.node_count):
        start, end = int(graph.node_start[node]), int(graph.node_end[node])
        for w in range(start + 1, end):
            preds[w].append(w - 1)
        for nb in graph.in_neighbors(node):
            preds[start].append(int(graph.node_end[nb]) - 1)
    succs = [[] for _ in range(n)]
    for w in range(n):
        for u in preds[w]:
            succs[u].append(w)

    INF = 1 << 40
    prev = np.zeros(n, dtype=np.int64)
    for r, ch in enumerate(sequence):
        cur = prev + 1  # vertical
        for w in range(n):
            match = ref_character_match(ch, graph.node_sequence_char(w))
            if r == 0:
                # free start: virtual diagonal from the all-zero row -1
                # (covers predecessor-less cells, ≡ StartMatch semantics)
                cur[w] = min(cur[w], 0 if match else 1)
            for u in preds[w]:
                cand = prev[u] + (0 if match else 1)
                if cand < cur[w]:
                    cur[w] = cand
        # horizontal closure (Bellman-Ford to fixpoint)
        changed = True
        while changed:
            changed = False
            for u in range(n):
                for w in succs[u]:
                    if cur[u] + 1 < cur[w]:
                        cur[w] = cur[u] + 1
                        changed = True
        prev = cur
    return int(prev.min())


def random_graph(rng, cyclic=False):
    nodes = []
    edges = []
    n = rng.randint(3, 7)
    for i in range(1, n + 1):
        seq = "".join(rng.choice("ACGT") for _ in range(rng.randint(1, 6)))
        nodes.append(vg.Node(id=i, sequence=seq))
    for i in range(1, n):
        edges.append(vg.Edge(from_=i, to=i + 1))
    # random extra edges
    for _ in range(rng.randint(0, 3)):
        a, b = rng.randint(1, n), rng.randint(1, n)
        if a < b:
            edges.append(vg.Edge(from_=a, to=b))
        elif cyclic and a > b:
            edges.append(vg.Edge(from_=a, to=b))
    return graph_from_vg([vg.Graph(node=nodes, edge=edges)])


def random_walk_read(rng, graph, length):
    """A read sampled from the graph with random errors."""
    # pick a random non-dummy position and walk forward
    pos = rng.randint(1, graph.size_in_bp - 2)
    out = []
    for _ in range(length):
        node = graph.index_to_node(pos)
        if node == graph.dummy_node_end:
            break
        ch = graph.node_sequence_char(pos)
        if ch == "-":
            break
        out.append(ch)
        if pos + 1 < int(graph.node_end[node]):
            pos += 1
        else:
            nbs = list(graph.out_neighbors(node))
            nbs = [int(x) for x in nbs if int(x) != graph.dummy_node_end]
            if not nbs:
                break
            pos = int(graph.node_start[rng.choice(nbs)])
    seq = "".join(out)
    # sprinkle errors
    chars = list(seq)
    for i in range(len(chars)):
        r = rng.random()
        if r < 0.05:
            chars[i] = rng.choice("ACGT")
    return "".join(chars)


@pytest.mark.parametrize("cyclic", [False, True])
@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5])
def test_full_band_matches_brute_force(seed, cyclic):
    """The full-band banded DP with a huge bandwidth must equal the
    unbanded semiglobal graph edit distance."""
    rng = random.Random(seed * (2 if cyclic else 1))
    graph = random_graph(rng, cyclic=cyclic)
    read = random_walk_read(rng, graph, rng.randint(5, 40))
    if not read:
        pytest.skip("degenerate read")
    padded = read + "N" * ((WORD_SIZE - len(read) % WORD_SIZE) % WORD_SIZE)
    initial = make_initial_slice_full_band(graph)
    table = get_table(
        graph, padded, initial, len(padded) // WORD_SIZE, 10**6, 0
    )
    engine_score = table.slices[-1].min_score
    brute = brute_force_semiglobal(graph, padded)
    assert engine_score == brute


def test_smallexample_seeded_matches_golden(smallexample_dir, fixtures_dir):
    graph = graph_from_vg_file(str(smallexample_dir / "sub_test.vg"))
    read = load_fastq(str(smallexample_dir / "read.fastq"))[0]
    seeds = [
        (
            a.path.mapping[0].position.node_id,
            a.query_position,
            a.path.mapping[0].position.is_reverse,
        )
        for a in stream.read_messages(
            str(smallexample_dir / "seedalignment.gam"), vg.Alignment
        )
    ]
    res = align_one_way_seeded(graph, read.seq_id, read.sequence, 35, 0, seeds)
    assert not res.alignment_failed
    mine = vg.Alignment.decode(res.alignment.encode())
    for m in mine.path.mapping:
        m.position.node_id //= 2
    golden = stream.read_messages(
        str(fixtures_dir / "golden" / "seeded.gam"), vg.Alignment
    )[0]
    assert mine == golden


def test_smallexample_trace_matches_golden(smallexample_dir, fixtures_dir):
    """Per-step trace items must match the reference's .trace file."""
    graph = graph_from_vg_file(str(smallexample_dir / "sub_test.vg"))
    read = load_fastq(str(smallexample_dir / "read.fastq"))[0]
    seeds = [
        (
            a.path.mapping[0].position.node_id,
            a.query_position,
            a.path.mapping[0].position.is_reverse,
        )
        for a in stream.read_messages(
            str(smallexample_dir / "seedalignment.gam"), vg.Alignment
        )
    ]
    res = align_one_way_seeded(graph, read.seq_id, read.sequence, 35, 0, seeds)
    mine = [
        f"{t.node_id} {t.offset} {1 if t.reverse else 0} {t.readpos} "
        f"{int(t.type)} {t.graph_char} {t.read_char}"
        for t in res.trace
    ]
    golden = (
        [l for l in (fixtures_dir / "golden" / "trace_0_read1.trace").read_text().split("\n") if l]
    )
    assert mine == golden


def test_full_band_on_smallexample(smallexample_dir):
    """The reference's -i mode crashes on every input (initial minScore
    is left at INT_MIN, emptying the band: GraphAligner.h:108-117 vs
    3100-3119). Ours works; validate the trace re-scores correctly."""
    graph = graph_from_vg_file(str(smallexample_dir / "sub_test.vg"))
    read = load_fastq(str(smallexample_dir / "read.fastq"))[0]
    res = align_one_way_full_band(graph, read.seq_id, read.sequence, 35, 0)
    assert not res.alignment_failed
    assert 0 <= res.alignment.score <= len(read.sequence) * 0.25
