"""Differential tests for the precomputed-reach projection (GA_PROJ=reach).

The reach table turns the per-slice band relaxation loop into one gather
+ one sort (core/reach.py). Equivalence contract: identical scan outputs
to the iterative projection, and bit-identical end-to-end GAMs.
"""

import heapq
import os
import pathlib

import numpy as np
import pytest

from graphaligner_tpu.core.align import _pad_to_word
from graphaligner_tpu.core.engine import _READ_CODE, encode_read
from graphaligner_tpu.core.engine_banded import (
    banded_scan,
    build_graph_tables,
    make_seed_carry,
)
from graphaligner_tpu.core.params import WORD_SIZE
from graphaligner_tpu.core.reach import build_reach_table, ensure_reach
from graphaligner_tpu.graph import load_alignment_graph
from graphaligner_tpu.graph.bigraph import graph_from_gfa_file
from graphaligner_tpu.io import load_fastq, stream, vg

SIM = pathlib.Path(__file__).parent / "fixtures" / "sim"


def _dijkstra_reach(tables, n, d_max):
    """Brute-force min intermediate-length-sum distances from node n."""
    dist = {}
    pq = [(0, int(m)) for m in tables.out_nbrs[n] if m >= 0]
    heapq.heapify(pq)
    while pq:
        d, m = heapq.heappop(pq)
        if m in dist or d > d_max:
            continue
        dist[m] = d
        nd = d + int(tables.node_len[m])
        if nd <= d_max:
            for w in tables.out_nbrs[m]:
                if w >= 0:
                    heapq.heappush(pq, (nd, int(w)))
    return dist


@pytest.mark.parametrize("src", ["bubbles.vg", "cyclic.gfa"])
def test_reach_build_matches_dijkstra(src):
    if src.endswith(".gfa"):
        graph = graph_from_gfa_file(str(SIM / src))
    else:
        graph = load_alignment_graph(str(SIM / src))
    tables = build_graph_tables(graph)
    d_max = 133
    tbl = build_reach_table(
        tables.node_len, tables.out_nbrs, tables.topo_rank, d_max
    )
    assert tbl is not None
    rng = np.random.default_rng(7)
    for n in rng.choice(tables.num_nodes, 25, replace=False):
        got = {
            int(i): int(w1 & 1023)
            for i, w1 in zip(tbl[0, n], tbl[1, n])
            if i >= 0 and (w1 & 1023) != 1023
        }
        assert got == _dijkstra_reach(tables, int(n), d_max), int(n)
        # self entry first, rank packed correctly (with the -2^31 bias)
        assert tbl[0, n, 0] == n
        assert int(tbl[1, n, 0]) == (
            int(tables.topo_rank[n]) * 1024 + 1023 - 2**31
        )


def test_reach_build_fuzz_random_graphs():
    """Random graphs (cycles, 0-length-ish short nodes, fan-out) vs the
    brute-force Dijkstra metric."""
    rng = np.random.default_rng(123)
    for trial in range(8):
        n = int(rng.integers(10, 120))
        node_len = rng.integers(1, 40, n).astype(np.int32)
        k_out = int(rng.integers(1, 4))
        out_nbrs = np.full((n, k_out), -1, np.int32)
        for i in range(n):
            deg = int(rng.integers(0, k_out + 1))
            if deg:
                out_nbrs[i, :deg] = rng.choice(n, deg, replace=False)
        topo_rank = rng.permutation(n).astype(np.int32)
        d_max = int(rng.integers(10, 200))
        tbl = build_reach_table(node_len, out_nbrs, topo_rank, d_max)
        if tbl is None:  # unfit (reach set > cap): legal outcome
            continue

        class T:
            pass

        t = T()
        t.node_len, t.out_nbrs = node_len, out_nbrs
        for src in rng.choice(n, min(n, 12), replace=False):
            got = {
                int(i): int(w1 & 1023)
                for i, w1 in zip(tbl[0, src], tbl[1, src])
                if i >= 0 and (w1 & 1023) != 1023
            }
            assert got == _dijkstra_reach(t, int(src), d_max), (trial, src)
            assert tbl[0, src, 0] == src  # self entry
            assert int(tbl[1, src, 0]) == (
                int(topo_rank[src]) * 1024 + 1023 - 2**31
            )


def _scan_outputs(graph, reads, seeds, proj, reach, mesh=None, nprob=6,
                  tables=None):
    if tables is None:
        tables = build_graph_tables(graph)
    Nm, Cm, bandwidth = 32, 384, 35
    problems = []
    for r in reads[:nprob]:
        node_id, pos, reverse = seeds[r.seq_id][0]
        fw = graph.node_lookup[node_id * 2 + (1 if reverse else 0)]
        problems.append((_pad_to_word(r.sequence[pos:]), fw))
    B = len(problems)
    S_max = max(len(p[0]) // WORD_SIZE for p in problems)
    codes = np.full((B, S_max * WORD_SIZE), _READ_CODE["N"], dtype=np.uint8)
    seq_len = np.zeros(B, np.int32)
    steps = np.zeros(B, np.int32)
    starts = np.zeros(B, np.int32)
    for i, (seq, node) in enumerate(problems):
        codes[i, : len(seq)] = encode_read(seq)
        seq_len[i] = len(seq)
        steps[i] = len(seq) // WORD_SIZE
        starts[i] = node
    carry = make_seed_carry(tables, starts, Nm, Cm)
    out = banded_scan(
        *tables.device_args(),
        codes,
        seq_len,
        steps,
        np.zeros(B, np.int32),
        np.full((S_max, B), bandwidth, np.int32),
        *carry,
        S_max=S_max,
        Nm=Nm,
        Cm=Cm,
        _proj=proj,
        reach=reach,
        mesh=mesh,
    )
    return {k: np.asarray(v) for k, v in out.items()}


def test_reach_scan_matches_iterative():
    graph = load_alignment_graph(str(SIM / "bubbles.vg"))
    reads = load_fastq(str(SIM / "sim.fastq"))
    seeds = {}
    for a in stream.read_messages(str(SIM / "seeds.gam"), vg.Alignment):
        seeds.setdefault(a.name, []).append(
            (
                a.path.mapping[0].position.node_id,
                a.query_position,
                a.path.mapping[0].position.is_reverse,
            )
        )
    tables = build_graph_tables(graph)
    reach = ensure_reach(tables, 35 + WORD_SIZE - 1)
    assert reach is not None
    base = _scan_outputs(graph, reads, seeds, "pairwise", None)
    got = _scan_outputs(graph, reads, seeds, "reach", reach)
    for k in base:
        assert np.array_equal(np.asarray(base[k]), np.asarray(got[k])), k


def test_reach_ranks_past_signed_packing_ceiling():
    """Topo ranks above 2^21 (the OLD signed rank*1024 ceiling, ~2.1M
    nodes) must still build and project correctly: the -2^31 bias makes
    the packed keys straddle the int32 sign boundary while preserving
    order (VERDICT r2 item 4 — pangenome graphs at 2.6M digraph nodes
    need the reach projection most)."""
    graph = load_alignment_graph(str(SIM / "bubbles.vg"))
    reads = load_fastq(str(SIM / "sim.fastq"))
    seeds = {}
    for a in stream.read_messages(str(SIM / "seeds.gam"), vg.Alignment):
        seeds.setdefault(a.name, []).append(
            (
                a.path.mapping[0].position.node_id,
                a.query_position,
                a.path.mapping[0].position.is_reverse,
            )
        )
    tables = build_graph_tables(graph)
    base = _scan_outputs(graph, reads, seeds, "pairwise", None, tables=tables)
    # shift every rank so packed keys cross 2^31 mid-graph: order (the
    # only thing the projection uses) is unchanged, so outputs must be
    # identical to the unshifted pairwise run
    shift = (1 << 21) - tables.num_nodes // 2
    hi_rank = (tables.topo_rank.astype(np.int64) + shift).astype(np.int32)
    tbl = build_reach_table(
        tables.node_len, tables.out_nbrs, hi_rank, 35 + WORD_SIZE - 1
    )
    assert tbl is not None
    lo = np.int64(tbl[1][tbl[0] >= 0]).min()
    hi = np.int64(tbl[1][tbl[0] >= 0]).max()
    assert lo < 0 < hi, (lo, hi)  # keys really straddle the sign boundary
    got = _scan_outputs(graph, reads, seeds, "reach", tbl, tables=tables)
    for k in base:
        assert np.array_equal(np.asarray(base[k]), np.asarray(got[k])), k


def test_reach_scan_sharded_matches_single_device():
    """Reach projection under shard_map (replicated reach table) == the
    single-device reach run, on the 8-virtual-device CPU mesh."""
    import jax
    from jax.sharding import Mesh

    graph = load_alignment_graph(str(SIM / "bubbles.vg"))
    reads = load_fastq(str(SIM / "sim.fastq"))
    seeds = {}
    for a in stream.read_messages(str(SIM / "seeds.gam"), vg.Alignment):
        seeds.setdefault(a.name, []).append(
            (
                a.path.mapping[0].position.node_id,
                a.query_position,
                a.path.mapping[0].position.is_reverse,
            )
        )
    tables = build_graph_tables(graph)
    reach = ensure_reach(tables, 35 + WORD_SIZE - 1)
    mesh = Mesh(np.array(jax.devices("cpu")[:8]), ("dp",))
    base = _scan_outputs(graph, reads, seeds, "reach", reach, nprob=8)
    got = _scan_outputs(graph, reads, seeds, "reach", reach, mesh=mesh, nprob=8)
    for k in base:
        assert np.array_equal(np.asarray(base[k]), np.asarray(got[k])), k


def test_reach_scan_matches_iterative_longsim():
    """Same differential on the 8.4k-node longsim graph (K=24 reach
    width, real variation-graph band shapes); reads truncated to 2kb to
    bound CPU compile time."""
    LS = SIM.parent / "longsim"
    graph = load_alignment_graph(str(LS / "graph.vg"))
    reads = load_fastq(str(LS / "reads.fastq"))[:3]
    reads = [r.__class__(**{**r.__dict__, "sequence": r.sequence[:2048]}) for r in reads]
    seeds = {}
    for a in stream.read_messages(str(LS / "seeds.gam"), vg.Alignment):
        seeds.setdefault(a.name, []).append(
            (
                a.path.mapping[0].position.node_id,
                a.query_position,
                a.path.mapping[0].position.is_reverse,
            )
        )
    tables = build_graph_tables(graph)
    reach = ensure_reach(tables, 35 + WORD_SIZE - 1)
    assert reach is not None
    base = _scan_outputs(graph, reads, seeds, "pairwise", None)
    got = _scan_outputs(graph, reads, seeds, "reach", reach)
    # the modes may diverge from the first overflowed slice of a lane on:
    # the iterative path truncates mid-relaxation at its trip cap while
    # reach computes the exact band, and everything at/after an overflow
    # is discarded by the capacity-retry ladder either way (the e2e GAM
    # byte test below is the real invariant). Compare the accepted
    # prefix of every lane exactly.
    ov = np.asarray(base["overflow"]) | np.asarray(got["overflow"])  # [S, B]
    S, B = ov.shape
    first_ov = np.where(ov.any(0), ov.argmax(0), S)
    assert (first_ov > 0).all()  # the differential isn't vacuous
    for k in base:
        a, b = np.asarray(base[k]), np.asarray(got[k])
        if a.shape[0] != S:  # ids_sub: final-slice only
            continue
        for lane in range(B):
            sl = slice(0, first_ov[lane])
            assert np.array_equal(
                a[sl, ..., lane], b[sl, ..., lane]
            ), (k, lane)


def test_reach_e2e_bit_identical(monkeypatch):
    """Full batched pipeline under GA_PROJ=reach == reference golden."""
    from graphaligner_tpu.core.batch_align import (
        BandedBatchAligner,
        align_reads_seeded_batch,
    )

    monkeypatch.setenv("GA_PROJ", "reach")
    graph = load_alignment_graph(str(SIM / "bubbles.vg"))
    reads = load_fastq(str(SIM / "sim.fastq"))
    seeds = {}
    for a in stream.read_messages(str(SIM / "seeds.gam"), vg.Alignment):
        seeds.setdefault(a.name, []).append(
            (
                a.path.mapping[0].position.node_id,
                a.query_position,
                a.path.mapping[0].position.is_reverse,
            )
        )
    golden = {
        a.name: a
        for a in stream.read_messages(
            str(SIM / "golden_b35" / "out.gam"), vg.Alignment
        )
    }
    from graphaligner_tpu.core.result import INT32_MAX

    aligner = BandedBatchAligner(graph, 35, 0, Cm=384)
    assert aligner._proj == "reach" and aligner._reach is not None
    results = align_reads_seeded_batch(graph, aligner, reads, seeds)
    for read in reads:
        res = results[read.seq_id]
        if res.alignment_failed or res.alignment.score == INT32_MAX:
            assert read.seq_id not in golden
            continue
        mine = vg.Alignment.decode(res.alignment.encode())
        for m in mine.path.mapping:
            m.position.node_id //= 2
        assert read.seq_id in golden
        assert mine == golden[read.seq_id], read.seq_id
