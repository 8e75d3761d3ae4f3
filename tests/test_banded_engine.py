"""Differential tests for the banded device engine + batched orchestration.

Layered like the reference's own verification (SURVEY.md §4): the device
engine's slices must equal the scalar oracle cell-for-cell, and the full
batched seeded pipeline must be bit-identical to the reference binary's
golden GAMs (both bandwidth configs, including ramping rewinds)."""

import pathlib

import numpy as np
import pytest

from graphaligner_tpu.core.align import _pad_to_word
from graphaligner_tpu.core.band import project_forward_from_min_score
from graphaligner_tpu.core.batch_align import (
    BandedBatchAligner,
    align_reads_seeded_batch,
)
from graphaligner_tpu.core.engine import _READ_CODE, encode_read
from graphaligner_tpu.core.engine_banded import (
    EMPTY,
    banded_scan,
    build_graph_tables,
    make_seed_carry,
)
from graphaligner_tpu.core.oracle import compute_slice, make_initial_slice_one_node
from graphaligner_tpu.core.params import WORD_SIZE
from graphaligner_tpu.core.result import INT32_MAX
from graphaligner_tpu.graph import load_alignment_graph
from graphaligner_tpu.io import load_fastq, stream, vg
from graphaligner_tpu.ops.packing import unpack_deltas_np

SIM = pathlib.Path(__file__).parent / "fixtures" / "sim"


@pytest.fixture(scope="module")
def sim():
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
    return graph, reads, seeds


def _oracle_slices(graph, seq, node, bandwidth, num_slices):
    last = make_initial_slice_one_node(graph, node)
    out = []
    for i in range(num_slices):
        band = project_forward_from_min_score(graph, last, bandwidth)
        s = compute_slice(graph, seq, i * WORD_SIZE, band, last, i, bandwidth)
        out.append(s)
        last = s
    return out


def test_device_slices_match_oracle(sim):
    """Device slices == oracle cell-for-cell on seeded fw problems."""
    graph, reads, seeds = sim
    tables = build_graph_tables(graph)
    Nm, Cm, bandwidth = 32, 384, 35
    problems = []
    for r in reads[:4]:
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
    )
    out = {k: np.asarray(v) for k, v in out.items()}
    assert not out["overflow"].any()
    for i, (seq, node) in enumerate(problems):
        oracle = _oracle_slices(graph, seq, node, bandwidth, int(steps[i]))
        for s, osl in enumerate(oracle):
            ids = np.array(
                sorted(int(x) for x in out["band_ids"][s, :, i] if x != EMPTY)
            )
            assert sorted(osl.rows.keys()) == list(ids)
            assert int(out["min_score"][s, i]) == osl.min_score
            assert int(out["num_cells"][s, i]) == osl.num_cells
            order = ids[np.argsort(tables.topo_rank[ids])]
            cols = out["cols"][s, :, :, i].T
            c = 0
            for n in order:
                L = int(graph.node_len[n])
                seg = cols[c : c + L]
                rows = unpack_deltas_np(
                    seg[:, 0].astype(np.uint32),
                    seg[:, 1].astype(np.uint32),
                    seg[:, 2].astype(np.uint32),
                    seg[:, 3].astype(np.uint32),
                    seg[:, 4],
                ).T
                n = int(n)
                assert np.array_equal(seg[:, 4], osl.sbs[n])
                assert np.array_equal(rows, osl.rows[n])
                assert np.array_equal((seg[:, 6] & 1).astype(bool), osl.sbs_exists[n])
                c += L


@pytest.mark.parametrize("config", ["golden_b35", "golden_b5_B20"])
def test_batched_bit_identical_to_reference(config, sim):
    """Full batched device pipeline == reference binary goldens."""
    graph, reads, seeds = sim
    bandwidth, ramp = {"golden_b35": (35, 0), "golden_b5_B20": (5, 20)}[config]
    golden = {
        a.name: a
        for a in stream.read_messages(str(SIM / config / "out.gam"), vg.Alignment)
    }
    aligner = BandedBatchAligner(graph, bandwidth, ramp, Cm=384)
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
        assert mine == golden[read.seq_id], f"{read.seq_id}: alignment differs"
