"""CPU interpreter-mode coverage of the PRODUCTION Pallas scan path.

The banded cell kernel + its layout_parallel metadata pass normally run
only on the real TPU (verified there against reference goldens, see
verify_tpu.py); GA_FORCE_PALLAS=1 runs them through the Pallas
interpreter so CI differentially pins them against the XLA cell path —
any layout/kernel edit that breaks bit-identity fails here first."""

from pathlib import Path

from graphaligner_tpu.core.batch_align import (
    BandedBatchAligner,
    align_reads_seeded_batch,
)
from graphaligner_tpu.graph import load_alignment_graph
from graphaligner_tpu.io import load_fastq
from graphaligner_tpu.runtime.aligner import load_seed_hits

SIM = Path(__file__).parent / "fixtures" / "sim"


def _run(graph, reads, seeds):
    aligner = BandedBatchAligner(graph, 35, 0)
    res = align_reads_seeded_batch(graph, aligner, reads, seeds)
    out = {}
    for rid, r in res.items():
        if r.alignment_failed:
            out[rid] = None
        else:
            out[rid] = r.alignment.encode()
    return out


def test_pallas_kernel_matches_xla_path(monkeypatch):
    graph = load_alignment_graph(str(SIM / "bubbles.vg"))
    reads = load_fastq(str(SIM / "sim.fastq"))[:4]
    seeds = load_seed_hits(str(SIM / "seeds.gam"), [r.seq_id for r in reads])

    base = _run(graph, reads, seeds)
    assert sum(1 for v in base.values() if v is not None) >= 3

    monkeypatch.setenv("GA_FORCE_PALLAS", "1")
    pallas = _run(graph, reads, seeds)
    assert pallas == base


def test_pallas_kernel_under_shard_map(monkeypatch):
    """The Pallas cell kernel inside the dp shard_map (VERDICT r2 item 5:
    every mesh test previously took the XLA path, so the kernel had never
    executed under shard_map in ANY mode). Interpreter mode on the 8-dev
    CPU mesh; multi-device Mosaic remains hardware-blocked."""
    from graphaligner_tpu.parallel import make_mesh

    graph = load_alignment_graph(str(SIM / "bubbles.vg"))
    reads = load_fastq(str(SIM / "sim.fastq"))[:8]
    seeds = load_seed_hits(str(SIM / "seeds.gam"), [r.seq_id for r in reads])

    base = _run(graph, reads, seeds)
    assert sum(1 for v in base.values() if v is not None) >= 6

    monkeypatch.setenv("GA_FORCE_PALLAS", "1")
    mesh = make_mesh()
    aligner = BandedBatchAligner(graph, 35, 0, mesh=mesh)
    res = align_reads_seeded_batch(graph, aligner, reads, seeds)
    sharded = {
        rid: (None if r.alignment_failed else r.alignment.encode())
        for rid, r in res.items()
    }
    assert sharded == base


def test_full_production_path_on_cpu(monkeypatch):
    """Pallas cell kernel + move-walk kernel + native decode — the exact
    real-TPU pipeline — through the interpreter, vs the XLA/CPU path."""
    graph = load_alignment_graph(str(SIM / "bubbles.vg"))
    reads = load_fastq(str(SIM / "sim.fastq"))[:4]
    seeds = load_seed_hits(str(SIM / "seeds.gam"), [r.seq_id for r in reads])

    base = _run(graph, reads, seeds)
    monkeypatch.setenv("GA_FORCE_PALLAS", "1")
    monkeypatch.setenv("GA_FORCE_MOVES", "1")
    prod = _run(graph, reads, seeds)
    assert prod == base


def test_walk_block_width_respects_vmem_budget():
    """The walk kernel's lane-block picker must (a) clamp the 1Mbp giant
    tier that overflowed Mosaic's 16 MiB scoped VMEM (Cm=1152, 236-slice
    window, B=128 -> 16.16 MiB at Bb=128), (b) leave every benched
    production signature at its swept block width, (c) keep Bb a divisor
    of B."""
    from graphaligner_tpu.ops.pallas.walk_moves import pick_block_width

    # (a) the observed 1Mbp failure signature halves to 64
    assert pick_block_width((236, 7, 1152, 128), 32, 256) == 64
    # (b) benched signatures keep their widths: longsim whole-table walk
    # (Cm=288, ~158 slices, B=256) and sim (Cm=288, ~11 slices, B=384)
    assert pick_block_width((158, 7, 288, 256), 32, 256) == 256
    assert pick_block_width((11, 7, 288, 384), 32, 256) == 128  # 384%256 -> 128
    # (c) divisibility and the projection both hold for the chosen width
    for shape, nm in [((236, 7, 1152, 128), 32), ((500, 7, 576, 256), 32)]:
        bb = pick_block_width(shape, nm, 256)
        K1, _, cm, b = shape
        assert b % bb == 0
        t_w = ((K1 - 1) * 112 + 512 + 7) // 8
        assert 4 * (24 * cm + 10 * nm + t_w + 220) * bb <= 15 * 2**20
