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
    """The walk kernel's VMEM sizing: Bb halves down to the Mosaic
    lane-dim floor of 128, and the per-tier window cap keeps the Bb=128
    projection inside the 15 MiB budget for the giant tiers the 1Mbp
    fixture reaches (Cm=1152 overflowed the real chip's 16 MiB scoped
    VMEM at a 236-slice window before the cap)."""
    from graphaligner_tpu.ops.pallas.walk_moves import (
        _VMEM_BUDGET_WORDS,
        _per_lane_words,
        max_window_slices,
        pick_block_width,
    )

    # Bb floors at 128 (Mosaic: last block dim must be a multiple of
    # 128 or equal B) — the giant tier cannot shrink below it
    assert pick_block_width((236, 7, 1152, 128), 32, 256) == 128
    # a 256-lane giant-tier batch halves 256 -> 128 to shed half the
    # block bytes
    assert pick_block_width((100, 7, 1152, 256), 32, 256) == 128
    # benched signatures keep their swept widths: longsim whole-table
    # walk (Cm=288, ~158 slices, B=256) and sim (B=384: 384%256 -> 128)
    assert pick_block_width((158, 7, 288, 256), 32, 256) == 256
    assert pick_block_width((11, 7, 288, 384), 32, 256) == 128
    # the window cap makes the Bb=128 projection feasible where the
    # fixed 320-slice LONG_WINDOW was not: Cm=1152 caps at 160 slices
    # (was 176 before the pred_prev boundary table joined the Nm-block
    # set) and fits; benched tiers keep LONG_WINDOW (cap >= 320)
    assert max_window_slices(1152, 32) == 160
    assert _per_lane_words(1152, 32, 160) * 128 <= _VMEM_BUDGET_WORDS
    assert _per_lane_words(1152, 32, 320) * 128 > _VMEM_BUDGET_WORDS
    assert max_window_slices(288, 32) >= 320
    assert max_window_slices(576, 32) >= 320
