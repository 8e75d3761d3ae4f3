"""Mesh sharding, distributed helpers, and runtime batched-path tests
(8 virtual CPU devices via conftest)."""

import numpy as np
import pytest

from graphaligner_tpu.graph import load_alignment_graph
from graphaligner_tpu.io import load_fastq, stream, vg
from graphaligner_tpu.parallel import distributed, make_mesh, shard_reads_aligner
from graphaligner_tpu.utils import AlignMetrics, BufferedWriter

SIM = "tests/fixtures/sim"


def test_mesh_sharded_alignment_matches_single_device():
    import jax

    graph = load_alignment_graph(f"{SIM}/bubbles.vg")
    reads = load_fastq(f"{SIM}/sim.fastq")
    n = len(jax.devices())
    assert n == 8
    mesh = make_mesh(n)
    from graphaligner_tpu.core.engine import _READ_CODE, encode_read

    B, S = 8, 2
    codes = np.full((B, S * 64), _READ_CODE["N"], dtype=np.uint8)
    for i in range(B):
        s = reads[i].sequence[: S * 64 - 5]
        codes[i, : len(s)] = encode_read(s)
    ba, run = shard_reads_aligner(graph, mesh)
    with mesh:
        out_sharded = [np.asarray(x) for x in run(codes, num_slices=S)]
    # single-device reference
    tables = ba.compute_tables(
        [reads[i].sequence[: S * 64 - 5] for i in range(B)],
        num_slices=S,
        backend="column",
    )
    # compare last-row scores of the final slice per read
    for b in range(B):
        sharded_send = out_sharded[5][S - 1, :, b]
        view = tables[b][-1]
        assert (sharded_send == view._score_end).all()


def test_mesh_sharded_end_to_end_gam_bytes_equal():
    """VERDICT r1 item 3: the driver path (BandedBatchAligner with a dp
    mesh) must produce byte-identical GAM payloads to the single-device
    run — not just matching final-slice scores."""
    from graphaligner_tpu.core.batch_align import (
        BandedBatchAligner,
        align_reads_seeded_batch,
    )
    from graphaligner_tpu.runtime.aligner import load_seed_hits

    graph = load_alignment_graph(f"{SIM}/bubbles.vg")
    reads = load_fastq(f"{SIM}/sim.fastq")
    seeds = load_seed_hits(f"{SIM}/seeds.gam", [r.seq_id for r in reads])
    single = BandedBatchAligner(graph, 35, 0)
    res_single = align_reads_seeded_batch(graph, single, reads, seeds)
    mesh = make_mesh()
    sharded = BandedBatchAligner(graph, 35, 0, mesh=mesh)
    res_sharded = align_reads_seeded_batch(graph, sharded, reads, seeds)
    assert set(res_single) == set(res_sharded)
    for sid in res_single:
        a, b = res_single[sid], res_sharded[sid]
        assert a.alignment_failed == b.alignment_failed, sid
        if a.alignment_failed:
            continue
        assert a.alignment.encode() == b.alignment.encode(), sid


def test_distributed_shard_helpers(tmp_path):
    reads = list(range(10))
    shards = [distributed.shard_reads_for_host(reads, i, 3) for i in range(3)]
    assert sorted(x for s in shards for x in s) == reads
    # GAM shard write + merge
    out = str(tmp_path / "all.gam")
    for i in range(3):
        distributed.write_host_shard(
            out, [vg.Alignment(name=f"r{i}_{j}") for j in range(2)], i
        )
    n = distributed.merge_shards(out, 3)
    assert n == 6
    assert len(stream.read_messages(out, vg.Alignment)) == 6


def test_buffered_writer(capsys):
    import sys

    w = BufferedWriter(sys.stdout)
    w.write("a", 1, "b")
    w.flush()
    assert capsys.readouterr().out == "a1b\n"


def test_metrics():
    m = AlignMetrics().start()
    m.record_read(1000)
    m.record_read(500, failed=True)
    m.stop()
    s = m.summary()
    assert s["reads"] == 2 and s["failed"] == 1 and s["cells_processed"] == 1500
    assert m.json_line().startswith("{")


def test_runtime_batched_backend(tmp_path):
    """The driver's --backend jax full-band path end-to-end on CPU devices."""
    from graphaligner_tpu.core.params import AlignerParams
    from graphaligner_tpu.runtime.aligner import align_reads

    params = AlignerParams(
        graph_file=f"{SIM}/bubbles.vg",
        fastq_file=f"{SIM}/sim.fastq",
        alignment_file=str(tmp_path / "out.gam"),
        initial_bandwidth=35,
        initial_full_band=True,
    )
    logs = []
    alns = align_reads(
        params, log=logs.append, output_dir=str(tmp_path), backend="jax",
        device_batch=8,
    )
    assert len(alns) == 20
    on_disk = stream.read_messages(str(tmp_path / "out.gam"), vg.Alignment)
    assert on_disk == alns


def test_graft_entry_dryrun_multichip():
    """The driver's multi-chip dry run must keep working as engine
    outputs evolve (a new banded_scan output once broke its shard_map
    specs without any test noticing)."""
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
