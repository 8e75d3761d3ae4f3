"""Real-TPU golden verification: the Pallas engine + move-walk only run
on the TPU backend, so any engine/encoder change must re-verify the
reference-binary goldens HERE, not just in the CPU suite (CLAUDE.md
invariant).

Runs the batched pipeline on sim (600bp, both bandwidth configs) and
longsim (10kb) corpora and compares every alignment against the
reference goldens message-by-message. Exit 0 = bit-identical.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# fail-loud: a silent host-oracle fallback would "verify" the host path
# instead of the device path these goldens exist to test
os.environ.setdefault("GA_NO_FALLBACK", "1")

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests/fixtures")
INT32_MAX = 2**31 - 1


def check_corpus(name, graph_file, reads_file, seeds_file, golden_file,
                 bandwidth, ramp):
    from graphaligner_tpu.core.batch_align import (
        BandedBatchAligner,
        align_reads_seeded_batch,
    )
    from graphaligner_tpu.graph import load_alignment_graph
    from graphaligner_tpu.io import load_fastq, stream, vg
    from graphaligner_tpu.runtime.aligner import load_seed_hits

    graph = load_alignment_graph(graph_file)
    reads = load_fastq(reads_file)
    seeds = load_seed_hits(seeds_file, [r.seq_id for r in reads])
    golden = {
        a.name: a for a in stream.read_messages(golden_file, vg.Alignment)
    }
    aligner = BandedBatchAligner(graph, bandwidth, ramp)
    results = align_reads_seeded_batch(graph, aligner, reads, seeds)
    n_ok = 0
    for read in reads:
        res = results[read.seq_id]
        if res.alignment_failed or res.alignment.score == INT32_MAX:
            assert read.seq_id not in golden, f"{name}/{read.seq_id}: missing"
            continue
        mine = vg.Alignment.decode(res.alignment.encode())
        for m in mine.path.mapping:
            m.position.node_id //= 2
        assert read.seq_id in golden, f"{name}/{read.seq_id}: extra alignment"
        assert mine == golden[read.seq_id], f"{name}/{read.seq_id}: differs"
        n_ok += 1
    print(f"{name}: {n_ok}/{len(reads)} bit-identical", flush=True)


def main():
    import jax

    assert jax.default_backend() != "cpu", (
        "verify_tpu.py must run on the real TPU (got cpu backend)"
    )
    check_corpus(
        "longsim b35",
        f"{FIX}/longsim/graph.vg", f"{FIX}/longsim/reads.fastq",
        f"{FIX}/longsim/seeds.gam", f"{FIX}/longsim/golden_b35.gam", 35, 0,
    )
    check_corpus(
        "sim b35",
        f"{FIX}/sim/bubbles.vg", f"{FIX}/sim/sim.fastq",
        f"{FIX}/sim/seeds.gam", f"{FIX}/sim/golden_b35/out.gam", 35, 0,
    )
    check_corpus(
        "sim b5 B20 (ramping)",
        f"{FIX}/sim/bubbles.vg", f"{FIX}/sim/sim.fastq",
        f"{FIX}/sim/seeds.gam", f"{FIX}/sim/golden_b5_B20/out.gam", 5, 20,
    )
    # candidate perf config: the reach projection must hold its goldens
    # on the REAL chip (different XLA lowering than the CPU suite)
    # before the battery's best_config can become the default
    os.environ["GA_PROJ"] = "reach"
    check_corpus(
        "longsim b35 proj=reach",
        f"{FIX}/longsim/graph.vg", f"{FIX}/longsim/reads.fastq",
        f"{FIX}/longsim/seeds.gam", f"{FIX}/longsim/golden_b35.gam", 35, 0,
    )
    check_corpus(
        "sim b35 proj=reach",
        f"{FIX}/sim/bubbles.vg", f"{FIX}/sim/sim.fastq",
        f"{FIX}/sim/seeds.gam", f"{FIX}/sim/golden_b35/out.gam", 35, 0,
    )
    del os.environ["GA_PROJ"]
    print("TPU golden verification: ALL BIT-IDENTICAL", flush=True)


if __name__ == "__main__":
    main()
