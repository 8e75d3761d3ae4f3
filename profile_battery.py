"""One-shot TPU measurement battery: runs everything needed to steer the
perf round in a single process (A/B runs must be back-to-back — machine
speed drifts +-30% across processes).

1. longsim 1000x10kb end-to-end (the bench.py headline) with a stage
   breakdown.
2. sim 600bp short-read corpus end-to-end (VERDICT weak #2).

Usage: python profile_battery.py [out.json]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def _load(corpus):
    from graphaligner_tpu.graph import load_alignment_graph
    from graphaligner_tpu.io import load_fastq
    from graphaligner_tpu.runtime.aligner import load_seed_hits

    d = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tests/fixtures", corpus
    )
    names = {
        "longsim": ("graph.vg", "reads.fastq", "seeds.gam"),
        "sim": ("bubbles.vg", "sim.fastq", "seeds.gam"),
    }[corpus]
    graph = load_alignment_graph(os.path.join(d, names[0]))
    reads = load_fastq(os.path.join(d, names[1]))
    seeds = load_seed_hits(os.path.join(d, names[2]), [r.seq_id for r in reads])
    return graph, reads, seeds


def _tile(reads, seeds, times):
    from dataclasses import replace

    out, smap = [], {}
    for t in range(times):
        for r in reads:
            rid = f"{r.seq_id}_t{t}"
            out.append(replace(r, seq_id=rid))
            smap[rid] = seeds[r.seq_id]
    return out, smap


def run_corpus(corpus, tile, label, results, chunk=None, cell_bb=None,
               walk_bb=None):
    from graphaligner_tpu.core.batch_align import (
        BandedBatchAligner,
        align_reads_seeded_batch,
    )

    if chunk is not None:
        os.environ["GA_CHUNK"] = str(chunk)
    if cell_bb is not None:
        os.environ["GA_CELL_BB"] = str(cell_bb)
    if walk_bb is not None:
        os.environ["GA_WALK_BB"] = str(walk_bb)
    graph, reads, seeds = _load(corpus)
    reads, seeds = _tile(reads, seeds, tile)
    ba = BandedBatchAligner(graph, 35, 0)
    # warm-up: compile every signature
    t0 = time.time()
    align_reads_seeded_batch(graph, ba, reads, seeds)
    warm = time.time() - t0
    # timed pass
    t0 = time.time()
    res = align_reads_seeded_batch(graph, ba, reads, seeds)
    dt = time.time() - t0
    n = len(reads)
    ok = sum(1 for r in res.values() if not r.alignment_failed)
    bp = sum(len(r.sequence) for r in reads)
    entry = {
        "corpus": label,
        "chunk": chunk or 256,
        "reads": n,
        "aligned": ok,
        "wall_s": round(dt, 2),
        "reads_per_s": round(n / dt, 1),
        "bp_per_s": round(bp / dt / 1e6, 2),
        "warm_s": round(warm, 1),
    }
    print(json.dumps(entry), flush=True)
    results.append(entry)
    _flush(results)
    return entry


def _flush(results):
    """Write partial results after every run so a watchdog timeout
    mid-battery doesn't lose the completed measurements."""
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/battery.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=1)


def main():
    results = []
    t_all = time.time()
    run_corpus("longsim", 10, "longsim x10 (1000 reads, 10kb)", results)
    run_corpus("sim", 10, "sim x10 (short reads ~600bp)", results)
    # width sweep: the cell kernel's sequential iteration count is
    # lane-slices * Cm / Bb, and [Bb]-wide ops fill 2/8 VPU sublanes at
    # 256 — so the chunk width AND the kernel block widths must rise
    # together (Bb=512 is the VMEM ceiling at Cm=288). Each combo
    # compiles new signatures (~20-150s each on the remote toolchain).
    e512 = run_corpus(
        "longsim", 10, "longsim x10 chunk=512 bb=512/256", results,
        chunk=512, cell_bb=512, walk_bb=256,
    )
    e1024 = run_corpus(
        "longsim", 10, "longsim x10 chunk=1024 bb=512/256", results,
        chunk=1024, cell_bb=512, walk_bb=256,
    )
    # if widening keeps paying (per-step fixed costs still dominate),
    # probe one more doubling before the sweep moves on
    if e1024["reads_per_s"] >= 1.05 * e512["reads_per_s"]:
        run_corpus(
            "longsim", 10, "longsim x10 chunk=2048 bb=512/256", results,
            chunk=2048, cell_bb=512, walk_bb=256,
        )
    run_corpus(
        "sim", 10, "sim x10 chunk=1024 bb=512/256", results,
        chunk=1024, cell_bb=512, walk_bb=256,
    )
    # two-hop projection re-test (halves while-loop trips; its extra
    # gathers are now folded into the packed exp_tbl read)
    os.environ["GA_PROJ"] = "pairwise2"
    run_corpus(
        "longsim", 10, "longsim x10 chunk=1024 bb=512/256 proj=2hop",
        results, chunk=1024, cell_bb=512, walk_bb=256,
    )
    del os.environ["GA_PROJ"]
    # precomputed-reach projection: the relaxation loop (the largest
    # fixed per-slice cost, ~40% of scan) collapses to 1 gather + 1 sort
    os.environ["GA_PROJ"] = "reach"
    run_corpus(
        "longsim", 10, "longsim x10 chunk=1024 bb=512/256 proj=reach",
        results, chunk=1024, cell_bb=512, walk_bb=256,
    )
    run_corpus(
        "sim", 10, "sim x10 chunk=1024 bb=512/256 proj=reach",
        results, chunk=1024, cell_bb=512, walk_bb=256,
    )
    del os.environ["GA_PROJ"]
    # scan unroll: amortizes per-iteration loop mechanics (a slice of
    # the fixed per-step cost) across 4 slices; compile time grows
    os.environ["GA_UNROLL"] = "4"
    run_corpus(
        "longsim", 10, "longsim x10 chunk=1024 bb=512/256 unroll=4",
        results, chunk=1024, cell_bb=512, walk_bb=256,
    )
    del os.environ["GA_UNROLL"]
    results.append({"total_wall_s": round(time.time() - t_all, 1)})
    _flush(results)
    print("battery complete", flush=True)


if __name__ == "__main__":
    main()
