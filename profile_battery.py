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

    for var, val in (
        ("GA_CHUNK", chunk),
        ("GA_CELL_BB", cell_bb),
        ("GA_WALK_BB", walk_bb),
    ):
        if val is not None:
            os.environ[var] = str(val)
        else:
            os.environ.pop(var, None)
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


OUT_PATH = None  # set by main(); importers (tools/ab_*.py) get /tmp


def _flush(results):
    """Write partial results after every run so a watchdog timeout
    mid-battery doesn't lose the completed measurements. Importers that
    reuse run_corpus flush to /tmp — NOT to sys.argv[1], which for
    `python -m tools.ab_tlo longsim ...` is the corpus name and used to
    strand a file literally called `longsim` in the repo root."""
    out = OUT_PATH or "/tmp/battery_partial.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=1)


def main():
    """Greedy keep-on-win sweep: apply one knob at a time to the current
    best config, keep it if longsim reads/s improves >=3%. One TPU
    session yields the best combined config (written as the final
    'best_config' entry) instead of isolated single-knob A/Bs."""
    global OUT_PATH
    OUT_PATH = sys.argv[1] if len(sys.argv) > 1 else "/tmp/battery.json"
    results = []
    t_all = time.time()
    tile = int(os.environ.get("GA_BATTERY_TILE", 10))  # smoke: =1 on CPU

    best = {"chunk": None, "cell_bb": None, "walk_bb": None}
    env_best = {}

    def attempt(tag, env=None, **cfg):
        for k, v in (env or {}).items():
            os.environ[k] = v
        try:
            trial = dict(best, **cfg)
            label = f"longsim x10 {tag}"
            return run_corpus("longsim", tile, label, results, **trial), trial
        finally:
            for k in env or {}:
                if k not in env_best:
                    del os.environ[k]
                else:
                    os.environ[k] = env_best[k]

    # sim reads are 600bp/0.02ms-class: tile 25x more so the timed pass
    # is long enough to resolve >=10k reads/s
    sim_tile = tile * 25

    base, _ = attempt("base")
    run_corpus("sim", sim_tile, "sim base", results)
    cur = base["reads_per_s"]

    # width ladder: per-step fixed costs amortize over the chunk width,
    # and the kernel block widths must rise with it (Bb=512 is the VMEM
    # ceiling at Cm=288; [256]-wide ops fill only 2/8 VPU sublanes)
    # 512 and 1024 run unconditionally (the rung changes chunk AND both
    # block widths, so a losing 512 doesn't predict 1024); 2048 only if
    # 1024 won its rung
    for chunk in (512, 1024, 2048):
        e, trial = attempt(
            f"chunk={chunk} bb=512/256", chunk=chunk, cell_bb=512, walk_bb=256
        )
        won = e["reads_per_s"] >= 1.03 * cur
        if won:
            best, cur = trial, e["reads_per_s"]
        if chunk >= 1024 and not won:
            break

    # projection: precomputed reach (relaxation loop -> 1 gather+1 sort),
    # else two-hop relaxation (halves trip count)
    for tag, env in (
        ("proj=reach", {"GA_PROJ": "reach"}),
        ("proj=2hop", {"GA_PROJ": "pairwise2"}),
    ):
        e, _ = attempt(tag, env=env)
        if e["reads_per_s"] >= 1.03 * cur:
            env_best.update(env)
            os.environ.update(env)
            cur = e["reads_per_s"]
            break

    # scan unroll: amortizes per-iteration loop mechanics across slices
    e, _ = attempt("unroll=4", env={"GA_UNROLL": "4"})
    if e["reads_per_s"] >= 1.03 * cur:
        env_best["GA_UNROLL"] = "4"
        os.environ["GA_UNROLL"] = "4"
        cur = e["reads_per_s"]

    # walk lockstep unroll: amortizes Mosaic per-iteration loop overhead
    e, _ = attempt("walk_unroll=2", env={"GA_WALK_UNROLL": "2"})
    if e["reads_per_s"] >= 1.03 * cur:
        env_best["GA_WALK_UNROLL"] = "2"
        os.environ["GA_WALK_UNROLL"] = "2"
        cur = e["reads_per_s"]

    # final best on both corpora (back-to-back, same process); flush the
    # best_config FIRST so a crash in a confirmation run can't lose it
    results.append(
        {
            "best_config": {**{k: v for k, v in best.items() if v}, **env_best},
            "best_longsim_reads_per_s": cur,
            "total_wall_s": round(time.time() - t_all, 1),
        }
    )
    _flush(results)
    run_corpus("longsim", tile, "longsim x10 BEST", results, **best)
    run_corpus("sim", sim_tile, "sim BEST", results, **best)
    results[-3:] = results[-2:] + results[-3:-2]  # keep best_config last
    results[-1]["total_wall_s"] = round(time.time() - t_all, 1)
    _flush(results)
    print("battery complete", flush=True)


if __name__ == "__main__":
    main()
