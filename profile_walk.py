"""Walk-path microprofile on the real TPU: splits _walk_moves_collect
into kernel-execution / moves-fetch / native-decode and sweeps the walk
knobs (GA_WALK_BB, GA_WALK_UNROLL) on a REAL longsim chunk's walk
inputs (captured from one driver dispatch, so band shapes, tie starts
and state are production-exact).

Usage: python profile_walk.py [longsim|sim] [tile]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("GA_NO_FALLBACK", "1")

import numpy as np


def main():
    corpus = sys.argv[1] if len(sys.argv) > 1 else "longsim"
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from dataclasses import replace

    import graphaligner_tpu.ops.pallas.walk_moves as wm
    from graphaligner_tpu.core import batch_align as ba
    from graphaligner_tpu.graph import load_alignment_graph
    from graphaligner_tpu.io import load_fastq, native
    from graphaligner_tpu.runtime.aligner import load_seed_hits

    FIX = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tests/fixtures", corpus
    )
    names = {
        "longsim": ("graph.vg", "reads.fastq", "seeds.gam"),
        "sim": ("bubbles.vg", "sim.fastq", "seeds.gam"),
    }[corpus]
    if corpus == "sim":
        tile *= 25
    graph = load_alignment_graph(os.path.join(FIX, names[0]))
    reads0 = load_fastq(os.path.join(FIX, names[1]))
    seeds0 = load_seed_hits(os.path.join(FIX, names[2]), [r.seq_id for r in reads0])
    reads, seeds = [], {}
    for t in range(tile):
        for r in reads0:
            rid = f"{r.seq_id}_t{t}"
            reads.append(replace(r, seq_id=rid))
            seeds[rid] = seeds0[r.seq_id]

    # capture one production walk_moves call's args
    captured = {}
    orig_walk = wm.walk_moves

    def capture(*args, **kw):
        if "args" not in captured:
            captured["args"] = args
            captured["kw"] = kw
        return orig_walk(*args, **kw)

    wm.walk_moves = capture
    aligner = ba.BandedBatchAligner(graph, 35, 0)
    res = ba.align_reads_seeded_batch(graph, aligner, reads, seeds)
    assert all(not r.alignment_failed for r in res.values())
    wm.walk_moves = orig_walk
    args, kw = captured["args"], captured["kw"]
    B = args[0].shape[3]
    K = args[0].shape[0] - 1
    print(f"captured walk: B={B} K={K} Cm={args[0].shape[2]} "
          f"Nm={args[1].shape[1]} K_in={kw['K_in']}", flush=True)

    import functools

    import jax

    for bb in (128, 256, 512):
        if B % bb:
            continue
        for unroll in (1, 2, 4):
            fn = jax.jit(functools.partial(
                wm.walk_moves_kernel, K_in=kw["K_in"], Bb=bb, unroll=unroll,
            ))
            out = fn(*args)
            jax.block_until_ready(out)
            times = []
            for _ in range(3):
                t0 = time.time()
                out = fn(*args)
                jax.block_until_ready(out)
                times.append(time.time() - t0)
            moves_dev, fail_dev, state, used_dev = out
            t0 = time.time()
            moves = np.ascontiguousarray(np.asarray(moves_dev)).view(np.uint32)
            t_fetch = time.time() - t0
            print(f"Bb={bb:4d} unroll={unroll}: kernel "
                  f"{min(times)*1000:7.1f} ms (all {[round(t,3) for t in times]}), "
                  f"fetch {t_fetch*1000:6.1f} ms "
                  f"({moves.nbytes/1e6:.1f} MB)", flush=True)

    # decode cost (pool, production path)
    fail = np.asarray(fail_dev)[0]
    t = aligner.tables
    node_start64 = np.ascontiguousarray(graph.node_start, dtype=np.int64)
    node_end64 = np.ascontiguousarray(graph.node_end, dtype=np.int64)
    pos2node = np.ascontiguousarray(t.pos_to_node)
    in_nbrs = np.ascontiguousarray(t.in_nbrs)
    cap = K * 64 * 3 + 64
    live = [i for i in range(B) if not fail[i]]
    sw = np.asarray(args[9][0])  # init_state? just decode what we can

    print(f"decode: {len(live)} live lanes (of {B})", flush=True)


if __name__ == "__main__":
    main()
