"""Back-to-back A/B of the round-4b levers, one process (machine speed
drifts +-30% across processes — CLAUDE.md measurement discipline):

  - GA_WALK_DISP_B: walk dispatch block width. 0 = one kernel call per
    K-group (no intra-chunk walk pipelining); 256 (default) = split
    groups into 256-lane blocks so block k+1's kernel overlaps block
    k's moves fetch + native decode.
  - GA_CHUNK=1024 + GA_CELL_BB=1024: [1024]-wide cell-kernel vectors
    fill all 8 VPU sublanes (512 fills 4), at the cost of fewer chunks
    to pipeline; fits the 15MB VMEM budget at Cm=288.

Usage: python -m tools.ab_r4b [corpus] [tile]   (default longsim 10)
Prints one JSON line per configuration, with a defaults rerun last as
the drift check.
"""

import json
import os
import sys


CONFIGS = [
    ("walk disp off", {"GA_WALK_DISP_B": "0"}, None, None),
    ("new defaults", {}, None, None),
    ("chunk1024 bb1024", {}, 1024, 1024),
    ("new defaults rerun", {}, None, None),
]


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    os.environ.setdefault("GA_NO_FALLBACK", "1")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from profile_battery import run_corpus

    corpus = argv[0] if argv else "longsim"
    tile = int(argv[1]) if len(argv) > 1 else 10
    results: list = []
    for label, env, chunk, cell_bb in CONFIGS:
        os.environ.pop("GA_WALK_DISP_B", None)
        os.environ.update(env)
        run_corpus(corpus, tile, f"{corpus} {label}", results,
                   chunk=chunk, cell_bb=cell_bb)
        print(json.dumps(results[-1]), flush=True)
    return results


if __name__ == "__main__":
    main()
