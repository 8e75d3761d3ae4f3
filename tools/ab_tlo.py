"""Back-to-back GA_WALK_TLO sweep, one process (CLAUDE.md measurement
discipline: machine speed drifts +-30% across processes).

GA_WALK_TLO scales the walk moves-prefix prefetch (batch_align.py
`_walk_lanes`): T_lo = (K_max * t_lo + 512 + 7) // 8 rows of the
[T, B] uint8 moves buffer are fetched eagerly; lanes whose used count
exceeds the prefix trigger a full-buffer fetch. Lower = fewer bytes on
the ~40 MB/s link per chunk, but a single over-run costs the whole
~9.4 MB buffer. The value is read from the environment at each walk
call, so one warm process measures every rung with shared compiles.

Usage: python -m tools.ab_tlo [corpus] [tile] [tlo ...]
       (default: longsim 10 96 88 80 72 64 88)
Prints one JSON line per rung; the repeated default last is the drift
check.
"""

import json
import os
import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    os.environ.setdefault("GA_NO_FALLBACK", "1")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from profile_battery import run_corpus

    corpus = argv[0] if argv else "longsim"
    tile = int(argv[1]) if len(argv) > 1 else 10
    rungs = [int(a) for a in argv[2:]] or [96, 88, 80, 72, 64, 88]
    results: list = []
    for tlo in rungs:
        os.environ["GA_WALK_TLO"] = str(tlo)
        run_corpus(corpus, tile, f"{corpus} tlo={tlo}", results)
        print(json.dumps(results[-1]), flush=True)
    return results


if __name__ == "__main__":
    main()
