"""Round-5 chunk-width ladder, back-to-back in ONE process (machine
speed drifts +-30% across processes — CLAUDE.md measurement
discipline).

Rationale: the scan's per-slice-step cost is dominated by FIXED
per-step op overheads (BENCH.md round-1 analysis; confirmed by the
round-4 phase table where _finish_round tracks slice-step count, not
lane count), so wider chunks amortize it over more lanes — and B=1024
unlocks the cell kernel's Bb=512 block width on every chunk (4/8 VPU
sublanes vs 2/8 at B=256). The round-3 battery's chunk=1024 loss
predates the r4 walk levers; retest with today's walk.

Usage: python -m tools.ab_r5 [tile]   (default 10 -> 1000 longsim reads)
Prints one JSON line per rung; defaults rerun last as the drift check.
"""

import json
import os
import sys

CONFIGS = [
    ("defaults (chunk=512)", dict()),
    ("chunk=1024", dict(chunk=1024)),
    ("chunk=2048", dict(chunk=2048)),
    ("chunk=1024 walkdisp=512", dict(chunk=1024), {"GA_WALK_DISP_B": "512"}),
    ("defaults rerun", dict()),
]


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    os.environ.setdefault("GA_NO_FALLBACK", "1")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from profile_battery import run_corpus

    tile = int(argv[0]) if argv else 10
    results: list = []
    for cfg in CONFIGS:
        label, kw = cfg[0], cfg[1]
        env = cfg[2] if len(cfg) > 2 else {}
        for var in ("GA_WALK_DISP_B",):
            os.environ.pop(var, None)
        os.environ.update(env)
        run_corpus("longsim", tile, f"longsim {label}", results, **kw)
        run_corpus("sim", tile * 25, f"sim {label}", results, **kw)
    print(json.dumps({"all": results}, indent=None))
    return results


if __name__ == "__main__":
    main()
