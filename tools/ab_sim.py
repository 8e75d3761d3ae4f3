"""Back-to-back chunk-size A/B driver (checked-in form of the ephemeral
/tmp/ab_sim.py run recorded in BENCH.md): every configuration runs in
ONE process on the live backend, because machine speed drifts +-30%
between processes (CLAUDE.md measurement discipline).

Usage:
    python -m tools.ab_sim [corpus] [tile] [chunk ...]

corpus defaults to "sim", tile to 25 (sim's 20-read fixture x25 = 500
reads); chunk values default to "none 64 96 128 none" where "none" runs
the code defaults. Prints one JSON line per configuration.
"""

import json
import os
import sys


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    os.environ.setdefault("GA_NO_FALLBACK", "1")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from profile_battery import run_corpus

    corpus = argv[0] if argv else "sim"
    tile = int(argv[1]) if len(argv) > 1 else 25
    raw = argv[2:] or ["none", "64", "96", "128", "none"]
    chunks = [None if c in ("none", "default") else int(c) for c in raw]
    results: list = []
    for chunk in chunks:
        label = f"{corpus} chunk={'default' if chunk is None else chunk}"
        run_corpus(corpus, tile, label, results, chunk=chunk)
        print(json.dumps(results[-1]), flush=True)
    return results


if __name__ == "__main__":
    main()
