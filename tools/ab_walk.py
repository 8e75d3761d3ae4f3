"""Back-to-back A/B of the walk-path levers, one process (machine speed
drifts +-30% across processes — CLAUDE.md measurement discipline):

  - GA_NO_TIEBATCH: per-lane Python tie dispatch (old) vs the single
    threaded native ga_tie_batch call (new default)
  - GA_HOST_WALK_CODES: host codes relayout + re-upload (old) vs the
    scan's device-resident codes passthrough (new default)

Usage: python -m tools.ab_walk [corpus] [tile]   (default longsim 10)
Prints one JSON line per configuration, old-to-new, with a defaults
rerun last as the drift check.
"""

import json
import os
import sys


CONFIGS = [
    ("r3-equivalent (host codes + per-lane ties)",
     {"GA_HOST_WALK_CODES": "1", "GA_NO_TIEBATCH": "1"}),
    ("tie_batch only", {"GA_HOST_WALK_CODES": "1"}),
    ("dev codes only", {"GA_NO_TIEBATCH": "1"}),
    ("new defaults", {}),
    ("new defaults rerun", {}),
]


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    os.environ.setdefault("GA_NO_FALLBACK", "1")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from profile_battery import run_corpus

    corpus = argv[0] if argv else "longsim"
    tile = int(argv[1]) if len(argv) > 1 else 10
    results: list = []
    for label, env in CONFIGS:
        for var in ("GA_HOST_WALK_CODES", "GA_NO_TIEBATCH"):
            os.environ.pop(var, None)
        os.environ.update(env)
        run_corpus(corpus, tile, f"{corpus} {label}", results)
        print(json.dumps(results[-1]), flush=True)
    return results


if __name__ == "__main__":
    main()
