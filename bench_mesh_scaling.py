"""Virtual-mesh scaling curve (VERDICT r2 item 9): reads/s through the
--mesh dp driver path at 1/2/4/8 CPU devices.

Real multi-chip hardware is unavailable here (one remote TPU chip), so
this measures the next best thing: the sharded driver path's per-device
OVERHEAD on a virtual CPU mesh. With one physical core (nproc=1) all
virtual devices share the core, so ideal scaling is flat 1.0x — any
drop below that is input-pipeline + shard_map + collective overhead
that would eat into real multi-chip scaling. Prints one JSON line:
{"metric": "mesh_overhead", "per_devices": {...}}.

Each device count runs in a fresh subprocess (jax_num_cpu_devices must
be set before backend init; this jax ignores
--xla_force_host_platform_device_count).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
n = int(sys.argv[2])
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", n)
assert len(jax.devices()) == n, jax.devices()

from graphaligner_tpu.core.batch_align import (
    BandedBatchAligner, align_reads_seeded_batch,
)
from graphaligner_tpu.graph import load_alignment_graph
from graphaligner_tpu.io import load_fastq
from graphaligner_tpu.runtime.aligner import load_seed_hits
from graphaligner_tpu.parallel import make_mesh

LS = os.path.join(sys.argv[1], "tests/fixtures/longsim")
graph = load_alignment_graph(f"{LS}/graph.vg")
reads = load_fastq(f"{LS}/reads.fastq")
seeds = load_seed_hits(f"{LS}/seeds.gam", [r.seq_id for r in reads])

mesh = make_mesh(n) if n > 1 else None
aligner = BandedBatchAligner(graph, 35, 0, mesh=mesh)
align_reads_seeded_batch(graph, aligner, reads, seeds)  # warm/compile
t0 = time.time()
res = align_reads_seeded_batch(graph, aligner, reads, seeds)
dt = time.time() - t0
ok = sum(1 for r in res.values() if not r.alignment_failed)
print(json.dumps({"n": n, "reads_per_s": len(reads) / dt, "ok": ok,
                  "reads": len(reads), "wall_s": dt}))
"""


def main():
    results = {}
    for n in (1, 2, 4, 8):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        r = subprocess.run(
            [sys.executable, "-c", _CHILD, REPO, str(n)],
            capture_output=True, text=True, timeout=3600, env=env,
        )
        if r.returncode != 0:
            print(f"n={n} FAILED:\n{r.stderr[-2000:]}", file=sys.stderr)
            continue
        line = json.loads(r.stdout.strip().splitlines()[-1])
        assert line["ok"] == line["reads"], line
        results[str(n)] = {
            "reads_per_s": round(line["reads_per_s"], 2),
            "wall_s": round(line["wall_s"], 2),
        }
        print(f"n={n}: {line['reads_per_s']:.2f} reads/s", file=sys.stderr)
    base = results.get("1", {}).get("reads_per_s")
    for n, v in results.items():
        v["vs_1dev"] = round(v["reads_per_s"] / base, 3) if base else None
    print(json.dumps({
        "metric": "mesh_overhead",
        "unit": "reads/s per device count (1 physical core: ideal = flat)",
        "note": (
            "OVERHEAD curve, not scaling evidence: all N virtual devices "
            "time-slice ONE physical CPU core, so reads/s falling with N "
            "measures sharding/collective overhead only. Real multi-chip "
            "efficiency is unmeasured in this environment (no multi-chip "
            "hardware); byte-identity of the sharded pipeline is the "
            "correctness evidence (tests/test_parallel.py, dryrun)."
        ),
        "per_devices": results,
    }))


if __name__ == "__main__":
    main()
