"""Giant-band (alternate-method) path: a hub graph whose band projection
hits ALTERNATE_METHOD_CUTOFF (200k bp). The native C++ slice engine
(ga_compute_slice) must carry these slices — bit-identical to the
reference binary's golden, with the Python per-cell loop not in play
(VERDICT r1 item 4; reference calculateSliceAlternate,
GraphAligner.h:2148-2329, switch at 2483)."""

import pathlib
import time

import pytest

import graphaligner_tpu.core.oracle as oracle
from graphaligner_tpu.core.align import align_one_way_seeded
from graphaligner_tpu.graph import load_alignment_graph
from graphaligner_tpu.io import load_fastq, native, stream, vg

FIX = pathlib.Path(__file__).parent / "fixtures" / "giantband"


@pytest.mark.skipif(native.get_lib() is None, reason="native lib unavailable")
def test_giant_band_bit_identical_and_native():
    graph = load_alignment_graph(str(FIX / "graph.vg"))
    read = load_fastq(str(FIX / "read.fastq"))[0]
    golden = list(stream.read_messages(str(FIX / "golden.gam"), vg.Alignment))[0]

    calls = {"native": 0, "giant": 0}
    orig = oracle._native_slice

    def counting(*a, **k):
        r = orig(*a, **k)
        if r is not None:
            calls["native"] += 1
            if len(r[0]) >= 190_000:
                calls["giant"] += 1
        return r

    oracle._native_slice = counting
    try:
        t0 = time.time()
        result = align_one_way_seeded(
            graph, read.seq_id, read.sequence, 35, 0, [(1, 0, False)]
        )
        dt = time.time() - t0
    finally:
        oracle._native_slice = orig

    assert calls["giant"] >= 1, "no >=190k-cell slice ran natively"
    assert not result.alignment_failed
    mine = vg.Alignment.decode(result.alignment.encode())
    for m in mine.path.mapping:
        m.position.node_id //= 2
    assert mine == golden, "giant-band alignment differs from reference"
    # the reference binary aligned this read in ~0.7s (alternate method);
    # the native path must be in that class, not the Python oracle's
    # minutes
    assert dt < 20, f"giant-band path too slow: {dt:.1f}s"
    print(f"giant-band read aligned in {dt:.2f}s "
          f"({calls['native']} native slices, {calls['giant']} giant)")
