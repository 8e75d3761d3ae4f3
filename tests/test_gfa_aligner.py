"""GFA graph input through the full aligner, vs reference goldens.

The overlap GFA path (S-sequence truncation by edge overlap +
DBGOverlap compensation during split alignment,
BigraphToDigraph.cpp:58-158, GraphAligner.h:2991-2992) previously had
no reference-binary validation. The golden includes FAILED reads —
which reads fail must match too."""

import glob
import gzip

import pytest

from graphaligner_tpu.core.params import AlignerParams
from graphaligner_tpu.io import stream, vg
from graphaligner_tpu.runtime.aligner import align_reads

from pathlib import Path

SIM = Path(__file__).parent / "fixtures" / "sim"


@pytest.mark.parametrize("backend", ["oracle", "jax", "auto"])
def test_gfa_input_matches_reference(tmp_path, backend):
    # "auto" is the CLI default: it must resolve to the device engine
    # (jax CPU backend in CI) and stay byte-identical to the goldens
    params = AlignerParams(
        graph_file=str(SIM / "overlap.gfa"),
        fastq_file=str(SIM / "gfa_reads.fastq"),
        alignment_file=str(tmp_path / "out.gam"),
        seed_file=str(SIM / "gfa_seeds.gam"),
        initial_bandwidth=35,
    )
    align_reads(params, log=lambda m: None, output_dir=str(tmp_path), backend=backend)
    golden_dir = SIM / "golden_gfa"
    # the same reads must succeed/fail
    g_files = sorted(Path(p).name for p in glob.glob(str(golden_dir / "alignment_*")))
    m_files = sorted(Path(p).name for p in glob.glob(str(tmp_path / "alignment_*")))
    assert g_files == m_files
    for name in g_files:
        assert (
            gzip.open(str(golden_dir / name), "rb").read()
            == gzip.open(str(tmp_path / name), "rb").read()
        ), name
    for g in sorted(glob.glob(str(golden_dir / "trace_*"))):
        name = Path(g).name
        assert open(g, "rb").read() == open(str(tmp_path / name), "rb").read(), name
    golden = stream.read_messages(str(golden_dir / "out.gam"), vg.Alignment)
    mine = stream.read_messages(str(tmp_path / "out.gam"), vg.Alignment)
    assert [repr(a) for a in golden] == [repr(b) for b in mine]
